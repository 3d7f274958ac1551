"""jax.shard_map compatibility shim.

Modern jax exposes `jax.shard_map` with a `check_vma` kwarg; older releases
only have `jax.experimental.shard_map.shard_map`, whose equivalent kwarg is
`check_rep`.  Callers that passed `check_vma=False` to the legacy API would
crash with TypeError — exactly the versions the fallback import exists for —
so the kwarg translation lives here, once.
"""

from __future__ import annotations

try:
    from jax import shard_map as _shard_map

    _NOCHECK = {"check_vma": False}
except ImportError:  # older jax: experimental module, check_rep kwarg
    from jax.experimental.shard_map import shard_map as _shard_map

    _NOCHECK = {"check_rep": False}


def shard_map_nocheck(f, mesh, in_specs, out_specs):
    """shard_map with replication/VMA checking disabled (our kernels return
    per-shard partial outputs that the specs, not the checker, describe)."""
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **_NOCHECK)
