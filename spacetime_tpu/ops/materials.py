"""Per-object material properties for the softbody solver.

The reference hard-codes one global material (k, repulsion, break threshold
as push constants, reference: src/twoplusone/softbody/softbodyrk4.glsl:24-33)
but already tags objects with a material index it only uses for shading.
This module completes that plumbing: a small host-side table of per-material
coefficients is expanded ONCE per scene into per-particle planes (static
(N,) arrays — no per-step table lookups on device), which the force kernels
consume via the same shifted-slice reads as positions.

Properties (all dimensionless multipliers / coefficients):
  * k_scale     — spring stiffness multiplier (pairwise mean, symmetric)
  * damping     — spring-damper coefficient c: F = -c ((v_i-v_j)·d̂) d̂
                  (projected on the bond, from ORIGINAL step velocities to
                  match the integrator's fixed-velocity stage scheme)
  * break_scale — bond break threshold multiplier (pairwise MIN: the weaker
                  material fails first, symmetric by construction)
  * creep_rate  — plastic creep rate (1/time): bonds stretched past the
                  yield strain permanently lengthen (per-bond rest-length
                  state on Particles.rest_len; pairwise MIN, symmetric) —
                  see forces.creep_rest_lengths_shifted
  * yield_strain — relative elastic limit before creep starts (pairwise
                  MAX: the harder material sets the pair's elastic range)

Material specs may be 3-tuples (k, damping, break) or 5-tuples adding
(creep_rate, yield_strain); 3-tuples imply no creep.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import numpy as np


class ParticleMaterials(NamedTuple):
    """Per-particle device planes, expanded from the material table."""

    k_scale: jax.Array  # (N,)
    damping: jax.Array  # (N,)
    break_scale: jax.Array  # (N,)
    creep_rate: jax.Array = None  # (N,) or None (no creep anywhere)
    yield_strain: jax.Array = None  # (N,) or None (creep from zero strain)


# (k_scale, damping, break_scale[, creep_rate, yield_strain]) per material id
MaterialSpec = Tuple[float, ...]
DEFAULT_MATERIAL: MaterialSpec = (1.0, 0.0, 1.0, 0.0, 0.0)


def particle_materials(
    table: Sequence[MaterialSpec],
    material_index,  # (MAX_OBJECTS,) object -> material id
    object_index,  # (N,) particle -> object
) -> Optional[ParticleMaterials]:
    """Expand the per-material table to per-particle planes (host, once).

    Returns None when every referenced material is the default — the caller
    then keeps the material-free fast path."""
    import jax.numpy as jnp

    rows = [tuple(r) + (0.0, 0.0)[: 5 - len(r)] for r in table]
    tab = np.asarray(rows, np.float32).reshape(-1, 5)
    mat_of_obj = np.asarray(material_index)
    obj_of_p = np.asarray(object_index)
    mat_of_p = mat_of_obj[np.clip(obj_of_p, 0, len(mat_of_obj) - 1)]
    mat_of_p = np.clip(mat_of_p, 0, len(tab) - 1)
    per_p = tab[mat_of_p]  # (N, 5)
    if (
        np.all(per_p[:, 0] == 1.0)
        and np.all(per_p[:, 1] == 0.0)
        and np.all(per_p[:, 2] == 1.0)
        and np.all(per_p[:, 3] == 0.0)
    ):
        return None
    # per-field fast path: an all-default column becomes None so the force
    # kernels skip its arithmetic entirely (e.g. a stiffness-only table
    # pays nothing for damping)
    has_creep = not np.all(per_p[:, 3] == 0.0)
    return ParticleMaterials(
        k_scale=None if np.all(per_p[:, 0] == 1.0) else jnp.asarray(per_p[:, 0]),
        damping=None if np.all(per_p[:, 1] == 0.0) else jnp.asarray(per_p[:, 1]),
        break_scale=None if np.all(per_p[:, 2] == 1.0) else jnp.asarray(per_p[:, 2]),
        creep_rate=jnp.asarray(per_p[:, 3]) if has_creep else None,
        yield_strain=(
            jnp.asarray(per_p[:, 4])
            if has_creep and not np.all(per_p[:, 4] == 0.0) else None
        ),
    )
