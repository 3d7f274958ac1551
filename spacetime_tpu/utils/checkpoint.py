"""Simulation checkpoint/resume.

The reference persists nothing but Vulkan pipeline caches at exit
(reference: src/boilerplate.rs:187-206, main.rs:354-359) with save-on-close
marked as future work (main.rs:206-210).  Here the whole simulation state is
a pytree, so checkpointing is exact serialization: particles + worldline
history + camera + step counter (SURVEY.md §5 flags this as a strict,
cheap improvement worth shipping).

(The JAX analog of the pipeline-cache persistence itself is the XLA
compilation cache, enabled via jax_compilation_cache_dir.)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

FORMAT_VERSION = 2  # v2: time-major (2T, N) worldline planes


def save(path: str, tree: Any, meta: Dict | None = None) -> None:
    """Serialize a pytree of arrays (+ JSON-able metadata) to one .npz."""
    leaves, treedef = jax.tree.flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(meta or {})
    meta["__version__"] = FORMAT_VERSION
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load(path: str, like: Any) -> Tuple[Any, Dict]:
    """Restore a pytree saved by `save`; `like` provides the tree structure.

    Raises ValueError with a clear message on version or shape mismatch
    (e.g. a checkpoint from a different capacity/history config) instead of
    failing deep inside tree.unflatten."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode() or "{}")
        version = meta.pop("__version__", None)
        if version is not None and version != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path!r} has format version {version}, "
                f"this build reads version {FORMAT_VERSION}"
            )
        leaves, treedef = jax.tree.flatten(like)
        n_stored = sum(1 for k in data.files if k.startswith("leaf_"))
        if n_stored != len(leaves):
            raise ValueError(
                f"checkpoint {path!r} holds {n_stored} arrays but the "
                f"current state has {len(leaves)} — different engine config?"
            )
        restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
        for i, (l, r) in enumerate(zip(leaves, restored)):
            if hasattr(l, "shape") and tuple(l.shape) != tuple(r.shape):
                raise ValueError(
                    f"checkpoint {path!r} leaf {i} has shape {tuple(r.shape)}"
                    f" but the engine expects {tuple(l.shape)} — capacity or"
                    f" history differs from the saved run"
                )
        new_leaves = [
            jax.numpy.asarray(r) if hasattr(l, "dtype") else type(l)(r)
            for l, r in zip(leaves, restored)
        ]
    return jax.tree.unflatten(treedef, new_leaves), meta
