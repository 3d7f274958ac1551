"""Spring + collision force evaluation (the per-particle hot loop).

Port of intent (not code) of `get_forces`
(reference: src/twoplusone/softbody/softbodyrk4.glsl:84-143):

  * Hooke springs to up to 8 bonded neighbors:
        F += -k (|d| - rest) * d/|d|,  d = p_self - p_neighbor
    (reference: softbodyrk4.glsl:119-140)
  * Constant-magnitude pairwise repulsion within `collision_distance` against
    grid candidates, excluding self and bonded neighbors
    (reference: softbodyrk4.glsl:90-114).

Deliberate deviation, documented per SURVEY.md §7: the reference's
neighbor-exclusion check compares *object-relative neighbor ids* against
*spatial-lookup slot indices* (softbodyrk4.glsl:101-108) — an index-space
mismatch that excludes essentially arbitrary particles.  This engine
implements the stated intent ("no colliding with your neighbors!") by
comparing global particle indices.  Self-exclusion follows the reference's
position-equality semantics via the dist > 0 test (softbodyrk4.glsl:99).

Everything here is pure function of (positions, static candidate set), fully
regular, so XLA fuses it into a handful of gather+VPU ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PhysicsParams

_EPS = 1e-20


def spring_forces(
    pos: jax.Array,  # (N, 2)
    neighbors: jax.Array,  # (N, 8) global indices, -1 = none
    rest_lengths: jax.Array,  # (8,)
    k: float,
) -> jax.Array:
    """Hooke spring force sum over bond slots (softbodyrk4.glsl:119-140)."""
    n = pos.shape[0]
    valid = neighbors >= 0
    nbr_pos = pos[jnp.clip(neighbors, 0, n - 1)]  # (N, 8, 2)
    d = pos[:, None, :] - nbr_pos
    dist = jnp.linalg.norm(d, axis=-1)  # (N, 8)
    inv = jnp.where(dist > 0, 1.0 / jnp.maximum(dist, _EPS), 0.0)
    mag = -k * (dist - rest_lengths[None, :]) * inv
    f = mag[..., None] * d
    return jnp.sum(jnp.where(valid[..., None], f, 0.0), axis=1)


def collision_forces(
    pos: jax.Array,  # (N, 2)
    cand_idx: jax.Array,  # (N, C) candidate particle indices
    cand_valid: jax.Array,  # (N, C)
    neighbors: jax.Array,  # (N, 8)
    collision_distance: float,
    repulsion: float,
) -> jax.Array:
    """Constant-magnitude repulsion from grid candidates
    (softbodyrk4.glsl:90-114)."""
    n = pos.shape[0]
    cand_pos = pos[cand_idx]  # (N, C, 2)
    d = pos[:, None, :] - cand_pos
    dist = jnp.linalg.norm(d, axis=-1)  # (N, C)
    is_self = cand_idx == jnp.arange(n, dtype=cand_idx.dtype)[:, None]
    is_bond = jnp.any(cand_idx[:, :, None] == neighbors[:, None, :], axis=-1)
    hit = cand_valid & ~is_self & ~is_bond & (dist < collision_distance) & (dist > 0)
    f = (repulsion / jnp.maximum(dist, _EPS))[..., None] * d
    return jnp.sum(jnp.where(hit[..., None], f, 0.0), axis=1)


def total_forces(
    pos: jax.Array,
    neighbors: jax.Array,
    cand_idx: jax.Array,
    cand_valid: jax.Array,
    rest_lengths: jax.Array,
    params: PhysicsParams,
) -> jax.Array:
    """F = springs + collisions (get_forces, softbodyrk4.glsl:84-143)."""
    return spring_forces(pos, neighbors, rest_lengths, params.k) + collision_forces(
        pos,
        cand_idx,
        cand_valid,
        neighbors,
        params.collision_distance,
        params.collision_repulsion_coefficient,
    )


def total_forces_dense(
    pos: jax.Array,
    neighbors: jax.Array,
    active: jax.Array,
    rest_lengths: jax.Array,
    params: PhysicsParams,
) -> jax.Array:
    """O(n^2) oracle: identical physics with all-pairs collision candidates.

    The test reference for the grid path (SURVEY.md §4); only usable at
    testimg3 scale.
    """
    n = pos.shape[0]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    valid = jnp.broadcast_to(active[None, :], (n, n))
    return total_forces(pos, neighbors, idx, valid, rest_lengths, params)
