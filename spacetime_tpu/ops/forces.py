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

Layout: all gathered intermediates are scalar component planes ((N, C), not
(N, C, 2)) — TPU pads 2-wide trailing dims to 128 lanes, which would inflate
the candidate gathers 64x in HBM (see ops/worldline.py layout note).
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
    px, py = pos[:, 0], pos[:, 1]
    valid = neighbors >= 0
    nbr = jnp.clip(neighbors, 0, n - 1)
    dx = px[:, None] - px[nbr]  # (N, 8)
    dy = py[:, None] - py[nbr]
    dist = jnp.sqrt(dx * dx + dy * dy)
    inv = jnp.where(dist > 0, 1.0 / jnp.maximum(dist, _EPS), 0.0)
    mag = jnp.where(valid, -k * (dist - rest_lengths[None, :]) * inv, 0.0)
    return jnp.stack([jnp.sum(mag * dx, axis=1), jnp.sum(mag * dy, axis=1)], axis=-1)


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
    px, py = pos[:, 0], pos[:, 1]
    dx = px[:, None] - px[cand_idx]  # (N, C)
    dy = py[:, None] - py[cand_idx]
    dist = jnp.sqrt(dx * dx + dy * dy)
    is_self = cand_idx == jnp.arange(n, dtype=cand_idx.dtype)[:, None]
    # unrolled over the 8 bond slots: keeps every intermediate at (N, C)
    # instead of materializing a lane-padded (N, C, 8) comparison tensor
    is_bond = jnp.zeros_like(cand_valid)
    for s in range(neighbors.shape[1]):
        is_bond = is_bond | (cand_idx == neighbors[:, s][:, None])
    hit = cand_valid & ~is_self & ~is_bond & (dist < collision_distance) & (dist > 0)
    mag = jnp.where(hit, repulsion / jnp.maximum(dist, _EPS), 0.0)
    return jnp.stack([jnp.sum(mag * dx, axis=1), jnp.sum(mag * dy, axis=1)], axis=-1)


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
