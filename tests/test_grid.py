"""Collision grid vs brute force (SURVEY.md §4: O(n^2) oracle strategy)."""

import jax.numpy as jnp
import numpy as np

from spacetime_tpu.ops import grid as grid_ops


def _brute_force_pairs(pos, active, radius):
    n = pos.shape[0]
    out = set()
    for i in range(n):
        if not active[i]:
            continue
        for j in range(n):
            if i == j or not active[j]:
                continue
            if np.linalg.norm(pos[i] - pos[j]) < radius:
                out.add((i, j))
    return out


def test_candidates_contain_all_near_pairs(rng):
    n = 128
    pos = rng.uniform(0.0, 0.08, (n, 2)).astype(np.float32)
    active = np.ones(n, bool)
    active[-8:] = False
    pos[-8:] = 1e9
    res = 0.005
    g = grid_ops.build_grid(jnp.asarray(pos), jnp.asarray(active), res, 256)
    cand, valid = grid_ops.collision_candidates(g, jnp.asarray(pos), res, cell_capacity=16)
    cand, valid = np.asarray(cand), np.asarray(valid)
    assert int(grid_ops.grid_overflow(g, 16)) == 0
    found = {
        (i, cand[i, c]) for i in range(n) for c in range(cand.shape[1]) if valid[i, c]
    }
    want = _brute_force_pairs(pos, active, 0.002)
    missing = want - found
    assert not missing, f"missing near pairs: {missing}"


def test_candidates_never_include_inactive(rng):
    n = 64
    pos = rng.uniform(0.0, 0.02, (n, 2)).astype(np.float32)
    active = rng.uniform(size=n) > 0.3
    pos[~active] = 1e9
    g = grid_ops.build_grid(jnp.asarray(pos), jnp.asarray(active), 0.005, 128)
    cand, valid = grid_ops.collision_candidates(g, jnp.asarray(pos), 0.005, 8)
    cand, valid = np.asarray(cand), np.asarray(valid)
    hit = cand[valid]
    assert np.all(active[hit])


def test_negative_coordinates_hash_distinctly(rng):
    # Regression guard for the reference's abs() hash folding
    # (common.glsl:35-39): particles at (x, y) and (-x, -y) must not be forced
    # into the same cell key systematically.
    pts = np.array([[0.012, 0.012], [-0.012, -0.012], [0.012, -0.012]], np.float32)
    cells = np.floor(pts / 0.005).astype(np.int32)
    keys = np.asarray(grid_ops.hash_cell(jnp.asarray(cells), 255))
    assert len(set(keys.tolist())) == 3


def test_grid_overflow_counts(rng):
    # 32 particles in one cell with capacity 4 -> 28 dropped
    pos = np.full((32, 2), 0.001, np.float32) + rng.uniform(0, 1e-4, (32, 2)).astype(
        np.float32
    )
    g = grid_ops.build_grid(jnp.asarray(pos), jnp.ones(32, bool), 0.005, 64)
    assert int(grid_ops.grid_overflow(g, 4)) == 28
