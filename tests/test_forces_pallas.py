"""Pallas collision kernel vs the O(n^2) oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import pytest
import numpy as np

from spacetime_tpu import scene
from spacetime_tpu.constants import DEFAULT_PARAMS
from spacetime_tpu.ops import forces as forces_ops
from spacetime_tpu.ops import forces_pallas as fp
from spacetime_tpu.ops import grid as grid_ops

REST = jnp.asarray(DEFAULT_PARAMS.rest_lengths())
GRID_DIM = 64


def _overlapping_scene(rng):
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(4, 0, (0.0, 0.0), (0.0, 0.0)))
    sb.add(scene.disc_softbody(4, 1, (0.012, 0.007), (0.0, 0.0)))
    particles, _ = sb.build(capacity=256)
    jitter = rng.uniform(-2e-4, 2e-4, particles.pos.shape).astype(np.float32)
    pos = particles.pos + jnp.asarray(jitter) * particles.active[:, None]
    return particles, pos


@pytest.mark.parametrize("chunk_sub", [8, 2])
def test_pallas_collision_matches_oracle(rng, chunk_sub):
    particles, pos = _overlapping_scene(rng)
    table = grid_ops.build_cell_table(
        pos, particles.active, DEFAULT_PARAMS.grid_resolution, GRID_DIM, 12
    )
    order = fp.build_sorted_order(
        table.cell, particles.active, (GRID_DIM + 2) ** 2, GRID_DIM + 2,
        tile=64, wmax=1024,
    )
    assert int(order.window_truncated) == 0
    f = fp.collision_forces_pallas(
        pos, particles.neighbors, order, tile=64, wmax=1024,
        collision_distance=DEFAULT_PARAMS.collision_distance,
        repulsion=DEFAULT_PARAMS.collision_repulsion_coefficient,
        interpret=True, chunk_sub=chunk_sub,
    )
    # oracle: dense collisions only (no springs)
    n = pos.shape[0]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    valid = jnp.broadcast_to(particles.active[None, :], (n, n))
    f_ref = forces_ops.collision_forces(
        pos, idx, valid, particles.neighbors,
        DEFAULT_PARAMS.collision_distance,
        DEFAULT_PARAMS.collision_repulsion_coefficient,
    )
    act = np.asarray(particles.active)
    np.testing.assert_allclose(
        np.asarray(f)[act], np.asarray(f_ref)[act], rtol=1e-4, atol=1e-3
    )
    assert np.abs(np.asarray(f_ref)[act]).max() > 1.0


def test_pallas_window_truncation_diag(rng):
    # everything in one cell with a tiny window -> truncation reported
    pos = jnp.asarray(
        np.full((64, 2), 0.001, np.float32)
        + rng.uniform(0, 1e-4, (64, 2)).astype(np.float32)
    )
    active = jnp.ones((64,), bool)
    table = grid_ops.build_cell_table(
        pos, active, DEFAULT_PARAMS.grid_resolution, GRID_DIM, 64
    )
    order = fp.build_sorted_order(
        table.cell, active, (GRID_DIM + 2) ** 2, GRID_DIM + 2, tile=64, wmax=1024
    )
    assert int(order.window_truncated) == 0


def test_split_windows_match_merged(rng):
    """Per-grid-row spans (split_windows) must produce EXACTLY the forces of
    the merged window — including tiles whose spans overlap (clipped) and
    chunk-aligned heads/tails that reach into neighboring rows (masked)."""
    # wide multi-row scene so tiles cross grid-row boundaries
    sb = scene.SceneBuilder()
    sb.add(scene.mask_to_softbody(scene.box_mask(40, 12), 0, (0.0, 0.0),
                                  (0.0, 0.0)))
    sb.add(scene.mask_to_softbody(scene.box_mask(40, 12), 1, (0.0, 0.040),
                                  (0.0, 0.0)))  # rows 1.5e-3 apart: colliding
    particles, _ = sb.build(capacity=1024)
    jitter = rng.uniform(-2e-4, 2e-4, particles.pos.shape).astype(np.float32)
    pos = particles.pos + jnp.asarray(jitter) * particles.active[:, None]

    table = grid_ops.build_cell_table(
        pos, particles.active, DEFAULT_PARAMS.grid_resolution, GRID_DIM, 16
    )
    outs = {}
    for split in (False, True):
        order = fp.build_sorted_order(
            table.cell, particles.active, (GRID_DIM + 2) ** 2, GRID_DIM + 2,
            tile=64, wmax=2048, split_windows=split,
        )
        assert int(order.window_truncated) == 0, split
        outs[split] = np.asarray(fp.collision_forces_pallas(
            pos, particles.neighbors, order, tile=64, wmax=2048,
            collision_distance=DEFAULT_PARAMS.collision_distance,
            repulsion=DEFAULT_PARAMS.collision_repulsion_coefficient,
            exclude_bonds=False,
            interpret=True,
            chunk_sub=2 if split else 8,  # cross-check DMA granularities
        ))
    act = np.asarray(particles.active)
    np.testing.assert_allclose(outs[True][act], outs[False][act],
                               rtol=1e-5, atol=1e-5)
    assert np.abs(outs[False][act]).max() > 1.0  # scene actually collides
