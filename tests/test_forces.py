"""Force evaluation tests: closed-form springs, grid-vs-dense oracle parity
(reference physics: src/twoplusone/softbody/softbodyrk4.glsl:84-143)."""

import jax.numpy as jnp
import numpy as np

from spacetime_tpu import constants, scene
from spacetime_tpu.constants import DEFAULT_PARAMS
from spacetime_tpu.ops import forces as forces_ops
from spacetime_tpu.ops import grid as grid_ops

REST = jnp.asarray(DEFAULT_PARAMS.rest_lengths())


def test_spring_force_closed_form():
    # Two particles bonded, stretched to 2x immediate rest length.
    r = constants.IMMEDIATE_NEIGHBOR_DIST
    pos = jnp.array([[0.0, 0.0], [2 * r, 0.0]], jnp.float32)
    nbr = jnp.full((2, 8), -1, jnp.int32)
    nbr = nbr.at[0, 2].set(1).at[1, 0].set(0)  # right / left slots
    f = forces_ops.spring_forces(pos, nbr, REST, DEFAULT_PARAMS.k)
    # F on particle 0 = -k(|d| - r) d_hat, d = p0 - p1 = (-2r, 0), |d| = 2r
    # => F0 = -k * r * (-1, 0) = (+k*r, 0): pulled toward particle 1
    np.testing.assert_allclose(f[0, 0], DEFAULT_PARAMS.k * r, rtol=1e-4)
    np.testing.assert_allclose(f[1, 0], -DEFAULT_PARAMS.k * r, rtol=1e-4)
    np.testing.assert_allclose(f[:, 1], 0.0, atol=1e-6)


def test_spring_force_zero_at_rest():
    body = scene.mask_to_softbody(np.ones((4, 4), bool), 0, (0.0, 0.0), (0.0, 0.0))
    pos = jnp.asarray(body["pos"])
    nbr = jnp.asarray(body["neighbors"])
    f = forces_ops.spring_forces(pos, nbr, REST, DEFAULT_PARAMS.k)
    np.testing.assert_allclose(f, 0.0, atol=2e-2)  # k=15000 amplifies f32 eps


def test_collision_force_magnitude_and_direction():
    d = DEFAULT_PARAMS.collision_distance * 0.5
    pos = jnp.array([[0.0, 0.0], [d, 0.0]], jnp.float32)
    cand = jnp.array([[0, 1], [0, 1]], jnp.int32)
    valid = jnp.ones((2, 2), bool)
    nbr = jnp.full((2, 8), -1, jnp.int32)
    f = forces_ops.collision_forces(
        pos, cand, valid, nbr,
        DEFAULT_PARAMS.collision_distance,
        DEFAULT_PARAMS.collision_repulsion_coefficient,
    )
    # Constant-magnitude repulsion along +/-x (softbodyrk4.glsl:110-111)
    np.testing.assert_allclose(
        f[0], [-DEFAULT_PARAMS.collision_repulsion_coefficient, 0.0], rtol=1e-5
    )
    np.testing.assert_allclose(
        f[1], [DEFAULT_PARAMS.collision_repulsion_coefficient, 0.0], rtol=1e-5
    )


def test_bonded_neighbors_do_not_collide():
    d = DEFAULT_PARAMS.collision_distance * 0.5
    pos = jnp.array([[0.0, 0.0], [d, 0.0]], jnp.float32)
    cand = jnp.array([[0, 1], [0, 1]], jnp.int32)
    valid = jnp.ones((2, 2), bool)
    nbr = jnp.full((2, 8), -1, jnp.int32)
    nbr = nbr.at[0, 2].set(1).at[1, 0].set(0)
    f = forces_ops.collision_forces(
        pos, cand, valid, nbr,
        DEFAULT_PARAMS.collision_distance,
        DEFAULT_PARAMS.collision_repulsion_coefficient,
    )
    np.testing.assert_allclose(f, 0.0, atol=1e-7)


def test_coincident_particles_no_nan():
    pos = jnp.zeros((2, 2), jnp.float32)
    cand = jnp.array([[0, 1], [0, 1]], jnp.int32)
    valid = jnp.ones((2, 2), bool)
    nbr = jnp.full((2, 8), -1, jnp.int32)
    f = forces_ops.collision_forces(pos, cand, valid, nbr, 0.002, 100.0)
    assert np.all(np.isfinite(np.asarray(f)))
    np.testing.assert_allclose(f, 0.0, atol=1e-7)  # pos-equality exclusion


def test_grid_forces_match_dense_oracle(rng):
    # Two small discs overlapping: springs + real collisions, grid vs O(n^2).
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(4, 0, (0.0, 0.0), (0.0, 0.0)))
    sb.add(scene.disc_softbody(4, 1, (0.012, 0.007), (0.0, 0.0)))
    particles, _ = sb.build(capacity=256)
    # jitter so the two lattices interpenetrate irregularly
    jitter = (rng.uniform(-2e-4, 2e-4, particles.pos.shape)).astype(np.float32)
    pos = particles.pos + jnp.asarray(jitter) * particles.active[:, None]

    g = grid_ops.build_grid(pos, particles.active, DEFAULT_PARAMS.grid_resolution, 512)
    cand, valid = grid_ops.collision_candidates(
        g, pos, DEFAULT_PARAMS.grid_resolution, 16
    )
    assert int(grid_ops.grid_overflow(g, 16)) == 0
    f_grid = forces_ops.total_forces(
        pos, particles.neighbors, cand, valid, REST, DEFAULT_PARAMS
    )
    f_dense = forces_ops.total_forces_dense(
        pos, particles.neighbors, particles.active, REST, DEFAULT_PARAMS
    )
    act = np.asarray(particles.active)
    np.testing.assert_allclose(
        np.asarray(f_grid)[act], np.asarray(f_dense)[act], rtol=1e-4, atol=1e-3
    )
    # sanity: the scene actually has collisions, so forces are nonzero
    assert np.abs(np.asarray(f_dense)[act]).max() > 1.0
