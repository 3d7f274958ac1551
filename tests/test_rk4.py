"""Integrator tests: reference dataflow, invariants, bond breaking
(reference: src/twoplusone/softbody/softbodyrk4.glsl:155-255)."""

import jax
import jax.numpy as jnp
import numpy as np

from spacetime_tpu import constants, scene
from spacetime_tpu.constants import DEFAULT_PARAMS, PhysicsParams
from spacetime_tpu.models.softbody import SoftbodyModel
from spacetime_tpu.ops import rk4 as rk4_ops
from spacetime_tpu.state import pack_particles


def _free_particle(vel):
    return pack_particles(
        pos=np.zeros((1, 2), np.float32),
        vel=np.array([vel], np.float32),
        neighbors=np.full((1, 8), -1, np.int32),
        object_index=np.zeros(1, np.int32),
        capacity=256,
    )


def test_free_particle_drifts_inertially():
    p = _free_particle((0.3, -0.2))
    model = SoftbodyModel(capacity=256)
    p2, aux = model.step(p)
    np.testing.assert_allclose(
        np.asarray(p2.pos[0]), [0.3 * DEFAULT_PARAMS.h, -0.2 * DEFAULT_PARAMS.h], rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(p2.vel[0]), [0.3, -0.2], rtol=1e-6)
    assert int(aux.bonds_broken) == 0


def test_speed_never_exceeds_c():
    # Slam two tiny blobs together near c; after many steps all speeds < c
    # (clamp at softbodyrk4.glsl:227).
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(2, 0, (0.0, 0.0), (0.9, 0.0)))
    sb.add(scene.disc_softbody(2, 1, (0.03, 0.0), (-0.9, 0.0)))
    particles, _ = sb.build(capacity=256)
    model = SoftbodyModel(capacity=256)
    p = particles
    for _ in range(30):
        p, _aux = model.step(p)
    speed = np.linalg.norm(np.asarray(p.vel), axis=-1)
    act = np.asarray(p.active)
    assert np.all(speed[act] < 1.0)
    assert np.all(np.isfinite(np.asarray(p.pos)[act]))


def test_rk4_stage_dataflow_matches_manual():
    """Pin the nonstandard reference dataflow (accelerations from ORIGINAL
    velocity; facc = f0+2f1+2f2+f3; pos = pos0 + vel_new*h) against a
    hand-rolled evaluation on a 2-particle spring."""
    r = constants.IMMEDIATE_NEIGHBOR_DIST
    pos = np.array([[0.0, 0.0], [1.8 * r, 0.0]], np.float32)
    nbr = np.full((2, 8), -1, np.int32)
    nbr[0, 2], nbr[1, 0] = 1, 0
    p = pack_particles(pos, np.zeros((2, 2), np.float32), nbr, np.zeros(2, np.int32), capacity=256)
    params = DEFAULT_PARAMS
    rest = jnp.asarray(params.rest_lengths())

    # manual, dense numpy
    def forces(x):
        d = x[0] - x[1]
        dist = np.linalg.norm(d)
        f0 = -params.k * (dist - r) * d / dist
        return np.stack([f0, -f0])

    def racc(f, v, m=1.0):
        g = 1.0 / np.sqrt(1.0 - np.sum(v * v, -1, keepdims=True))
        return (f - np.sum(v * f, -1, keepdims=True) * v) / (m * g)

    h = params.h
    x0, v0 = pos.astype(np.float64), np.zeros((2, 2))
    f0 = forces(x0)
    v1 = v0 + racc(f0, v0) * h / 2
    x1 = x0 + v1 * h / 2
    f1 = forces(x1)
    v2 = v0 + racc(f1, v0) * h / 2
    x2 = x0 + v2 * h / 2
    f2 = forces(x2)
    v3 = v0 + racc(f2, v0) * h
    x3 = x0 + v3 * h
    f3 = forces(x3)
    facc = f0 + 2 * f1 + 2 * f2 + f3
    vel = v0 + racc(facc, v0) * h / 6
    want_pos = x0 + vel * h

    model = SoftbodyModel(capacity=256)
    p2, _ = model.step(p)
    np.testing.assert_allclose(np.asarray(p2.vel[:2]), vel, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p2.pos[:2]), want_pos, rtol=2e-4, atol=1e-9)


def test_bond_breaking_symmetric_and_thresholded():
    r = constants.IMMEDIATE_NEIGHBOR_DIST
    # stretch one bond past the 0.01 threshold, keep another at rest
    pos = np.array([[0.0, 0.0], [0.011, 0.0], [0.0, r]], np.float32)
    nbr = np.full((3, 8), -1, np.int32)
    nbr[0, 2], nbr[1, 0] = 1, 0  # will break
    nbr[0, 3], nbr[2, 1] = 2, 0  # stays
    new_nbr, n_broken = rk4_ops.break_bonds(
        jnp.asarray(pos), jnp.asarray(nbr), DEFAULT_PARAMS.bond_break_threshold
    )
    new_nbr = np.asarray(new_nbr)
    assert new_nbr[0, 2] == -1 and new_nbr[1, 0] == -1
    assert new_nbr[0, 3] == 2 and new_nbr[2, 1] == 0
    assert int(n_broken) == 2


def test_momentum_conserved_without_clamp():
    """Internal forces are equal-opposite, but the reference integrator is
    only momentum-conserving to integration order — check drift is tiny over
    100 steps of a free oscillating blob."""
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(3, 0, (0.0, 0.0), (0.05, 0.02)))
    particles, _ = sb.build(capacity=256)
    model = SoftbodyModel(capacity=256)
    p = particles

    def momentum(p):
        g = 1.0 / np.sqrt(1.0 - np.sum(np.asarray(p.vel) ** 2, -1))
        act = np.asarray(p.active)
        return ((g * np.asarray(p.rest_mass))[:, None] * np.asarray(p.vel))[act].sum(0)

    m0 = momentum(p)
    for _ in range(100):
        p, _aux = model.step(p)
    m1 = momentum(p)
    np.testing.assert_allclose(m1, m0, rtol=1e-3, atol=1e-5)


def test_euler_step_reference_semantics():
    # Euler advances position with the OLD velocity (softbodyrk4.glsl:162).
    p = _free_particle((0.5, 0.0))
    model = SoftbodyModel(capacity=256, integrator="euler")
    p2, _ = model.step(p)
    np.testing.assert_allclose(np.asarray(p2.pos[0, 0]), 0.5 * DEFAULT_PARAMS.h, rtol=1e-6)


def test_step_n_matches_repeated_step():
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(3, 0, (0.0, 0.0), (0.1, 0.0)))
    particles, _ = sb.build(capacity=256)
    model = SoftbodyModel(capacity=256)
    a = particles
    for _ in range(5):
        a, _aux = model.step(a)
    b, _aux = model.step_n(particles, 5)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), rtol=1e-6)


def test_inactive_padding_is_frozen():
    p = _free_particle((0.3, 0.0))
    model = SoftbodyModel(capacity=256)
    p2, _ = model.step(p)
    np.testing.assert_array_equal(np.asarray(p2.pos[1:]), np.asarray(p.pos[1:]))
    np.testing.assert_array_equal(np.asarray(p2.vel[1:]), np.asarray(p.vel[1:]))


def test_diagnostics_totals():
    from spacetime_tpu.utils import diagnostics

    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(3, 0, (0.0, 0.0), (0.6, 0.0)))
    particles, _ = sb.build(capacity=256)
    t = diagnostics.totals(particles)
    n = int(np.asarray(particles.num_active()))
    g = 1.25  # gamma(0.6)
    np.testing.assert_allclose(float(t.rest_mass), n, rtol=1e-6)
    np.testing.assert_allclose(float(t.energy), n * g, rtol=1e-5)
    np.testing.assert_allclose(float(t.kinetic), n * (g - 1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t.momentum), [n * g * 0.6, 0.0], rtol=1e-5)
    np.testing.assert_allclose(float(t.max_speed), 0.6, rtol=1e-6)
    assert int(t.n_bonds) > 0
