"""Worldline ring buffer tests (reference semantics:
src/twoplusone/object_archive.txt:108-178 — wrap, ramp-up)."""

import jax.numpy as jnp
import numpy as np

from spacetime_tpu.ops import worldline as wl
from spacetime_tpu.state import pack_particles


def _particles(x):
    return pack_particles(
        pos=np.array([[x, 0.0]], np.float32),
        vel=np.array([[0.1, 0.0]], np.float32),
        neighbors=np.full((1, 8), -1, np.int32),
        object_index=np.zeros(1, np.int32),
        capacity=8,
    )


def test_mirror_consistency():
    buf = wl.create(capacity=4, num_particles=8)
    for i in range(6):
        buf = wl.push_frame(buf, _particles(float(i)), time=i * 0.005)
    px = np.asarray(buf.pos_x)
    np.testing.assert_array_equal(px[:4], px[4:])


def test_push_and_wrap():
    buf = wl.create(capacity=4, num_particles=8)
    for i in range(6):
        buf = wl.push_frame(buf, _particles(float(i)), time=i * 0.005)
    assert int(buf.frames_in_use) == 4
    # newest is x=5; ring holds ticks 2..5
    assert float(buf.pos_x[buf.cursor, 0]) == 5.0
    ages = [float(buf.pos_x[wl.slot_of_age(buf, a), 0]) for a in range(4)]
    assert ages == [5.0, 4.0, 3.0, 2.0]
    times = [float(buf.times[wl.slot_of_age(buf, a)]) for a in range(4)]
    np.testing.assert_allclose(times, [0.025, 0.020, 0.015, 0.010], rtol=1e-5)


def test_ramp_up_times_invalid():
    buf = wl.create(capacity=4, num_particles=8)
    buf = wl.push_frame(buf, _particles(1.0), time=0.0)
    assert int(buf.frames_in_use) == 1
    finite = np.isfinite(np.asarray(buf.times))
    assert finite.sum() == 1


def test_inactive_particles_parked():
    buf = wl.create(capacity=4, num_particles=8)
    buf = wl.push_frame(buf, _particles(1.0), time=0.0)
    assert np.all(np.asarray(buf.pos_x[buf.cursor, 1:]) >= 1e8)


def test_boundary_mask():
    from spacetime_tpu import scene

    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(5, 0, (0.0, 0.0), (0.0, 0.0)))
    particles, _ = sb.build(capacity=256)
    mask = np.asarray(wl.boundary_mask(particles))
    act = np.asarray(particles.active)
    n_boundary = mask.sum()
    n_total = act.sum()
    # a disc's boundary is O(circumference): well under half the area,
    # and interior particles (all 8 bonds) are excluded
    assert 0 < n_boundary < n_total * 0.75
    nbr = np.asarray(particles.neighbors)
    assert np.all(np.any(nbr[mask] < 0, axis=-1))
    interior = act & ~mask
    assert np.all(np.all(nbr[interior] >= 0, axis=-1))
