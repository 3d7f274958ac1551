"""Unit tests for the relativity library against closed forms
(reference formulas: src/twoplusone/relativity.glsl:1-32)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spacetime_tpu import relativity as rel


def test_gamma_known_values():
    np.testing.assert_allclose(rel.gamma(jnp.float32(0.0)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(rel.gamma(jnp.float32(0.6)), 1.25, rtol=1e-6)
    np.testing.assert_allclose(rel.gamma(jnp.float32(0.8)), 5.0 / 3.0, rtol=1e-6)


def test_energy_momentum_invariant():
    # E^2 - |p|^2 c^2 = m0^2 c^4 for any velocity
    vel = jnp.array([[0.3, 0.4], [0.0, 0.0], [-0.7, 0.1]], jnp.float32)
    m0 = jnp.array([1.0, 2.0, 0.5], jnp.float32)
    e = rel.r_energy(vel, m0)
    p = rel.r_momentum(vel, m0)
    inv = e**2 - jnp.sum(p**2, axis=-1)
    np.testing.assert_allclose(inv, m0**2, rtol=1e-5)


def test_r_acc_perpendicular_and_parallel():
    # F parallel to v: a = F / (m0 gamma^3); F perpendicular: a = F / (m0 gamma)
    v = jnp.array([[0.6, 0.0]], jnp.float32)
    m0 = jnp.array([2.0], jnp.float32)
    g = 1.25
    a_par = rel.r_acc(jnp.array([[1.0, 0.0]], jnp.float32), v, m0)
    np.testing.assert_allclose(a_par[0, 0], 1.0 / (2.0 * g**3), rtol=1e-5)
    np.testing.assert_allclose(a_par[0, 1], 0.0, atol=1e-7)
    a_perp = rel.r_acc(jnp.array([[0.0, 1.0]], jnp.float32), v, m0)
    np.testing.assert_allclose(a_perp[0, 1], 1.0 / (2.0 * g), rtol=1e-5)
    np.testing.assert_allclose(a_perp[0, 0], 0.0, atol=1e-7)


def test_velocity_addition_collinear():
    # (u + v) / (1 + uv) for collinear velocities
    u = jnp.array([[0.5, 0.0]], jnp.float32)
    v = jnp.array([[0.5, 0.0]], jnp.float32)
    out = rel.velocity_addition_2d(u, v)
    np.testing.assert_allclose(out[0, 0], 0.8, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-7)


def test_velocity_addition_never_exceeds_c():
    rng = np.random.default_rng(1)
    u = rng.uniform(-0.99, 0.99, (64, 2)).astype(np.float32) * 0.7
    v = rng.uniform(-0.99, 0.99, (64, 2)).astype(np.float32) * 0.7
    out = rel.velocity_addition_2d(jnp.asarray(u), jnp.asarray(v))
    assert np.all(np.linalg.norm(out, axis=-1) < 1.0)


def test_velocity_addition_zero_frame():
    u = jnp.array([[0.3, -0.2]], jnp.float32)
    out = rel.velocity_addition_2d(u, jnp.zeros((1, 2), jnp.float32))
    np.testing.assert_allclose(out, u, atol=1e-7)


def test_velocity_addition_transverse():
    # u purely transverse to v: u' = (v, u_y/gamma) / 1 (denominator 1 since u.v=0)
    u = jnp.array([[0.0, 0.5]], jnp.float32)
    v = jnp.array([[0.6, 0.0]], jnp.float32)
    out = rel.velocity_addition_2d(u, v)
    np.testing.assert_allclose(out[0, 0], 0.6, rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.5 * 0.8, rtol=1e-6)  # 1/gamma = 0.8


def test_doppler_factor_signs():
    # Source approaching head-on at 0.6c: D = sqrt((1+b)/(1-b)) = 2
    v = jnp.array([[0.6, 0.0]], jnp.float32)
    n_to_observer = jnp.array([[1.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(rel.doppler_factor(v, n_to_observer)[0], 2.0, rtol=1e-5)
    # Receding: D = 1/2
    np.testing.assert_allclose(rel.doppler_factor(-v, n_to_observer)[0], 0.5, rtol=1e-5)
    # Transverse: D = 1/gamma (transverse redshift)
    n_perp = jnp.array([[0.0, 1.0]], jnp.float32)
    np.testing.assert_allclose(rel.doppler_factor(v, n_perp)[0], 0.8, rtol=1e-5)


def test_aberration_forward_concentration():
    # A camera moving +x sees directions concentrated toward +x (headlight
    # effect inverse); ground-frame mapping of a transverse camera ray tilts
    # toward the motion.
    d = jnp.array([[0.0, 1.0]], jnp.float32)
    out = rel.aberrate_direction(d, jnp.array([[0.6, 0.0]], jnp.float32))
    assert out[0, 0] > 0.0
    np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1), 1.0, rtol=1e-6)


def test_camera_doppler_composition():
    # Camera co-moving with the source sees no shift: D_src * D_cam == 1 when
    # cam_vel == source_vel (light along any n).
    v = jnp.array([[0.5, 0.2]], jnp.float32)
    n = jnp.array([[0.8, 0.6]], jnp.float32)
    d_src = rel.doppler_factor(v, n)
    d_cam = rel.camera_doppler_factor(v, n)
    np.testing.assert_allclose(d_src * d_cam, 1.0, rtol=1e-5)
