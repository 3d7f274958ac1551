"""Special-relativity math (c = 1 units), vectorized over trailing axes.

Covers the reference's device-side relativity library
(reference: src/twoplusone/relativity.glsl:1-32) plus the 2D velocity
addition the reference archived host-side
(reference: src/twoplusone/utils.rs:24-45, src/twoplusone/object_archive.txt:53-73),
and the Doppler/aberration formulas needed by the retarded-time renderer
(design intent: reference src/twoplusone/worldline/raytrace.glsl).

All functions take `(..., 2)` velocity/position arrays and broadcast.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import C2

_EPS = 1e-12


def gamma(speed):
    """Lorentz factor from |v| (scalar speed).

    reference: src/twoplusone/relativity.glsl:5-7
    """
    return jnp.asarray(1.0, speed.dtype if hasattr(speed, "dtype") else jnp.float32) / jnp.sqrt(
        1.0 - speed * speed / C2
    )


def gamma_v(vel):
    """Lorentz factor from a velocity vector `(..., 2)`."""
    return gamma(jnp.linalg.norm(vel, axis=-1))


def r_mass(vel, rest_mass):
    """Relativistic mass m = gamma * m0.  reference: relativity.glsl:10-12"""
    return gamma_v(vel) * rest_mass


def r_momentum(vel, rest_mass):
    """Relativistic momentum p = m v.  reference: relativity.glsl:15-17"""
    return r_mass(vel, rest_mass)[..., None] * vel


def r_energy(vel, rest_mass):
    """Relativistic energy E = m c^2.  reference: relativity.glsl:20-22"""
    return r_mass(vel, rest_mass) * C2


def r_ke(vel, rest_mass):
    """Relativistic kinetic energy E - m0 c^2.  reference: relativity.glsl:25-27"""
    return r_energy(vel, rest_mass) - rest_mass * C2


def r_acc(force, vel, rest_mass):
    """Acceleration of a particle under 3-force `force` at velocity `vel`.

    a = (F - (v.F) v / c^2) / (m0 * gamma)
    reference: src/twoplusone/relativity.glsl:30-32
    (https://en.wikipedia.org/wiki/Relativistic_mechanics#Force)
    """
    vdotf = jnp.sum(vel * force, axis=-1, keepdims=True)
    g = gamma_v(vel)[..., None]
    return (force - vdotf * vel / C2) / (rest_mass[..., None] * g)


def velocity_addition_2d(u, v):
    """Relativistic composition of 2D velocities: the velocity of a particle
    moving at `u` in a frame that itself moves at `v` (both in the final
    frame's coordinates).

    Decomposes `u` into components parallel/perpendicular to `v` and applies
    the longitudinal/transverse addition formulas — equivalent to the
    reference's rotate -> compose -> rotate-back construction
    (reference: src/twoplusone/utils.rs:24-45), but branch-free.

    https://en.wikipedia.org/wiki/Velocity-addition_formula#General_configuration
    """
    v_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    safe_v_sq = jnp.maximum(v_sq, _EPS)
    u_par = (jnp.sum(u * v, axis=-1, keepdims=True) / safe_v_sq) * v
    u_perp = u - u_par
    g = gamma(jnp.sqrt(v_sq[..., 0]))[..., None]
    denom = 1.0 + jnp.sum(u * v, axis=-1, keepdims=True) / C2
    out = (u_par + v + u_perp / g) / denom
    # v == 0: composition is identity.
    return jnp.where(v_sq > _EPS, out, u)


def doppler_factor(source_vel, n_hat):
    """Observed/emitted frequency ratio for light emitted by a source moving
    at `source_vel`, propagating in direction `n_hat` (unit vector pointing
    from the source toward the observer), observer at rest in this frame.

    D = 1 / (gamma * (1 - beta . n_hat))

    D > 1 is blueshift (source approaching).  Used for the renderer's
    Doppler/beaming shading (north star in BASELINE.json; the reference's
    raytracer was an empty stub — reference: worldline/raytrace.glsl:11-21).
    """
    g = gamma_v(source_vel)
    beta_n = jnp.sum(source_vel * n_hat, axis=-1)
    return 1.0 / (g * (1.0 - beta_n / C2))


def aberrate_direction(d_hat, cam_vel):
    """Map a unit ray direction measured in the camera's rest frame into the
    ground frame, for a camera moving at `cam_vel` in the ground frame.

    This is relativistic aberration: the photon's velocity (c * d_hat in the
    camera frame) composed with the camera velocity.  Since photons travel at
    c this is exactly `velocity_addition_2d(c*d_hat, cam_vel)` normalized.
    """
    d = velocity_addition_2d(d_hat * 1.0, cam_vel)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), _EPS)


def camera_doppler_factor(cam_vel, n_hat):
    """Extra Doppler factor from a *moving observer*: ratio of frequency seen
    by a camera moving at `cam_vel` to that seen by a ground-frame observer,
    for light arriving along `n_hat` (unit, pointing source -> observer).

    D_cam = gamma_cam * (1 - beta_cam . n_hat)
    """
    g = gamma_v(cam_vel)
    beta_n = jnp.sum(cam_vel * n_hat, axis=-1)
    return g * (1.0 - beta_n / C2)
