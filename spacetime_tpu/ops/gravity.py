"""Matter-sourced geometry: conical defects that follow the simulated matter.

The curved-spacetime renderer (ops/curved.py) takes defects as EXTERNAL
geometry — positions/deficits prescribed by config.  This module closes the
loop: a defect can instead be SOURCED by a softbody object, so the lensing
mass sits at (and moves with) the matter's relativistic-energy centroid —
self-consistent gravity in the quasi-static approximation.

Physics.  In 2+1D GR a stationary point mass M produces a cone with deficit
angle 8*pi*G*M, and the source strength is the ENERGY (a moving mass lenses
by its total energy, not its rest mass) — so:

  * position  = energy-weighted centroid sum(m0*gamma*x)/sum(m0*gamma) of
    the object's active particles (the relativistic center of energy);
  * deficit   = 8*pi*G * sum(m0*gamma) when derived via `defect_G`
    (or a fixed per-object deficit when the config provides one).

Retardation.  Quasi-static sourcing places the defect at its CURRENT
centroid — geometry changes reach the camera instantly.  With
config.defect_retarded the defect is instead placed on the camera's past
light cone, read from the worldline ring: `retarded_com` sweeps the per-age
centroid track com(a) for the unique crossing of f(a) = |com(a) - cam| -
a*dt (monotone because the centroid of subluminal matter is subluminal) and
interpolates linearly between the straddling ticks — the Lienard-Wiechert
construction with the actual simulated trajectory instead of the
closed-form linear motion engine._defects uses for prescribed defects.

Approximation envelope (matching ops/curved.py's documented choices): the
object's extended mass distribution is collapsed to its centroid (monopole;
valid when the lensed matter is well separated from the source object), the
physics itself still runs in the flat chart, and the geometry's own change
propagates either instantly (quasi-static) or at c via the centroid track
(retarded) — there is no gravitational radiation in 2+1D to lose (the
theory has no local degrees of freedom; exterior geometry is locked to the
instantaneous mass/energy through the junction conditions).

The reference has no curved spacetime at all (its raytracer is an empty
stub, raytrace.glsl:11-21); this extends the rebuild's own curved axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import relativity
from ..state import Particles
from .worldline import WorldlineBuffer

EIGHT_PI = 8.0 * jnp.pi


def object_energy_com(particles: Particles, obj: int):
    """Energy-weighted centroid of one object's active particles.

    Returns (cx, cy, energy): the relativistic center of energy and the
    total energy sum(m0 * gamma) (c = 1) — the conical source strength.
    """
    mask = particles.active & (particles.object_index == obj)
    g = relativity.gamma_v(particles.vel)
    w = jnp.where(mask, particles.rest_mass * g, 0.0)
    tot = jnp.maximum(jnp.sum(w), 1e-20)
    cx = jnp.sum(w * particles.pos[:, 0]) / tot
    cy = jnp.sum(w * particles.pos[:, 1]) / tot
    return cx, cy, jnp.sum(w)


def com_history(
    buf: WorldlineBuffer,
    object_index: jax.Array,
    rest_mass: jax.Array,
    active: jax.Array,
    obj: int,
    max_age: int = 0,
):
    """Per-age energy centroid track of one object from the ring planes.

    Returns (com_x, com_y, energy, age) — all (A,) with age DESCENDING
    (A-1 .. 0), matching the cone sweep's slice order
    (raytrace._cone_band_window).  One streaming pass over the swept
    (A, N) plane slices; weights use the PER-AGE velocities (gamma at
    emission), so a blob that was faster in the past sources more strongly
    on the older part of the track.
    """
    t_cap = buf.capacity
    n = buf.num_particles
    a_sw = t_cap if max_age <= 0 else min(max_age, t_cap)
    col0 = buf.cursor + 1 + (t_cap - a_sw)
    sx = jax.lax.dynamic_slice(buf.pos_x, (col0, 0), (a_sw, n))
    sy = jax.lax.dynamic_slice(buf.pos_y, (col0, 0), (a_sw, n))
    svx = jax.lax.dynamic_slice(buf.vel_x, (col0, 0), (a_sw, n))
    svy = jax.lax.dynamic_slice(buf.vel_y, (col0, 0), (a_sw, n))
    mask = active & (object_index == obj)
    v2 = jnp.minimum(svx * svx + svy * svy, 1.0 - 1e-7)
    g = 1.0 / jnp.sqrt(1.0 - v2)
    w = jnp.where(mask[None, :], rest_mass[None, :] * g, 0.0)  # (A, N)
    tot = jnp.sum(w, axis=1)
    den = jnp.maximum(tot, 1e-20)
    com_x = jnp.sum(w * sx, axis=1) / den
    com_y = jnp.sum(w * sy, axis=1) / den
    age = jnp.arange(a_sw - 1, -1, -1, dtype=jnp.int32)
    return com_x, com_y, tot, age


def retarded_com(
    buf: WorldlineBuffer,
    object_index: jax.Array,
    rest_mass: jax.Array,
    active: jax.Array,
    obj: int,
    cam_x,
    cam_y,
    dt: float,
    max_age: int = 0,
):
    """Defect source on the camera's past light cone, from the ring.

    Solves |com(a) - cam| = a*dt on the centroid track: f(a) =
    |com(a) - cam| - a*dt is strictly decreasing in age a (the centroid
    moves below c while the cone radius grows at exactly c), so the crossing
    is unique; linear interpolation between the straddling ticks gives
    sub-tick placement.  Returns (cx, cy, energy) at the retarded time.

    When the history is shorter than the crossing age (camera too far for
    the stored track), the oldest usable tick is returned — the same
    graceful degradation the renderer's max_age bound applies to matter.
    """
    com_x, com_y, tot, age = com_history(
        buf, object_index, rest_mass, active, obj, max_age
    )
    a_sw = age.shape[0]
    hi0 = jnp.minimum(buf.frames_in_use - 1, a_sw - 1)
    dx = com_x - cam_x
    dy = com_y - cam_y
    f = jnp.sqrt(dx * dx + dy * dy) - age.astype(jnp.float32) * dt
    usable = age <= hi0
    # smallest age with f <= 0 (rows are age-descending so use a masked min)
    crossed = (f <= 0.0) & usable
    a_star = jnp.min(jnp.where(crossed, age, hi0))  # clamp: oldest usable
    # straddling ticks: row i holds age a_sw-1-i, so a_star sits at row r1
    # and its YOUNGER neighbor a_star-1 (where f > 0) at row r1 + 1
    r1 = a_sw - 1 - a_star
    r0 = jnp.clip(r1 + 1, 0, a_sw - 1)
    f1 = f[r1]
    f0 = f[r0]  # age a_star - 1 (f > 0) unless clamped
    denom = f0 - f1
    frac = jnp.where(jnp.abs(denom) > 1e-12, f0 / denom, 0.0)
    frac = jnp.clip(frac, 0.0, 1.0)  # 0 -> younger tick, 1 -> a_star
    lerp = lambda arr: arr[r0] + (arr[r1] - arr[r0]) * frac
    no_cross = ~jnp.any(crossed)
    pick_oldest = lambda arr: arr[a_sw - 1 - hi0]
    cx = jnp.where(no_cross, pick_oldest(com_x), lerp(com_x))
    cy = jnp.where(no_cross, pick_oldest(com_y), lerp(com_y))
    en = jnp.where(no_cross, pick_oldest(tot), lerp(tot))
    return cx, cy, en


def source_defects(
    specs,
    particles: Particles,
    buf: WorldlineBuffer | None,
    cam,
    dt: float,
    g_coupling: float,
    retarded: bool,
    max_age: int = 0,
):
    """Build the ConicalDefect tuple for matter-sourced specs.

    `specs` is config.defect_source: a tuple of (object_index, deficit)
    pairs; deficit None derives 8*pi*G*energy via `g_coupling`.  With
    `retarded` (and a ring), each defect sits at its retarded centroid.
    All quantities are traced — the fused frame recomputes them in-graph
    every frame.
    """
    from . import curved

    out = []
    for spec in specs:
        obj, deficit = spec
        if retarded and buf is not None:
            cx, cy, en = retarded_com(
                buf, particles.object_index, particles.rest_mass,
                particles.active, int(obj), cam.pos[0], cam.pos[1], dt,
                max_age,
            )
        else:
            cx, cy, en = object_energy_com(particles, int(obj))
        d = EIGHT_PI * g_coupling * en if deficit is None else deficit
        out.append(
            curved.ConicalDefect(
                center=jnp.stack([cx, cy]).astype(jnp.float32),
                deficit=jnp.asarray(d, jnp.float32),
            )
        )
    return tuple(out)
