"""Worldline history ring buffer in HBM.

The reference's (archived) design keeps per-frame geometry slices in GPU ring
buffers with `frames_stored` slots, `frames_in_use` ramp-up and a wrapping
`current_frame` cursor, re-uploading one slice per frame
(reference: src/twoplusone/object_archive.txt:108-171).  Its live WIP shader
was meant to extrude softbody boundaries into an (x, y, t) triangle mesh for
a hardware raytracer (reference: src/twoplusone/worldline/mod.rs:37-44,
raytrace.glsl) but never writes output
(worldline_updatesoftbodies.glsl:37-81).

TPU-native redesign: no mesh at all.  Each stored tick keeps every particle's
(pos, vel); between consecutive ticks a particle's worldline is a linear
segment in (x, y, t), and a softbody is rendered as the union of
radius-``rho`` capsules swept along those segments.  This is *exact* for the
union-of-discs geometry, sidesteps the boundary-meshing problem the reference
author got stuck on (OLD_worldline_updatesoftbodies.glsl:119-123 "god how am
I supposed to make this work"), and preserves per-particle velocity for
Doppler shading at the retarded event.

Layout note: components are stored as SEPARATE (T, N) planes, not (T, N, 2).
TPU tiles the two minor dims as (8 sublanes, 128 lanes); a trailing dim of 2
would pad to 128 lanes and inflate the buffer (and everything broadcast from
it) by 64x in HBM — measured, not theoretical: the first 1080p run OOM'd at
a 68 GB "f32[...,2]{1,0:T(8,128)}" allocation.

The buffer is a fixed-shape pytree updated with one `dynamic_update_slice`
per step — `add_frame` without the staging copy.  Slot arithmetic is
modular; `times[slot]` gives each slot's coordinate time, so no roll/reorder
is ever materialized.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..state import Particles


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WorldlineBuffer:
    pos_x: jax.Array  # (T, N) f32
    pos_y: jax.Array  # (T, N) f32
    vel_x: jax.Array  # (T, N) f32
    vel_y: jax.Array  # (T, N) f32
    times: jax.Array  # (T,) f32 — coordinate time of each slot (-inf = unused)
    cursor: jax.Array  # () i32 — slot that holds the newest tick
    frames_in_use: jax.Array  # () i32 — ramp-up counter (object_archive.txt:150)

    @property
    def capacity(self) -> int:
        return self.pos_x.shape[0]

    @property
    def num_particles(self) -> int:
        return self.pos_x.shape[1]


def create(capacity: int, num_particles: int) -> WorldlineBuffer:
    """Empty history. `capacity` is the `frames_stored` analog
    (object_archive.txt:118); it bounds how far into the past rays can see:
    max view radius = capacity * h lightseconds."""
    plane = lambda fill: jnp.full((capacity, num_particles), fill, jnp.float32)
    return WorldlineBuffer(
        pos_x=plane(1e9),
        pos_y=plane(1e9),
        vel_x=plane(0.0),
        vel_y=plane(0.0),
        times=jnp.full((capacity,), -jnp.inf, jnp.float32),
        cursor=jnp.int32(capacity - 1),
        frames_in_use=jnp.int32(0),
    )


@jax.jit
def push_raw(buf: WorldlineBuffer, pos, vel, present, time) -> WorldlineBuffer:
    """Store one tick of (pos (N,2), vel (N,2)) with an explicit presence mask
    (the `add_frame` analog, object_archive.txt:173-178: cursor advances with
    wraparound, in-use count saturates at capacity).  Slots not `present` are
    parked far away so the renderer never sees them."""
    t_cap = buf.capacity
    cursor = (buf.cursor + 1) % t_cap

    def upd(plane, vals):
        return jax.lax.dynamic_update_slice(plane, vals[None], (cursor, 0))

    px = jnp.where(present, pos[:, 0], 1e9)
    py = jnp.where(present, pos[:, 1], 1e9)
    return WorldlineBuffer(
        pos_x=upd(buf.pos_x, px),
        pos_y=upd(buf.pos_y, py),
        vel_x=upd(buf.vel_x, vel[:, 0]),
        vel_y=upd(buf.vel_y, vel[:, 1]),
        times=buf.times.at[cursor].set(jnp.float32(time)),
        cursor=cursor,
        frames_in_use=jnp.minimum(buf.frames_in_use + 1, t_cap),
    )


def push_frame(
    buf: WorldlineBuffer, particles: Particles, time, present=None
) -> WorldlineBuffer:
    """Store the current physics tick.  `present` defaults to the physics
    active mask; engines with aloofbodies pass active | aloof."""
    if present is None:
        present = particles.active
    return push_raw(buf, particles.pos, particles.vel, present, time)


@jax.jit
def prefill_inertial(
    buf: WorldlineBuffer, pos, vel, present, t0, dt
) -> WorldlineBuffer:
    """Warm-start: fill the whole ring assuming bodies were INERTIAL before
    t0 (pos(t) = pos0 + vel*(t - t0)).  Without this a fresh engine renders
    pure background until the camera's past light cone fills with stored
    ticks — physically correct but useless for a cold start."""
    t_cap = buf.capacity
    # slot k holds time t0 - (t_cap - 1 - k) * dt; cursor = t_cap - 1
    rel_t = (jnp.arange(t_cap, dtype=jnp.float32) - (t_cap - 1)) * dt  # <= 0

    def fill(p, v):
        out = p[None, :] + v[None, :] * rel_t[:, None]
        return jnp.where(present[None, :], out, 1e9)

    return WorldlineBuffer(
        pos_x=fill(pos[:, 0], vel[:, 0]),
        pos_y=fill(pos[:, 1], vel[:, 1]),
        vel_x=jnp.broadcast_to(vel[:, 0][None], (t_cap, pos.shape[0])),
        vel_y=jnp.broadcast_to(vel[:, 1][None], (t_cap, pos.shape[0])),
        times=t0 + rel_t,
        cursor=jnp.int32(t_cap - 1),
        frames_in_use=jnp.int32(t_cap),
    )


def slot_of_age(buf: WorldlineBuffer, age: jax.Array) -> jax.Array:
    """Slot index holding the tick `age` steps before the newest (age 0 =
    newest). Valid while age < frames_in_use."""
    t_cap = buf.capacity
    return (buf.cursor - age) % t_cap


def boundary_mask(particles: Particles) -> jax.Array:
    """(N,) bool: particles on the softbody surface.

    The reference's WIP shaders identify boundary geometry by probing the
    collision grid for same-object occupancy around each particle
    (worldline_updatesoftbodies.glsl:55-77, OLD_...glsl:135-153).  The bond
    table already encodes exactly that neighborhood: a particle with any
    missing bond slot is on the surface (or next to a tear).  O(N) and exact
    on the import lattice.
    """
    return particles.active & jnp.any(particles.neighbors < 0, axis=-1)
