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

The buffer is a fixed-shape (T, N, ...) pytree updated with one
`dynamic_update_slice` per step — `add_frame` without the staging copy.
Slot arithmetic is modular; `times[slot]` gives each slot's coordinate time,
so no roll/reorder is ever materialized.
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
    pos: jax.Array  # (T, N, 2) f32
    vel: jax.Array  # (T, N, 2) f32
    times: jax.Array  # (T,) f32 — coordinate time of each slot (-inf = unused)
    cursor: jax.Array  # () i32 — slot that holds the newest tick
    frames_in_use: jax.Array  # () i32 — ramp-up counter (object_archive.txt:150)

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def num_particles(self) -> int:
        return self.pos.shape[1]


def create(capacity: int, num_particles: int) -> WorldlineBuffer:
    """Empty history. `capacity` is the `frames_stored` analog
    (object_archive.txt:118); it bounds how far into the past rays can see:
    max view radius = capacity * h lightseconds."""
    return WorldlineBuffer(
        pos=jnp.full((capacity, num_particles, 2), 1e9, jnp.float32),
        vel=jnp.zeros((capacity, num_particles, 2), jnp.float32),
        times=jnp.full((capacity,), -jnp.inf, jnp.float32),
        cursor=jnp.int32(capacity - 1),
        frames_in_use=jnp.int32(0),
    )


@jax.jit
def push_raw(buf: WorldlineBuffer, pos, vel, present, time) -> WorldlineBuffer:
    """Store one tick of (pos, vel) with an explicit presence mask (the
    `add_frame` analog, object_archive.txt:173-178: cursor advances with
    wraparound, in-use count saturates at capacity).  Slots not `present`
    are parked far away so the renderer never sees them."""
    t_cap = buf.capacity
    cursor = (buf.cursor + 1) % t_cap
    pos = jnp.where(present[:, None], pos, 1e9)
    return WorldlineBuffer(
        pos=jax.lax.dynamic_update_slice(buf.pos, pos[None], (cursor, 0, 0)),
        vel=jax.lax.dynamic_update_slice(buf.vel, vel[None], (cursor, 0, 0)),
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
    pos_k = pos[None] + vel[None] * rel_t[:, None, None]
    pos_k = jnp.where(present[None, :, None], pos_k, 1e9)
    return WorldlineBuffer(
        pos=pos_k,
        vel=jnp.broadcast_to(vel[None], (t_cap,) + vel.shape),
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
