"""Sharded step/render: multi-chip execution of the full frame.

GSPMD sharding layout (see parallel/__init__ for the mapping rationale):
  * Particles pytree: every (N, ...) array sharded on the capacity axis.
    Forces/integration are row-parallel; the collision-grid sort and the
    neighbor/candidate gathers become XLA collectives over ICI.
  * Worldline ring buffer: sharded on the HISTORY axis T (the engine's
    sequence dimension).  The per-tick `push_frame` update touches one slot;
    the annulus mask and pair compaction run tick-parallel.
  * Image: sharded on pixel rows (pure data parallel).

The entry points return jitted functions with in/out shardings bound, so the
driver can run one training-step-equivalent (step + worldline push + render)
over an N-device mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import Camera
from ..models.softbody import SoftbodyModel
from ..ops import raytrace
from ..ops import worldline as wl
from ..state import Objects, Particles


def particle_sharding(mesh: Mesh, axis: str = "d"):
    """Shardings for the Particles pytree: shard the capacity axis."""
    row = NamedSharding(mesh, P(axis))
    return Particles(
        pos=row, vel=row, rest_mass=row, neighbors=row,
        object_index=row, particle_id=row, active=row,
    )


def worldline_sharding(mesh: Mesh, axis: str = "d"):
    """Shardings for the ring buffer: shard the history (T) axis."""
    t_row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return wl.WorldlineBuffer(
        pos_x=t_row, pos_y=t_row, vel_x=t_row, vel_y=t_row,
        times=t_row, cursor=rep, frames_in_use=rep,
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_state(particles: Particles, buf: wl.WorldlineBuffer, mesh: Mesh, axis="d"):
    """Place existing host/device state onto the mesh."""
    p = jax.device_put(particles, particle_sharding(mesh, axis))
    b = jax.device_put(buf, worldline_sharding(mesh, axis))
    return p, b


def make_sharded_frame(
    model: SoftbodyModel,
    objects: Objects,
    render_params: raytrace.RenderParams,
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "d",
):
    """One fused frame — physics step + worldline push + retarded render —
    jitted over the mesh with dp (pixels) x "tp" (particles) x sp (history)
    shardings.  Returns fn(particles, buf, cam, time) -> (particles, buf, img).
    """
    p_shard = particle_sharding(mesh, axis)
    b_shard = worldline_sharding(mesh, axis)
    rep = replicated(mesh)
    img_shard = NamedSharding(mesh, P(axis))  # rows of the image

    def frame(particles: Particles, buf: wl.WorldlineBuffer, cam: Camera, t):
        particles, aux = model.step(particles)
        buf = wl.push_frame(buf, particles, t)
        img = raytrace.render_retarded(
            buf, particles.object_index, objects, cam,
            width, height, render_params,
        )
        return particles, buf, img

    cam_shard = Camera(pos=rep, zoom=rep, vel=rep)
    return jax.jit(
        frame,
        in_shardings=(p_shard, b_shard, cam_shard, rep),
        out_shardings=(p_shard, b_shard, img_shard),
    )


def make_sharded_step(model: SoftbodyModel, mesh: Mesh, axis: str = "d"):
    """Physics-only sharded step (no renderer), for scaling the simulation."""
    p_shard = particle_sharding(mesh, axis)

    def step(particles: Particles):
        new, aux = model.step(particles)
        return new

    return jax.jit(step, in_shardings=(p_shard,), out_shardings=p_shard)
