"""Shared builder for the reference's default demo scene: testimg4 at the
origin with velocity (0.1, 0.1), testimg5 at (1.2, 0.8) with (-0.1, -0.1)
(/root/reference/src/twoplusone/mod.rs:86-113), loaded through the PNG import
path.  Falls back to procedural discs of the same particle count when the
reference images are not mounted.  Used by tools/bench_116k.py and the trace
tools so benches and profiles run the SAME workload."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spacetime_tpu import scene  # noqa: E402
from spacetime_tpu.camera import Camera  # noqa: E402
from spacetime_tpu.models.softbody import SoftbodyModel  # noqa: E402
from spacetime_tpu.ops import forces as forces_ops  # noqa: E402
from spacetime_tpu.ops import raytrace  # noqa: E402
from spacetime_tpu.ops import worldline as wl  # noqa: E402

REF_IMAGES = "/root/reference/softbodyimages"
WIDTH, HEIGHT = 1920, 1080


def build_scene():
    """The reference demo scene -> (particles, objects)."""
    sb = scene.SceneBuilder()
    if os.path.isdir(REF_IMAGES):
        sb.add(
            scene.image_to_softbody(
                f"{REF_IMAGES}/testimg4.png", 0, (0.0, 0.0), (0.1, 0.1),
                lattice_pad=True),
            base_color=(0.25, 0.35, 1.0),
        )
        sb.add(
            scene.image_to_softbody(
                f"{REF_IMAGES}/testimg5.png", 1, (1.2, 0.8), (-0.1, -0.1),
                lattice_pad=True),
            base_color=(1.0, 0.3, 0.25),
        )
    else:
        n_half = 57980  # testimg4/5 non-black pixel count
        sb.add(
            scene.disc_softbody(scene.radius_for_count(n_half), 0,
                                (0.0, 0.0), (0.1, 0.1), lattice_pad=True),
            base_color=(0.25, 0.35, 1.0),
        )
        sb.add(
            scene.disc_softbody(scene.radius_for_count(n_half), 1,
                                (1.2, 0.8), (-0.1, -0.1), lattice_pad=True),
            base_color=(1.0, 0.3, 0.25),
        )
    return sb.build()


def render_params(h):
    # band=4 covers radial speeds to ~0.4c (bodies close at 0.28c; the
    # band_truncated diag guards the assumption); splat_cells=4 is exact here
    # (reach 4.9 px <= cell/2 = 8 px at zoom 2.0).  max_age: view corner 230
    # ticks + band + 8 = 242, quantized up to 128 (the engine's own formula).
    # entry_budget: 228.8k valid splat entries measured at full history
    # (probe, round 3) of the 524k capacity — 262144 slices the bin scatter
    # (the top render op, 2.4 ms traced) nearly in half with 15% headroom;
    # RenderDiag.entry_dropped guards the assumption.
    # segments=2: mean valid crossings/particle measured 1.09 here — rank
    # compaction halves the pdata rows; segment_dropped guards overflow.
    # retina_budget=8192: boundary pairs measured ~2.5k (2280 boundary
    # particles x ~1.1) — one ray_chunk instead of two (-0.35 ms traced).
    return raytrace.RenderParams(
        dt=h, num_rays=4096, pair_budget=131072, entry_budget=262144,
        bin_capacity=96, cell_px=16, occlusion_downsample=2, ray_chunk=8192,
        band=4, splat_cells=4, retina_budget=8192, max_age=256,
        segments=2,
    )


def build(history=1024):
    """Returns (particles, objects, model, buf, cam, params)."""
    particles, objects = build_scene()
    model = SoftbodyModel(
        capacity=particles.capacity,
        spring_offsets=forces_ops.derive_spring_offsets(
            np.asarray(particles.neighbors)),
    )
    buf = wl.create(history, particles.capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(model.params.h),
    )
    cam = Camera.create(pos=(0.6, 0.4), zoom=2.0)
    return particles, objects, model, buf, cam, render_params(model.params.h)
