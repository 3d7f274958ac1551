"""Reference-demo benchmark: the reference's ACTUAL default scene —
testimg4 at the origin with velocity (0.1, 0.1) and testimg5 at (1.2, 0.8)
with velocity (-0.1, -0.1) (/root/reference/src/twoplusone/mod.rs:86-113),
loaded through the PNG import path at 1080p retarded render.  Falls back to
procedural discs of the same particle count if the reference images are not
mounted.  Usage: python tools/bench_116k.py [history]"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from spacetime_tpu import scene  # noqa: E402
from spacetime_tpu.camera import Camera  # noqa: E402
from spacetime_tpu.models.softbody import SoftbodyModel  # noqa: E402
from spacetime_tpu.ops import raytrace  # noqa: E402
from spacetime_tpu.ops import worldline as wl  # noqa: E402


REF_IMAGES = "/root/reference/softbodyimages"


def main():
    import os

    history = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    width, height = 1920, 1080

    import numpy as np

    from spacetime_tpu.ops import forces as forces_ops

    sb = scene.SceneBuilder()
    if os.path.isdir(REF_IMAGES):
        # the reference demo exactly: create_world's two image_to_softbody
        # calls (twoplusone/mod.rs:86-113)
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
    particles, objects = sb.build()
    model = SoftbodyModel(
        capacity=particles.capacity,
        spring_offsets=forces_ops.derive_spring_offsets(
            np.asarray(particles.neighbors)
        ),
    )
    print(f"# particles: {int(particles.num_active())}, capacity {particles.capacity}, history {history}",
          file=sys.stderr)

    buf = wl.create(history, particles.capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(model.params.h),
    )
    cam = Camera.create(pos=(0.6, 0.4), zoom=2.0)
    # band=4 covers radial speeds to ~0.4c (bodies close at 0.28c; the
    # band_truncated diag guards the assumption); splat_cells=4 is exact here
    # (reach 4.9 px <= cell/2 = 8 px at zoom 2.0)
    params = raytrace.RenderParams(
        dt=model.params.h, num_rays=4096, pair_budget=131072,
        bin_capacity=96, cell_px=16, occlusion_downsample=2, ray_chunk=8192,
        band=4, splat_cells=4, retina_budget=16384,
        # engine safety formula: view corner 230 ticks + band + 8 = 242,
        # quantized up to 128 (ADVICE r2: 240 could cull extreme corners)
        max_age=256,
    )

    def frame(particles, buf, cam, t):
        # t stays on device across frames (a fresh host scalar per frame
        # costs one tunnel round-trip in the dispatch path)
        t = t + jnp.float32(model.params.h)
        particles, _aux = model.step(particles)
        buf = wl.push_frame(buf, particles, t)
        img = raytrace.render_retarded(
            buf, particles.object_index, objects, cam, width, height, params,
            planar=True, boundary=wl.boundary_mask(particles),
        )
        return particles, buf, img, t

    frame = jax.jit(frame, donate_argnums=(0, 1, 3))
    step_only = jax.jit(lambda p: model.step(p)[0])

    t = jnp.float32(0.0)
    p, b = particles, buf
    t0 = time.perf_counter()
    for _ in range(5):
        p, b, img, t = frame(p, b, cam, t)
    jax.block_until_ready(img)
    print(f"# warmup+compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    n_frames = 30
    t0 = time.perf_counter()
    for _ in range(n_frames):
        p, b, img, t = frame(p, b, cam, t)
    jax.block_until_ready(img)
    dt_frame = (time.perf_counter() - t0) / n_frames

    p2 = step_only(p)
    jax.block_until_ready(p2)
    t0 = time.perf_counter()
    for _ in range(50):
        p2 = step_only(p2)
    jax.block_until_ready(p2)
    sps = 50 / (time.perf_counter() - t0)

    # diagnostics at the final state
    img2, diag = raytrace.render_retarded_with_diag(
        b, p.object_index, objects, cam, width, height, params, planar=True)
    print(
        f"# fused frame: {dt_frame*1e3:.2f} ms ({1/dt_frame:.1f} fps); "
        f"physics-only: {sps:.0f} steps/s ({1e3/sps:.1f} ms); "
        f"pairs={int(diag.pairs_used)} dropped={int(diag.bin_dropped)} "
        f"trunc={int(diag.band_truncated)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
