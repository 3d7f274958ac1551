"""Multi-observer serving bench: B cameras over one stored worldline ring
in ONE jitted program (raytrace.render_views) vs B separate render
dispatches.  Measures per-view ms / views-per-second at the flagship scene
(10k particles, 1080p, history 1024).

Usage: python tools/bench_views.py [B ...]   (default batches: 1 4 8)
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

import bench  # noqa: E402
from spacetime_tpu.camera import Camera, stack_cameras  # noqa: E402
from spacetime_tpu.ops import raytrace  # noqa: E402
from spacetime_tpu.ops import worldline as wl  # noqa: E402


def orbit_cameras(center, zoom, b):
    """B cameras on a small ring around the scene center (distinct views)."""
    import math

    cams = []
    for i in range(b):
        ang = 2.0 * math.pi * i / max(b, 1)
        cams.append(Camera.create(
            pos=(center[0] + 0.08 * math.cos(ang),
                 center[1] + 0.08 * math.sin(ang)),
            zoom=zoom,
        ))
    return cams


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 4, 8]
    frame, step_only, particles, buf, cam, model, (w, h) = bench.build()
    # advance a few frames so the ring holds real (post-step) history
    t = 0.0
    p, b = particles, buf
    for _ in range(8):
        t += model.params.h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)

    params = raytrace.RenderParams(
        dt=model.params.h, num_rays=4096, pair_budget=32768, bin_capacity=64,
        cell_px=16, occlusion_downsample=2, ray_chunk=8192,
        retina_budget=8192, max_age=160,
    )
    boundary = wl.boundary_mask(p)
    obj_index = p.object_index
    objects = _objects_from_bench()

    # ring/objects must be ARGUMENTS, not closure captures: captured arrays
    # compile in as literal constants and the multi-MB ring blows the axon
    # remote-compile request limit (HTTP 413)
    def _single(buf_, oi_, objs_, bnd_, cam_):
        return raytrace.render_retarded(
            buf_, oi_, objs_, cam_, w, h, params, planar=True, boundary=bnd_)

    single_j = jax.jit(_single)
    single = lambda c: single_j(b, obj_index, objects, boundary, c)  # noqa: E731

    print(f"{'B':>3s} {'mode':>8s} {'ms/view':>8s} {'views/s':>8s}")
    for nb in batches:
        cams = orbit_cameras((0.7, 0.5), 1.2, nb)
        stacked = stack_cameras(cams)

        # batched: one dispatch for all views
        out = raytrace.render_views(b, obj_index, objects, stacked, w, h,
                                    params, planar=True, boundary=boundary)
        jax.block_until_ready(out)
        reps = max(1, 24 // nb)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = raytrace.render_views(b, obj_index, objects, stacked, w, h,
                                        params, planar=True,
                                        boundary=boundary)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (reps * nb) * 1e3
        print(f"{nb:3d} {'batched':>8s} {ms:8.2f} {1e3 / ms:8.1f}")

        # per-dispatch loop over the same cameras
        for c in cams:
            img = single(c)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        for _ in range(reps):
            for c in cams:
                img = single(c)
        jax.block_until_ready(img)
        ms = (time.perf_counter() - t0) / (reps * nb) * 1e3
        print(f"{nb:3d} {'loop':>8s} {ms:8.2f} {1e3 / ms:8.1f}")


def _objects_from_bench():
    """Rebuild the bench scene's Objects table (bench.build returns model
    state only)."""
    from spacetime_tpu import scene

    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(scene.radius_for_count(5000), 0, (0.35, 0.40),
                               (0.25, 0.05), lattice_pad=True),
           base_color=(0.25, 0.35, 1.0))
    sb.add(scene.disc_softbody(scene.radius_for_count(5000), 1, (1.05, 0.55),
                               (-0.25, -0.05), lattice_pad=True),
           base_color=(1.0, 0.3, 0.25))
    _particles, objects = sb.build()
    return objects


if __name__ == "__main__":
    main()
