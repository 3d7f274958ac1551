"""3D spacetime-view tests (ops/worldline3d.py — the reference's stub
worldline3d.glsl axis: render the (x, y, t) worldline block side-on).

Oracle strategy: hand-built ring buffers with known worldlines, checked
against the closed-form orthographic projection — top-down parity with the
2D point rasterizer, edge-on time extrusion, depth ordering, age fade."""

import math

import jax.numpy as jnp
import numpy as np

from spacetime_tpu.camera import Camera
from spacetime_tpu.ops import rasterize
from spacetime_tpu.ops import worldline as wl
from spacetime_tpu.ops.worldline3d import Worldline3DParams, render_worldline3d
from spacetime_tpu.state import make_objects, pack_particles

H = 0.005  # tick spacing used by the fixtures


def _particles(rows, capacity=8):
    """rows = [(x, y, vx, vy, obj)]"""
    rows = np.asarray(rows, np.float32)
    return pack_particles(
        pos=rows[:, 0:2],
        vel=rows[:, 2:4],
        neighbors=np.full((len(rows), 8), -1, np.int32),
        object_index=rows[:, 4].astype(np.int32),
        capacity=capacity,
    )


def _buf(trajectory, capacity=16, n=8):
    """trajectory(i) -> particle rows at tick i; fills the whole ring."""
    buf = wl.create(capacity=capacity, num_particles=n)
    for i in range(capacity):
        buf = wl.push_frame(buf, _particles(trajectory(i), capacity=n),
                            time=i * H)
    return buf


def _render(buf, p, cam, params, w=64, h=64):
    objects = make_objects(16, [{"base_color": (1.0, 0.2, 0.2)},
                                {"base_color": (0.2, 0.2, 1.0)}])
    img = render_worldline3d(
        buf, p.object_index, objects, cam, w, h, params, active=p.active
    )
    return np.asarray(img), objects


def test_topdown_matches_point_rasterizer():
    """elevation = pi/2 with zero fade reduces to the 2D point view: the
    newest tick wins every pixel (depth = age top-down)."""
    rows = [(0.45, 0.5, 0.0, 0.0, 0), (0.55, 0.5, 0.0, 0.0, 1)]
    p = _particles(rows)
    buf = _buf(lambda i: rows)
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.5)
    params = Worldline3DParams(azimuth=0.0, elevation=math.pi / 2,
                               fade=0.0, shell_only=False)
    img, objects = _render(buf, p, cam, params)
    ref = np.asarray(rasterize.render_points(p, objects, cam, 64, 64))
    hits = (img < 0.99).any(axis=-1)
    ref_hits = (ref < 0.99).any(axis=-1)
    np.testing.assert_array_equal(hits, ref_hits)
    # colors match to 5-bit quantization
    assert np.abs(img[hits] - ref[hits]).max() <= 1.0 / 31 + 1e-6


def test_edge_on_extrudes_time_axis():
    """A static particle seen edge-on (elevation 0) draws its worldline as a
    vertical column of samples: one pixel row per stored tick batch."""
    rows = [(0.5, 0.5, 0.0, 0.0, 0)]
    p = _particles(rows)
    buf = _buf(lambda i: rows, capacity=16)
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.2)
    params = Worldline3DParams(azimuth=0.0, elevation=0.0, time_scale=1.0,
                               fade=0.0, shell_only=False)
    img, _ = _render(buf, p, cam, params)
    ys, xs = np.nonzero((img < 0.99).any(axis=-1))
    assert len(np.unique(xs)) == 1  # static particle: one column
    # v = age * H * time_scale * (64 / 0.2) px = 1.6 px per tick of lookback:
    # 16 ticks span ~26 px below center, some rounding collisions
    assert len(np.unique(ys)) >= 12
    assert ys.min() >= 31  # the past extends DOWN-screen only


def test_depth_ordering_near_wins():
    """Two coincident-projection worldlines: the sample nearer the viewer
    (smaller depth) must win the pixel."""
    # same x, same ticks; the viewer sits toward +y at elevation 0
    # (depth = -yr), so the y = 0.55 particle (object 0, red) is nearer
    rows = [(0.5, 0.55, 0.0, 0.0, 0), (0.5, 0.45, 0.0, 0.0, 1)]
    p = _particles(rows)
    buf = _buf(lambda i: rows)
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.1)
    params = Worldline3DParams(azimuth=0.0, elevation=0.0, time_scale=10.0,
                               fade=0.0, shell_only=False)
    img, objects = _render(buf, p, cam, params)
    hits = np.argwhere((img < 0.99).any(axis=-1))
    assert len(hits) > 0
    # every winning pixel carries object 0's red (yr = +0.05 -> depth -0.05)
    near_color = np.array([1.0, 0.2, 0.2])
    for (y, x) in hits[:8]:
        assert np.abs(img[y, x] - near_color).max() <= 1.0 / 31 + 1e-6


def test_moving_particle_tilts_worldline():
    """A moving particle's past samples shift across columns (the worldline
    tilts in (x, t))."""
    def traj(i):
        return [(0.3 + 0.02 * i, 0.5, 0.0, 0.0, 0)]

    p = _particles(traj(15))
    buf = _buf(traj, capacity=16)
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.6)
    params = Worldline3DParams(azimuth=0.0, elevation=0.0, time_scale=4.0,
                               fade=0.0, shell_only=False)
    img, _ = _render(buf, p, cam, params)
    ys, xs = np.nonzero((img < 0.99).any(axis=-1))
    assert xs.max() - xs.min() >= 5  # many distinct columns
    # older (lower on screen) samples sit at smaller x
    order = np.argsort(ys)
    assert xs[order[0]] > xs[order[-1]]


def test_age_fade_toward_background():
    """With fade on, older samples are strictly closer to white."""
    rows = [(0.5, 0.5, 0.0, 0.0, 0)]
    p = _particles(rows)
    buf = _buf(lambda i: rows, capacity=16)
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.2)
    params = Worldline3DParams(azimuth=0.0, elevation=0.0, time_scale=1.0,
                               fade=0.9, shell_only=False)
    img, _ = _render(buf, p, cam, params)
    ys, xs = np.nonzero((img < 0.99).any(axis=-1))
    x = xs[0]
    newest, oldest = ys.min(), ys.max()
    # object 0 is red (1.0, 0.2, 0.2): green/blue rise toward 1 with age
    assert img[oldest, x, 1] > img[newest, x, 1] + 0.3


def test_engine_mode_end_to_end():
    """render_mode='worldline3d' runs through the REAL fused engine frame."""
    from spacetime_tpu.engine import Engine
    from spacetime_tpu.ops.raytrace import RenderParams
    from spacetime_tpu.utils.config import EngineConfig, SceneSpec

    eng = Engine(
        EngineConfig(
            scene=SceneSpec(
                bodies=(("disc", 30, (0.45, 0.45), (0.2, 0.0), (0.2, 0.2, 1.0)),),
                capacity=256,
            ),
            render=RenderParams(num_rays=128),
            width=64,
            height=64,
            history=32,
            render_mode="worldline3d",
            wl3d=Worldline3DParams(time_scale=2.0, fade=0.5),
        )
    )
    for _ in range(3):
        img = eng.run_frame()
    arr = np.asarray(img)
    assert arr.shape == (64, 64, 3)
    assert (arr < 0.99).any()  # something was drawn
    assert np.isfinite(arr).all()
    # the unfused path renders the same mode (paused frame re-renders)
    eng.paused = True
    arr2 = np.asarray(eng.run_frame())
    assert arr2.shape == (64, 64, 3)


def test_viewer_spin_keys():
    """[/]/{/} keys rotate the 3D view live (recompile-on-change; the view
    params are part of the fused-frame cache key)."""
    import matplotlib

    matplotlib.use("Agg")
    from spacetime_tpu.engine import Engine
    from spacetime_tpu.ops.raytrace import RenderParams
    from spacetime_tpu.utils.config import EngineConfig, SceneSpec
    from spacetime_tpu.viewer import run_viewer

    eng = Engine(
        EngineConfig(
            scene=SceneSpec(
                bodies=(("disc", 30, (0.45, 0.45), (0.2, 0.0), (0.2, 0.2, 1.0)),),
                capacity=256,
            ),
            render=RenderParams(num_rays=128),
            width=48,
            height=48,
            history=32,
            render_mode="worldline3d",
        )
    )
    az0 = eng.config.wl3d.azimuth
    el0 = eng.config.wl3d.elevation

    def script(frame):
        if frame == 0:
            return [("]", True)]
        if frame == 1:
            return [("{", True)]
        return []

    n = run_viewer(eng, max_frames=3, script=script, show=False)
    assert n == 3
    assert eng.config.wl3d.azimuth > az0
    assert eng.config.wl3d.elevation < el0


def test_age_stride_keeps_newest_tick():
    """Strided views must still draw age 0 (the present-time front face),
    whatever (a_all-1) % stride is."""
    def traj(i):
        return [(0.3 + 0.02 * i, 0.5, 0.0, 0.0, 0)]

    p = _particles(traj(15))
    buf = _buf(traj, capacity=16)  # a_all=16 -> (a_all-1) % 4 = 3
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.6)
    params = Worldline3DParams(azimuth=0.0, elevation=0.0, time_scale=4.0,
                               fade=0.0, shell_only=False, age_stride=4)
    img, _ = _render(buf, p, cam, params)
    ys, xs = np.nonzero((img < 0.99).any(axis=-1))
    # the newest sample (x=0.6, age 0) sits at u=(0.6-0.5)*106.7+31.5 ~ 42,
    # v ~ 31.5 (rt=0)
    assert ((np.abs(xs - 42) <= 1) & (np.abs(ys - 32) <= 1)).any(), (
        list(zip(xs, ys)))


def test_depth_order_beyond_zoom_range():
    """Depth normalization must rank samples far outside the zoom window:
    at edge-on elevation |yr| is unconstrained by the screen, and a fixed
    zoom-based depth bound would clamp both and let packed COLOR decide."""
    # same x; red at y=+5 is nearer the +y viewer than blue at y=+2
    rows = [(0.5, 5.5, 0.0, 0.0, 0), (0.5, 2.5, 0.0, 0.0, 1)]
    p = _particles(rows)
    buf = _buf(lambda i: rows)
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.1)
    params = Worldline3DParams(azimuth=0.0, elevation=0.0, time_scale=10.0,
                               fade=0.0, shell_only=False)
    img, _ = _render(buf, p, cam, params)
    hits = np.argwhere((img < 0.99).any(axis=-1))
    assert len(hits) > 0
    near_color = np.array([1.0, 0.2, 0.2])  # red must win
    for (y, x) in hits[:8]:
        assert np.abs(img[y, x] - near_color).max() <= 1.0 / 31 + 1e-6
