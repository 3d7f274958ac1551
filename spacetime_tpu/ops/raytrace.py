"""Retarded-time raytracer over the worldline ring buffer.

This implements the capability the reference left as an empty stub
(reference: src/twoplusone/worldline/raytrace.glsl:11-21 — bindings and a
resources list, no code): Lorentz-correct retarded-time visibility per the
north star in BASELINE.json.

Physical model.  The world is 2D; the image is the standard top-down "god
view" map of the plane (same convention as the reference's debug point
renderer), but what is shown at map point ``p`` is what an observer at the
camera position ``c`` actually *sees* of ``p`` at coordinate time ``t_now``:
the event ``(p, t_now - |p - c|)`` on the camera's past light cone.  A pixel
ray in (x, y, t) runs from the camera event along direction ``(d_hat, -1)``
— slope c, exactly the construction sketched in SURVEY.md §5.

Geometry.  Softbodies are unions of radius-``rho`` discs centered on
particles; between stored ticks each disc sweeps a linear capsule in
(x, y, t).  Ray-capsule intersection is closed form: with ``tau`` the within-
segment time fraction, both the ray point and the particle position are
affine in ``tau``, so squared distance is quadratic — one clamp + one
division per candidate.  This replaces the reference's unfinished
boundary-mesh + BVH design (worldline/mod.rs:37-44,
object_archive.txt:249-287) with something exact for the disc-union geometry
and fully regular on TPU.

Acceleration structure (TPU-native: no BVH, no dynamic stacks):
  1. *Annulus candidate compaction* — a (slot, particle) segment can only
     meet the light cone where its camera-distance interval overlaps its
     retarded-radius interval: a vectorized (T, N) mask compacting to ~3N
     pairs (each worldline crosses the cone once, staying near it O(1) ticks).
  2. *Spatial hashing of pairs* — compacted pairs splat into the <=3x3 hashed
     uniform-grid cells their reach disc touches (one `lax.sort`, the
     collision-grid machinery reapplied to the cone-crossing set).  The
     annulus property is what makes this work: at any map location only ~2-3
     ticks' worth of worldline segments are cone-crossing, so per-cell counts
     are bounded by LOCAL particle density — uniform in radius, no near-field
     special case, and no time dimension needed in the table.
  3. *1D retina* — the camera is a point, so occlusion needs one first-hit
     march per ANGLE (``num_rays``), not per pixel.  Rays test the compacted
     pair list directly as a dense chunked broadcast (no gathers, exact).
  4. *Per-pixel retarded occupancy* — each pixel gathers exactly ONE hash
     cell (cell size >= 2x capsule reach guarantees single-cell coverage) to
     decide whether its own light-cone event is inside matter and which
     particle shades it.

Total work is O(T*N mask + pairs log pairs + rays*pairs + pixels*capacity) —
independent of history length per pixel.

Layout rule (hard-won): every hot-path array is a SCALAR COMPONENT plane —
no broadcasted (..., 2) vectors, no (..., 3) rgb tensors.  TPU tiles the two
minor dims as (8, 128); a 2- or 3-wide trailing dim pads to 128 lanes (64x /
42x HBM inflation; the first 1080p run OOM'd on exactly this).  Public image
output is (H, W, 3) by default; `planar=True` returns (3, H, W) and avoids
materializing the padded interleaved form on device.

Shading: special-relativistic Doppler (source motion composed with observer
motion) with an approximate spectral shift of the RGB channels, plus
headlight beaming ``D**3`` (bolometric intensity boost), per BASELINE
configs 3-4.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera import Camera, pixel_centers
from ..constants import C2
from ..state import Objects
from .worldline import WorldlineBuffer

_BIG = jnp.float32(3.0e38)
_PI = jnp.float32(jnp.pi)


@dataclasses.dataclass(frozen=True)
class RenderParams:
    """Static renderer configuration (hashable -> jit static arg)."""

    dt: float = 0.005  # history tick spacing (= PhysicsParams.h if pushed every step)
    rho: float = 0.0026  # particle render radius; >= half diagonal spacing fills interiors
    pair_capacity: int = 16384  # max compacted cone-crossing segments
    bin_capacity: int = 64  # candidates per spatial hash cell
    table_factor: int = 4  # hash table size = table_factor * pair_capacity
    num_rays: int = 2048  # 1D retina resolution (occlusion only)
    ray_chunk: int = 2048  # pairs per scan chunk in the retina march
    pixel_block: int = 131072  # pixels per lax.map block (bounds HBM working set)
    opaque: bool = True  # False = x-ray: no occlusion shading
    retarded: bool = True  # False = instantaneous view of the newest tick
    doppler: bool = True
    beaming: bool = True
    doppler_strength: float = 1.0
    ambient: float = 0.15  # fraction of unshifted base color mixed in
    absorbed_dim: float = 0.35  # brightness of matter hidden behind other matter
    shadow: float = 0.78  # background brightness in occluded regions

    @property
    def cell_size(self) -> float:
        """Hash cell edge; >= 2x max capsule reach (rho + c*dt/2) so a pixel's
        own cell is guaranteed to contain every capsule that can cover it."""
        return 2.0 * (self.rho + 0.5 * self.dt)


class RenderDiag(NamedTuple):
    pairs_used: jax.Array  # compacted cone-crossing segment count
    pairs_dropped: jax.Array  # pairs beyond pair_capacity
    bin_dropped: jax.Array  # splat entries beyond bin_capacity


# ---------------------------------------------------------------------------
# Scalar-component shading
# ---------------------------------------------------------------------------


def _gamma_xy(vx, vy):
    return 1.0 / jnp.sqrt(jnp.maximum(1.0 - (vx * vx + vy * vy) / C2, 1e-12))


def doppler_factor_xy(vx, vy, nx, ny):
    """Observed/emitted frequency for a source at velocity (vx, vy), photon
    propagation direction (nx, ny) (unit, source -> observer), static
    observer (relativity.doppler_factor, componentized)."""
    g = _gamma_xy(vx, vy)
    return 1.0 / (g * (1.0 - (vx * nx + vy * ny) / C2))


def camera_doppler_factor_xy(cvx, cvy, nx, ny):
    """Moving-observer factor (relativity.camera_doppler_factor)."""
    g = _gamma_xy(cvx, cvy)
    return g * (1.0 - (cvx * nx + cvy * ny) / C2)


def _hat(x):
    """Linear hat weight max(0, 1 - |x|) for the spectral-shift resample."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def shade_channels(cr, cg, cb, d, params: RenderParams):
    """Doppler-shift + beam three scalar channel arrays.

    Spectral model: (r, g, b) are three frequency bands (increasing); a
    Doppler factor D translates energy across them by log2(D) channels with
    linear interpolation; light shifted outside the triplet dims to black.
    out_i = sum_j hat(i - t - j) * c_j  with t = clip(log2 D).
    """
    if params.doppler:
        t = jnp.clip(
            jnp.log2(jnp.maximum(d, 1e-6)) * params.doppler_strength, -2.5, 2.5
        )
        out = []
        for i in range(3):
            src = i - t
            out.append(_hat(src - 0) * cr + _hat(src - 1) * cg + _hat(src - 2) * cb)
        sr, sg, sb = out
    else:
        sr, sg, sb = cr, cg, cb
    if params.beaming:
        boost = d * d * d
        sr, sg, sb = sr * boost, sg * boost, sb * boost
    amb = params.ambient
    mix = lambda s, c: amb * c + (1.0 - amb) * jnp.clip(s, 0.0, 1.0)
    return mix(sr, cr), mix(sg, cg), mix(sb, cb)


def doppler_shift_rgb(rgb, d_factor, strength=1.0):
    """Vector-form spectral shift (used by tests/small paths)."""
    params = RenderParams(doppler=True, beaming=False, ambient=0.0,
                          doppler_strength=strength)
    r, g, b = shade_channels(
        rgb[..., 0], rgb[..., 1], rgb[..., 2], d_factor, params
    )
    return jnp.stack([r, g, b], axis=-1)


def shade_hit(base_color, vel_event, n_hat, cam_vel, params: RenderParams):
    """Vector-form shading (oracle / tests).  `n_hat` (..., 2) is the photon
    propagation direction (event -> camera); total Doppler = source factor x
    moving-observer factor (a co-moving camera sees no shift)."""
    d = jnp.ones(base_color.shape[:-1], base_color.dtype)
    if params.doppler or params.beaming:
        d = doppler_factor_xy(
            vel_event[..., 0], vel_event[..., 1], n_hat[..., 0], n_hat[..., 1]
        ) * camera_doppler_factor_xy(
            cam_vel[..., 0], cam_vel[..., 1], n_hat[..., 0], n_hat[..., 1]
        )
    r, g, b = shade_channels(
        base_color[..., 0], base_color[..., 1], base_color[..., 2], d, params
    )
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# Scalar-component segment math (shared by oracle and accelerated path)
# ---------------------------------------------------------------------------


def _segment_data(buf: WorldlineBuffer, dt: float):
    """Per-(slot, particle) segment endpoint components in time order.

    Segment owned by slot k runs from (pos[k], times[k]) to
    (pos[(k+1) % T], times[k] + dt); valid iff the next slot holds the
    consecutive tick (ring wraparound and ramp-up slots fail this)."""
    t_cap = buf.capacity
    nxt = (jnp.arange(t_cap) + 1) % t_cap
    ta = buf.times
    valid = jnp.isfinite(ta) & (jnp.abs(buf.times[nxt] - ta - dt) < 0.5 * dt)
    return (
        buf.pos_x, buf.pos_y,
        buf.pos_x[nxt], buf.pos_y[nxt],
        ta, valid,
    )


def _ray_hit_xy(cx, cy, dhx, dhy, ax, ay, bx, by, ta, t_now, dt, rho):
    """Ray (origin camera, direction (dhx, dhy)) on the past light cone of
    (cam, t_now) vs one swept capsule, all scalar components.  Event times
    [ta, ta+dt] map to arclength s = t_now - t in [s_hi - dt, s_hi]; both ray
    point and particle position are affine in the segment fraction tau, so
    |A - tau B|^2 minimizes in closed form.  Returns (hit, s_hit)."""
    s_hi = t_now - ta
    a_x = cx + s_hi * dhx - ax
    a_y = cy + s_hi * dhy - ay
    b_x = dt * dhx + (bx - ax)
    b_y = dt * dhy + (by - ay)
    bb = b_x * b_x + b_y * b_y
    tau = jnp.clip((a_x * b_x + a_y * b_y) / jnp.maximum(bb, 1e-20), 0.0, 1.0)
    d_x = a_x - tau * b_x
    d_y = a_y - tau * b_y
    dist2 = d_x * d_x + d_y * d_y
    s_hit = s_hi - tau * dt
    hit = (dist2 <= rho * rho) & (s_hit > 0.0)
    return hit, s_hit


def _occupancy_xy(px, py, t_e, ax, ay, bx, by, ta, dt, rho):
    """Is map point (px, py) inside this segment's capsule at event time t_e?
    Returns (inside, dist2)."""
    tau = (t_e - ta) / dt
    in_time = (tau >= -0.001) & (tau <= 1.001)
    tau_c = jnp.clip(tau, 0.0, 1.0)
    d_x = px - (ax + tau_c * (bx - ax))
    d_y = py - (ay + tau_c * (by - ay))
    dist2 = d_x * d_x + d_y * d_y
    return in_time & (dist2 <= rho * rho), dist2


# ---------------------------------------------------------------------------
# Shared pixel-pass machinery
# ---------------------------------------------------------------------------


class PairTables(NamedTuple):
    """Scalar-component pair data + spatial hash table."""

    starts: jax.Array
    counts: jax.Array
    sval: jax.Array
    pair_valid: jax.Array
    pax: jax.Array
    pay: jax.Array
    pbx: jax.Array
    pby: jax.Array
    pta: jax.Array
    pvx: jax.Array
    pvy: jax.Array
    pobj: jax.Array


def _compact(mask_flat: jax.Array, capacity: int):
    """Indices of True entries, padded with -1 to `capacity` (stream
    compaction via cumsum + scatter — the TPU version of an append buffer)."""
    write_pos = jnp.cumsum(mask_flat) - 1
    out = jnp.full((capacity,), -1, jnp.int32)
    src = jnp.arange(mask_flat.shape[0], dtype=jnp.int32)
    out = out.at[jnp.where(mask_flat, write_pos, capacity)].set(src, mode="drop")
    count = jnp.sum(mask_flat.astype(jnp.int32))
    return out, count


def _build_pair_tables(buf, obj_index, cand, params: RenderParams):
    """Compact the (T, N) candidate mask and build the spatial hash."""
    from . import grid as grid_ops

    rho, lam = params.rho, params.cell_size
    t_cap, n = cand.shape
    pcap = params.pair_capacity
    n_keys = params.table_factor * pcap

    pair_sid, n_pairs = _compact(cand.reshape(-1), pcap)
    pair_valid = pair_sid >= 0
    sid = jnp.maximum(pair_sid, 0)
    slot, pidx = sid // n, sid % n
    far = 2.0e9
    nxt_slot = (slot + 1) % t_cap
    pax = jnp.where(pair_valid, buf.pos_x.reshape(-1)[sid], far)
    pay = jnp.where(pair_valid, buf.pos_y.reshape(-1)[sid], far)
    sid_next = nxt_slot * n + pidx
    pbx = jnp.where(pair_valid, buf.pos_x.reshape(-1)[sid_next], far)
    pby = jnp.where(pair_valid, buf.pos_y.reshape(-1)[sid_next], far)
    pta = buf.times[slot]
    pvx = buf.vel_x.reshape(-1)[sid]
    pvy = buf.vel_y.reshape(-1)[sid]
    pobj = obj_index[pidx]

    # spatial hash: splat each pair into the <=3x3 cells its reach disc touches
    cx = 0.5 * (pax + pbx)
    cy = 0.5 * (pay + pby)
    dxab = pbx - pax
    dyab = pby - pay
    reach = rho + 0.5 * jnp.sqrt(dxab * dxab + dyab * dyab)
    cell_x = jnp.floor(cx / lam).astype(jnp.int32)
    cell_y = jnp.floor(cy / lam).astype(jnp.int32)
    keys = []
    uses = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ccx = cell_x + dx
            ccy = cell_y + dy
            lox = ccx.astype(jnp.float32) * lam
            loy = ccy.astype(jnp.float32) * lam
            nx_ = jnp.clip(cx, lox, lox + lam)
            ny_ = jnp.clip(cy, loy, loy + lam)
            d2 = (nx_ - cx) ** 2 + (ny_ - cy) ** 2
            use = pair_valid & (d2 <= (reach + 1e-6) ** 2)
            keys.append(
                jnp.where(use, grid_ops.hash_cell_xy(ccx, ccy, n_keys - 1), n_keys)
            )
            uses.append(use)
    key = jnp.stack(keys, axis=1).reshape(-1)  # (pcap * 9,)
    val = jnp.broadcast_to(
        jnp.arange(pcap, dtype=jnp.int32)[:, None], (pcap, 9)
    ).reshape(-1)
    skey, sval = jax.lax.sort_key_val(key, val)
    n_entries = skey.shape[0]
    starts = jnp.full((n_keys + 1,), n_entries, jnp.int32)
    starts = starts.at[skey].min(jnp.arange(n_entries, dtype=jnp.int32))
    counts = jnp.zeros((n_keys + 1,), jnp.int32).at[key].add(1)
    bin_dropped = jnp.sum(jnp.maximum(counts[:-1] - params.bin_capacity, 0))

    tables = PairTables(
        starts=starts, counts=counts, sval=sval, pair_valid=pair_valid,
        pax=pax, pay=pay, pbx=pbx, pby=pby, pta=pta, pvx=pvx, pvy=pvy,
        pobj=pobj,
    )
    diag = RenderDiag(
        pairs_used=jnp.minimum(n_pairs, pcap),
        pairs_dropped=jnp.maximum(n_pairs - pcap, 0),
        bin_dropped=bin_dropped,
    )
    return tables, n_keys, diag


def _occupancy_block(px, py, t_e, tables: PairTables, lam, n_keys, cap, dt, rho):
    """Retarded occupancy for one block of pixels (scalar coords).
    Returns (occupied (B,), best_pid (B,))."""
    from . import grid as grid_ops

    cellx = jnp.floor(px / lam).astype(jnp.int32)
    celly = jnp.floor(py / lam).astype(jnp.int32)
    key = grid_ops.hash_cell_xy(cellx, celly, n_keys - 1)
    s = tables.starts[key]
    c = jnp.minimum(tables.counts[key], cap)
    j = jnp.arange(cap, dtype=jnp.int32)
    slot = jnp.clip(s[:, None] + j[None, :], 0, tables.sval.shape[0] - 1)
    pid = tables.sval[slot]  # (B, cap)
    ok = (j[None, :] < c[:, None]) & tables.pair_valid[pid]
    inside, dist2 = _occupancy_xy(
        px[:, None], py[:, None],
        t_e[:, None],
        tables.pax[pid], tables.pay[pid],
        tables.pbx[pid], tables.pby[pid],
        tables.pta[pid], dt, rho,
    )
    inside = inside & ok
    dist2 = jnp.where(inside, dist2, _BIG)
    best = jnp.argmin(dist2, axis=1)
    occupied = jnp.take_along_axis(inside, best[:, None], axis=1)[:, 0]
    best_pid = jnp.take_along_axis(pid, best[:, None], axis=1)[:, 0]
    return occupied, best_pid


def _compose_block(
    px, py, r, occupied, best_pid, s_first_px, tables: PairTables, objects,
    cam, params: RenderParams,
):
    """Shading/composition for one pixel block; returns 3 channel arrays."""
    obj = tables.pobj[best_pid]
    cr = objects.base_color[:, 0][obj]
    cg = objects.base_color[:, 1][obj]
    cb = objects.base_color[:, 2][obj]
    inv_r = 1.0 / jnp.maximum(r, 1e-12)
    nx = (cam.pos[0] - px) * inv_r
    ny = (cam.pos[1] - py) * inv_r
    d = doppler_factor_xy(
        tables.pvx[best_pid], tables.pvy[best_pid], nx, ny
    ) * camera_doppler_factor_xy(cam.vel[0], cam.vel[1], nx, ny)
    sr, sg, sb = shade_channels(cr, cg, cb, d, params)

    if params.opaque and params.retarded:
        blocked = s_first_px < (r - 2.0 * params.rho)

        def compose(shaded):
            return jnp.where(
                occupied,
                jnp.where(blocked, shaded * params.absorbed_dim, shaded),
                jnp.where(blocked, jnp.float32(params.shadow), 1.0),
            )

    else:

        def compose(shaded):
            return jnp.where(occupied, shaded, 1.0)

    return compose(sr), compose(sg), compose(sb)


def _pad_pixels(width, height, cam, block):
    """Flattened, padded scalar pixel coords + block count."""
    pc = pixel_centers(width, height, cam)
    px = pc[..., 0].reshape(-1)
    py = pc[..., 1].reshape(-1)
    n_px = px.shape[0]
    n_blocks = -(-n_px // block)
    pad = n_blocks * block - n_px
    px = jnp.pad(px, (0, pad), constant_values=1.0e9)
    py = jnp.pad(py, (0, pad), constant_values=1.0e9)
    return px.reshape(n_blocks, block), py.reshape(n_blocks, block), n_px


def _finalize_image(crgb, n_px, width, height, planar: bool):
    """(n_blocks, 3, B) channel planes -> image."""
    planes = crgb.transpose(1, 0, 2).reshape(3, -1)[:, :n_px]
    img = planes.reshape(3, height, width)
    return img if planar else img.transpose(1, 2, 0)


# ---------------------------------------------------------------------------
# Oracle renderer (exact, O(pixels * T * N) — tests / tiny scenes only)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("width", "height", "params"))
def render_retarded_brute(
    buf: WorldlineBuffer,
    obj_index: jax.Array,  # (N,) i32 object id per particle
    objects: Objects,
    cam: Camera,
    width: int,
    height: int,
    params: RenderParams,
) -> jax.Array:
    """Reference renderer: every pixel tests every (slot, particle) segment.
    Defines correct output for the accelerated path (SURVEY.md §4)."""
    dt, rho = params.dt, params.rho
    qax, qay, qbx, qby, ta, seg_valid = _segment_data(buf, dt)
    t_now = buf.times[buf.cursor]
    t_cap, n = qax.shape

    pc = pixel_centers(width, height, cam)
    px = pc[..., 0].reshape(-1)
    py = pc[..., 1].reshape(-1)
    relx, rely = px - cam.pos[0], py - cam.pos[1]
    r = jnp.sqrt(relx * relx + rely * rely)
    inv_r = 1.0 / jnp.maximum(r, 1e-12)
    dhx, dhy = relx * inv_r, rely * inv_r

    fax, fay = qax.reshape(-1), qay.reshape(-1)
    fbx, fby = qbx.reshape(-1), qby.reshape(-1)
    fta = jnp.repeat(ta, n)
    valid_f = jnp.repeat(seg_valid, n) & (jnp.abs(fax) < 1e8)
    fobj = jnp.tile(obj_index, t_cap)
    fvx = buf.vel_x.reshape(-1)
    fvy = buf.vel_y.reshape(-1)

    t_e = t_now - r if params.retarded else jnp.broadcast_to(t_now, r.shape)
    inside, dist2 = _occupancy_xy(
        px[:, None], py[:, None], t_e[:, None],
        fax[None], fay[None], fbx[None], fby[None], fta[None], dt, rho,
    )
    inside = inside & valid_f[None, :]
    dist2 = jnp.where(inside, dist2, _BIG)
    best = jnp.argmin(dist2, axis=1)
    occupied = jnp.take_along_axis(inside, best[:, None], axis=1)[:, 0]

    hit, s_hit = _ray_hit_xy(
        cam.pos[0], cam.pos[1], dhx[:, None], dhy[:, None],
        fax[None], fay[None], fbx[None], fby[None], fta[None],
        t_now, dt, rho,
    )
    s_hit = jnp.where(hit & valid_f[None, :], s_hit, _BIG)
    s_first = jnp.min(s_hit, axis=1)

    obj = fobj[best]
    cr = objects.base_color[:, 0][obj]
    cg = objects.base_color[:, 1][obj]
    cb = objects.base_color[:, 2][obj]
    nx, ny = -dhx, -dhy
    d = doppler_factor_xy(fvx[best], fvy[best], nx, ny) * camera_doppler_factor_xy(
        cam.vel[0], cam.vel[1], nx, ny
    )
    sr, sg, sb = shade_channels(cr, cg, cb, d, params)
    if params.opaque and params.retarded:
        blocked = s_first < (r - 2.0 * params.rho)
        comp = lambda s: jnp.where(
            occupied,
            jnp.where(blocked, s * params.absorbed_dim, s),
            jnp.where(blocked, jnp.float32(params.shadow), 1.0),
        )
    else:
        comp = lambda s: jnp.where(occupied, s, 1.0)
    img = jnp.stack([comp(sr), comp(sg), comp(sb)], axis=-1)
    return img.reshape(height, width, 3)


# ---------------------------------------------------------------------------
# Accelerated renderer
# ---------------------------------------------------------------------------


def _render_retarded_impl(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    width: int,
    height: int,
    params: RenderParams,
    planar: bool,
):
    dt, rho = params.dt, params.rho
    lam = params.cell_size
    t_cap = buf.capacity
    t_now = buf.times[buf.cursor]

    qax, qay, qbx, qby, ta, seg_valid = _segment_data(buf, dt)

    # --- 1. candidate mask over (T, N) ---
    cxm, cym = cam.pos[0], cam.pos[1]
    ra = jnp.sqrt((qax - cxm) ** 2 + (qay - cym) ** 2)
    rb = jnp.sqrt((qbx - cxm) ** 2 + (qby - cym) ** 2)
    s_hi = t_now - ta  # (T,)
    s_lo = s_hi - dt
    if params.retarded:
        cand = (
            seg_valid[:, None]
            & (s_hi[:, None] > 0)
            & (jnp.maximum(ra, rb) >= s_lo[:, None] - rho)
            & (jnp.minimum(ra, rb) <= s_hi[:, None] + rho)
            & (ra < 1.0e8)
        )
    else:
        # instantaneous view: only the newest segment (age 1, tau = 1 at
        # t_now) matters — "measured reality", the filled upgrade of the
        # reference's debug point renderer (points_norel.glsl).
        newest = jnp.arange(t_cap, dtype=jnp.int32) == (buf.cursor - 1) % t_cap
        cand = seg_valid[:, None] & newest[:, None] & (ra < 1.0e8)

    # --- 2./3. compact pairs + spatial hash ---
    tables, n_keys, diag = _build_pair_tables(buf, obj_index, cand, params)

    # --- 4. 1D retina: exact first hit per angle, dense over all pairs ---
    use_rays = params.opaque and params.retarded
    n_rays = params.num_rays
    pcap = params.pair_capacity
    theta = -_PI + (jnp.arange(n_rays, dtype=jnp.float32) + 0.5) * (2 * _PI / n_rays)
    dhx = jnp.cos(theta)
    dhy = jnp.sin(theta)
    if use_rays:
        chunk = min(params.ray_chunk, pcap)
        n_chunks = -(-pcap // chunk)
        pad = n_chunks * chunk - pcap
        padv = lambda x: jnp.pad(x, (0, pad)).reshape(n_chunks, chunk)
        cax, cay = padv(tables.pax), padv(tables.pay)
        cbx, cby = padv(tables.pbx), padv(tables.pby)
        cta = padv(tables.pta)
        cok = jnp.pad(tables.pair_valid, (0, pad)).reshape(n_chunks, chunk)

        def ray_chunk_step(s_min, args):
            ax, ay, bx, by, t_, ok = args
            hit, s_hit = _ray_hit_xy(
                cxm, cym, dhx[:, None], dhy[:, None],
                ax[None], ay[None], bx[None], by[None], t_[None],
                t_now, dt, rho,
            )
            s_hit = jnp.where(hit & ok[None, :], s_hit, _BIG)
            return jnp.minimum(s_min, jnp.min(s_hit, axis=1)), None

        s_first, _ = jax.lax.scan(
            ray_chunk_step, jnp.full((n_rays,), _BIG),
            (cax, cay, cbx, cby, cta, cok),
        )
    else:
        s_first = jnp.full((n_rays,), _BIG)

    # --- 5. per-pixel retarded occupancy + shading, chunked pixel blocks ---
    pxs, pys, n_px = _pad_pixels(width, height, cam, params.pixel_block)
    cap = params.bin_capacity

    def block_fn(args):
        px, py = args
        relx = px - cxm
        rely = py - cym
        r = jnp.sqrt(relx * relx + rely * rely)
        t_e = t_now - r if params.retarded else jnp.broadcast_to(t_now, r.shape)
        occupied, best_pid = _occupancy_block(
            px, py, t_e, tables, lam, n_keys, cap, dt, rho
        )
        phi_p = jnp.arctan2(rely, relx)
        ray_of_pix = jnp.clip(
            jnp.floor((phi_p + _PI) / (2 * _PI) * n_rays).astype(jnp.int32),
            0, n_rays - 1,
        )
        sr, sg, sb = _compose_block(
            px, py, r, occupied, best_pid, s_first[ray_of_pix], tables,
            objects, cam, params,
        )
        return jnp.stack([sr, sg, sb], axis=0)  # (3, B)

    crgb = jax.lax.map(block_fn, (pxs, pys))  # (n_blocks, 3, B)
    img = _finalize_image(crgb, n_px, width, height, planar)
    return img, diag


@partial(jax.jit, static_argnames=("width", "height", "params", "planar"))
def render_retarded(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    width: int,
    height: int,
    params: RenderParams,
    planar: bool = False,
) -> jax.Array:
    img, _ = _render_retarded_impl(
        buf, obj_index, objects, cam, width, height, params, planar
    )
    return img


@partial(jax.jit, static_argnames=("width", "height", "params", "planar"))
def render_retarded_with_diag(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    width: int,
    height: int,
    params: RenderParams,
    planar: bool = False,
):
    return _render_retarded_impl(
        buf, obj_index, objects, cam, width, height, params, planar
    )
