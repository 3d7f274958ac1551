"""Scene construction: image -> softbody import and procedural blobs.

The reference turns every non-black pixel of an 8-bit RGB PNG into a particle
at `pixel * IMMEDIATE_NEIGHBOR_DIST + offset` with a given initial velocity,
then wires the 8-neighbor spring lattice through a pixel-coordinate map
(reference: src/twoplusone/softbody/mod.rs:117-189).  Here the decode is PIL
and the wiring is vectorized numpy (no per-pixel Python loop).

Also provides procedural blob generators (disc / box) so tests and benchmarks
don't depend on the reference's PNG fixtures, plus builders for the five
BASELINE.json scene configs.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import constants
from .state import Particles, Objects, concat_particle_arrays, make_objects, pack_particles

# Neighbor slot offsets, in the reference's slot order:
# immediate: left/up/right/down (reference: common.glsl:4, mod.rs:163-174)
# diagonal:  tl/tr/bl/br       (reference: common.glsl:5, mod.rs:175-186)
NEIGHBOR_OFFSETS: Tuple[Tuple[int, int], ...] = (
    (-1, 0),
    (0, -1),
    (1, 0),
    (0, 1),
    (-1, -1),
    (1, -1),
    (-1, 1),
    (1, 1),
)
# Slot of the reciprocal bond: immediate i <-> i±2 (softbodyrk4.glsl:241),
# diagonal i <-> 3-i (softbodyrk4.glsl:249), i.e. slots 4..7 pair as 4+3-i.
RECIPROCAL_SLOT: Tuple[int, ...] = (2, 3, 0, 1, 7, 6, 5, 4)


def mask_to_softbody(
    mask: np.ndarray,
    object_index: int,
    ground_pos_offset: Sequence[float],
    starting_ground_vel: Sequence[float],
    spacing: float = constants.IMMEDIATE_NEIGHBOR_DIST,
    lattice_pad: bool = False,
) -> dict:
    """Build one softbody from a boolean occupancy grid (H, W).

    Equivalent to `image_to_softbody` given mask = (pixel != black)
    (reference: src/twoplusone/softbody/mod.rs:123-189).  Returns host-side
    arrays with *object-local* neighbor indices (rebased at pack time).

    `lattice_pad=True` emits a slot for EVERY bbox pixel (non-mask pixels
    become inactive slots parked at 1e9 with no bonds).  The spring graph is
    identical, but neighbor slot s of particle i is then exactly i + d_s for
    a per-object constant d_s in {±1, ±W, ±W±1} — which lets the physics
    read bonded positions by static shifted slices instead of row gathers
    (see ops/forces.spring_forces_shifted; the gathers' 16x lane padding
    traced at ~12 ms/step at reference demo scale).  Costs ~1.27x capacity
    for a disc.
    """
    mask = np.asarray(mask, bool)
    if lattice_pad and mask.any():
        # crop to the tight occupancy bbox: black margins would otherwise
        # become dead lattice slots that every O(N) pass pays for — the
        # reference demo images carry ~21% margin (testimg4/5: 300x300 with
        # a 271x262 live bbox), which round-3 capacity (180224) inherited.
        # World positions are unchanged: the crop origin moves into the
        # ground offset.
        ys_nz, xs_nz = np.nonzero(mask)
        y0, y1 = int(ys_nz.min()), int(ys_nz.max())
        x0, x1 = int(xs_nz.min()), int(xs_nz.max())
        if (y0, x0) != (0, 0) or (y1, x1) != (mask.shape[0] - 1,
                                              mask.shape[1] - 1):
            mask = mask[y0:y1 + 1, x0:x1 + 1]
            ground_pos_offset = (
                float(ground_pos_offset[0]) + x0 * float(spacing),
                float(ground_pos_offset[1]) + y0 * float(spacing),
            )
    h, w = mask.shape
    if lattice_pad:
        n = h * w
        ys, xs = np.divmod(np.arange(n, dtype=np.int32), w)
        flat = mask.reshape(-1)
        neighbors = np.full((n, 8), -1, np.int32)
        for slot, (dx, dy) in enumerate(NEIGHBOR_OFFSETS):
            nx, ny = xs + dx, ys + dy
            in_b = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
            tgt = np.where(in_b, ny * w + nx, 0)
            ok = in_b & flat & flat[tgt]
            neighbors[:, slot] = np.where(ok, tgt, -1)
        far = np.float32(1.0e9)
        pos = np.stack(
            [
                np.where(flat, xs.astype(np.float32) * spacing
                         + np.float32(ground_pos_offset[0]), far),
                np.where(flat, ys.astype(np.float32) * spacing
                         + np.float32(ground_pos_offset[1]), far),
            ],
            axis=-1,
        )
        vel = np.where(
            flat[:, None],
            np.asarray(starting_ground_vel, np.float32)[None, :],
            np.float32(0.0),
        ).astype(np.float32)
        return {
            "pos": pos,
            "vel": vel,
            "neighbors": neighbors,
            "object_index": np.full((n,), object_index, np.int32),
            "active": flat.copy(),
        }
    ys, xs = np.nonzero(mask)
    # Reference iterates pixels row-major and appends in that order
    # (mod.rs:143-161); np.nonzero is row-major too, so particle order and
    # therefore ids match the reference exactly.
    order = np.argsort(ys * w + xs, kind="stable")
    ys, xs = ys[order], xs[order]
    n = xs.shape[0]
    index_of = np.full((h + 2, w + 2), -1, np.int32)  # +1 halo so x±1 never wraps
    index_of[ys + 1, xs + 1] = np.arange(n, dtype=np.int32)

    neighbors = np.full((n, 8), -1, np.int32)
    for slot, (dx, dy) in enumerate(NEIGHBOR_OFFSETS):
        neighbors[:, slot] = index_of[ys + 1 + dy, xs + 1 + dx]

    pos = np.stack(
        [
            xs.astype(np.float32) * spacing + np.float32(ground_pos_offset[0]),
            ys.astype(np.float32) * spacing + np.float32(ground_pos_offset[1]),
        ],
        axis=-1,
    )
    vel = np.tile(np.asarray(starting_ground_vel, np.float32), (n, 1))
    return {
        "pos": pos,
        "vel": vel,
        "neighbors": neighbors,
        "object_index": np.full((n,), object_index, np.int32),
    }


def image_to_softbody(
    path_or_array,
    object_index: int,
    ground_pos_offset: Sequence[float],
    starting_ground_vel: Sequence[float],
    lattice_pad: bool = False,
) -> dict:
    """PNG (or (H,W,3) array) -> softbody; non-black pixels become particles.

    reference: src/twoplusone/softbody/mod.rs:123-161
    """
    if isinstance(path_or_array, np.ndarray):
        rgb = path_or_array
    else:
        from PIL import Image

        rgb = np.asarray(Image.open(path_or_array).convert("RGB"))
    mask = np.any(rgb != 0, axis=-1)
    return mask_to_softbody(
        mask, object_index, ground_pos_offset, starting_ground_vel,
        lattice_pad=lattice_pad,
    )


def disc_mask(radius_px: int) -> np.ndarray:
    """Filled disc occupancy grid — procedural stand-in for the reference's
    blob fixtures (reference: softbodyimages/*.png)."""
    d = 2 * radius_px + 1
    yy, xx = np.mgrid[0:d, 0:d]
    return (xx - radius_px) ** 2 + (yy - radius_px) ** 2 <= radius_px**2


def box_mask(w_px: int, h_px: int) -> np.ndarray:
    return np.ones((h_px, w_px), bool)


def disc_softbody(radius_px, object_index, offset, vel, lattice_pad=False) -> dict:
    return mask_to_softbody(
        disc_mask(radius_px), object_index, offset, vel, lattice_pad=lattice_pad
    )


def radius_for_count(count: int) -> int:
    """Disc radius (px) whose filled-disc particle count is close to `count`."""
    r = max(1, int(round(np.sqrt(count / np.pi))))
    # fine-tune against the exact rasterized count
    best_r, best_err = r, abs(disc_mask(r).sum() - count)
    for rr in range(max(1, r - 2), r + 3):
        err = abs(disc_mask(rr).sum() - count)
        if err < best_err:
            best_r, best_err = rr, err
    return best_r


@dataclasses.dataclass
class SceneBuilder:
    """Accumulates softbodies then packs the device state — the analog of
    `create_world` + `SoftbodyState::{add_particles, push}`
    (reference: src/twoplusone/mod.rs:83-126, softbody/mod.rs:770-778)."""

    bodies: List[dict] = dataclasses.field(default_factory=list)
    object_specs: List[dict] = dataclasses.field(default_factory=list)

    def add(self, body: dict, base_color=None, material_index: int = 0) -> "SceneBuilder":
        offset = sum(b["pos"].shape[0] for b in self.bodies)
        self.bodies.append(body)
        spec = {"offset": offset, "material_index": material_index}
        if base_color is not None:
            spec["base_color"] = base_color
        self.object_specs.append(spec)
        return self

    def num_particles(self) -> int:
        return sum(b["pos"].shape[0] for b in self.bodies)

    def build(self, capacity: Optional[int] = None) -> Tuple[Particles, Objects]:
        pos, vel, nbr, obj, ids, act = concat_particle_arrays(self.bodies)
        particles = pack_particles(
            pos, vel, nbr, obj, particle_id=ids, capacity=capacity, active=act
        )
        objects = make_objects(constants.MAX_OBJECTS, self.object_specs)
        return particles, objects


def two_blob_collision_scene(
    radius_px: int = 135, capacity: Optional[int] = None
) -> Tuple[Particles, Objects]:
    """The reference's hard-coded demo: two ~58k-particle blobs on a collision
    course at 0.14c closing speed (reference: src/twoplusone/mod.rs:86-113 —
    testimg4 at (0,0) v=(0.1,0.1), testimg5 at (1.2,0.8) v=(-0.1,-0.1)).
    Blobs here are procedural discs of matching particle count."""
    sb = SceneBuilder()
    sb.add(disc_softbody(radius_px, 0, (0.0, 0.0), (0.1, 0.1)), base_color=(0.0, 0.0, 1.0))
    sb.add(disc_softbody(radius_px, 1, (1.2, 0.8), (-0.1, -0.1)), base_color=(1.0, 0.0, 0.0))
    return sb.build(capacity)


def single_blob_scene(
    count: int = 4000, capacity: Optional[int] = None, vel=(0.1, 0.1)
) -> Tuple[Particles, Objects]:
    """BASELINE config 1: single softbody blob, flat Minkowski, static camera.
    Default count mirrors testimg3's small/fast case (3 965 particles,
    reference: softbodyimages/testimg3.png)."""
    sb = SceneBuilder()
    sb.add(
        disc_softbody(radius_for_count(count), 0, (0.3, 0.3), vel),
        base_color=(0.0, 0.0, 1.0),
    )
    return sb.build(capacity)
