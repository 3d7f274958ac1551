"""Camera model.

The reference camera is a pan (ground position) + zoom (lightseconds per
screen along the larger window axis) driven by WASD/zx keys
(reference: src/twoplusone/mod.rs:56-80, src/keyboard.rs:3-45).  This engine
adds a ground-frame velocity so the retarded-time renderer can model a
*moving/accelerated observer* (BASELINE.json config 4: Rindler camera sweep)
with aberration + observer Doppler.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    pos: jax.Array  # (2,) f32 — ground-frame position, lightseconds
    zoom: jax.Array  # () f32 — lightseconds per screen (larger axis)
    vel: jax.Array  # (2,) f32 — ground-frame velocity (for aberration/Doppler)

    @staticmethod
    def create(pos=(0.5, 0.5), zoom=1.0, vel=(0.0, 0.0)) -> "Camera":
        """Defaults mirror create_world (reference: twoplusone/mod.rs:120-121)."""
        return Camera(
            pos=jnp.asarray(pos, jnp.float32),
            zoom=jnp.asarray(zoom, jnp.float32),
            vel=jnp.asarray(vel, jnp.float32),
        )


@dataclasses.dataclass
class CameraController:
    """Host-side pan/zoom controller — `World::update_camera`
    (reference: src/twoplusone/mod.rs:71-80): SPEED=0.6 ls/s pan,
    ZOOM_FACTOR=1.0 per second."""

    pan_speed: float = 0.6
    zoom_factor: float = 1.0

    def update(self, cam: Camera, keys, dt: float) -> Camera:
        """`keys` has booleans left/right/up/down/z/x (reference: keyboard.rs)."""
        dx = (keys.get("right", False) - keys.get("left", False)) * dt * self.pan_speed
        dy = (keys.get("down", False) - keys.get("up", False)) * dt * self.pan_speed
        dz = (keys.get("x", False) - keys.get("z", False)) * dt * self.zoom_factor
        return Camera(
            pos=cam.pos + jnp.asarray([dx, dy], jnp.float32),
            zoom=jnp.maximum(cam.zoom + dz, 1e-3),
            vel=cam.vel,
        )


def stack_cameras(cams) -> Camera:
    """Stack a sequence of Cameras into one batched Camera pytree (leaves
    gain a leading B axis) for `raytrace.render_views`."""
    cams = list(cams)
    if not cams:
        raise ValueError("stack_cameras needs at least one camera")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def pixel_centers(width: int, height: int, cam: Camera) -> jax.Array:
    """Ground-frame positions of pixel centers, (H, W, 2).

    Matches the reference's NDC mapping: screen = (2/zoom) * (pos - cam) with
    aspect correction by the larger axis
    (reference: src/twoplusone/softbody/point_render_nr.rs:60-75 push
    constants, points_norel.glsl:28)."""
    larger = max(width, height)
    scale = cam.zoom / larger  # lightseconds per pixel
    xs = (jnp.arange(width, dtype=jnp.float32) - (width - 1) / 2.0) * scale
    ys = (jnp.arange(height, dtype=jnp.float32) - (height - 1) / 2.0) * scale
    xx, yy = jnp.meshgrid(xs, ys)
    return jnp.stack([xx + cam.pos[0], yy + cam.pos[1]], axis=-1)


def world_to_pixel(pos: jax.Array, width: int, height: int, cam: Camera) -> jax.Array:
    """Ground-frame (..., 2) -> fractional pixel coords (..., 2) [x, y]."""
    larger = max(width, height)
    scale = larger / cam.zoom  # pixels per lightsecond
    rel = (pos - cam.pos) * scale
    return rel + jnp.asarray([(width - 1) / 2.0, (height - 1) / 2.0], jnp.float32)
