"""Aloofbodies: rigid relativistic bodies on prescribed worldlines.

The reference planned these as a second body class — "floating/sometimes
moving relativistic bodies --- text/UI" (reference: src/twoplusone/mod.rs:64-65)
— but shipped an empty module (aloofbody/mod.rs is one blank line) and an
unbuilt flat-blue mesh shader (aloofbody/render_norel.glsl:1-31).  This
completes the capability.

An aloofbody is a rigid point template (its shape in its own REST frame, e.g.
rasterized text or a polygon) following a host-prescribed trajectory.  Each
tick the engine samples ground-frame (pos, vel) for its points — applying
Lorentz contraction of the template along the instantaneous velocity — and
injects them into reserved (physics-inactive) particle slots, so they flow
through the same worldline ring buffer and retarded-time renderer as
softbodies: aloof text correctly exhibits retardation, Doppler shading and
occlusion, while never participating in collision or spring dynamics.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import numpy as np

from .. import constants


def text_template(
    text: str, spacing: float = constants.IMMEDIATE_NEIGHBOR_DIST
) -> np.ndarray:
    """Rasterize text into a centered (M, 2) point template (rest frame)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (8 * len(text) + 8, 16), 0)
    ImageDraw.Draw(img).text((2, 2), text, fill=255)
    mask = np.asarray(img) > 127
    ys, xs = np.nonzero(mask)
    pts = np.stack([xs, ys], -1).astype(np.float32) * spacing
    return pts - pts.mean(0, keepdims=True)


def disc_template(radius_px: int, spacing: float = constants.IMMEDIATE_NEIGHBOR_DIST):
    from ..scene import disc_mask

    ys, xs = np.nonzero(disc_mask(radius_px))
    pts = np.stack([xs, ys], -1).astype(np.float32) * spacing
    return pts - pts.mean(0, keepdims=True)


def box_template(w_px: int, h_px: int, spacing: float = constants.IMMEDIATE_NEIGHBOR_DIST):
    ys, xs = np.mgrid[0:h_px, 0:w_px]
    pts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32) * spacing
    return pts - pts.mean(0, keepdims=True)


@dataclasses.dataclass
class AloofBody:
    """Rigid template + trajectory.  `trajectory(t) -> (center(2,), vel(2,))`
    in the ground frame; |vel| must stay < c."""

    template: np.ndarray  # (M, 2) rest-frame points, centered
    trajectory: Callable[[float], Tuple[np.ndarray, np.ndarray]]
    object_index: int = 0

    @property
    def num_points(self) -> int:
        return self.template.shape[0]

    def state_at(self, t) -> Tuple["jnp.ndarray", "jnp.ndarray"]:
        """Ground-frame (pos (M,2), vel (M,2)) at coordinate time t, with the
        template Lorentz-contracted along the motion by 1/gamma.

        Written in jnp and branch-free so it TRACES: with a traced `t` (and
        a jnp-compatible trajectory) the whole injection runs inside the
        engine's fused frame program — no per-tick host round trip."""
        import jax
        import jax.numpy as jnp

        center, vel = self.trajectory(t)
        center = jnp.asarray(center, jnp.float32)
        vel = jnp.asarray(vel, jnp.float32)
        v2 = vel @ vel
        if not isinstance(v2, jax.core.Tracer) and float(v2) >= 1.0:
            raise ValueError(f"aloofbody speed {float(v2) ** 0.5:.4f} >= c")
        inv_gamma = jnp.sqrt(jnp.clip(1.0 - v2, 1e-12, 1.0))
        speed = jnp.sqrt(jnp.maximum(v2, 1e-24))
        v_hat = jnp.where(v2 > 1e-12, vel / speed, jnp.zeros_like(vel))
        tmpl = jnp.asarray(self.template, jnp.float32)
        par = (tmpl @ v_hat)[:, None] * v_hat[None, :]
        pts = (tmpl - par) + par * inv_gamma  # == tmpl when v ~ 0
        pos = pts + center[None, :]
        return pos, jnp.broadcast_to(vel, pos.shape)


def linear_trajectory(p0: Sequence[float], vel: Sequence[float]):
    """Constant-velocity worldline."""
    p0 = np.asarray(p0, np.float32)
    v = np.asarray(vel, np.float32)

    def traj(t: float):
        return p0 + v * t, v

    return traj


def circular_trajectory(center: Sequence[float], radius: float, speed: float):
    """Uniform circular motion (|v| = speed < c); jnp ops so it traces."""
    import jax.numpy as jnp

    c = np.asarray(center, np.float32)
    omega = speed / radius

    def traj(t):
        a = omega * t
        pos = c + radius * jnp.stack([jnp.cos(a), jnp.sin(a)])
        vel = speed * jnp.stack([-jnp.sin(a), jnp.cos(a)])
        return pos, vel

    return traj
