"""Physics constants for the 2+1D special-relativistic softbody engine.

Mirrors the reference's single constants module (reference:
src/twoplusone/mod.rs:12-38) — c = 1 units, distances in lightseconds,
times in seconds.

Invariant (documented in the reference): the timestep ``H`` must be greater
than ``DIAGONAL_NEIGHBOR_DIST`` (the maximum radius at which a particle can
influence another within one integrator invocation) so that the effective
speed of sound stays below c.
"""

from __future__ import annotations

import dataclasses
import math

# Speed of light (c = 1 units).  reference: src/twoplusone/relativity.glsl:1
C: float = 1.0
C2: float = C * C

# Integrator timestep, in seconds.  reference: src/twoplusone/mod.rs:16
H: float = 0.005
# Hooke spring constant.  reference: src/twoplusone/mod.rs:17
K: float = 15000.0
# Rest length between 4-connected lattice neighbors (lightseconds).
# reference: src/twoplusone/mod.rs:18
IMMEDIATE_NEIGHBOR_DIST: float = 0.0035
# Rest length between diagonal lattice neighbors = IMMEDIATE * sqrt(2).
# reference: src/twoplusone/mod.rs:19
DIAGONAL_NEIGHBOR_DIST: float = IMMEDIATE_NEIGHBOR_DIST * math.sqrt(2.0)
# Collision grid cell edge (lightseconds).  reference: src/twoplusone/mod.rs:20
GRID_RESOLUTION: float = 0.005
# Max distance at which particle-particle repulsion acts.
# reference: src/twoplusone/mod.rs:21
COLLISION_DISTANCE: float = 0.002
# Constant-magnitude repulsion force applied inside COLLISION_DISTANCE.
# reference: src/twoplusone/mod.rs:22
COLLISION_REPULSION_COEFFICIENT: float = 100.0
# Bonds longer than this break (symmetrically).  reference: src/twoplusone/mod.rs:23
BOND_BREAK_THRESHOLD: float = 0.01

# Capacity limits.  reference: src/twoplusone/softbody/mod.rs:225-226
MAX_PARTICLES: int = 1 << 20
MAX_OBJECTS: int = 1024

# Velocity clamp applied after the final integrator combine: |v| is clamped
# to 0.9999 c.  reference: src/twoplusone/softbody/softbodyrk4.glsl:227
MAX_SPEED: float = 0.9999

# Number of bond slots per particle: 4 immediate (left/up/right/down) then
# 4 diagonal (tl/tr/bl/br).  reference: src/twoplusone/common.glsl:4-6
NUM_NEIGHBORS: int = 8


@dataclasses.dataclass(frozen=True)
class PhysicsParams:
    """Runtime-overridable physics parameters.

    The analog of the reference's RK4 push constants
    (reference: src/twoplusone/softbody/softbodyrk4.glsl:58-78).
    """

    h: float = H
    k: float = K
    immediate_neighbor_dist: float = IMMEDIATE_NEIGHBOR_DIST
    diagonal_neighbor_dist: float = DIAGONAL_NEIGHBOR_DIST
    grid_resolution: float = GRID_RESOLUTION
    collision_distance: float = COLLISION_DISTANCE
    collision_repulsion_coefficient: float = COLLISION_REPULSION_COEFFICIENT
    bond_break_threshold: float = BOND_BREAK_THRESHOLD
    max_speed: float = MAX_SPEED

    def rest_lengths(self):
        """Rest length per neighbor slot (8,): 4 immediate then 4 diagonal."""
        import numpy as np

        return np.array(
            [self.immediate_neighbor_dist] * 4 + [self.diagonal_neighbor_dist] * 4,
            dtype=np.float32,
        )


DEFAULT_PARAMS = PhysicsParams()
