"""spacetime_tpu — a TPU-native (JAX/XLA/Pallas) 2+1D special-relativistic
softbody engine with retarded-time raytracing.

A ground-up rebuild of the capabilities of `ccs-cs1l-f24/spacetime-raytracer`
(Rust + Vulkan compute), designed TPU-first: SoA pytree state, one jitted
step/render loop, XLA sort-based collision binning, an HBM worldline ring
buffer, and a fused Pallas past-light-cone raytrace kernel.
"""

from . import constants, relativity, scene, state
from .constants import DEFAULT_PARAMS, PhysicsParams
from .state import Objects, Particles

__version__ = "0.1.0"
