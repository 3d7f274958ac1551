"""Physical diagnostics: relativistic totals over the particle system.

The reference exposes only GPU stage timings (querybank.rs); these are the
physics-side observables — the quantities its relativity library defines
per-particle (reference: src/twoplusone/relativity.glsl:10-27) summed over
the system, useful for regression-testing conservation and for instrumenting
simulations (momentum drift, heating).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import relativity
from ..state import Particles


class Totals(NamedTuple):
    momentum: jax.Array  # (2,) total relativistic momentum
    energy: jax.Array  # () total relativistic energy (sum gamma m0 c^2)
    kinetic: jax.Array  # () total relativistic kinetic energy
    rest_mass: jax.Array  # () total rest mass
    max_speed: jax.Array  # () max |v| over active particles
    n_bonds: jax.Array  # () live (directed) bond count


@jax.jit
def totals(particles: Particles) -> Totals:
    act = particles.active
    vel = jnp.where(act[:, None], particles.vel, 0.0)
    m0 = jnp.where(act, particles.rest_mass, 0.0)
    p = relativity.r_momentum(vel, m0)
    e = relativity.r_energy(vel, m0)
    ke = relativity.r_ke(vel, m0)
    speed = jnp.linalg.norm(vel, axis=-1)
    return Totals(
        momentum=jnp.sum(p, axis=0),
        energy=jnp.sum(e),
        kinetic=jnp.sum(ke),
        rest_mass=jnp.sum(m0),
        max_speed=jnp.max(jnp.where(act, speed, 0.0)),
        n_bonds=jnp.sum((particles.neighbors >= 0) & act[:, None]),
    )
