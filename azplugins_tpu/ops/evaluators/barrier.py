"""Harmonic barrier evaluators (one-sided harmonic restraints).

Rebuild of SURVEY §2.5:
  * planar: pushes particles with y > H + offset back down
    (/root/reference/src/PlanarBarrierEvaluator.h:36-48)
  * spherical: pushes particles with r > R + offset inward
    (/root/reference/src/SphericalBarrierEvaluator.h:36-51)

Protocol: ``(pos, location, k, offset) -> (energy, force[...,3])`` evaluated
per particle; ``location`` is the variant value at the current timestep.
Each evaluator also provides a host-side ``valid(location, box)`` check
mirroring the reference's per-step validation.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

__all__ = ["BarrierDef", "BARRIERS", "planar_barrier", "spherical_barrier"]


@dataclasses.dataclass(frozen=True)
class BarrierDef:
    name: str
    energy_force: Callable  # (pos, location, k, offset) -> (e, force)
    valid: Callable  # (location_value, box) -> bool (host-side)


def planar_barrier(pos, H, k, offset):
    dy = pos[..., 1] - (H + offset)
    on = dy > 0.0
    fy = jnp.where(on, -k * dy, 0.0)
    e = jnp.where(on, 0.5 * k * dy * dy, 0.0)
    zeros = jnp.zeros_like(fy)
    force = jnp.stack([zeros, fy, zeros], axis=-1)
    return e, force


def _planar_valid(H, box) -> bool:
    lo = np.asarray(box.lo)
    hi = np.asarray(box.hi)
    return bool(lo[1] <= H < hi[1])


def spherical_barrier(pos, R, k, offset):
    r = jnp.sqrt(jnp.sum(pos * pos, axis=-1))
    dr = r - (R + offset)
    on = dr > 0.0
    k_dr = k * dr
    r_safe = jnp.where(r > 0, r, 1.0)
    force = jnp.where(on[..., None], -(k_dr / r_safe)[..., None] * pos, 0.0)
    e = jnp.where(on, 0.5 * k_dr * dr, 0.0)
    return e, force


def _spherical_valid(R, box) -> bool:
    npd = np.asarray(box.nearest_plane_distance())
    return bool(R >= 0.0 and np.all(npd >= 2.0 * R))


BARRIERS = {
    "Planar": BarrierDef("Planar", planar_barrier, _planar_valid),
    "Spherical": BarrierDef("Spherical", spherical_barrier, _spherical_valid),
}
