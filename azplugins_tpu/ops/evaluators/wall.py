"""Wall potential evaluators (distance-to-plane forms).

Rebuild of SURVEY §2.9 (legacy, required by the north star):
  * LJ 9-3 integrated point/half-space wall:
    /root/reference/src/WallEvaluatorLJ93.h:110-136
    lj1 = (2/15) eps sigma^9, lj2 = eps sigma^3
  * Colloid (sphere/half-space integrated LJ):
    /root/reference/src/WallEvaluatorColloid.h:114-151
    C1 = A sigma^6 / 7560, C2 = A / 6; needs the particle radius a = d/2

Protocol: ``(rsq, rcutsq, params, extra...) -> (energy, force_div_r)`` where
r is the perpendicular distance to the wall plane. The external-force driver
masks r >= rcut and applies the force along the wall normal.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

__all__ = ["WallPotentialDef", "WALL_POTENTIALS", "lj93", "colloid_wall"]


@dataclasses.dataclass(frozen=True)
class WallPotentialDef:
    name: str
    spec: dict
    precompute: Callable[[dict], dict]
    energy_force: Callable  # (rsq, rcutsq, params, diameter) -> (e, f_div_r)


def _lj93_precompute(t: dict) -> dict:
    sigma_3 = t["sigma"] ** 3
    return {
        "lj1": (2.0 / 15.0) * t["epsilon"] * sigma_3**3,
        "lj2": t["epsilon"] * sigma_3,
    }


def lj93(rsq, rcutsq, p, diameter=None):
    r2inv = 1.0 / rsq
    r3inv = r2inv * jnp.sqrt(r2inv)
    r6inv = r3inv * r3inv
    f = r2inv * r3inv * (9.0 * p["lj1"] * r6inv - 3.0 * p["lj2"])
    e = r3inv * (p["lj1"] * r6inv - p["lj2"])
    active = p["lj1"] != 0
    return jnp.where(active, e, 0.0), jnp.where(active, f, 0.0)


def _colloid_wall_precompute(t: dict) -> dict:
    sigma_6 = t["sigma"] ** 6
    return {"C1": t["A"] * sigma_6 / 7560.0, "C2": t["A"] / 6.0}


def colloid_wall(rsq, rcutsq, p, diameter):
    a = 0.5 * diameter
    r = jnp.sqrt(rsq)
    arinv = a / r
    rma = r - a
    rma = jnp.where(rma == 0, 1e-20, rma)
    rma_inv = 1.0 / rma
    rpa_inv = 1.0 / (r + a)
    r2ma2_inv = rma_inv * rpa_inv
    rma_inv2 = rma_inv * rma_inv
    rma_inv6 = rma_inv2 * rma_inv2 * rma_inv2
    rpa_inv2 = rpa_inv * rpa_inv
    rpa_inv6 = rpa_inv2 * rpa_inv2 * rpa_inv2

    arinv8 = 8.0 * arinv
    f = 6.0 * p["C1"] * (
        (arinv8 - 1.0) * rma_inv2 * rma_inv6 + (arinv8 + 1.0) * rpa_inv2 * rpa_inv6
    )
    f = f - p["C2"] * (4.0 * a * a * arinv * r2ma2_inv * r2ma2_inv)

    a7 = 7.0 * a
    e = p["C1"] * ((a7 - r) * rma_inv * rma_inv6 + (a7 + r) * rpa_inv * rpa_inv6)
    ratio = rpa_inv / rma_inv  # = (r-a)/(r+a)
    ratio = jnp.where(ratio > 0, ratio, 1.0)
    e = e - p["C2"] * (2.0 * a * r * r2ma2_inv + jnp.log(ratio))

    active = (p["C2"] != 0) & (a > 0)
    return jnp.where(active, e, 0.0), jnp.where(active, f, 0.0)


WALL_POTENTIALS = {
    "LJ93": WallPotentialDef(
        name="LJ93",
        spec={"epsilon": float, "sigma": float},
        precompute=_lj93_precompute,
        energy_force=lj93,
    ),
    "Colloid": WallPotentialDef(
        name="Colloid",
        spec={"A": float, "sigma": float},
        precompute=_colloid_wall_precompute,
        energy_force=colloid_wall,
    ),
}
