"""Anisotropic pair evaluators: force + energy + torques.

Rebuild of SURVEY §2.3. Protocol:
``(dr, quat_i, quat_j, rcutsq, params) -> (energy, force, torque_i, torque_j)``
with ``dr = r_i - r_j`` (minimum image), applied elementwise over the padded
neighbor array by ops/aniso_force.py.

TwoPatchMorse physics re-derived from
/root/reference/src/AnisoPairEvaluatorTwoPatchMorse.h:127-216: Morse radial
well modulated by patch alignment Omega(gamma) = 1/(1+exp(-omega(gamma^2 -
alpha))) for each particle, gamma = rhat . nhat, patch direction = body x
axis rotated by the particle quaternion; analytic torques from dU/dgamma.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from ...utils.quaternion import rotate_x

__all__ = ["AnisoPairPotentialDef", "ANISO_PAIR_POTENTIALS", "two_patch_morse"]


@dataclasses.dataclass(frozen=True)
class AnisoPairPotentialDef:
    name: str
    spec: dict
    precompute: Callable[[dict], dict]
    # (dr, quat_i, quat_j, rcutsq, params, energy_shift) ->
    #     (energy, force[...,3], torque_i[...,3], torque_j[...,3])
    energy_force_torque: Callable


def _tpm_precompute(t: dict) -> dict:
    return {
        "M_d": t["M_d"],
        "M_rinv": 1.0 / t["M_r"],
        "r_eq": t["r_eq"],
        "omega": t["omega"],
        "alpha": t["alpha"],
        "repulsion": t["repulsion"],
    }


def _morse(r, p):
    """Morse energy and radial derivative, with optional flat bottom."""
    morse_exp = jnp.exp(-(r - p["r_eq"]) * p["M_rinv"])
    one_minus = 1.0 - morse_exp
    U = p["M_d"] * (one_minus * one_minus - 1.0)
    dU_dr = 2.0 * p["M_d"] * p["M_rinv"] * morse_exp * one_minus
    # flat bottom: purely attractive branch clamps U=-M_d, dU=0 for r<r_eq
    flat = (r < p["r_eq"]) & jnp.logical_not(p["repulsion"].astype(bool))
    U = jnp.where(flat, -p["M_d"], U)
    dU_dr = jnp.where(flat, 0.0, dU_dr)
    return U, dU_dr


def two_patch_morse(dr, quat_i, quat_j, rcutsq, p, energy_shift: bool):
    rsq = jnp.sum(dr * dr, axis=-1)
    rsq_safe = jnp.where(rsq > 0, rsq, 1.0)
    rinv = 1.0 / jnp.sqrt(rsq_safe)
    r = rsq_safe * rinv  # = sqrt(rsq)
    unitr = dr * rinv[..., None]

    n_i = rotate_x(quat_i)
    n_j = rotate_x(quat_j)

    U, dU_dr_radial = _morse(r, p)

    def omega_terms(gamma):
        g_exp = jnp.exp(-p["omega"] * (gamma * gamma - p["alpha"]))
        Om = 1.0 / (1.0 + g_exp)
        dOm_dg = 2.0 * p["omega"] * gamma * g_exp * Om * Om
        return Om, dOm_dg

    gamma_i = jnp.sum(unitr * n_i, axis=-1)
    gamma_j = jnp.sum(unitr * n_j, axis=-1)
    Om_i, dOmi = omega_terms(gamma_i)
    Om_j, dOmj = omega_terms(gamma_j)

    e = U * Om_i * Om_j
    dU_dr = dU_dr_radial * Om_i * Om_j
    dU_dgi = dOmi * U * Om_j
    dU_dgj = dOmj * U * Om_i

    # n_perp = -rhat x (rhat x n) is the in-plane component driving rotation
    n_i_perp = jnp.cross(-unitr, jnp.cross(unitr, n_i))
    n_j_perp = jnp.cross(-unitr, jnp.cross(unitr, n_j))

    force = (
        -dU_dr[..., None] * unitr
        - rinv[..., None] * (dU_dgi[..., None] * n_i_perp + dU_dgj[..., None] * n_j_perp)
    )
    torque_i = dU_dgi[..., None] * jnp.cross(unitr, n_i)
    torque_j = dU_dgj[..., None] * jnp.cross(unitr, n_j)

    if energy_shift:
        # shift uses the raw Morse form at rcut (no flat-bottom clamp),
        # matching /root/reference/src/AnisoPairEvaluatorTwoPatchMorse.h:194-207
        rcut = jnp.sqrt(rcutsq)
        exp_cut = jnp.exp(-(rcut - p["r_eq"]) * p["M_rinv"])
        one_minus_cut = 1.0 - exp_cut
        U_cut = p["M_d"] * (one_minus_cut * one_minus_cut - 1.0)
        e = e - U_cut * Om_i * Om_j

    return e, force, torque_i, torque_j


ANISO_PAIR_POTENTIALS = {
    "TwoPatchMorse": AnisoPairPotentialDef(
        name="TwoPatchMorse",
        spec={
            "M_d": float,
            "M_r": float,
            "r_eq": float,
            "omega": float,
            "alpha": float,
            "repulsion": bool,
        },
        precompute=_tpm_precompute,
        energy_force_torque=two_patch_morse,
    ),
}
