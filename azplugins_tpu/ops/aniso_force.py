"""Anisotropic pair force driver: forces + torques over the neighbor list.

TPU rebuild of HOOMD's ``AnisoPotentialPair<Evaluator>`` (SURVEY §2.3).
Same dense masked-row-reduction shape as the isotropic driver, extended
with particle orientations in and torques out. Note torque accumulation:
with a full neighbor list each particle sums its *own* torque from every
pair (torque_i for row i; the j-side torque is produced when the pair is
visited from j's row).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.box import Box
from .pair_force import ForceResult, _pair_tables

__all__ = ["aniso_pair_force"]


def aniso_pair_force(
    energy_force_torque_fn,
    position,
    orientation,
    typeid,
    box: Box,
    nbr_idx,
    tables: dict,
    r_cut_table,
    mode: str = "none",
) -> ForceResult:
    N = position.shape[0]
    T = r_cut_table.shape[0]
    sentinel = N
    j = jnp.minimum(nbr_idx, N - 1)
    pos_j = jnp.take(position, j, axis=0)
    dr = box.min_image(position[:, None, :] - pos_j)
    rsq = jnp.sum(dr * dr, axis=-1)
    valid = nbr_idx != sentinel
    t_i = typeid[:, None]
    t_j = jnp.take(typeid, j, axis=0)
    p = _pair_tables(tables, t_i, t_j, T)
    rcut = jnp.take(r_cut_table.reshape(-1), t_i * T + t_j)
    rcutsq = rcut * rcut
    mask = valid & (rsq < rcutsq) & (rcut > 0)

    quat_i = orientation[:, None, :]  # broadcasts against [N, M, ...]
    quat_j = jnp.take(orientation, j, axis=0)
    # sanitize dr for padded slots (evaluator divides by |dr|)
    dr_safe = jnp.where(mask[..., None], dr, jnp.asarray([1.0, 0.0, 0.0]))

    e, f, t_i_vec, _t_j_vec = energy_force_torque_fn(
        dr_safe, quat_i, quat_j, jnp.where(rcut > 0, rcutsq, 4.0), p, mode == "shift"
    )

    mask_f = mask[..., None]
    force = jnp.sum(jnp.where(mask_f, f, 0.0), axis=1)
    energy = 0.5 * jnp.sum(jnp.where(mask, e, 0.0), axis=1)
    torque = jnp.sum(jnp.where(mask_f, t_i_vec, 0.0), axis=1)

    # virial: 0.5 * dr_a * F_b per pair (HOOMD aniso convention)
    fm = jnp.where(mask_f, f, 0.0)
    w = 0.5
    virial = jnp.stack(
        [
            w * jnp.sum(dr[..., 0] * fm[..., 0], axis=1),
            w * jnp.sum(dr[..., 0] * fm[..., 1], axis=1),
            w * jnp.sum(dr[..., 0] * fm[..., 2], axis=1),
            w * jnp.sum(dr[..., 1] * fm[..., 1], axis=1),
            w * jnp.sum(dr[..., 1] * fm[..., 2], axis=1),
            w * jnp.sum(dr[..., 2] * fm[..., 2], axis=1),
        ],
        axis=-1,
    )
    return ForceResult(force=force, energy=energy, virial=virial, torque=torque)
