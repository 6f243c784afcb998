"""Pallas TPU kernel for the dense-stencil pair force (the hot op).

Replaces the XLA scan in ops/dense.dense_pair_force for the hot case
(want="force", maskless sentinel path, single particle type): one Mosaic
kernel computes BOTH Newton sides of every pair in a single pass over the
half-stencil J blocks, with accumulators resident in VMEM.

Layout is chosen for the VPU's (8 sublanes, 128 lanes) tiles:

  * arrays are **cell-minor** ``[rows, C]`` — lanes run over cells, so any
    cap (i-rows) and any J (stencil rows) give full lane utilization with
    zero padding waste (C is padded to a multiple of the 128-lane block
    once, with far-sentinel cells that interact with nothing);
  * the kernel loops over i-slots; each iteration evaluates one i-row
    against a ``[J_seg, CB]`` j-block — perfectly regular tiles, no
    gathers, no masks except the cutoff compare (empty slots sit at far
    sentinel coordinates) and the self-cell triangle (Newton: each
    unordered pair evaluated once);
  * the J axis is split into segments on a second grid dimension so the
    working set fits VMEM for any cell capacity; the i-side output block
    is revisited across segments and accumulated in place.

The J axis is the flattened half stencil: rows [0, cap) are the self
cell (strict upper triangle), rows [k*cap, (k+1)*cap) the k-th positive
offset's cells, pre-shifted by the periodic lattice vector (dense.py
``_axis_shift_tables``), so ``xi - jx`` is the true separation with no
minimum-image math (reference force loop: HOOMD PotentialPair evaluator
protocol, see /root/reference/src/PairEvaluator.h:67-140).

The j-side partial sums come back in the rolled frame ``[J, C]``; the
caller un-rolls them with the inverse stencil slices (cheap XLA copies).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_pair_force_kernel", "has_tpu", "pallas_mode"]

_SENTINEL = 1.0e18
# j-subtile height of the pair microkernel (rows per register-resident
# tile). 16 measured ~35% faster than 8 at 64k (fewer per-subtile i-row
# reduce/RMW issues); 32 regressed (register spill). Falls back to 8 when
# the J segment is not a multiple (see _kernel).
_SUBTILE_H = int(__import__("os").environ.get("AZTPU_SUBTILE_H", "16"))
# scoped VMEM budget for choosing the J-segment size (the hardware limit
# is 16M; leave headroom for Mosaic's own temporaries)
_VMEM_BUDGET = 10 * 1024 * 1024


def approx_recip(x):
    """Fast reciprocal: hardware approximate + one Newton step.

    The VPU's exact f32 divide is the single most expensive op in the LJ
    evaluator (measured ~45%% of the pair kernel); the approximate
    reciprocal instruction (~2^-12) refined once reaches ~2^-24 relative —
    the same order as the exact divide's rounding. Only valid inside a
    compiled Mosaic kernel; interpret mode / XLA paths use exact division.
    """
    r0 = pl.reciprocal(x, approx=True)
    return r0 * (2.0 - x * r0)


@functools.cache
def has_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pallas_mode() -> str | None:
    """Kernel dispatch policy: "compiled" on TPU, "interpret" when forced
    via AZTPU_PALLAS=1 off-TPU (tests), None to use the XLA path."""
    env = os.environ.get("AZTPU_PALLAS", "auto")
    if env == "0":
        return None
    if has_tpu():
        return "compiled"
    if env == "1":
        return "interpret"
    return None


def _kernel(eval_f_divr, cap, Jseg, CB, n_sc, sc_ref,
            xi_ref, yi_ref, zi_ref, jx_ref, jy_ref, jz_ref,
            fxi_ref, fyi_ref, fzi_ref, fxj_ref, fyj_ref, fzj_ref,
            sxi_ref, syi_ref, szi_ref):
    """j-subtile-outer / i-row-inner pair microkernel.

    The v2 formulation (whole [Jseg, CB] j-block per i-row) re-read the
    three j planes and read-modified-wrote the three j accumulators from
    VMEM on every one of the `cap` i-rows -- ~45 bytes of VMEM traffic
    per pair, measured bandwidth-bound at ~1.35 TB/s with the arithmetic
    mostly idle (a trivial evaluator ran only 19% faster than the full
    one). Here the outer loop walks (8, CB) j-subtiles: the j coordinates
    and the Newton j-side accumulators live in vector registers across
    the fully unrolled i-row loop, leaving ~2 bytes/pair of VMEM traffic
    (the i-row partial-sum updates), which puts the VPU arithmetic back
    in charge.
    """
    svals = [sc_ref[k, 0] for k in range(n_sc)]
    kseg = pl.program_id(1)

    # i-side partial accumulators for this (block, segment)
    sxi_ref[:] = jnp.zeros((cap, CB), jnp.float32)
    syi_ref[:] = jnp.zeros((cap, CB), jnp.float32)
    szi_ref[:] = jnp.zeros((cap, CB), jnp.float32)

    xi = xi_ref[:]
    yi = yi_ref[:]
    zi = zi_ref[:]

    H = _SUBTILE_H if (Jseg % _SUBTILE_H == 0) else 8
    if Jseg % H != 0:
        # flooring NT here would silently skip the tail j-rows (missed
        # pair forces) and leave their output rows uninitialized; callers
        # must guarantee cap (and hence Jseg, a multiple of cap) is a
        # multiple of 8 or take the XLA path
        raise ValueError(
            f"pallas pair kernel needs Jseg divisible by the subtile "
            f"height (Jseg={Jseg}, H={H}); use a cell capacity that is a "
            f"multiple of 8"
        )
    NT = Jseg // H

    def make_jt_body(with_tri):
        def jt_body(jt, _):
            j0 = pl.multiple_of(jt * H, H)
            jx_t = jx_ref[pl.ds(j0, H), :]
            jy_t = jy_ref[pl.ds(j0, H), :]
            jz_t = jz_ref[pl.ds(j0, H), :]
            if with_tri:
                # self-cell rows (global J row < cap): Newton strict
                # upper triangle via one compare folded into rsq. Rows of
                # this subtile past the self cell (jrow >= cap) are never
                # masked automatically: i indices s < cap <= jrow
                jrow = j0 + jax.lax.broadcasted_iota(
                    jnp.int32, (H, CB), 0
                )
            fjx = jnp.zeros((H, CB), jnp.float32)
            fjy = jnp.zeros((H, CB), jnp.float32)
            fjz = jnp.zeros((H, CB), jnp.float32)
            for s in range(cap):
                dx = xi[s, :][None, :] - jx_t
                dy = yi[s, :][None, :] - jy_t
                dz = zi[s, :][None, :] - jz_t
                rsq = dx * dx + dy * dy + dz * dz
                if with_tri:
                    rsq = jnp.where(jrow > s, rsq, jnp.float32(1.0e30))
                f = eval_f_divr(rsq, svals)
                fx = f * dx
                fy = f * dy
                fz = f * dz
                fjx = fjx - fx
                fjy = fjy - fy
                fjz = fjz - fz
                sxi_ref[s, :] += jnp.sum(fx, axis=0)
                syi_ref[s, :] += jnp.sum(fy, axis=0)
                szi_ref[s, :] += jnp.sum(fz, axis=0)
            fxj_ref[pl.ds(j0, H), :] = fjx
            fyj_ref[pl.ds(j0, H), :] = fjy
            fzj_ref[pl.ds(j0, H), :] = fjz
            return 0

        return jt_body

    # the self cell occupies global J rows [0, cap): the first
    # ceil(cap/H) subtiles of segment 0 carry the triangle compare, all
    # others skip it (a partial boundary subtile is safe — see jt_body)
    n_tri = -(-cap // H)

    @pl.when(kseg == 0)
    def _():
        jax.lax.fori_loop(0, n_tri, make_jt_body(True), 0)
        jax.lax.fori_loop(n_tri, NT, make_jt_body(False), 0)

    @pl.when(kseg > 0)
    def _():
        jax.lax.fori_loop(0, NT, make_jt_body(False), 0)

    # merge this segment's i-side partials; the fi block is revisited
    # across the (innermost) segment grid dimension
    @pl.when(kseg == 0)
    def _():
        fxi_ref[:] = sxi_ref[:]
        fyi_ref[:] = syi_ref[:]
        fzi_ref[:] = szi_ref[:]

    @pl.when(kseg > 0)
    def _():
        fxi_ref[:] = fxi_ref[:] + sxi_ref[:]
        fyi_ref[:] = fyi_ref[:] + syi_ref[:]
        fzi_ref[:] = fzi_ref[:] + szi_ref[:]


def _choose_jseg(J, cap, CB):
    """Largest J segment (multiple of cap) whose working set fits VMEM.

    Per-block VMEM ~ 4*CB*(2*3*(Jseg+cap) double-buffered io + ~8*Jseg
    temporaries + 3*cap scratch).
    """
    n_seg = J // cap
    for parts in range(1, n_seg + 1):
        if n_seg % parts:
            continue
        jseg = J // parts
        need = 4 * CB * (6 * (jseg + cap) + 8 * jseg + 3 * cap)
        if need <= _VMEM_BUDGET:
            return jseg
    return cap


def stencil_pair_force_kernel(
    eval_f_divr,
    scalars,            # sequence of f32 scalars (potential parameters)
    xi_t, yi_t, zi_t,   # [cap, C] f32, cell-minor i coordinates
    jx_t, jy_t, jz_t,   # [J, C] f32, flattened pre-shifted half stencil
    *,
    cell_block: int = 128,
    interpret: bool = False,
):
    """Run the stencil pair kernel. Returns (fi, fj) as cell-minor arrays.

    ``eval_f_divr(rsq, svals) -> force/r`` must be a pure elementwise jnp
    function of rsq and the scalar parameter list (cutoff included: it
    must return 0 beyond r_cut — sentinel coordinates give huge rsq, so
    no validity masks are needed). Parameters arrive through SMEM so the
    kernel captures no traced constants.
    """
    sc = jnp.stack(
        [jnp.asarray(s, jnp.float32).reshape(()) for s in scalars]
    ).reshape(-1, 1)
    n_sc = sc.shape[0]
    cap, C = xi_t.shape
    J = jx_t.shape[0]
    CB = int(cell_block)
    Cp = ((C + CB - 1) // CB) * CB
    if Cp != C:
        # pad cells with far sentinels (opposite signs so pad-pad and
        # pad-real distances are all huge): padded cells interact with
        # nothing and their outputs are sliced off
        def padi(a, fill):
            return jnp.pad(a, ((0, 0), (0, Cp - C)), constant_values=fill)

        big = jnp.float32(_SENTINEL)
        xi_t, yi_t, zi_t = padi(xi_t, big), padi(yi_t, 0.0), padi(zi_t, 0.0)
        jx_t, jy_t, jz_t = padi(jx_t, -big), padi(jy_t, 0.0), padi(jz_t, 0.0)

    Jseg = _choose_jseg(J, cap, CB)
    n_jseg = J // Jseg
    grid = (Cp // CB, n_jseg)

    def ispec():
        return pl.BlockSpec((cap, CB), lambda i, k: (0, i), memory_space=pltpu.VMEM)

    def jspec():
        return pl.BlockSpec((Jseg, CB), lambda i, k: (k, i), memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, eval_f_divr, cap, Jseg, CB, n_sc)
    scspec = pl.BlockSpec((n_sc, 1), lambda i, k: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[scspec] + [ispec()] * 3 + [jspec()] * 3,
        out_specs=[ispec()] * 3 + [jspec()] * 3,
        out_shape=(
            [jax.ShapeDtypeStruct((cap, Cp), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((J, Cp), jnp.float32)] * 3
        ),
        scratch_shapes=[pltpu.VMEM((cap, CB), jnp.float32)] * 3,
        interpret=interpret,
    )(sc, xi_t, yi_t, zi_t, jx_t, jy_t, jz_t)
    fxi, fyi, fzi, fxj, fyj, fzj = out
    if Cp != C:
        fxi, fyi, fzi = fxi[:, :C], fyi[:, :C], fzi[:, :C]
        fxj, fyj, fzj = fxj[:, :C], fyj[:, :C], fzj[:, :C]
    return (fxi, fyi, fzi), (fxj, fyj, fzj)
