"""Pallas TPU kernel for the dense-stencil pair force (the hot op).

Replaces the XLA scan in ops/dense.dense_pair_force for the hot case
(maskless sentinel path, T <= 4 particle types): one Mosaic kernel
computes BOTH Newton sides of every pair in a single pass over the
half-stencil J blocks, with accumulators resident in VMEM. Optional
energy + virial outputs serve the observable pull path (``want="all"``).

Layout is chosen for the VPU's (8 sublanes, 128 lanes) tiles:

  * arrays are **cell-minor** ``[rows, C]`` — lanes run over cells, so any
    cap (i-rows) and any J (stencil rows) give full lane utilization with
    zero padding waste (C is padded to a multiple of the lane block
    once, with far-sentinel cells that interact with nothing);
  * the kernel loops over i-slots; each iteration evaluates one i-row
    against a ``[H, CB]`` j-subtile — perfectly regular tiles, no
    gathers, no masks except the cutoff compare (empty slots sit at far
    sentinel coordinates) and the self-cell triangle (Newton: each
    unordered pair evaluated once);
  * the J axis is split into segments on a second grid dimension so the
    working set fits VMEM for any cell capacity; the i-side output block
    is revisited across segments and accumulated in place.

The J axis is the flattened half stencil: each offset's cells occupy a
``cap_pad``-row block (cap rounded up to the subtile height, tail rows at
far sentinels) — block 0 the self cell (strict upper triangle), block k
the k-th positive offset's cells, pre-shifted by the periodic lattice
vector (dense.py ``_axis_shift_tables``), so ``xi - jx`` is the true
separation with no minimum-image math (reference force loop: HOOMD
PotentialPair evaluator protocol, see
/root/reference/src/PairEvaluator.h:67-140).

Work skipping rides the cell-occupancy structure: slots fill
front-to-back within each cell (the rebin gather), so per lane block the
i-row loop runs only to the block's max occupancy, and a j-subtile whose
rows all exceed its offset's max neighbor occupancy is skipped outright
(its output rows are written as zeros). Both bounds come from per-block
SMEM scalars computed from the current cell counts — measured
~(48/56)^2 = 0.73x of the evaluations at the 64k bench shapes.

**Extra planes** generalize the evaluator inputs: per-i-row and per-j-row
f32 planes (e.g. typeids for multi-type parameter interpolation, or
velocities/tags for a future DPD kernel) are threaded through to the
evaluator callback alongside dx/dy/dz/rsq.

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

__all__ = ["stencil_pair_force_kernel", "has_tpu", "pallas_mode", "approx_recip",
           "pad_cap", "subtile_h"]

_SENTINEL = 1.0e18
# default j-subtile height of the pair microkernel (rows per
# register-resident tile) on dense grids. 16 measured ~35% faster than 8
# at 64k (fewer per-subtile i-row reduce/RMW issues); 32 regressed
# (register spill). Dilute grids pick 8 — see subtile_h().
_SUBTILE_H_DEFAULT = 16
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


def subtile_h(cap: int) -> int:
    """Production j-subtile height for a grid with ``cap`` slots/cell.

    H=16 measured ~35% faster than 8 on the dense 64k headline (cap 56:
    fewer per-subtile i-row reduce/RMW issues). But H is also the
    work-skipping QUANTUM: a j-subtile runs whole whenever any lane-cell
    of the block has occupancy above its first row, so on dilute grids
    (small cap) H=16 evaluates 16 j-rows where typical occupancy is ~2.
    Modeled on the equilibrated patchy state (cap 16, mean occ 2.2):
    H=8 exactly halves the pair EVALUATIONS while occupancy-order
    blocking buys nothing (scripts/model_brick_blocks.py); measured on
    chip the step gains +11% (3.91 -> 3.53 ms — per-subtile fixed
    costs don't scale with H, so the eval saving is diluted).

    Round 5: H=24 measured on chip at the slack-0 headline (cap 48,
    tight by construction — the post-tune cap sits one sublane quantum
    above the equilibrated max occupancy, so occupancy ~ cap and the
    skip quantum barely matters): kernel 0.750 -> 0.736 ms, step 0.950
    -> 0.909 ms (1052 -> 1100 TPS, full default protocol). The same H
    REGRESSED the dilute DPD grid (cap 24, mean occ 10: 24-row quantum
    kills the skipping; 961.6 -> ~900 interval-adjusted), so H=24
    applies only to pad-free dense caps: cap % 24 == 0 and cap > 24.

    Heuristic: H=8 when the 16-row quantum cannot amortize (cap <= 24);
    H=24 when cap is a >24 multiple of 24 (pad-free, tight post-tune
    grids); else 16. AZTPU_SUBTILE_H overrides.
    """
    env = os.environ.get("AZTPU_SUBTILE_H")
    if env:
        h = int(env)
        return h if h % 8 == 0 else 8
    if cap <= 24:
        return 8
    if cap % 24 == 0:
        return 24
    return _SUBTILE_H_DEFAULT


def pad_cap(cap: int, h: int | None = None) -> int:
    """Row count of each per-offset J block: cap rounded up to the subtile
    height (tail rows sit at far sentinels and are skipped by j_bound)."""
    if h is None:
        h = subtile_h(cap)
    h = h if h % 8 == 0 else 8
    return ((cap + h - 1) // h) * h


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


def _kernel(eval_f, svals_const, n_acc, cap, cap_pad, Jseg, CB, H, n_sc,
            n_ei, n_ej, *refs):
    """j-subtile-outer / i-group-inner pair microkernel.

    The v2 formulation (whole [Jseg, CB] j-block per i-row) re-read the
    three j planes and read-modified-wrote the three j accumulators from
    VMEM on every one of the `cap` i-rows -- ~45 bytes of VMEM traffic
    per pair, measured bandwidth-bound at ~1.35 TB/s with the arithmetic
    mostly idle (a trivial evaluator ran only 19% faster than the full
    one). Here the outer loop walks (H, CB) j-subtiles: the j coordinates
    and the Newton j-side accumulators live in vector registers across
    the i-row loop, leaving ~2 bytes/pair of VMEM traffic (the i-row
    partial-sum updates), which puts the VPU arithmetic back in charge.

    ``svals_const``: potential parameters as Python floats (folded into
    the trace — the production path, parameters are jit-time constants)
    or None (parameters stream through an SMEM ref, first in ``refs``).

    ``eval_f(dx, dy, dz, rsq, extra_i, extra_j, svals)`` returns
    ``(terms_i, terms_j)`` — two length-``n_acc`` lists of [H, CB]
    contributions accumulated to the i and j members of each pair (e.g.
    ``([fx, fy, fz], [-fx, -fy, -fz])`` for a Newton pair force). Every
    term must be exactly zero beyond the cutoff (sentinel coordinates
    give huge rsq, so no validity masks exist in the kernel).
    """
    refs = list(refs)
    if svals_const is None:
        sc_ref = refs.pop(0)
        svals = [sc_ref[k, 0] for k in range(n_sc)]
    else:
        svals = list(svals_const)
    ib_ref = refs.pop(0)
    jb_ref = refs.pop(0)
    xi_ref, yi_ref, zi_ref = refs.pop(0), refs.pop(0), refs.pop(0)
    ei_refs = [refs.pop(0) for _ in range(n_ei)]
    jx_ref, jy_ref, jz_ref = refs.pop(0), refs.pop(0), refs.pop(0)
    ej_refs = [refs.pop(0) for _ in range(n_ej)]
    fi_refs = [refs.pop(0) for _ in range(n_acc)]  # outputs [cap, CB]
    fj_refs = [refs.pop(0) for _ in range(n_acc)]  # outputs [Jseg, CB]
    si_refs = [refs.pop(0) for _ in range(n_acc)]  # scratch [cap, CB]
    assert not refs

    iblk = pl.program_id(0)
    kseg = pl.program_id(1)

    # i-side partial accumulators for this (block, segment)
    for r in si_refs:
        r[:] = jnp.zeros((cap, CB), jnp.float32)

    # i-row groups of 8 up to this block's max occupancy (rows beyond it
    # are empty in every lane-cell of the block)
    ib = ib_ref[iblk, 0]
    n_igroups = jnp.minimum((ib + 7) // 8, (cap + 7) // 8)

    NT = Jseg // H

    def make_jt_body(with_tri):
        def jt_body(jt, _):
            j0 = pl.multiple_of(jt * H, H)
            j0g = kseg * Jseg + j0  # global J row
            off = j0g // cap_pad  # stencil offset of this subtile
            r0 = j0g - off * cap_pad  # row within the offset block
            jbound = jb_ref[iblk, off]

            @pl.when(r0 < jbound)
            def _eval():
                jx_t = jx_ref[pl.ds(j0, H), :]
                jy_t = jy_ref[pl.ds(j0, H), :]
                jz_t = jz_ref[pl.ds(j0, H), :]
                ej_t = [r[pl.ds(j0, H), :] for r in ej_refs]
                if with_tri:
                    # self-cell rows: Newton strict upper triangle via one
                    # compare folded into rsq (rows of this subtile past
                    # the self block are sentinels, masked by distance)
                    jrow = r0 + jax.lax.broadcasted_iota(
                        jnp.int32, (H, CB), 0
                    )

                def i_group(g, carry):
                    jaccs = list(carry)
                    i0 = pl.multiple_of(g * 8, 8)
                    xg = xi_ref[pl.ds(i0, 8), :]
                    yg = yi_ref[pl.ds(i0, 8), :]
                    zg = zi_ref[pl.ds(i0, 8), :]
                    eg = [r[pl.ds(i0, 8), :] for r in ei_refs]
                    sacc = [jnp.zeros((8, CB), jnp.float32) for _ in range(n_acc)]
                    for s in range(8):
                        dx = xg[s, :][None, :] - jx_t
                        dy = yg[s, :][None, :] - jy_t
                        dz = zg[s, :][None, :] - jz_t
                        rsq = dx * dx + dy * dy + dz * dz
                        if with_tri:
                            rsq = jnp.where(
                                jrow > i0 + s, rsq, jnp.float32(1.0e30)
                            )
                        ei_s = [e[s, :][None, :] for e in eg]
                        terms_i, terms_j = eval_f(
                            dx, dy, dz, rsq, ei_s, ej_t, svals
                        )
                        for k in range(n_acc):
                            jaccs[k] = jaccs[k] + terms_j[k]
                        one = (
                            jax.lax.broadcasted_iota(jnp.int32, (8, CB), 0)
                            == s
                        )
                        for k in range(n_acc):
                            sacc[k] = sacc[k] + jnp.where(
                                one, jnp.sum(terms_i[k], axis=0), 0.0
                            )
                    for k in range(n_acc):
                        si_refs[k][pl.ds(i0, 8), :] += sacc[k]
                    return tuple(jaccs)

                z = jnp.zeros((H, CB), jnp.float32)
                jaccs = jax.lax.fori_loop(
                    0, n_igroups, i_group, (z,) * n_acc
                )
                for k in range(n_acc):
                    fj_refs[k][pl.ds(j0, H), :] = jaccs[k]

            @pl.when(r0 >= jbound)
            def _skip():
                z = jnp.zeros((H, CB), jnp.float32)
                for k in range(n_acc):
                    fj_refs[k][pl.ds(j0, H), :] = z

            return 0

        return jt_body

    # the self block occupies global J rows [0, cap_pad): only its
    # subtiles carry the triangle compare (cap_pad rows = one whole
    # offset block, so subtile boundaries never straddle offsets)
    n_tri = cap_pad // H

    @pl.when(kseg == 0)
    def _():
        jax.lax.fori_loop(0, min(n_tri, NT), make_jt_body(True), 0)
        if NT > n_tri:
            jax.lax.fori_loop(n_tri, NT, make_jt_body(False), 0)

    @pl.when(kseg > 0)
    def _():
        jax.lax.fori_loop(0, NT, make_jt_body(False), 0)

    # merge this segment's i-side partials; the fi block is revisited
    # across the (innermost) segment grid dimension
    @pl.when(kseg == 0)
    def _():
        for k in range(n_acc):
            fi_refs[k][:] = si_refs[k][:]

    @pl.when(kseg > 0)
    def _():
        for k in range(n_acc):
            fi_refs[k][:] = fi_refs[k][:] + si_refs[k][:]


def _choose_jseg(J, cap_pad, CB, n_acc=3, n_extra=0):
    """Largest J segment (multiple of cap_pad) whose working set fits VMEM.

    Per-block VMEM ~ 4*CB*((3+n_extra+n_acc)*(Jseg+cap)*2 double-buffered
    io + ~8*Jseg temporaries + n_acc*cap scratch).
    """
    n_seg = J // cap_pad
    width = 3 + n_extra + n_acc
    for parts in range(1, n_seg + 1):
        if n_seg % parts:
            continue
        jseg = J // parts
        need = 4 * CB * (
            2 * width * (jseg + cap_pad) + 8 * jseg + n_acc * cap_pad
        )
        if need <= _VMEM_BUDGET:
            return jseg
    return cap_pad


def stencil_pair_force_kernel(
    eval_f,
    scalars,            # sequence of f32 scalars (potential parameters)
    xi_t, yi_t, zi_t,   # [cap, C] f32, cell-minor i coordinates
    jx_t, jy_t, jz_t,   # [J, C] f32, per-offset cap_pad-row pre-shifted blocks
    counts,             # [C] int32: per-cell occupancy
    stencil_counts,     # [n_seg, C] int32: occupancy of each offset's neighbor
    *,
    cap_pad: int,
    extra_i=(),         # tuple of [cap, C] f32 planes passed to eval_f
    extra_j=(),         # tuple of [J, C] f32 planes passed to eval_f
    n_acc: int = 3,
    cell_block: int = 128,
    interpret: bool = False,
    subtile: int | None = None,
):
    """Run the stencil pair kernel.

    Returns ``(acc_i, acc_j)`` — lists of ``n_acc`` cell-minor arrays
    (``[cap, C]`` / ``[J, C]``): whatever per-pair terms ``eval_f``
    emits, accumulated per i slot and per rolled j slot (e.g. force
    x/y/z; force + energy/2 + 6 virial components; force + torque).

    ``eval_f(dx, dy, dz, rsq, extra_i, extra_j, svals) -> (terms_i,
    terms_j)`` must be a pure elementwise jnp function whose terms are
    exactly zero beyond r_cut — sentinel coordinates give huge rsq, so
    no validity masks are needed. Parameters fold into the trace as
    constants when concrete (the production path: tables are baked into
    the compiled chunk) and stream through SMEM when traced.
    """
    svals_const = None
    try:
        svals_const = [float(np.asarray(s)) for s in scalars]
    except Exception:
        svals_const = None

    _ablate_eval = os.environ.get("AZTPU_ABLATE_EVAL") == "1"
    _ablate_bounds = os.environ.get("AZTPU_ABLATE_BOUNDS") == "1"
    if _ablate_eval or _ablate_bounds:
        # these flags replace the physics (trivial evaluator) or the
        # work-skipping bounds — a leaked env var in a production process
        # would silently corrupt forces, so shout every trace
        import warnings

        warnings.warn(
            "AZTPU_ABLATE_EVAL/AZTPU_ABLATE_BOUNDS is active: the pair "
            "kernel is running in ROOFLINE-ABLATION mode and computes "
            "WRONG FORCES. Unset it unless you are running "
            "scripts/ablate_kernel.py.",
            stacklevel=2,
        )
    if _ablate_eval:
        # roofline ablation (scripts/ablate_kernel.py): replace the
        # potential math with a near-trivial evaluator (one cutoff
        # compare + the raw separations), keeping the geometry, Newton
        # accumulation, and skipping structure intact — isolates the
        # kernel's structural instruction floor from the evaluator cost
        def eval_f(dx, dy, dz, rsq, ei, ej, sv, _n=n_acc):  # noqa: ARG001
            w = jnp.where(rsq < jnp.float32(9.0), jnp.float32(1.0), 0.0)
            t = [dx * w, dy * w, dz * w]
            t += [rsq * w] * (_n - 3)
            return t[:_n], [-a for a in t[:_n]]

    cap, C = xi_t.shape
    J = jx_t.shape[0]
    n_seg = J // cap_pad
    H = subtile_h(cap) if subtile is None else subtile
    if cap_pad % H != 0:
        H = 8
    if cap_pad % H != 0:
        raise ValueError(
            f"cap_pad ({cap_pad}) must be a multiple of the subtile height"
        )
    CB = int(cell_block)
    Cp = ((C + CB - 1) // CB) * CB
    extra_i = list(extra_i)
    extra_j = list(extra_j)
    n_ei, n_ej = len(extra_i), len(extra_j)
    if Cp != C:
        # pad cells with far sentinels (opposite signs so pad-pad and
        # pad-real distances are all huge): padded cells interact with
        # nothing and their outputs are sliced off
        def padi(a, fill):
            return jnp.pad(a, ((0, 0), (0, Cp - C)), constant_values=fill)

        big = jnp.float32(_SENTINEL)
        xi_t, yi_t, zi_t = padi(xi_t, big), padi(yi_t, 0.0), padi(zi_t, 0.0)
        jx_t, jy_t, jz_t = padi(jx_t, -big), padi(jy_t, 0.0), padi(jz_t, 0.0)
        extra_i = [padi(a, 0.0) for a in extra_i]
        extra_j = [padi(a, 0.0) for a in extra_j]
    n_blocks = Cp // CB
    # per-lane-block occupancy bounds (padding cells are empty: bound 0)
    cnt = counts.astype(jnp.int32)
    sc_cnt = stencil_counts.astype(jnp.int32)
    if Cp != C:
        cnt = jnp.pad(cnt, (0, Cp - C))
        sc_cnt = jnp.pad(sc_cnt, ((0, 0), (0, Cp - C)))
    ib = cnt.reshape(n_blocks, CB).max(axis=1).reshape(n_blocks, 1)
    jb = sc_cnt.reshape(n_seg, n_blocks, CB).max(axis=2).T  # [n_blocks, n_seg]
    if _ablate_bounds:
        # roofline ablation: disable occupancy skipping (every i-row and
        # j-subtile evaluated) — measures what the per-block bounds buy
        ib = jnp.full_like(ib, cap)
        jb = jnp.full_like(jb, cap_pad)

    Jseg = _choose_jseg(J, cap_pad, CB, n_acc=n_acc, n_extra=n_ei + n_ej)
    n_jseg = J // Jseg
    grid = (n_blocks, n_jseg)

    def ispec():
        return pl.BlockSpec((cap, CB), lambda i, k: (0, i), memory_space=pltpu.VMEM)

    def jspec():
        return pl.BlockSpec((Jseg, CB), lambda i, k: (k, i), memory_space=pltpu.VMEM)

    n_sc = len(scalars)
    kern = functools.partial(
        _kernel, eval_f, svals_const, n_acc, cap, cap_pad, Jseg, CB, H,
        n_sc, n_ei, n_ej,
    )
    in_specs = []
    inputs = []
    if svals_const is None:
        sc = jnp.stack(
            [jnp.asarray(s, jnp.float32).reshape(()) for s in scalars]
        ).reshape(-1, 1)
        in_specs.append(
            pl.BlockSpec((n_sc, 1), lambda i, k: (0, 0), memory_space=pltpu.SMEM)
        )
        inputs.append(sc)
    # full bounds tables in SMEM (tiny); indexed by program_id in-kernel —
    # per-block (1, x) SMEM blocks fail the Mosaic block-shape rule
    in_specs += [
        pl.BlockSpec((n_blocks, 1), lambda i, k: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (n_blocks, n_seg), lambda i, k: (0, 0), memory_space=pltpu.SMEM
        ),
    ]
    inputs += [ib, jb]
    in_specs += [ispec()] * (3 + n_ei) + [jspec()] * (3 + n_ej)
    inputs += [xi_t, yi_t, zi_t, *extra_i, jx_t, jy_t, jz_t, *extra_j]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[ispec()] * n_acc + [jspec()] * n_acc,
        out_shape=(
            [jax.ShapeDtypeStruct((cap, Cp), jnp.float32)] * n_acc
            + [jax.ShapeDtypeStruct((J, Cp), jnp.float32)] * n_acc
        ),
        scratch_shapes=[pltpu.VMEM((cap, CB), jnp.float32)] * n_acc,
        interpret=interpret,
    )(*inputs)
    fi = list(out[:n_acc])
    fj = list(out[n_acc:])
    if Cp != C:
        fi = [a[:, :C] for a in fi]
        fj = [a[:, :C] for a in fj]
    return fi, fj
