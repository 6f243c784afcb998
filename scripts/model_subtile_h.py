"""Exact-shape model of the j-subtile height choice (H in {8, 16, 24}).

The Pallas pair kernel (ops/pallas_pair.py) skips a j-subtile of a
stencil-offset block whenever the whole CB-cell lane block has occupancy
at or below the subtile's first row: ``jbound = jb[iblk, off]; run iff
r0 < jbound``. H is therefore the work-skipping QUANTUM, and the right H
for a grid depends on the *block structure* of the occupancy field, not
on cap alone: a droplet's vapor region is contiguous in cell-id order
(whole blocks skippable -> small H wins), a homogeneous melt has
mid-range occupancy in every block (no skips -> per-subtile fixed costs
make large H win).

This script pulls the REAL equilibrated occupancy of the bench configs
from the chip and computes, for each candidate H, the kernel's exact
structural counts:

  W(H) = sum_{iblk,o} ceil(jb/H)*H * 8*n_igroups(iblk)   pair-eval rows
  R(H) = sum_{iblk,o} ceil(jb/H)*H                       j-plane rows loaded
  G(H) = sum_{iblk,o} ceil(jb/H) * n_igroups(iblk)       i-group entries
  S(H) = sum_{iblk,o} ceil(jb/H)                         subtile entries

(all per CB lanes; multiply by CB for element counts). Fitting
measured step-time differences between H runs of the same config
against these counts yields the decision rule installed in
``pallas_pair.choose_subtile_h``. Measured anchors (chip, full default
protocol, doc/bench_evidence/):

  droplet  (cap 32): H16 1.071 ms -> H8 1.043 ms  (H8 wins, -0.028)
  polymer  (cap 40): H16 1.709 ms -> H8 1.752 ms  (H16 wins, +0.043)
  headline (cap 48): H16 0.950 ms -> H24 0.909 ms (H24 wins, -0.041)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

if os.environ.get("AZTPU_MODEL_CPU") == "1":
    # occupancy statistics are backend-independent: equilibrate on the
    # host CPU when the chip is busy (same backend-drop pattern as
    # tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    _xb._clear_backends()
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/tests/.jax_compile_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from azplugins_tpu.ops import dense as D  # noqa: E402


def model_counts(counts, dims, cap, CB, H):
    """Structural counts for subtile height H given per-cell occupancy."""
    C = counts.shape[0]

    class _Spec:
        pass

    spec = D.GridSpec(dims=dims, cap=cap, r_cut=1.0, buffer=0.0)
    offsets = spec.half_stencil()
    stc = np.asarray(D._stencil_counts(jnp.asarray(counts), spec, offsets))
    Cp = ((C + CB - 1) // CB) * CB
    cnt = np.pad(counts, (0, Cp - C))
    stc = np.pad(stc, ((0, 0), (0, Cp - C)))
    n_blocks = Cp // CB
    ib = cnt.reshape(n_blocks, CB).max(axis=1)  # [n_blocks]
    jb = stc.reshape(stc.shape[0], n_blocks, CB).max(axis=2)  # [n_off, n_blocks]
    n_ig = np.minimum((ib + 7) // 8, (cap + 7) // 8)  # [n_blocks]
    nt = -(-jb // H)  # ceil(jb/H)  [n_off, n_blocks]
    W = float((nt * H * 8 * n_ig[None, :]).sum())
    R = float((nt * H).sum())
    G = float((nt * n_ig[None, :]).sum())
    S = float(nt.sum())
    return dict(W=W, R=R, G=G, S=S)


def analyze(name, sim):
    spec = sim._grid_spec
    counts = np.asarray(D._cell_counts(sim._dense, spec))
    np.savez(f"/tmp/occ_{name}.npz", counts=counts,
             dims=np.asarray(spec.dims), cap=spec.cap)
    C, cap = spec.n_cells, spec.cap
    CB = 256 if C >= 1024 else 128
    print(f"\n== {name}: N={int((counts).sum())} dims={spec.dims} "
          f"cap={cap} C={C} CB={CB} mean_occ={counts.mean():.1f} "
          f"max_occ={counts.max()}")
    rows = {}
    for H in (8, 16, 24):
        m = model_counts(counts, spec.dims, cap, CB, H)
        rows[H] = m
        print(f"  H={H:>2}: W={m['W']/1e6:10.3f}M  R={m['R']/1e3:8.1f}k  "
              f"G={m['G']/1e3:8.1f}k  S={m['S']/1e3:7.1f}k")
    return counts, spec, rows


def main():
    import azplugins_tpu  # noqa: F401

    out = {}
    for name, builder, warm in (
        ("droplet", bench.build_droplet, 250),
        ("polymer", bench.build_polymer_melt, 250),
        ("dpd", bench.build_dpd_fluid, 250),
        ("patchy", bench.build_patchy, 250),
    ):
        t0 = time.perf_counter()
        sim = builder()
        sim.auto_tune_after = 150
        sim.run(warm)
        print(f"[{name}] warmed in {time.perf_counter() - t0:.1f}s")
        out[name] = analyze(name, sim)

    t0 = time.perf_counter()
    sim, _ = bench.build_sim(N_side=40)
    sim.auto_tune_after = 200
    sim.run(250)
    print(f"[headline] warmed in {time.perf_counter() - t0:.1f}s")
    out["headline"] = analyze("headline", sim)
    return out


if __name__ == "__main__":
    main()
