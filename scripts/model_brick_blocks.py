"""Model per-lane-block occupancy bounds under alternative cell orderings.

The Pallas pair kernel skips work with PER-LANE-BLOCK occupancy bounds
(max over the CB cells sharing a block — ops/pallas_pair.py). In the
current z-minor lattice raveling a block of CB consecutive cells is a
long thin stripe (~CB/Dz whole z columns), so for aggregated/dilute
systems (BASELINE config 4, patchy colloids) nearly every stripe
intersects some cluster and the bounds barely skip anything (measured
slot selectivity ~0.2%, BENCH.md).

This script quantifies what reordering the cells could buy BEFORE any
engineering (the round-3 discipline: model, then build or reject). It
replays the kernel's exact skipping logic over a real equilibrated
cell-count field for:

  * ``stripe``   — the current z-minor lattice order (baseline),
  * ``brick BxBxB`` — brick-major ravelings (spatially compact blocks;
    still roll-compatible: a brick-major ravel is a nested reshape and a
    lattice shift is two static slices per axis instead of one),
  * ``sorted``   — cells ordered by occupancy (the unimplementable ideal:
    breaks the stencil roll structure entirely; lower bound only).

Cost model (matches _kernel in ops/pallas_pair.py): per block b the
i-row loop runs ceil(ib_b/8) groups of 8 rows for every unskipped
j-subtile; a j-subtile of offset o is unskipped iff its first row
r0 < jb[b, o], i.e. ceil(jb[b, o]/H) subtiles run. Total evaluations
 = sum_b 8*ceil(ib_b/8) * H*CB * sum_o ceil(jb[b, o]/H).

Usage: python scripts/model_brick_blocks.py [config] [warm_steps]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np


def block_cost(counts_g, nb_counts_g, order, CB, H, cap, cap_pad):
    """Total kernel pair-evals for one cell ordering.

    counts_g: [C] occupancy in that ordering; nb_counts_g: [n_seg, C]
    stencil-neighbor occupancy (self block first) in the same ordering.
    """
    C = counts_g.shape[0]
    Cp = ((C + CB - 1) // CB) * CB
    cnt = np.zeros(Cp, np.int64)
    cnt[:C] = counts_g[order]
    n_seg = nb_counts_g.shape[0]
    sc = np.zeros((n_seg, Cp), np.int64)
    sc[:, :C] = nb_counts_g[:, order]
    nb = Cp // CB
    ib = cnt.reshape(nb, CB).max(1)  # [nb]
    jb = sc.reshape(n_seg, nb, CB).max(2)  # [n_seg, nb]
    n_ig = np.minimum((ib + 7) // 8, (cap + 7) // 8)
    n_jt = (jb + H - 1) // H  # unskipped subtiles per (offset, block)
    return float((8 * n_ig * (H * CB) * n_jt.sum(0)).sum())


def stencil_neighbor_counts(counts, dims):
    """[n_seg, C]: self + 13 half-stencil neighbor occupancies."""
    Dx, Dy, Dz = dims
    g = counts.reshape(Dx, Dy, Dz)
    offs = [(0, 0, 0)] + [
        (ox, oy, oz)
        for ox in (-1, 0, 1)
        for oy in (-1, 0, 1)
        for oz in (-1, 0, 1)
        if (ox, oy, oz) > (0, 0, 0)
    ]
    return np.stack(
        [np.roll(g, (-o[0], -o[1], -o[2]), (0, 1, 2)).ravel() for o in offs]
    )


def brick_order(dims, brick):
    """Cell permutation: order[i] = lattice cell id of brick-ravel rank i."""
    Dx, Dy, Dz = dims
    bx, by, bz = brick
    cx, cy, cz = np.meshgrid(
        np.arange(Dx), np.arange(Dy), np.arange(Dz), indexing="ij"
    )
    lat = ((cx * Dy + cy) * Dz + cz).ravel()
    key = (
        ((cx // bx) * ((Dy + by - 1) // by) + cy // by)
        * ((Dz + bz - 1) // bz)
        + cz // bz
    ) * (bx * by * bz) + ((cx % bx) * by + cy % by) * bz + cz % bz
    return lat[np.argsort(key.ravel(), kind="stable")]


def divisors_near(D, targets):
    """Divisor-friendly brick edges <= D (pad handled by cost model)."""
    out = []
    for t in targets:
        out.append(min(t, D))
    return sorted(set(out))


def main():
    import jax

    import bench as B

    config = sys.argv[1] if len(sys.argv) > 1 else "patchy"
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    build = {
        "patchy": B.build_patchy,
        "droplet": B.build_droplet,
        "headline": B.build_sim,
        "polymer": B.build_polymer_melt,
        "dpd": B.build_dpd_fluid,
    }[config]
    sim = build()
    if isinstance(sim, tuple):
        sim = sim[0]
    sim.run(warm)
    sim.tune_cell_capacity()
    sim.run(16)
    spec = sim._grid_spec
    dense = jax.device_get(sim._dense.tag)
    counts = (dense.reshape(spec.n_cells, spec.cap) >= 0).sum(1)
    dims = spec.dims
    cap = spec.cap
    N = int(counts.sum())
    print(
        f"config={config} N={N} dims={dims} cap={cap} "
        f"mean_occ={counts.mean():.2f} max_occ={counts.max()} "
        f"p99={np.percentile(counts, 99):.0f} empty={100*(counts==0).mean():.1f}%"
    )
    nbc = stencil_neighbor_counts(counts, dims)

    results = {}
    for CB in (128, 256):
        for H in (8, 16):
            cap_pad = ((cap + H - 1) // H) * H
            lat = np.arange(spec.n_cells)
            base = block_cost(counts, nbc, lat, CB, H, cap, cap_pad)
            # dense reference: no skipping at all
            full_ib = np.full_like(counts, cap)
            full = block_cost(
                np.full_like(counts, cap),
                np.full_like(nbc, cap),
                lat, CB, H, cap, cap_pad,
            )
            rows = [("stripe", base)]
            bricks = []
            for bx in divisors_near(dims[0], (2, 4, 8)):
                for by in divisors_near(dims[1], (4, 8, 16)):
                    for bz in divisors_near(dims[2], (4, 8, 16, 32)):
                        if bx * by * bz in (CB // 2, CB, 2 * CB):
                            bricks.append((bx, by, bz))
            for brick in sorted(set(bricks)):
                o = brick_order(dims, brick)
                rows.append(
                    (f"brick {brick}", block_cost(counts, nbc, o, CB, H, cap, cap_pad))
                )
            o = np.argsort(counts, kind="stable")
            rows.append(("sorted (ideal)", block_cost(counts, nbc, o, CB, H, cap, cap_pad)))
            print(f"\nCB={CB} H={H}  (full dense = {full:.3e} evals)")
            for name, c in rows:
                print(
                    f"  {name:18s} {c:.3e} evals  {c/full:6.1%} of dense"
                    f"  {base/c:5.2f}x vs stripe"
                )
            results[(CB, H)] = rows


if __name__ == "__main__":
    main()
