"""Feasibility model: in-cell x-sorted subtile distance bounds (VERDICT r2 #2a).

Question: if rebin sorted each cell's occupants by x, how many of the
pair kernel's (i-group, j-subtile) tiles could a sound per-lane-block
bound skip?  For the 9 of 13 half-stencil offsets with ox = +1, every
pair satisfies r >= xj - xi, so a (g, t) tile is skippable when

    min_over_block(xj[subtile t]) - max_over_block(xi[group g]) > r_list.

This models the production 64k bench shapes exactly (dims 12^3, cap 56,
H = 16, occupancy-bounded subtiles/groups) on a uniform random fluid at
rho = 0.85 and reports the skippable fraction for both lane-block widths.

Result (run it): ~8-11%% of the ox=+1 tiles, ~5-7%% of all tiles, at the
cost of a slower rebin sort (the fused (cell,row) int32 key must grow
in-cell x bits).  The bound is weak because min/max aggregate over the
whole 128/256-lane block: one high-occupancy cell saturates xi_max by the
second i-group and xj_min stays low until the last subtile (quantile
statistics over 128+ iid cells concentrate at the extremes).  This is the
structural difference from GROMACS cluster lists, whose bounds hold per
4x4 cluster pair with no cross-cell aggregation (arXiv:1804.06231) — the
TPU's 128-lane vector unit forces the aggregation.  Documented in
BENCH.md; the lever was modeled and rejected, not built.
"""

import numpy as np


def model(CB=256, D=12, cap=56, H=16, rho=0.85, N=64000, r_cut=3.0,
          buffer=0.4, seed=0):
    rng = np.random.default_rng(seed)
    L = (N / rho) ** (1 / 3)
    E = L / D
    r_list = r_cut + buffer
    pos = rng.random((N, 3)) * L
    c3 = np.minimum((pos / E).astype(int), D - 1)
    cid = (c3[:, 0] * D + c3[:, 1]) * D + c3[:, 2]
    C = D**3
    order = np.lexsort((pos[:, 0], cid))
    cid_s, x_s = cid[order], pos[order, 0]
    counts = np.bincount(cid_s, minlength=C)
    start = np.zeros(C + 1, int)
    np.cumsum(counts, out=start[1:])
    X = np.full((C, cap), np.nan)
    for c in range(C):
        n = min(counts[c], cap)
        X[c, :n] = x_s[start[c]:start[c] + n]

    grid = np.arange(C).reshape(D, D, D)
    n_blocks = (C + CB - 1) // CB
    Cp = n_blocks * CB
    Xp = np.full((Cp, cap), np.nan)
    Xp[:C] = X
    cnt_p = np.zeros(Cp, int)
    cnt_p[:C] = counts

    offs = [(ox, oy, oz) for ox in (-1, 0, 1) for oy in (-1, 0, 1)
            for oz in (-1, 0, 1) if (ox, oy, oz) > (0, 0, 0)]
    base = saved = 0
    for (ox, oy, oz) in offs:
        # occupants of the (ox,oy,oz)-neighbor of each cell, x pre-shifted
        nb = np.roll(grid, (-ox, -oy, -oz), axis=(0, 1, 2)).reshape(C)
        xj = X[nb].copy()
        if ox:  # crossing the x boundary adds the lattice vector
            wrap = (np.arange(C) // (D * D)) == (D - 1 if ox == 1 else 0)
            xj[wrap] += ox * L
        xjp = np.full((Cp, cap), np.nan)
        xjp[:C] = xj
        jcnt = np.zeros(Cp, int)
        jcnt[:C] = counts[nb]
        for b in range(n_blocks):
            xi_b = Xp[b * CB:(b + 1) * CB]
            xj_b = xjp[b * CB:(b + 1) * CB]
            n_ig = (min(cnt_p[b * CB:(b + 1) * CB].max(), cap) + 7) // 8
            n_sub = (min(jcnt[b * CB:(b + 1) * CB].max(), cap) + H - 1) // H
            gmax = [np.nanmax(xi_b[:, g * 8:(g + 1) * 8]) for g in range(n_ig)]
            for t in range(n_sub):
                w = xj_b[:, t * H:(t + 1) * H]
                tmin = np.nanmin(w) if np.isfinite(w).any() else np.inf
                for g in range(n_ig):
                    base += 1
                    if ox == 1 and tmin - gmax[g] > r_list:
                        saved += 1
    return base, saved


if __name__ == "__main__":
    for CB in (128, 256):
        base, saved = model(CB=CB)
        print(f"CB={CB}: (g,t) tiles {base}, skippable {saved} "
              f"({saved / base:.1%})")
