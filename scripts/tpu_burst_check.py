"""One-session compiled validation of every Pallas path (run after the
relay returns): force/all/xplor/two-type/DPD/aniso vs the XLA reference
paths at production-like shapes, then a short verify drive."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import azplugins_tpu as az
from azplugins_tpu.core.state import state_from_snapshot
from azplugins_tpu.ops import dense as D
from azplugins_tpu.ops.evaluators.pair import PAIR_POTENTIALS
from azplugins_tpu.ops.evaluators.aniso import ANISO_PAIR_POTENTIALS


_NSIDE = int(os.environ.get("BURST_NSIDE", "24"))  # small for CPU smoke
# comma list to run a subset of sections, e.g. BURST_ONLY=dpd,dpd2,dpd3
_ONLY = [s for s in os.environ.get("BURST_ONLY", "").split(",") if s]


def sec(name):
    return not _ONLY or name in _ONLY


def build(N_side=None, rho=0.85, types=1, orient=False, vel=False, seed=5):
    if N_side is None:
        N_side = _NSIDE
    N = N_side**3
    L = (N / rho) ** (1 / 3)
    a = L / N_side
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A", "B", "C", "D"][:types]
    x = (np.arange(N_side) + 0.5) * a - L / 2
    pos = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1).reshape(-1, 3)
    rng = np.random.default_rng(seed)
    snap.particles.position[:] = pos + rng.normal(0, 0.05, pos.shape)
    if types > 1:
        snap.particles.typeid[:] = rng.integers(0, types, N)
    state, _, _ = state_from_snapshot(snap)
    if vel:
        state = state.replace(
            velocity=jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32))
    if orient:
        q = rng.normal(size=(N, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        state = state.replace(orientation=jnp.asarray(q, jnp.float32))
    spec = D.GridSpec.create(state.box, N, r_cut=3.0, buffer=0.4)
    occ = az.Simulation._max_occupancy_cap(state, spec)
    if occ > spec.cap:
        spec = spec.replace(cap=occ)
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)
    return dense, spec


def cmp(tag, ref, got, fields, tol=1e-3):
    for f in fields:
        r = np.asarray(getattr(ref, f)); g = np.asarray(getattr(got, f))
        scale = max(np.abs(r).max(), 1.0)
        err = np.abs(g - r).max() / scale
        print(f"[{tag}] {f}: rel {err:.2e}", flush=True)
        assert err < tol, (tag, f, err)


def run_pair(dense, spec, tables, r_cut, mode, want, T):
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force
    jb = D.make_jblocks(dense, spec, half=True, need_typeid=(T > 1))
    r_on = jnp.full((T, T), 2.0, jnp.float32)
    return D.dense_pair_force(ef, dense, jb, spec, tables, r_cut,
                              r_on_table=r_on, mode=mode, want=want,
                              masked=False)


def main():
    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute(
        dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=0.5))
    t1 = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in prec.items()}
    rc1 = jnp.full((1, 1), 3.0, jnp.float32)

    dense = spec = None
    if sec("pair") or sec("lj"):
        dense, spec = build()
    if sec("pair"):
        for mode, want, fields in [
            ("none", "force", ("force",)),
            ("shift", "all", ("force", "energy", "virial")),
            ("xplor", "all", ("force", "energy", "virial")),
        ]:
            os.environ["AZTPU_PALLAS"] = "0"
            ref = jax.block_until_ready(run_pair(dense, spec, t1, rc1, mode, want, 1))
            os.environ["AZTPU_PALLAS"] = "1"
            got = jax.block_until_ready(run_pair(dense, spec, t1, rc1, mode, want, 1))
            cmp(f"pair {mode}/{want}", ref, got, fields)

    # two types
    prec2 = PAIR_POTENTIALS["PerturbedLennardJones"].precompute(
        dict(epsilon=0.6, sigma=1.1, attraction_scale_factor=0.8))
    if sec("pair2"):
        dense2, spec2 = build(types=2, seed=7)
        t2 = {k: jnp.asarray([[float(prec[k]), float(prec2[k])],
                              [float(prec2[k]), float(prec[k])]], jnp.float32)
              for k in prec}
        rc2 = jnp.asarray([[3.0, 2.5], [2.5, 3.0]], jnp.float32)
        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_pair(dense2, spec2, t2, rc2, "shift", "all", 2))
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_pair(dense2, spec2, t2, rc2, "shift", "all", 2))
        cmp("pair 2type", ref, got, ("force", "energy", "virial"))

    # three types (one-hot parameter reconstruction, _table_scalars)
    if sec("pair3"):
        dense3, spec3 = build(types=3, seed=13)
        rng3 = np.random.default_rng(13)
        t3 = {}
        for k in prec:
            m = rng3.uniform(0.5, 1.5, (3, 3)) * float(prec[k])
            t3[k] = jnp.asarray((m + m.T) / 2, jnp.float32)
        rcm = rng3.uniform(2.2, 3.0, (3, 3))
        rc3 = jnp.asarray((rcm + rcm.T) / 2, jnp.float32)
        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_pair(dense3, spec3, t3, rc3, "shift", "all", 3))
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_pair(dense3, spec3, t3, rc3, "shift", "all", 3))
        cmp("pair 3type", ref, got, ("force", "energy", "virial"))

    # substrate LJ (its own pallas_force_divr fast-reciprocal variant)
    if sec("lj"):
        ef_lj = PAIR_POTENTIALS["LJ"].energy_force
        tlj = {k: jnp.full((1, 1), float(v), jnp.float32)
               for k, v in PAIR_POTENTIALS["LJ"].precompute(
                   dict(epsilon=1.0, sigma=1.0)).items()}
        rclj = jnp.full((1, 1), 2.5, jnp.float32)

        def run_lj(flag):
            os.environ["AZTPU_PALLAS"] = flag
            jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
            return jax.block_until_ready(D.dense_pair_force(
                ef_lj, dense, jb, spec, tlj, rclj, mode="none", want="force",
                masked=False))

        cmp("pair lj", run_lj("0"), run_lj("1"), ("force",))

    # four types (the 4th one-hot column + the _PALLAS_MAX_T boundary)
    if sec("pair4"):
        dense4, spec4 = build(types=4, seed=23)
        rng4 = np.random.default_rng(23)
        t4 = {}
        for k in prec:
            m = rng4.uniform(0.5, 1.5, (4, 4)) * float(prec[k])
            t4[k] = jnp.asarray((m + m.T) / 2, jnp.float32)
        rcm4 = rng4.uniform(2.2, 3.0, (4, 4))
        rc4 = jnp.asarray((rcm4 + rcm4.T) / 2, jnp.float32)
        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_pair(dense4, spec4, t4, rc4, "shift", "all", 4))
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_pair(dense4, spec4, t4, rc4, "shift", "all", 4))
        cmp("pair 4type", ref, got, ("force", "energy", "virial"))

    # masked (tilted box)
    if sec("tilted"):
        rng = np.random.default_rng(3)
        # r_list ≈ 3.4 needs >= 3 cells per axis: floor the tilted system size
        Nt = max(_NSIDE - 4, 12) ** 3
        Lt = (Nt / 0.85) ** (1 / 3)
        snapt = az.Snapshot(N=Nt)
        snapt.configuration.box = [Lt, Lt, Lt, 0.25, -0.1, 0.15]
        snapt.particles.types = ["A"]
        frac = rng.random((Nt, 3)) - 0.5
        xt = frac[:, 0] * Lt + frac[:, 1] * 0.25 * Lt + frac[:, 2] * (-0.1) * Lt
        yt = frac[:, 1] * Lt + frac[:, 2] * 0.15 * Lt
        zt = frac[:, 2] * Lt
        statet, _, _ = state_from_snapshot(snapt)
        statet = statet.replace(
            position=jnp.asarray(np.stack([xt, yt, zt], 1), jnp.float32))
        spect = D.GridSpec.create(statet.box, Nt, r_cut=3.0, buffer=0.4)
        occt = az.Simulation._max_occupancy_cap(statet, spect)
        if occt > spect.cap:
            spect = spect.replace(cap=occt)
        denset, metat = D.densify(statet, spect)
        assert not bool(metat.overflow)
        ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

        def run_tilted(flag):
            os.environ["AZTPU_PALLAS"] = flag
            jb = D.make_jblocks(denset, spect, half=True, need_typeid=True)
            return jax.block_until_ready(D.dense_pair_force(
                ef, denset, jb, spect, t1, rc1, mode="shift", want="all",
                masked=True))

        cmp("pair tilted", run_tilted("0"), run_tilted("1"),
            ("force", "energy", "virial"))

    # DPD
    if sec("dpd"):
        dd, ds = build(vel=True, seed=9)
        tdpd = {"A": jnp.full((1, 1), 25.0, jnp.float32),
                "gamma": jnp.full((1, 1), 4.5, jnp.float32),
                "s": jnp.full((1, 1), 0.5, jnp.float32)}
        rcd = jnp.full((1, 1), 1.0, jnp.float32)

        def run_dpd():
            # jit over the timestep: production runs trace it, which routes
            # the RNG key words through SMEM instead of folded constants
            def inner(ts):
                jb = D.make_jblocks(dd, ds, need_velocity=True, need_tag=True,
                                    half=True, need_typeid=False)
                return D.dense_dpd_force(dd, jb, ds, tdpd, rcd, kT=1.0,
                                         dt=0.01, seed=3, timestep=ts,
                                         want="force", masked=False)
            return jax.jit(inner)(jnp.int32(50))

        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_dpd())
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_dpd())
        cmp("dpd", ref, got, ("force",))

    # DPD, two types (BILINEAR tables — a different in-kernel param path
    # than the T>=3 one-hot contraction below)
    if sec("dpd2"):
        dd2, ds2 = build(types=2, vel=True, seed=15)
        tdpd2 = {"A": jnp.asarray([[25.0, 18.0], [18.0, 30.0]], jnp.float32),
                 "gamma": jnp.asarray([[4.5, 3.0], [3.0, 5.0]], jnp.float32),
                 "s": jnp.asarray([[0.5, 1.0], [1.0, 2.0]], jnp.float32)}
        rcd2 = jnp.asarray([[1.0, 0.9], [0.9, 1.1]], jnp.float32)

        def run_dpd2():
            # jit over the timestep: production runs trace it, which routes
            # the RNG key words through SMEM instead of folded constants
            def inner(ts):
                jb = D.make_jblocks(dd2, ds2, need_velocity=True, need_tag=True,
                                    half=True, need_typeid=True)
                return D.dense_dpd_force(dd2, jb, ds2, tdpd2, rcd2, kT=1.0,
                                         dt=0.01, seed=3, timestep=ts,
                                         want="force", masked=False)
            return jax.jit(inner)(jnp.int32(50))

        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_dpd2())
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_dpd2())
        cmp("dpd 2type", ref, got, ("force",))

    # DPD, three types (one-hot tables + in-kernel Threefry)
    if sec("dpd3"):
        dd3, ds3 = build(types=3, vel=True, seed=17)
        rngd = np.random.default_rng(17)

        def sym(lo, hi):
            m = rngd.uniform(lo, hi, (3, 3))
            return jnp.asarray((m + m.T) / 2, jnp.float32)

        tdpd3 = {"A": sym(10, 40), "gamma": sym(2, 6), "s": sym(0.5, 2)}
        rcd3 = sym(0.8, 1.2)

        def run_dpd3():
            # jit over the timestep: production runs trace it, which routes
            # the RNG key words through SMEM instead of folded constants
            def inner(ts):
                jb = D.make_jblocks(dd3, ds3, need_velocity=True, need_tag=True,
                                    half=True, need_typeid=True)
                return D.dense_dpd_force(dd3, jb, ds3, tdpd3, rcd3, kT=1.0,
                                         dt=0.01, seed=3, timestep=ts,
                                         want="force", masked=False)
            return jax.jit(inner)(jnp.int32(50))

        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_dpd3())
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_dpd3())
        cmp("dpd 3type", ref, got, ("force",))

    # aniso
    preca = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].precompute(
        dict(M_d=1.5, M_r=0.2, r_eq=1.0, omega=15.0, alpha=0.5, repulsion=True))
    preca2 = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].precompute(
        dict(M_d=0.8, M_r=0.25, r_eq=1.1, omega=10.0, alpha=0.4, repulsion=True))
    efa = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].energy_force_torque
    if sec("aniso"):
        da, sa = build(orient=True, seed=11)
        ta = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in preca.items()}
        rca = jnp.full((1, 1), 1.6, jnp.float32)

        def run_aniso():
            jb = D.make_jblocks(da, sa, need_quat=True, half=True,
                                need_typeid=False)
            return D.dense_aniso_force(efa, da, jb, sa, ta, rca, mode="shift",
                                       want="force", masked=False)

        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_aniso())
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_aniso())
        cmp("aniso", ref, got, ("force", "torque"))

    # aniso, two types (bilinear tables after the quaternion planes)
    if sec("aniso2"):
        da2, sa2 = build(types=2, orient=True, seed=19)
        ta2 = {k: jnp.asarray([[float(preca[k]), float(preca2[k])],
                               [float(preca2[k]), float(preca[k])]], jnp.float32)
               for k in preca}
        rca2 = jnp.asarray([[1.6, 1.4], [1.4, 1.5]], jnp.float32)

        def run_aniso2():
            jb = D.make_jblocks(da2, sa2, need_quat=True, half=True,
                                need_typeid=True)
            return D.dense_aniso_force(efa, da2, jb, sa2, ta2, rca2, mode="shift",
                                       want="force", masked=False)

        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_aniso2())
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_aniso2())
        cmp("aniso 2type", ref, got, ("force", "torque"))

    # aniso, three types (one-hot contraction on the quaternion planes);
    # every table entry is a VALID parameter set — table[i][j] picks one of
    # three precomputed sets by (i+j) % 3, which is symmetric
    if sec("aniso3"):
        da3, sa3 = build(types=3, orient=True, seed=29)
        precb = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].precompute(
            dict(M_d=1.2, M_r=0.15, r_eq=0.95, omega=12.0, alpha=0.45,
                 repulsion=True))
        psets = [preca, preca2, precb]
        ta3 = {k: jnp.asarray([[float(psets[(i + j) % 3][k]) for j in range(3)]
                               for i in range(3)], jnp.float32) for k in preca}
        rcs = [1.6, 1.45, 1.5]
        rca3 = jnp.asarray([[rcs[(i + j) % 3] for j in range(3)]
                            for i in range(3)], jnp.float32)

        def run_aniso3():
            jb = D.make_jblocks(da3, sa3, need_quat=True, half=True,
                                need_typeid=True)
            return D.dense_aniso_force(efa, da3, jb, sa3, ta3, rca3, mode="shift",
                                       want="force", masked=False)

        os.environ["AZTPU_PALLAS"] = "0"
        ref = jax.block_until_ready(run_aniso3())
        os.environ["AZTPU_PALLAS"] = "1"
        got = jax.block_until_ready(run_aniso3())
        cmp("aniso 3type", ref, got, ("force", "torque"))
    print("TPU BURST CHECK OK" if not _ONLY else
          f"TPU BURST CHECK OK (sections: {','.join(_ONLY)})", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.0f}s")
