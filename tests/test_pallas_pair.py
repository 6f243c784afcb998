"""Pallas stencil pair kernel vs the XLA half-stencil path (interpret mode).

The Pallas kernel (ops/pallas_pair.py) must produce identical physics to
the XLA half-stencil branch of dense_pair_force; on CPU it runs in
interpreter mode (AZTPU_PALLAS=1).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import azplugins_tpu as az
from azplugins_tpu.core.state import state_from_snapshot
from azplugins_tpu.ops import dense as D
from azplugins_tpu.ops.evaluators.pair import PAIR_POTENTIALS


def _dense_system(N=400, L=12.0, seed=3):
    rng = np.random.default_rng(seed)
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * L
    state, _, _ = state_from_snapshot(snap)
    spec = D.GridSpec.create(state.box, N, r_cut=1.5, buffer=0.3)
    assert spec.newton_ok
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)
    return dense, spec


def _plj_tables():
    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute(
        {"epsilon": 1.0, "sigma": 1.0, "attraction_scale_factor": 0.5}
    )
    tables = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in prec.items()}
    r_cut = jnp.full((1, 1), 1.5, jnp.float32)
    return tables, r_cut


@pytest.mark.parametrize("mode", ["none", "shift"])
def test_pallas_matches_xla_half(monkeypatch, mode):
    dense, spec = _dense_system()
    tables, r_cut = _plj_tables()
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode=mode, want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()

    f_ref = np.asarray(ref.force)
    f_got = np.asarray(got.force)
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f_got, f_ref, atol=2e-5 * scale, rtol=2e-5)


def test_pallas_j_segmented(monkeypatch):
    """Force the VMEM J-segmentation path (multiple j-grid steps)."""
    from azplugins_tpu.ops import pallas_pair as PP

    dense, spec = _dense_system()
    tables, r_cut = _plj_tables()
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="none", want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    monkeypatch.setattr(PP, "_VMEM_BUDGET", 64 * 1024)
    assert PP._choose_jseg(14 * spec.cap, spec.cap, 128) < 14 * spec.cap
    got = run()
    scale = np.abs(np.asarray(ref.force)).max()
    np.testing.assert_allclose(
        np.asarray(got.force), np.asarray(ref.force),
        atol=2e-5 * scale, rtol=2e-5,
    )


@pytest.mark.parametrize("mode", ["none", "shift"])
def test_pallas_energy_virial_outputs(monkeypatch, mode):
    """want="all": the kernel's energy/virial outputs match the XLA path."""
    dense, spec = _dense_system()
    tables, r_cut = _plj_tables()
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode=mode, want="all", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    for field in ("force", "energy", "virial"):
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            g, r, atol=3e-5 * scale, rtol=3e-5, err_msg=field
        )


@pytest.mark.parametrize("want", ["force", "all"])
def test_pallas_two_types_bilinear(monkeypatch, want):
    """T=2: per-pair parameters via exact bilinear interpolation match the
    XLA one-hot path, including asymmetric tables and a disabled pair."""
    rng = np.random.default_rng(7)
    # small box: interpret-mode Pallas walks the grid in Python, so wall
    # clock scales with cell count; production shapes are burst-checked
    # on the chip (scripts/tpu_burst_check.py)
    N, L = 260, 9.6
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A", "B"]
    snap.particles.typeid[:] = rng.integers(0, 2, N)
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * L
    state, _, _ = state_from_snapshot(snap)
    spec = D.GridSpec.create(state.box, N, r_cut=1.5, buffer=0.3)
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)

    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute
    vals = {
        (0, 0): dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0),
        (0, 1): dict(epsilon=0.6, sigma=1.1, attraction_scale_factor=0.5),
        (1, 1): dict(epsilon=0.0, sigma=1.0, attraction_scale_factor=0.0),
    }
    keys = prec(vals[(0, 0)]).keys()
    tables = {k: np.zeros((2, 2), np.float32) for k in keys}
    for (a, b), v in vals.items():
        p = prec(v)
        for k in keys:
            tables[k][a, b] = tables[k][b, a] = p[k]
    tables = {k: jnp.asarray(v) for k, v in tables.items()}
    r_cut = jnp.asarray([[1.5, 1.3], [1.3, 0.0]], jnp.float32)
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=True)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="shift", want=want, masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    fields = ("force",) if want == "force" else ("force", "energy", "virial")
    for field in fields:
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            g, r, atol=3e-5 * scale, rtol=3e-5, err_msg=field
        )


@pytest.mark.parametrize("r_on", [1.0, 2.0])
def test_pallas_xplor_matches_xla(monkeypatch, r_on):
    """xplor smoothing inside the kernel closure, both regimes:
    r_on < r_cut (smoothed) and r_on >= r_cut (plain shift fallback)."""
    dense, spec = _dense_system()
    tables, r_cut = _plj_tables()
    r_on_t = jnp.full((1, 1), r_on, jnp.float32)
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut, r_on_table=r_on_t,
            mode="xplor", want="all", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    for field in ("force", "energy", "virial"):
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            g, r, atol=3e-5 * scale, rtol=3e-5, err_msg=field
        )


@pytest.mark.parametrize("masked", [False, True])
def test_pallas_dpd_matches_xla(monkeypatch, masked):
    """DPD with the Threefry traced into the kernel: noise keyed on sorted
    tags is bitwise identical pair-by-pair, so forces match the XLA half
    path to summation-order rounding."""
    rng = np.random.default_rng(13)
    dense, spec = _dense_system(N=500)
    S = dense.position.shape[0]
    vel = jnp.asarray(rng.normal(0, 1, (S, 3)), jnp.float32)
    vel = jnp.where((dense.tag >= 0)[:, None], vel, 0.0)
    dense = dense.replace(velocity=vel)
    tables = {
        "A": jnp.full((1, 1), 25.0, jnp.float32),
        "gamma": jnp.full((1, 1), 4.5, jnp.float32),
        "s": jnp.full((1, 1), 0.5, jnp.float32),
    }
    r_cut = jnp.full((1, 1), 1.5, jnp.float32)

    def run():
        jb = D.make_jblocks(
            dense, spec, need_velocity=True, need_tag=True, half=True,
            need_typeid=masked,
        )
        return D.dense_dpd_force(
            dense, jb, spec, tables, r_cut, kT=1.2, dt=0.01, seed=11,
            timestep=jnp.int32(77), want="force", masked=masked,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    f_ref = np.asarray(ref.force)
    scale = max(np.abs(f_ref).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(got.force), f_ref, atol=5e-5 * scale, rtol=5e-5
    )


# two of the four (mode, masked) combos cover both axes (~50s each in
# interpret mode; the dropped combos exercise no distinct code path)
@pytest.mark.parametrize("mode,masked", [("none", False), ("shift", True)])
def test_pallas_aniso_matches_xla(monkeypatch, mode, masked):
    """TwoPatchMorse force AND per-side torques through the Pallas kernel
    (quaternions on the extra-plane channel) match the XLA half path."""
    from azplugins_tpu.ops.evaluators.aniso import ANISO_PAIR_POTENTIALS

    rng = np.random.default_rng(17)
    dense, spec = _dense_system(N=400)
    S = dense.position.shape[0]
    q = rng.normal(size=(S, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    quat = jnp.where(
        (dense.tag >= 0)[:, None],
        jnp.asarray(q, jnp.float32),
        jnp.asarray([1.0, 0, 0, 0], jnp.float32),
    )
    dense = dense.replace(orientation=quat)
    prec = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].precompute(
        dict(M_d=1.5, M_r=0.2, r_eq=1.0, omega=15.0, alpha=0.5, repulsion=True)
    )
    tables = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in prec.items()}
    r_cut = jnp.full((1, 1), 1.5, jnp.float32)
    ef = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].energy_force_torque

    def run():
        jb = D.make_jblocks(
            dense, spec, need_quat=True, half=True, need_typeid=masked
        )
        return D.dense_aniso_force(
            ef, dense, jb, spec, tables, r_cut,
            mode=mode, want="force", masked=masked,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    for field in ("force", "torque"):
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            g, r, atol=3e-5 * scale, rtol=3e-5, err_msg=field
        )


def test_pallas_dpd_two_types(monkeypatch):
    """Two-type DPD mixture through the kernel: bilinear A/gamma/s/rcut/
    sigma tables plus in-kernel Threefry."""
    rng = np.random.default_rng(23)
    N, L = 500, 12.0
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A", "B"]
    snap.particles.typeid[:] = rng.integers(0, 2, N)
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * L
    state, _, _ = state_from_snapshot(snap)
    state = state.replace(
        velocity=jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
    )
    spec = D.GridSpec.create(state.box, N, r_cut=1.5, buffer=0.3)
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)
    tables = {
        "A": jnp.asarray([[25.0, 40.0], [40.0, 15.0]], jnp.float32),
        "gamma": jnp.asarray([[4.5, 3.0], [3.0, 6.0]], jnp.float32),
        "s": jnp.asarray([[0.5, 1.0], [1.0, 2.0]], jnp.float32),
    }
    r_cut = jnp.asarray([[1.0, 1.2], [1.2, 1.4]], jnp.float32)

    def run():
        jb = D.make_jblocks(
            dense, spec, need_velocity=True, need_tag=True, half=True,
            need_typeid=True,
        )
        return D.dense_dpd_force(
            dense, jb, spec, tables, r_cut, kT=1.0, dt=0.01, seed=9,
            timestep=jnp.int32(123), want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    f_ref = np.asarray(ref.force)
    scale = max(np.abs(f_ref).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(got.force), f_ref, atol=5e-5 * scale, rtol=5e-5
    )


@pytest.mark.parametrize("want", ["force", "all"])
def test_pallas_masked_tilted_box(monkeypatch, want):
    """Tilted-box (masked) grids through the kernel: triclinic pre-shifted
    stencil + validity planes folded into rsq."""
    rng = np.random.default_rng(29)
    N = 400
    L = (12.0, 11.5, 12.5)
    tilt = (0.3, -0.1, 0.2)
    snap = az.Snapshot(N=N)
    snap.configuration.box = list(L) + list(tilt)
    snap.particles.types = ["A"]
    frac = rng.random((N, 3)) - 0.5
    x = frac[:, 0] * L[0] + frac[:, 1] * tilt[0] * L[1] + frac[:, 2] * tilt[1] * L[2]
    y = frac[:, 1] * L[1] + frac[:, 2] * tilt[2] * L[2]
    z = frac[:, 2] * L[2]
    snap.particles.position[:] = np.stack([x, y, z], axis=1)
    state, _, _ = state_from_snapshot(snap)
    spec = D.GridSpec.create(state.box, N, r_cut=1.5, buffer=0.3)
    assert spec.newton_ok
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)
    tables, r_cut = _plj_tables()
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=True)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="shift", want=want, masked=True,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    fields = ("force",) if want == "force" else ("force", "energy", "virial")
    for field in fields:
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            g, r, atol=3e-5 * scale, rtol=3e-5, err_msg=field
        )


# interpret-mode cost scales with the grid (program count x subtile
# body evals), not N: the 5^3 grid keeps these tests fast while the
# single-type tests cover the larger-grid shapes
def _multi_type_system(T, N=260, L=9.6, seed=31, velocities=False):
    rng = np.random.default_rng(seed)
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = [chr(ord("A") + k) for k in range(T)]
    snap.particles.typeid[:] = rng.integers(0, T, N)
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * L
    state, _, _ = state_from_snapshot(snap)
    if velocities:
        state = state.replace(
            velocity=jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
        )
    spec = D.GridSpec.create(state.box, N, r_cut=1.5, buffer=0.3)
    dense, meta = D.densify(state, spec)
    while bool(meta.overflow):
        spec = spec.grow()
        dense, meta = D.densify(state, spec)
    return dense, spec


def _plj_tables_T(T, seed=5):
    """[T, T] PLJ tables, every pair distinct, one pair disabled."""
    rng = np.random.default_rng(seed)
    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute
    keys = list(prec({"epsilon": 1, "sigma": 1, "attraction_scale_factor": 1}))
    tabs = {k: np.zeros((T, T), np.float32) for k in keys}
    r_cut = np.zeros((T, T), np.float32)
    for a in range(T):
        for b in range(a, T):
            p = prec({
                "epsilon": float(rng.uniform(0.4, 1.4)),
                "sigma": float(rng.uniform(0.9, 1.1)),
                "attraction_scale_factor": float(rng.uniform(0.0, 1.0)),
            })
            for k in keys:
                tabs[k][a, b] = tabs[k][b, a] = p[k]
            r_cut[a, b] = r_cut[b, a] = float(rng.uniform(1.2, 1.5))
    r_cut[T - 1, 0] = r_cut[0, T - 1] = 0.0  # disabled pair
    return (
        {k: jnp.asarray(v) for k, v in tabs.items()},
        jnp.asarray(r_cut, jnp.float32),
    )


# two combos cover every distinct code path: (3, all) = one-hot stride 9
# with the full accumulator set, (4, force) = stride 16 + the fast
# force_divr closure; further combos re-cover the same branches at ~30s
# of interpret-mode wall-clock each
@pytest.mark.parametrize("T,want", [(3, "all"), (4, "force")])
def test_pallas_multi_types_one_hot(monkeypatch, T, want):
    """T in (3, 4): per-pair parameters via the exact one-hot contraction
    (_table_scalars) match the XLA one-hot path, including a disabled
    pair (r_cut 0)."""
    dense, spec = _multi_type_system(T)
    tables, r_cut = _plj_tables_T(T)
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=True)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="shift", want=want, masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    fields = ("force",) if want == "force" else ("force", "energy", "virial")
    for field in fields:
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            g, r, atol=3e-5 * scale, rtol=3e-5, err_msg=field
        )


def test_pallas_dpd_three_types(monkeypatch):
    """Three-type DPD mixture through the kernel: one-hot A/gamma/s/rcut/
    sigma tables plus in-kernel Threefry."""
    rng = np.random.default_rng(41)
    dense, spec = _multi_type_system(3, velocities=True, seed=41)
    tables = {
        "A": jnp.asarray(rng.uniform(10, 40, (3, 3)), jnp.float32),
        "gamma": jnp.asarray(rng.uniform(2, 6, (3, 3)), jnp.float32),
        "s": jnp.asarray(rng.uniform(0.5, 2, (3, 3)), jnp.float32),
    }
    tables = {k: (v + v.T) / 2 for k, v in tables.items()}
    rc = rng.uniform(1.0, 1.5, (3, 3))
    r_cut = jnp.asarray((rc + rc.T) / 2, jnp.float32)

    def run():
        jb = D.make_jblocks(
            dense, spec, need_velocity=True, need_tag=True, half=True,
            need_typeid=True,
        )
        return D.dense_dpd_force(
            dense, jb, spec, tables, r_cut, kT=1.0, dt=0.01, seed=9,
            timestep=jnp.int32(321), want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    f_ref = np.asarray(ref.force)
    scale = max(np.abs(f_ref).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(got.force), f_ref, atol=5e-5 * scale, rtol=5e-5
    )


def test_pallas_aniso_two_types(monkeypatch):
    """Two-type TwoPatchMorse through the kernel: bilinear parameter
    reconstruction on the typeid plane after the quaternion planes."""
    from azplugins_tpu.ops.evaluators.aniso import ANISO_PAIR_POTENTIALS

    rng = np.random.default_rng(43)
    dense, spec = _multi_type_system(2, seed=43)
    S = dense.position.shape[0]
    q = rng.normal(size=(S, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    quat = jnp.where(
        (dense.tag >= 0)[:, None],
        jnp.asarray(q, jnp.float32),
        jnp.asarray([1.0, 0, 0, 0], jnp.float32),
    )
    dense = dense.replace(orientation=quat)
    prec = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].precompute
    vals = {
        (0, 0): dict(M_d=1.5, M_r=0.2, r_eq=1.0, omega=15.0, alpha=0.5,
                     repulsion=True),
        (0, 1): dict(M_d=0.8, M_r=0.25, r_eq=1.1, omega=10.0, alpha=0.4,
                     repulsion=True),
        (1, 1): dict(M_d=2.0, M_r=0.15, r_eq=0.9, omega=20.0, alpha=0.6,
                     repulsion=True),
    }
    keys = list(prec(vals[(0, 0)]))
    tables = {k: np.zeros((2, 2), np.float32) for k in keys}
    for (a, b), v in vals.items():
        p = prec(v)
        for k in keys:
            tables[k][a, b] = tables[k][b, a] = p[k]
    tables = {k: jnp.asarray(v) for k, v in tables.items()}
    r_cut = jnp.asarray([[1.5, 1.4], [1.4, 1.3]], jnp.float32)
    ef = ANISO_PAIR_POTENTIALS["TwoPatchMorse"].energy_force_torque

    def run():
        jb = D.make_jblocks(
            dense, spec, need_quat=True, half=True, need_typeid=True
        )
        return D.dense_aniso_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="shift", want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    for field in ("force", "torque"):
        r = np.asarray(getattr(ref, field))
        g = np.asarray(getattr(got, field))
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(
            g, r, atol=3e-5 * scale, rtol=3e-5, err_msg=field
        )


def test_pallas_cell_block_256(monkeypatch):
    """The 256-lane block width (the 64k production choice) on a small
    grid: C=216 pads to one 256-lane block, exercising the wide-bounds
    reshape and sentinel padding."""
    dense, spec = _dense_system()
    tables, r_cut = _plj_tables()
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="none", want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    monkeypatch.setenv("AZTPU_CELL_BLOCK", "256")
    got = run()
    scale = np.abs(np.asarray(ref.force)).max()
    np.testing.assert_allclose(
        np.asarray(got.force), np.asarray(ref.force),
        atol=2e-5 * scale, rtol=2e-5,
    )


def test_pallas_cell_padding(monkeypatch):
    """Cell counts not divisible by the 128-lane block exercise padding."""
    dense, spec = _dense_system(N=200, L=9.0)  # 5^3 = 125 cells
    assert spec.n_cells % 128 != 0
    tables, r_cut = _plj_tables()
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="none", want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    got = run()
    scale = np.abs(np.asarray(ref.force)).max()
    np.testing.assert_allclose(
        np.asarray(got.force), np.asarray(ref.force),
        atol=2e-5 * scale, rtol=2e-5,
    )


def test_pallas_subtile_24(monkeypatch):
    """H=24 j-subtiles (the round-5 dense-tight-cap production choice,
    cap 48 = 2 subtiles of 24): parity vs the XLA path, exercising the
    multi-subtile triangle self-block (n_tri = cap_pad // H = 2) and
    the 24-row skip quantum."""
    rng = np.random.default_rng(3)
    N, L = 400, 12.0
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * L
    state, _, _ = state_from_snapshot(snap)
    spec = D.GridSpec.create(state.box, N, r_cut=1.5, buffer=0.3)
    spec48 = spec.replace(cap=48)  # pad-free for H=24: cap_pad = 48
    dense, meta = D.densify(state, spec48)
    assert not bool(meta.overflow)
    tables, r_cut = _plj_tables()
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec48, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec48, tables, r_cut,
            mode="none", want="force", masked=False,
        )

    monkeypatch.setenv("AZTPU_PALLAS", "0")
    ref = run()
    monkeypatch.setenv("AZTPU_PALLAS", "1")
    monkeypatch.setenv("AZTPU_SUBTILE_H", "24")
    got = run()
    scale = np.abs(np.asarray(ref.force)).max()
    np.testing.assert_allclose(
        np.asarray(got.force), np.asarray(ref.force),
        atol=2e-5 * scale, rtol=2e-5,
    )


def test_choose_subtile_h_occupancy_model():
    """The tune-time H choice follows the occupancy block structure.

    Exact-work model (ops/dense.py choose_subtile_h, chip-calibrated —
    BENCH.md round 5 "Occupancy-model subtile choice"): a dense
    homogeneous grid has no skippable subtiles, so per-i-group fixed
    costs favor the largest pad-free H; a dilute grid needs the finest
    skip quantum.
    """
    # dense homogeneous: occ 37-45 everywhere at cap 48 (the 64k
    # headline regime) -> H=24 (W flat across H, fewest i-group entries)
    spec48 = D.GridSpec(dims=(12, 12, 12), cap=48, r_cut=1.0, buffer=0.4)
    rng = np.random.default_rng(1)
    occ = rng.integers(37, 46, size=12**3)
    assert D.choose_subtile_h(occ, spec48) == 24

    # dilute: occ <= 8 at cap 8 (patchy regime) -> H=8 (every taller
    # subtile evaluates empty rows in every block)
    spec8 = D.GridSpec(dims=(23, 23, 23), cap=8, r_cut=1.0, buffer=0.4)
    occ = rng.integers(0, 9, size=23**3)
    assert D.choose_subtile_h(occ, spec8) == 8


def test_tune_installs_subtile_choice(lattice_snapshot_factory):
    """tune_cell_capacity stores the model H in GridSpec.subtile and the
    simulation keeps producing identical physics afterwards."""
    snap = lattice_snapshot_factory(n=6, a=1.1)
    sim = az.Simulation(seed=3)
    sim.create_state_from_snapshot(snap)
    lj = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=2.5
    )
    lj.params[("A", "A")] = dict(
        epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0
    )
    sim.operations.integrator = az.md.Integrator(
        dt=0.005,
        methods=[az.md.methods.Langevin(kT=1.0, default_gamma=0.5)],
        forces=[lj],
    )
    sim.state.thermalize_particle_momenta(kT=1.0)
    sim.run(20)
    sim.tune_cell_capacity()
    assert sim._grid_spec.subtile in (8, 16, 24)
    sim.run(20)  # runs cleanly with the tuned subtile
    pos = np.asarray(sim.state.get_snapshot().particles.position)
    assert np.isfinite(pos).all()
