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
