"""Incremental (migrant-local) rebin vs the global fused-key sort.

The incremental path (AZTPU_INCREMENTAL_REBIN=1, ops/dense.py
_incremental_assembly) replaces the S-row global sort with a per-cell
lane sort plus a migrant-only sort. Its contract is BITWISE identity
with the global rebin — same membership, same in-cell order (by input
slot index), same overflow truncation — so trajectories cannot depend
on which path ran.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import azplugins_tpu as az
from azplugins_tpu.core.state import state_from_snapshot
from azplugins_tpu.ops import dense as D

_CMP_FIELDS = (
    "position", "velocity", "acceleration", "typeid", "tag", "image",
    "mass", "orientation",
)


def _system(N=900, L=(11.0, 9.5, 8.2), tilt=(0, 0, 0), types=1, seed=3):
    rng = np.random.default_rng(seed)
    snap = az.Snapshot(N=N)
    snap.configuration.box = list(L) + list(tilt)
    snap.particles.types = ["A", "B", "C"][:types]
    if types > 1:
        snap.particles.typeid[:] = rng.integers(0, types, N)
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * np.asarray(L)
    state, _, _ = state_from_snapshot(snap)
    state = state.replace(
        velocity=jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
    )
    spec = D.GridSpec.create(state.box, N, r_cut=1.6, buffer=0.4)
    occ = az.Simulation._max_occupancy_cap(state, spec)
    if occ > spec.cap:
        spec = spec.replace(cap=occ)
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)
    return dense, meta, spec, N


def _drift(dense, scale, seed):
    rng = np.random.default_rng(seed)
    S = dense.position.shape[0]
    dpos = jnp.asarray(rng.uniform(-scale, scale, (S, 3)), jnp.float32)
    dpos = jnp.where((dense.tag >= 0)[:, None], dpos, 0.0)
    return dense.replace(position=dense.position + dpos)


def _both_paths(monkeypatch, dense, meta, spec, N, **kw):
    monkeypatch.delenv("AZTPU_INCREMENTAL_REBIN", raising=False)
    ref = D.rebin(dense, meta, spec, N, **kw)
    monkeypatch.setenv("AZTPU_INCREMENTAL_REBIN", "1")
    got = D.rebin(dense, meta, spec, N, **kw)
    monkeypatch.delenv("AZTPU_INCREMENTAL_REBIN", raising=False)
    return ref, got


def _assert_bitwise(ref, got):
    ref_dense, ref_meta = ref
    got_dense, got_meta = got
    for f in _CMP_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref_dense, f)),
            np.asarray(getattr(got_dense, f)),
            err_msg=f,
        )
    np.testing.assert_array_equal(
        np.asarray(ref_meta.slot_of), np.asarray(got_meta.slot_of)
    )
    assert bool(ref_meta.overflow) == bool(got_meta.overflow)


@pytest.mark.parametrize("drift", [0.0, 0.3, 1.2])
@pytest.mark.parametrize("types", [1, 3])
def test_incremental_rebin_bitwise(monkeypatch, drift, types):
    dense, meta, spec, N = _system(types=types, seed=3 + types)
    if drift:
        dense = _drift(dense, drift, seed=11)
    ref, got = _both_paths(monkeypatch, dense, meta, spec, N)
    _assert_bitwise(ref, got)


def test_incremental_rebin_triclinic(monkeypatch):
    dense, meta, spec, N = _system(tilt=(0.2, -0.1, 0.15), seed=9)
    dense = _drift(dense, 0.5, seed=12)
    ref, got = _both_paths(monkeypatch, dense, meta, spec, N)
    _assert_bitwise(ref, got)


def test_incremental_rebin_overflow_truncation(monkeypatch):
    """Both paths flag overflow AND truncate identically (cap smallest
    input rows win) when a cell exceeds capacity."""
    dense, meta, spec, N = _system(seed=21)
    # pile many particles into one corner cell
    pos = np.asarray(dense.position).copy()
    tags = np.asarray(dense.tag)
    rows = np.where(tags >= 0)[0][: spec.cap + 8]
    pos[rows] = np.asarray([-5.2, -4.4, -3.8]) + np.random.default_rng(5).normal(
        0, 0.05, (len(rows), 3)
    )
    dense = dense.replace(position=jnp.asarray(pos, jnp.float32))
    ref, got = _both_paths(monkeypatch, dense, meta, spec, N)
    assert bool(ref[1].overflow) and bool(got[1].overflow)
    _assert_bitwise(ref, got)


def test_incremental_rebin_cond_fallback(monkeypatch):
    """A too-small per-cell arrival capacity must fall back to the global
    sort inside the cond — bitwise-equal output either way."""
    dense, meta, spec, N = _system(seed=33)
    dense = _drift(dense, 1.5, seed=14)  # heavy migration
    monkeypatch.setenv("AZTPU_REBIN_MC", "1")
    ref, got = _both_paths(monkeypatch, dense, meta, spec, N)
    _assert_bitwise(ref, got)


def test_incremental_rebin_trajectory_bitwise(monkeypatch):
    """A full Simulation trajectory with the incremental rebin active is
    bitwise identical to the global-rebin trajectory."""

    def make():
        rng = np.random.default_rng(8)
        N = 500
        L = [9.0, 9.0, 9.0]
        snap = az.Snapshot(N=N)
        snap.configuration.box = L + [0, 0, 0]
        snap.particles.types = ["A"]
        snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * np.asarray(L)
        sim = az.Simulation(seed=4)
        sim.create_state_from_snapshot(snap)
        pot = az.pair.Hertz(nlist=az.md.nlist.Cell(buffer=0.3), default_r_cut=1.5)
        pot.params[("A", "A")] = dict(epsilon=5.0)
        sim.operations.integrator = az.md.Integrator(
            dt=0.002,
            methods=[az.md.methods.Langevin(kT=0.8, default_gamma=1.0)],
            forces=[pot],
        )
        sim.state.thermalize_particle_momenta(kT=0.8)
        return sim

    monkeypatch.delenv("AZTPU_INCREMENTAL_REBIN", raising=False)
    ref = make()
    ref.run(40)
    ref_pos = np.asarray(ref.state.get_snapshot().particles.position)

    monkeypatch.setenv("AZTPU_INCREMENTAL_REBIN", "1")
    sim = make()
    sim.run(40)
    got_pos = np.asarray(sim.state.get_snapshot().particles.position)
    np.testing.assert_array_equal(ref_pos, got_pos)
