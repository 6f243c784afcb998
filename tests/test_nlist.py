"""Neighbor pipeline tests: cell list binning vs brute force, rebuild logic."""

import jax.numpy as jnp
import numpy as np

import azplugins_tpu as az
from azplugins_tpu.ops.neighbor import (
    NeighborSpec,
    build_neighbor_list,
    needs_rebuild,
)


def brute_force_pairs(pos, box, r_list):
    """Reference neighbor sets via O(N^2) minimum-image distances."""
    pos = np.asarray(pos)
    N = pos.shape[0]
    out = [set() for _ in range(N)]
    dr = pos[:, None, :] - pos[None, :, :]
    dr = np.asarray(box.min_image(jnp.asarray(dr)))
    rsq = (dr**2).sum(-1)
    for i in range(N):
        for j in range(N):
            if i != j and rsq[i, j] < r_list**2:
                out[i].add(j)
    return out


def nlist_sets(idx, N):
    return [set(int(j) for j in row if j != N) for j in [None] for row in np.asarray(idx)]


def test_matches_brute_force():
    rng = np.random.default_rng(4)
    N = 300
    box = az.Box.from_lengths(8.0, 9.0, 10.0)
    pos = (rng.random((N, 3)) - 0.5) * np.array([8.0, 9.0, 10.0])
    spec = NeighborSpec.create(box, N, r_cut=1.5, buffer=0.3)
    nld = build_neighbor_list(jnp.asarray(pos, jnp.float32), box, spec)
    assert not bool(nld.overflow)

    expected = brute_force_pairs(pos, box, spec.r_list)
    got = nlist_sets(nld.idx, N)
    for i in range(N):
        assert got[i] == expected[i], f"particle {i}"


def test_small_box_no_duplicates():
    """Boxes only 1-2 cells wide must not produce duplicate neighbors."""
    rng = np.random.default_rng(7)
    N = 40
    box = az.Box.cube(4.0)
    pos = (rng.random((N, 3)) - 0.5) * 4.0
    spec = NeighborSpec.create(box, N, r_cut=1.5, buffer=0.3)
    assert max(spec.dims) <= 2
    nld = build_neighbor_list(jnp.asarray(pos, jnp.float32), box, spec)
    assert not bool(nld.overflow)
    idx = np.asarray(nld.idx)
    for i in range(N):
        row = [j for j in idx[i] if j != N]
        assert len(row) == len(set(row)), f"duplicates for particle {i}"
    expected = brute_force_pairs(pos, box, spec.r_list)
    got = nlist_sets(nld.idx, N)
    for i in range(N):
        assert got[i] == expected[i]


def test_overflow_flag():
    # 50 particles in one tiny cluster with capacity 4 -> must flag overflow
    box = az.Box.cube(10.0)
    pos = jnp.zeros((50, 3), jnp.float32) + jnp.linspace(0, 0.1, 50)[:, None]
    spec = NeighborSpec(r_cut=1.0, buffer=0.2, dims=(8, 8, 8), cell_capacity=4, n_max=8)
    nld = build_neighbor_list(pos, box, spec)
    assert bool(nld.overflow)


def test_needs_rebuild():
    box = az.Box.cube(10.0)
    pos = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]], jnp.float32)
    spec = NeighborSpec.create(box, 2, r_cut=1.5, buffer=0.4)
    nld = build_neighbor_list(pos, box, spec)
    assert not bool(needs_rebuild(nld, pos, box, spec.buffer))
    moved = pos.at[0, 0].add(0.19)
    assert not bool(needs_rebuild(nld, moved, box, spec.buffer))
    moved = pos.at[0, 0].add(0.21)
    assert bool(needs_rebuild(nld, moved, box, spec.buffer))


def test_capacity_growth_recovers():
    """Simulation transparently grows capacity when a dense cluster forms."""
    # all particles overlapping in a small region -> initial density estimate
    # is fine but local capacity overflows; run() must still be correct
    rng = np.random.default_rng(1)
    N = 64
    snap = az.Snapshot(N=N)
    snap.configuration.box = [12, 12, 12, 0, 0, 0]
    snap.particles.types = ["A"]
    # cluster all particles into a 1.5-wide blob in one corner
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * 1.5
    sim = az.Simulation(seed=3)
    sim.create_state_from_snapshot(snap)
    pot = az.pair.Hertz(nlist=az.md.nlist.Cell(buffer=0.3), default_r_cut=1.0)
    pot.params[("A", "A")] = dict(epsilon=1.0)
    integ = az.md.Integrator(dt=0.001, methods=[az.md.methods.ConstantVolume()], forces=[pot])
    sim.operations.integrator = integ
    sim.run(2)
    # after run, the grid must not be in overflow state
    assert not bool(sim._meta.overflow)
