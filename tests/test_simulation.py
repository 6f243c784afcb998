"""End-to-end integration tests: conservation, thermostats, determinism."""

import numpy as np
import pytest

import azplugins_tpu as az


def _lj_fluid_sim(lattice_snapshot_factory, n=6, a=1.3, seed=7, kT=None, dt=0.002):
    snap = lattice_snapshot_factory(n=n, a=a)
    sim = az.Simulation(seed=seed)
    sim.create_state_from_snapshot(snap)
    cell = az.md.nlist.Cell(buffer=0.4)
    pot = az.pair.PerturbedLennardJones(nlist=cell, default_r_cut=2.5, mode="shift")
    pot.params[("A", "A")] = dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0)
    if kT is None:
        method = az.md.methods.ConstantVolume()
    else:
        method = az.md.methods.Langevin(kT=kT, default_gamma=1.0)
    integ = az.md.Integrator(dt=dt, methods=[method], forces=[pot])
    sim.operations.integrator = integ
    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    return sim, pot, thermo


def test_nve_energy_conservation(lattice_snapshot_factory):
    sim, pot, thermo = _lj_fluid_sim(lattice_snapshot_factory)
    sim.state.thermalize_particle_momenta(kT=0.7)
    sim.run(0)
    e0 = thermo.kinetic_energy + pot.energy
    sim.run(200)
    e1 = thermo.kinetic_energy + pot.energy
    n = sim.state.N_particles
    # drift per particle must be small over 200 steps
    assert abs(e1 - e0) / n < 5e-3


def test_langevin_thermostat_temperature(lattice_snapshot_factory):
    kT = 1.2
    sim, pot, thermo = _lj_fluid_sim(lattice_snapshot_factory, kT=kT, dt=0.005)
    sim.state.thermalize_particle_momenta(kT=kT)
    sim.run(400)
    samples = []
    for _ in range(20):
        sim.run(20)
        samples.append(thermo.kinetic_temperature)
    measured = np.mean(samples)
    assert measured == pytest.approx(kT, rel=0.1)


def test_determinism_same_seed(lattice_snapshot_factory):
    sim1, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=11)
    sim2, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=11)
    for s in (sim1, sim2):
        s.state.thermalize_particle_momenta(kT=1.0)
        s.run(50)
    p1 = sim1.state.get_snapshot().particles.position
    p2 = sim2.state.get_snapshot().particles.position
    np.testing.assert_array_equal(p1, p2)


def test_different_seed_differs(lattice_snapshot_factory):
    sim1, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=11)
    sim2, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=12)
    for s in (sim1, sim2):
        s.run(20)
    p1 = sim1.state.get_snapshot().particles.position
    p2 = sim2.state.get_snapshot().particles.position
    assert not np.allclose(p1, p2)


def test_momentum_conserved_nve(lattice_snapshot_factory):
    sim, _, _ = _lj_fluid_sim(lattice_snapshot_factory)
    sim.state.thermalize_particle_momenta(kT=0.7)
    snap = sim.state.get_snapshot()
    p0 = (snap.particles.velocity * snap.particles.mass[:, None]).sum(axis=0)
    sim.run(100)
    snap = sim.state.get_snapshot()
    p1 = (snap.particles.velocity * snap.particles.mass[:, None]).sum(axis=0)
    np.testing.assert_allclose(p1, p0, atol=5e-3)


def test_brownian_runs_and_moves(lattice_snapshot_factory):
    snap = lattice_snapshot_factory(n=4, a=1.5)
    sim = az.Simulation(seed=5)
    sim.create_state_from_snapshot(snap)
    cell = az.md.nlist.Cell(buffer=0.4)
    pot = az.pair.Hertz(nlist=cell, default_r_cut=1.2)
    pot.params[("A", "A")] = dict(epsilon=1.0)
    method = az.md.methods.Brownian(kT=1.0, default_gamma=2.0)
    sim.operations.integrator = az.md.Integrator(dt=0.0005, methods=[method], forces=[pot])
    p0 = sim.state.get_snapshot().particles.position
    sim.run(50)
    p1 = sim.state.get_snapshot().particles.position
    assert not np.allclose(p0, p1)
    # noiseless brownian with zero forces must not move at all
    sim2 = az.Simulation(seed=5)
    sim2.create_state_from_snapshot(lattice_snapshot_factory(n=4, a=1.5))
    m2 = az.md.methods.Brownian(kT=1.0, default_gamma=2.0, noiseless=True)
    sim2.operations.integrator = az.md.Integrator(dt=0.0005, methods=[m2], forces=[])
    sim2.run(10)
    p2 = sim2.state.get_snapshot().particles.position
    np.testing.assert_allclose(p2, lattice_snapshot_factory(n=4, a=1.5).particles.position, atol=1e-6)


def test_auto_tune_fires_and_preserves_chunking(lattice_snapshot_factory):
    """run() retunes itself at the absolute auto_tune_after step; the tune
    point is chunking-invariant, so differently-chunked runs across it
    stay bitwise identical."""

    def make():
        sim, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=3)
        sim.auto_tune_after = 60
        sim.state.thermalize_particle_momenta(kT=1.0)
        return sim

    sim1 = make()
    sim1.run(100)
    assert sim1._auto_tuned
    sim2 = make()
    for n in (30, 25, 45):
        sim2.run(n)
    assert sim2._auto_tuned
    p1 = sim1.state.get_snapshot().particles.position
    p2 = sim2.state.get_snapshot().particles.position
    np.testing.assert_array_equal(p1, p2)
    # a manual tune cancels the scheduled one
    sim3, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=3)
    sim3.run(0)
    sim3.tune_cell_capacity()
    assert sim3._auto_tuned


def test_auto_tune_not_refired_on_resume(lattice_snapshot_factory):
    """Setting the clock at/past auto_tune_after (checkpoint resume) must
    not re-fire the scheduled tune in the new process — the continuous
    run tuned back at the threshold, and a surprise mid-trajectory retune
    would reset the rebuild schedule."""
    sim, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=3)
    sim.auto_tune_after = 60
    sim.timestep = 100
    assert sim._auto_tuned
    calls = []
    orig = sim.tune_cell_capacity
    sim.tune_cell_capacity = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    sim.run(10)
    assert not calls
    # resuming BEFORE the threshold still tunes at it, like the
    # continuous run would
    sim2, _, _ = _lj_fluid_sim(lattice_snapshot_factory, kT=1.0, seed=3)
    sim2.auto_tune_after = 60
    sim2.timestep = 30
    assert not sim2._auto_tuned
    sim2.run(40)
    assert sim2._auto_tuned


def test_run_zero_then_observables(two_particle_snapshot_factory, simulation_factory):
    sim = simulation_factory(two_particle_snapshot_factory(d=1.0, L=20))
    pot = az.pair.Hertz(nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=2.0)
    pot.params[("A", "A")] = dict(epsilon=1.0)
    sim.operations.integrator = az.md.Integrator(
        dt=0.001, methods=[az.md.methods.ConstantVolume()], forces=[pot]
    )
    with pytest.raises(RuntimeError):
        _ = pot.energies  # before attach
    sim.run(0)
    assert pot.energies.shape == (2,)
    assert pot.forces.shape == (2, 3)
    assert pot.virials.shape == (2, 6)


def test_violation_halving_settles_not_cascades(lattice_snapshot_factory):
    """A Verlet-drift violation re-derives the rebuild interval from the
    current peak speed ONCE per genuine violation. The replay's unaligned
    prefix must run with per-step rebuilds: replaying it as a no-rebin
    continuation against the restored (pre-adjustment) rebuild reference
    re-violates immediately and cascades the interval all the way to 1
    (regression: observed on the droplet-evaporation benchmark, interval
    23 -> 1)."""
    # idle lattice + one ballistic particle drifting 0.0355/step against
    # the grid's claimed margin of 0.5 (cell width 3.0 - r_cut 2.5; the
    # grid absorbs the rounding slack into the buffer). With 7-step run()
    # chunks on a 16-step schedule the drift first exceeds the margin at
    # step 14 (15 drifts = 0.5325) — inside the chunk [14,16) that starts
    # 14 steps past the segment's rebuild reference. The replay of that
    # chunk at the re-derived interval starts unaligned: a no-rebin
    # continuation re-measures the same stale drift and cascades toward
    # 1; the per-step-rebuild prefix settles at the conservative
    # (safety 1.5) vmax estimate 0.25 / (7.1 * 0.005 * 1.5) = 4, ceiling
    # at the optimistic estimate
    # 0.25 / (7.1 * 0.005) = 7 (the pairwise drift criterion reserves
    # half the buffer per particle). A 7-step segment consumes 0.249 —
    # clean thereafter.
    snap = lattice_snapshot_factory(n=4, a=3.0)
    snap.particles.velocity[0] = [7.1, 0.0, 0.0]
    sim = az.Simulation(seed=3)
    sim.create_state_from_snapshot(snap)
    pot = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=2.5)
    pot.params[("A", "A")] = dict(
        epsilon=0.0, sigma=1.0, attraction_scale_factor=0.0)
    sim.operations.integrator = az.md.Integrator(
        dt=0.005, methods=[az.md.methods.ConstantVolume()], forces=[pot])
    sim.auto_tune_after = None
    sim.run(0)
    assert sim._grid_spec.buffer == 0.5  # the margin the drifts are sized to
    sim._seg_len = 16
    sim._seg_ceiling = 16
    sim._seg_adapt = False
    # odd chunking leaves the violation chunk start unaligned to the
    # re-derived schedule, which is what triggered the cascade
    for _ in range(12):
        sim.run(7)
    assert sim._seg_len == 4, (
        f"interval cascaded to {sim._seg_len}; expected to settle at the "
        "conservative (safety 1.5) vmax estimate 4"
    )
    assert sim._seg_ceiling == 7, (
        f"regrowth ceiling {sim._seg_ceiling}; expected the optimistic "
        "vmax estimate 7"
    )
    assert getattr(sim, "_viol_replays", 0) == 1, (
        "exactly one violation replay expected; chronic replays mean the "
        "re-derived interval is still optimistic"
    )
