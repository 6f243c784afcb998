"""Updater tests: TypeUpdater region retyping, ParticleEvaporator budget.

Behavior per /root/reference/src/TypeUpdater.cc:93-127 and
/root/reference/src/ParticleEvaporator.cc:64-174.
"""

import numpy
import pytest

import azplugins_tpu as az


def _sim(positions, typeids, types, L=20.0, seed=2):
    snap = az.Snapshot(N=len(positions))
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = types
    snap.particles.position[:] = positions
    snap.particles.typeid[:] = typeids
    sim = az.Simulation(seed=seed)
    sim.create_state_from_snapshot(snap)
    sim.operations.integrator = az.md.Integrator(
        dt=0.0, methods=[az.md.methods.ConstantVolume()]
    )
    return sim


def test_type_updater_flips_by_region():
    # region z in [0, 5): particles of type A/B flip accordingly; type C untouched
    sim = _sim(
        positions=[[0, 0, 1.0], [0, 0, -1.0], [0, 0, 2.0], [0, 0, 3.0]],
        typeids=[1, 0, 0, 2],  # B, A, A, C
        types=["A", "B", "C"],
    )
    up = az.update.TypeUpdater(
        trigger=1, inside_type="A", outside_type="B", lo=0.0, hi=5.0
    )
    sim.operations.updaters.append(up)
    sim.run(1)
    tid = sim.state.get_snapshot().particles.typeid
    assert tid[0] == 0  # B inside region -> A
    assert tid[1] == 1  # A outside region -> B
    assert tid[2] == 0  # A inside stays A
    assert tid[3] == 2  # C untouched


def test_type_updater_validation():
    sim = _sim([[0, 0, 0]], [0], ["A", "B"])
    with pytest.raises(ValueError):
        az.update.TypeUpdater(trigger=1, inside_type="A", outside_type="B", lo=3.0, hi=1.0)
    up = az.update.TypeUpdater(trigger=1, inside_type="A", outside_type="A", lo=0.0, hi=1.0)
    sim.operations.updaters.append(up)
    with pytest.raises(ValueError):
        sim.run(1)


def test_evaporator_under_budget_takes_all():
    # 3 solvent in slab, 1 outside, budget 10 -> all 3 flip
    sim = _sim(
        positions=[[0, 0, 0.5], [1, 1, 0.7], [2, 2, 0.9], [0, 0, -5.0]],
        typeids=[0, 0, 0, 0],
        types=["S", "Z"],
    )
    ev = az.update.ParticleEvaporator(
        trigger=1, solvent_type="S", evaporated_type="Z", lo=0.0, hi=1.0, N_evap_max=10
    )
    sim.operations.updaters.append(ev)
    sim.run(1)
    tid = sim.state.get_snapshot().particles.typeid
    assert list(tid) == [1, 1, 1, 0]


def test_evaporator_budget_limits_picks():
    # 20 solvent particles in the slab, budget 5 per firing
    N = 20
    pos = numpy.zeros((N, 3))
    pos[:, 2] = numpy.linspace(0.05, 0.95, N)
    pos[:, 0] = numpy.linspace(-5, 5, N)
    sim = _sim(pos, [0] * N, ["S", "Z"])
    ev = az.update.ParticleEvaporator(
        trigger=1, solvent_type="S", evaporated_type="Z", lo=0.0, hi=1.0, N_evap_max=5
    )
    sim.operations.updaters.append(ev)
    sim.run(1)
    tid = sim.state.get_snapshot().particles.typeid
    assert (tid == 1).sum() == 5
    sim.run(1)
    tid = sim.state.get_snapshot().particles.typeid
    assert (tid == 1).sum() == 10

    # deterministic: same seed, same picks
    sim2 = _sim(pos, [0] * N, ["S", "Z"])
    ev2 = az.update.ParticleEvaporator(
        trigger=1, solvent_type="S", evaporated_type="Z", lo=0.0, hi=1.0, N_evap_max=5
    )
    sim2.operations.updaters.append(ev2)
    sim2.run(2)
    numpy.testing.assert_array_equal(
        sim2.state.get_snapshot().particles.typeid, tid
    )


def test_evaporator_trigger_period():
    # trigger period 2: firing only on even steps (phase 0)
    pos = [[0, 0, 0.5], [0, 0, 0.6]]
    sim = _sim(pos, [0, 0], ["S", "Z"])
    ev = az.update.ParticleEvaporator(
        trigger=az.md.trigger.Periodic(2),
        solvent_type="S", evaporated_type="Z", lo=0.0, hi=1.0, N_evap_max=1,
    )
    sim.operations.updaters.append(ev)
    sim.run(1)  # step t=0 fires
    assert (sim.state.get_snapshot().particles.typeid == 1).sum() == 1
    sim.run(1)  # t=1 does not fire
    assert (sim.state.get_snapshot().particles.typeid == 1).sum() == 1
    sim.run(1)  # t=2 fires
    assert (sim.state.get_snapshot().particles.typeid == 1).sum() == 2
