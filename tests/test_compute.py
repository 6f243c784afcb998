"""Compute tests: COM velocity, velocity field binning (Cartesian +
cylindrical), bin-shape collapse, out-of-bounds exclusion.

Patterns follow /root/reference/src/pytest/test_compute.py:238-523.
"""

import numpy
import pytest

import azplugins_tpu as az


def _sim_with(positions, velocities, masses=None, L=20.0, seed=1):
    N = len(positions)
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = positions
    snap.particles.velocity[:] = velocities
    if masses is not None:
        snap.particles.mass[:] = masses
    sim = az.Simulation(seed=seed)
    sim.create_state_from_snapshot(snap)
    sim.operations.integrator = az.md.Integrator(
        dt=0.0, methods=[az.md.methods.ConstantVolume()]
    )
    return sim


def test_velocity_compute_com():
    sim = _sim_with(
        positions=[[0, 0, 0], [1, 0, 0]],
        velocities=[[2.0, 0, 0], [0, 0, 4.0]],
        masses=[1.0, 3.0],
    )
    vc = az.compute.VelocityCompute(filter=az.filter.All())
    sim.operations.computes.append(vc)
    sim.run(0)
    # COM velocity = (1*2 + 0, 0, 3*4) / 4
    numpy.testing.assert_allclose(vc.velocity, [0.5, 0.0, 3.0], atol=1e-6)


def test_velocity_compute_type_filter():
    snap = az.Snapshot(N=3)
    snap.configuration.box = [10, 10, 10, 0, 0, 0]
    snap.particles.types = ["A", "B"]
    snap.particles.typeid[:] = [0, 1, 0]
    snap.particles.velocity[:] = [[1, 0, 0], [5, 5, 5], [3, 0, 0]]
    sim = az.Simulation(seed=1)
    sim.create_state_from_snapshot(snap)
    sim.operations.integrator = az.md.Integrator(dt=0.0, methods=[az.md.methods.ConstantVolume()])
    vc = az.compute.VelocityCompute(filter=az.filter.Type(["A"]))
    sim.operations.computes.append(vc)
    sim.run(0)
    numpy.testing.assert_allclose(vc.velocity, [2.0, 0, 0], atol=1e-6)


@pytest.mark.parametrize(
    "num_bins,expected_shape",
    [
        ((4, 3, 2), (4, 3, 2, 3)),
        ((4, 3, 0), (4, 3, 3)),
        ((4, 0, 2), (4, 2, 3)),
        ((0, 3, 2), (3, 2, 3)),
        ((4, 0, 0), (4, 3)),
        ((0, 3, 0), (3, 3)),
        ((0, 0, 2), (2, 3)),
    ],
)
def test_cartesian_field_shape_collapse(num_bins, expected_shape):
    sim = _sim_with(positions=[[0, 0, 0]], velocities=[[1, 0, 0]])
    field = az.compute.CartesianVelocityFieldCompute(
        num_bins=num_bins,
        lower_bounds=(-5, -5, -5),
        upper_bounds=(5, 5, 5),
        filter=az.filter.All(),
    )
    sim.operations.computes.append(field)
    sim.run(0)
    assert field.velocities.shape == expected_shape


def test_cartesian_field_coordinates():
    sim = _sim_with(positions=[[0, 0, 0]], velocities=[[1, 0, 0]])
    field = az.compute.CartesianVelocityFieldCompute(
        num_bins=(4, 0, 0), lower_bounds=(-4, 0, 0), upper_bounds=(4, 0, 0),
        filter=az.filter.All(),
    )
    sim.operations.computes.append(field)
    sim.run(0)
    numpy.testing.assert_allclose(field.coordinates, [-3, -1, 1, 3])


def test_cartesian_field_assignment_and_average():
    # two particles in one bin (mass-weighted average), one in another,
    # one outside the bounds (excluded)
    sim = _sim_with(
        positions=[[-2.0, 0, 0], [-2.2, 0, 0], [2.0, 0, 0], [7.0, 0, 0]],
        velocities=[[1, 0, 0], [4, 0, 0], [-2, 0, 0], [9, 9, 9]],
        masses=[1.0, 3.0, 2.0, 1.0],
    )
    field = az.compute.CartesianVelocityFieldCompute(
        num_bins=(2, 0, 0), lower_bounds=(-5, 0, 0), upper_bounds=(5, 0, 0),
        filter=az.filter.All(),
    )
    sim.operations.computes.append(field)
    sim.run(0)
    v = field.velocities
    assert v.shape == (2, 3)
    # bin 0: (1*1 + 3*4)/4 = 3.25 ; bin 1: -2
    numpy.testing.assert_allclose(v[0], [3.25, 0, 0], atol=1e-6)
    numpy.testing.assert_allclose(v[1], [-2.0, 0, 0], atol=1e-6)


def test_whole_box_bin_equals_com_velocity():
    rng = numpy.random.default_rng(3)
    pos = (rng.random((20, 3)) - 0.5) * 18
    vel = rng.normal(size=(20, 3))
    mass = rng.random(20) + 0.5
    sim = _sim_with(pos, vel, mass)
    field = az.compute.CartesianVelocityFieldCompute(
        num_bins=(1, 1, 1), lower_bounds=(-10, -10, -10), upper_bounds=(10, 10, 10),
        filter=az.filter.All(),
    )
    vc = az.compute.VelocityCompute(filter=az.filter.All())
    sim.operations.computes.extend([field, vc])
    sim.run(0)
    numpy.testing.assert_allclose(
        field.velocities.reshape(3), vc.velocity, rtol=1e-5, atol=1e-6
    )


def test_cylindrical_field_basis_rotation():
    # particle at (0, 3, 1) -> theta = pi/2: v_r = vy, v_theta = -vx
    sim = _sim_with(
        positions=[[0.0, 3.0, 1.0]],
        velocities=[[2.0, 5.0, -1.0]],
    )
    field = az.compute.CylindricalVelocityFieldCompute(
        num_bins=(2, 4, 2),
        lower_bounds=(0, 0, -2),
        upper_bounds=(4, 2 * numpy.pi, 2),
        filter=az.filter.All(),
    )
    sim.operations.computes.append(field)
    sim.run(0)
    v = field.velocities
    assert v.shape == (2, 4, 2, 3)
    # r=3 -> bin 1; theta=pi/2 -> bin 1; z=1 -> bin 1
    numpy.testing.assert_allclose(v[1, 1, 1], [5.0, -2.0, -1.0], atol=1e-5)
    # all other bins empty
    total = numpy.abs(v).sum()
    numpy.testing.assert_allclose(total, 8.0, atol=1e-5)


def test_thermo_kinetic_temperature():
    sim = _sim_with(
        positions=[[0, 0, 0], [1, 0, 0]],
        velocities=[[1.0, 0, 0], [-1.0, 0, 0]],
    )
    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    sim.run(0)
    assert thermo.kinetic_energy == pytest.approx(1.0)
    assert thermo.translational_degrees_of_freedom == 3.0
    assert thermo.kinetic_temperature == pytest.approx(2.0 / 3.0)


def test_logging_contract():
    """Loggable-category contract (reference test_compute.py:105-115)."""
    from azplugins_tpu.logging import LoggerCategories, logging_check

    logging_check(
        az.compute.VelocityCompute,
        {"velocity": {"category": LoggerCategories.sequence, "default": True}},
    )
    logging_check(
        az.compute.ThermodynamicQuantities,
        {
            "kinetic_energy": {"category": LoggerCategories.scalar},
            "potential_energy": {"category": LoggerCategories.scalar},
            "kinetic_temperature": {"category": LoggerCategories.scalar},
            "pressure": {"category": LoggerCategories.scalar},
            "pressure_tensor": {"category": LoggerCategories.sequence},
            "translational_degrees_of_freedom": {
                "category": LoggerCategories.scalar
            },
        },
    )
    logging_check(
        az.pair.PerturbedLennardJones,
        {
            "energy": {"category": LoggerCategories.scalar, "default": True},
            "forces": {"category": LoggerCategories.particle, "default": True},
            "virials": {"category": LoggerCategories.particle, "default": False},
        },
    )


def test_logger_add_defaults(simulation_factory, two_particle_snapshot_factory):
    """Logger.add with no quantity list picks up default-on loggables."""
    sim = simulation_factory(two_particle_snapshot_factory(d=1.5))
    sim.operations.integrator = az.md.Integrator(
        dt=0.0, methods=[az.md.methods.ConstantVolume()]
    )
    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    thermo._attach(sim)
    sim.run(0)
    logger = az.write.Logger()
    logger.add(thermo)
    labels = logger.labels()
    assert any("kinetic_temperature" in l for l in labels)
    assert any("pressure" in l for l in labels)
    out = logger.sample()
    assert all(v is not None for v in out.values())


def test_pressure_two_particle(simulation_factory, two_particle_snapshot_factory):
    """Pressure from the virial: two particles at d with known f."""
    d = 1.1
    sim = simulation_factory(two_particle_snapshot_factory(d=d, L=20))
    lj = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=3.0
    )
    lj.params[("A", "A")] = dict(
        epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0
    )
    sim.operations.integrator = az.md.Integrator(
        dt=0.0, methods=[az.md.methods.ConstantVolume()], forces=[lj]
    )
    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    thermo._attach(sim)
    sim.run(0)
    # analytic LJ force at d (velocities are zero -> pure virial pressure)
    sr6 = (1.0 / d) ** 6
    f = 24.0 * (2.0 * sr6 * sr6 - sr6) / d
    W = f * d  # sum over pairs of r . F
    V = 20.0**3
    numpy.testing.assert_allclose(thermo.pressure, W / (3 * V), rtol=1e-4)
    pt = thermo.pressure_tensor
    numpy.testing.assert_allclose(pt[0], f * d / V, rtol=1e-4)  # P_xx
    numpy.testing.assert_allclose(pt[3], 0.0, atol=1e-7)


def test_dof_accounting(simulation_factory, two_particle_snapshot_factory):
    """NVE whole-system: 3N-3; Langevin thermostat: 3N (no COM mode)."""
    sim = simulation_factory(two_particle_snapshot_factory())
    sim.operations.integrator = az.md.Integrator(
        dt=0.0, methods=[az.md.methods.ConstantVolume()]
    )
    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    thermo._attach(sim)
    sim.run(0)
    assert thermo.translational_degrees_of_freedom == 3.0

    sim2 = simulation_factory(two_particle_snapshot_factory())
    sim2.operations.integrator = az.md.Integrator(
        dt=0.0, methods=[az.md.methods.Langevin(kT=1.0)]
    )
    thermo2 = az.compute.ThermodynamicQuantities()
    sim2.operations.computes.append(thermo2)
    thermo2._attach(sim2)
    sim2.run(0)
    assert thermo2.translational_degrees_of_freedom == 6.0


def test_compute_appended_after_run_attaches(
    two_particle_snapshot_factory, simulation_factory
):
    """A compute appended AFTER the first run() attaches on the next run
    (reference: HOOMD attaches pending operations at each run entry)."""
    sim = simulation_factory(two_particle_snapshot_factory())
    sim.operations.integrator = az.md.Integrator(
        dt=0.0, methods=[az.md.methods.ConstantVolume()]
    )
    sim.run(1)
    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    sim.run(1)
    assert thermo.kinetic_temperature >= 0.0
