"""Bond potential golden parity tests.

Table replicates /root/reference/src/pytest/test_bond.py:14-193 (analytic
truths): two bonded particles at distance d, energies split [U/2, U/2],
forces [[-f,0,0],[f,0,0]].
"""

import collections

import numpy
import pytest

import azplugins_tpu as az

PotentialTestCase = collections.namedtuple(
    "PotentialTestCase", ["potential", "params", "distance", "energy", "force"]
)

potential_tests = [
    # DoubleWell: first minimum, barrier top, second minimum
    PotentialTestCase(
        az.bond.DoubleWell, dict(r_0=0.5, r_1=2.5, U_1=5.0, U_tilt=0.0), 0.5, 0, 0
    ),
    PotentialTestCase(
        az.bond.DoubleWell, dict(r_0=0.5, r_1=2.5, U_1=5.0, U_tilt=0.0), 2.5, 5.0, 0
    ),
    PotentialTestCase(
        az.bond.DoubleWell, dict(r_0=0.5, r_1=2.5, U_1=5.0, U_tilt=0.0), 4.5, 0, 0
    ),
    PotentialTestCase(
        az.bond.DoubleWell, dict(r_0=1.0, r_1=2.0, U_1=1.0, U_tilt=0.0), 1.5, 0.5625, -1.5
    ),
    PotentialTestCase(
        az.bond.DoubleWell, dict(r_0=1.0, r_1=2.0, U_1=1.0, U_tilt=0.0), 2.5, 0.5625, 1.5
    ),
    PotentialTestCase(
        az.bond.DoubleWell, dict(r_0=1.0, r_1=2.0, U_1=1.0, U_tilt=0.5), 2.5, 1.03125, 0.25
    ),
    # Quartic
    PotentialTestCase(
        az.bond.Quartic,
        dict(k=1434.3, r_0=1.5, b_1=-0.7589, b_2=0, U_0=67.2234, sigma=0.0, epsilon=0.0, delta=0.0),
        1, 20.80586625, -99.2177025,
    ),
    PotentialTestCase(
        az.bond.Quartic,
        dict(epsilon=1.0, sigma=1.0, k=0.0, r_0=1.5, b_1=-0.7589, b_2=0, U_0=67.2234, delta=0),
        1, 68.2234, 24,
    ),
    PotentialTestCase(
        az.bond.Quartic,
        dict(epsilon=1.0, sigma=1.0, k=1434.3, r_0=1.5, b_1=-0.7589, b_2=0, U_0=67.2234, delta=0.0),
        1, 21.80586625, -75.2177025,
    ),
    PotentialTestCase(
        az.bond.Quartic,
        dict(epsilon=1.0, sigma=1.0, k=1434.3, r_0=1.5, b_1=-0.7589, b_2=0, U_0=67.2234, delta=0.5),
        1.5, 21.80586625, -75.2177025,
    ),
    PotentialTestCase(
        az.bond.Quartic,
        dict(epsilon=1.0, sigma=1.0, k=1434.3, r_0=1.5, b_1=-0.7589, b_2=0, U_0=67.2234, delta=0.0),
        1.5, 67.2234, 0,
    ),
    PotentialTestCase(
        az.bond.Quartic,
        dict(epsilon=1.0, sigma=1.0, k=1434.3, r_0=1.5, b_1=0, b_2=0, U_0=67.2234, delta=0.0),
        1.25, 72.82613438, 89.64375,
    ),
]


@pytest.mark.parametrize(
    "potential_test", potential_tests, ids=lambda x: x.potential.__name__
)
def test_energy_and_force(
    simulation_factory, bonded_two_particle_snapshot_factory, potential_test
):
    sim = simulation_factory(
        bonded_two_particle_snapshot_factory(d=potential_test.distance, L=30.0)
    )
    integrator = az.md.Integrator(dt=0.001)
    integrator.methods = [az.md.methods.ConstantVolume()]
    potential = potential_test.potential()
    potential.params["A-A"] = potential_test.params
    integrator.forces = [potential]
    sim.operations.integrator = integrator
    sim.run(0)

    got = potential.params["A-A"]
    for k, v in potential_test.params.items():
        assert got[k] == pytest.approx(v)

    e = potential_test.energy
    numpy.testing.assert_allclose(
        potential.energies, [0.5 * e, 0.5 * e], rtol=3e-5, atol=1e-4
    )
    f = potential_test.force
    numpy.testing.assert_allclose(
        potential.forces, [[-f, 0, 0], [f, 0, 0]], rtol=3e-5, atol=2e-4
    )
