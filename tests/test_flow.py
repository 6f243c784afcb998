"""Flow fields + flow integrators.

Field values per /root/reference/src/ConstantFlow.h:48-51 and
/root/reference/src/ParabolicFlow.h:69-93; integrator drag behavior per
/root/reference/src/TwoStepLangevinFlow.h:159-249.
"""

import jax.numpy as jnp
import numpy
import pytest

import azplugins_tpu as az


def test_constant_flow_values():
    u = az.flow.ConstantFlow(velocity=(1.0, -2.0, 0.5))
    pos = jnp.asarray([[0.0, 0, 0], [5.0, 3.0, -1.0]])
    out = numpy.asarray(u(pos))
    numpy.testing.assert_allclose(out, [[1, -2, 0.5], [1, -2, 0.5]])
    assert u.velocity == (1.0, -2.0, 0.5)


def test_parabolic_flow_values():
    u = az.flow.ParabolicFlow(mean_velocity=2.0, separation=10.0)
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, -2.5, 3.0]])
    out = numpy.asarray(u(pos))
    # u_x(y) = 1.5 * 2 * (1 - (y/5)^2)
    numpy.testing.assert_allclose(out[0], [3.0, 0, 0], atol=1e-6)
    numpy.testing.assert_allclose(out[1], [0.0, 0, 0], atol=1e-6)
    numpy.testing.assert_allclose(out[2], [3.0 * (1 - 0.25), 0, 0], atol=1e-6)
    assert u.mean_velocity == 2.0
    assert u.separation == 10.0


def _free_sim(N=8, L=20.0, seed=3):
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    rng = numpy.random.default_rng(0)
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * 4
    sim = az.Simulation(seed=seed)
    sim.create_state_from_snapshot(snap)
    return sim


def test_langevin_flow_drags_to_flow_velocity():
    """Noiseless Langevin + constant flow: velocities relax to u."""
    sim = _free_sim()
    u = az.flow.ConstantFlow(velocity=(1.5, 0, 0))
    method = az.md.methods.LangevinFlow(
        kT=1.0, flow_field=u, default_gamma=5.0, noiseless=True
    )
    sim.operations.integrator = az.md.Integrator(dt=0.01, methods=[method], forces=[])
    sim.run(500)
    vel = sim.state.get_snapshot().particles.velocity
    numpy.testing.assert_allclose(vel[:, 0], 1.5, atol=1e-2)
    numpy.testing.assert_allclose(vel[:, 1:], 0.0, atol=1e-2)


def test_brownian_flow_advects():
    """Noiseless Brownian + flow with no forces: dr = u dt exactly."""
    sim = _free_sim()
    u = az.flow.ConstantFlow(velocity=(0.5, -0.25, 0))
    method = az.md.methods.BrownianFlow(
        kT=1.0, flow_field=u, default_gamma=1.0, noiseless=True
    )
    sim.operations.integrator = az.md.Integrator(dt=0.01, methods=[method], forces=[])
    p0 = sim.state.get_snapshot().particles.position
    sim.run(100)
    p1 = sim.state.get_snapshot().particles.position
    numpy.testing.assert_allclose(p1 - p0, [[0.5, -0.25, 0]] * 8, atol=1e-4)


def test_langevin_flow_parabolic_profile_tendency():
    """With parabolic flow, x-velocity at the center exceeds the edges."""
    N = 400
    snap = az.Snapshot(N=N)
    snap.configuration.box = [10, 10, 10, 0, 0, 0]
    snap.particles.types = ["A"]
    rng = numpy.random.default_rng(1)
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * 10
    sim = az.Simulation(seed=4)
    sim.create_state_from_snapshot(snap)
    u = az.flow.ParabolicFlow(mean_velocity=2.0, separation=10.0)
    method = az.md.methods.LangevinFlow(
        kT=0.1, flow_field=u, default_gamma=2.0, noiseless=False
    )
    sim.operations.integrator = az.md.Integrator(dt=0.005, methods=[method], forces=[])
    sim.run(800)
    snap_out = sim.state.get_snapshot()
    y = snap_out.particles.position[:, 1]
    vx = snap_out.particles.velocity[:, 0]
    center = numpy.abs(y) < 2.0
    edge = numpy.abs(y) > 4.0
    assert vx[center].mean() > vx[edge].mean() + 0.5


def test_flow_field_pickleable():
    import pickle

    for obj in (
        az.flow.ConstantFlow(velocity=(1, 2, 3)),
        az.flow.ParabolicFlow(mean_velocity=1.0, separation=5.0),
    ):
        clone = pickle.loads(pickle.dumps(obj))
        assert type(clone) is type(obj)
