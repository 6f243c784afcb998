"""Rotational dynamics: NO_SQUISH free rotor, NVE conservation, Langevin.

Validates the rotational integration the reference relies on HOOMD for
(torques from /root/reference/src/AnisoPairEvaluatorTwoPatchMorse.h:179-192
are integrated by HOOMD's NVE/Langevin; BASELINE config 4).
"""

import numpy as np
import pytest

import azplugins_tpu as az


def _quat_rotate(q, v):
    w, x, y, z = q
    qv = np.array([x, y, z])
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def test_free_rotor_principal_axis():
    """Spin about a principal axis advances the orientation at omega = L/I."""
    import jax.numpy as jnp

    from azplugins_tpu.md import rotation as R

    I = np.array([[2.0, 2.0, 4.0]], np.float32)
    L = 0.8
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    p = jnp.asarray([[0.0, 0.0, 0.0, 2.0 * L]], jnp.float32)  # 2 q (0, L e_z)
    dt = 0.01
    omega = L / I[0, 2]
    n_steps = 200
    for _ in range(n_steps):
        q, p = R.free_rotation(q, p, jnp.asarray(I), dt)
    theta = omega * dt * n_steps
    expect = np.array([np.cos(theta / 2), 0, 0, np.sin(theta / 2)])
    np.testing.assert_allclose(np.asarray(q)[0], expect, atol=1e-4)
    # L_body conserved
    Lb = np.asarray(R.body_angular_momentum(q, p))[0]
    np.testing.assert_allclose(Lb, [0, 0, L], atol=1e-5)


def test_free_rotor_energy_conservation():
    """Asymmetric-top tumbling conserves rotational KE and |L_body|^2 I-norm."""
    import jax.numpy as jnp

    from azplugins_tpu.md import rotation as R

    rng = np.random.default_rng(3)
    I = jnp.asarray([[1.0, 2.0, 3.5]], jnp.float32)
    q0 = rng.normal(size=4)
    q0 /= np.linalg.norm(q0)
    q = jnp.asarray(q0[None], jnp.float32)
    Lb = jnp.asarray([[0.4, -0.7, 0.9]], jnp.float32)
    p = 2.0 * R.quat_mul(
        q, jnp.concatenate([jnp.zeros((1, 1)), Lb], axis=-1)
    )
    ke0 = float(R.rotational_kinetic_energy(q, p, I))
    for _ in range(500):
        q, p = R.free_rotation(q, p, I, 0.005)
    ke1 = float(R.rotational_kinetic_energy(q, p, I))
    assert abs(ke1 - ke0) < 2e-3 * abs(ke0)
    # unit quaternion maintained
    assert abs(float(jnp.sum(q * q)) - 1.0) < 1e-5


def _patchy_sim(kT=None, seed=7, n=4, inertia=(1.0, 1.0, 1.0)):
    rng = np.random.default_rng(11)
    N, a = n**3, 1.4
    L = n * a
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["P"]
    x = (np.arange(n) + 0.5) * a - L / 2
    snap.particles.position[:] = np.stack(
        np.meshgrid(x, x, x, indexing="ij"), -1
    ).reshape(-1, 3)
    q = rng.normal(size=(N, 4))
    snap.particles.orientation[:] = q / np.linalg.norm(q, axis=1, keepdims=True)
    snap.particles.moment_inertia[:] = inertia

    sim = az.Simulation(seed=seed)
    sim.create_state_from_snapshot(snap)
    # conservation-test config: M_r chosen so U(r_cut) ~ 5e-4 * M_d. Both
    # the cutoff discontinuity (mode="none") and the orientation-dependent
    # shift term (mode="shift" — by reference semantics NOT included in the
    # torques, AnisoPairEvaluatorTwoPatchMorse.h:194-207) inject energy at
    # a dt-INDEPENDENT rate; a near-zero tail removes both so the test sees
    # the integrator, not the truncation
    patchy = az.pair.TwoPatchMorse(
        nlist=az.md.nlist.Cell(buffer=0.3), default_r_cut=1.6, mode="shift"
    )
    patchy.params[("P", "P")] = dict(
        M_d=0.5, M_r=0.08, r_eq=1.0, omega=4.0, alpha=0.4, repulsion=True
    )
    if kT is None:
        method = az.md.methods.ConstantVolume()
    else:
        method = az.md.methods.Langevin(kT=kT, default_gamma=0.5)
    sim.operations.integrator = az.md.Integrator(
        dt=0.002, methods=[method], forces=[patchy],
        integrate_rotational_dof=True,
    )
    return sim, patchy


def _total_energy(sim, patchy):
    from azplugins_tpu.md import rotation as R

    snap = sim.state.get_snapshot()
    v = snap.particles.velocity
    m = snap.particles.mass
    ke_t = 0.5 * float(np.sum(m[:, None] * v * v))
    import jax.numpy as jnp

    ke_r = float(
        R.rotational_kinetic_energy(
            jnp.asarray(snap.particles.orientation, jnp.float32),
            jnp.asarray(snap.particles.angmom, jnp.float32),
            jnp.asarray(snap.particles.moment_inertia, jnp.float32),
        )
    )
    return ke_t + ke_r + patchy.energy, ke_r


def test_nve_patchy_energy_conservation():
    """NVE with rotating patchy particles conserves total energy."""
    sim, patchy = _patchy_sim()
    sim.state.thermalize_particle_momenta(kT=0.2)
    sim.run(10)  # settle transients from the lattice start
    e0, _ = _total_energy(sim, patchy)
    sim.run(400)
    e1, ke_r1 = _total_energy(sim, patchy)
    N = sim.state.N_particles
    # rotational DOF actually active (torques pumped energy into spin)
    assert ke_r1 > 1e-4
    assert abs(e1 - e0) / N < 5e-4


def test_nve_orientations_evolve():
    sim, _ = _patchy_sim()
    sim.state.thermalize_particle_momenta(kT=0.3)
    q0 = sim.state.get_snapshot().particles.orientation.copy()
    sim.run(200)
    q1 = sim.state.get_snapshot().particles.orientation
    # orientations normalized and changed
    np.testing.assert_allclose(np.linalg.norm(q1, axis=1), 1.0, atol=1e-4)
    assert np.abs(q1 - q0).max() > 1e-3


def test_zero_inertia_axis_frozen():
    """A zero-inertia axis never rotates (uniaxial particle)."""
    import jax.numpy as jnp

    from azplugins_tpu.md import rotation as R

    # inertia only about z: body x/y axes frozen in the sense that
    # angular momentum about x/y cannot develop; spin about z works
    I = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    p = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    torque = jnp.asarray([[3.0, 3.0, 0.5]], jnp.float32)
    p = R.angmom_kick(q, p, torque, I, 0.01)
    Lb = np.asarray(R.body_angular_momentum(q, p))[0]
    # x/y torque components dropped; z component integrated
    np.testing.assert_allclose(Lb[:2], 0.0, atol=1e-6)
    assert Lb[2] > 0.5


def test_langevin_rotation_thermalizes():
    """Rotational KE relaxes toward (3/2) N kT under the Langevin kicks."""
    sim, patchy = _patchy_sim(kT=0.5, seed=3)
    sim.run(600)
    _, ke_r = _total_energy(sim, patchy)
    N = sim.state.N_particles
    kT_rot = 2.0 * ke_r / (3.0 * N)
    assert 0.3 < kT_rot < 0.75  # target 0.5 within statistical slop


def test_thermalize_angular_momenta():
    sim, _ = _patchy_sim()
    sim.state.thermalize_particle_momenta(kT=0.8)
    snap = sim.state.get_snapshot()
    assert np.abs(snap.particles.angmom).max() > 0
    import jax.numpy as jnp

    from azplugins_tpu.md import rotation as R

    ke_r = float(
        R.rotational_kinetic_energy(
            jnp.asarray(snap.particles.orientation, jnp.float32),
            jnp.asarray(snap.particles.angmom, jnp.float32),
            jnp.asarray(snap.particles.moment_inertia, jnp.float32),
        )
    )
    N = snap.particles.N
    kT_rot = 2.0 * ke_r / (3.0 * N)
    assert 0.6 < kT_rot < 1.05


def test_rotation_payload_survives_rebin():
    """Angular state rides the rebin sort bitwise across a run() boundary."""
    sim, _ = _patchy_sim()
    sim.state.thermalize_particle_momenta(kT=0.2)
    sim.run(25)  # crosses at least one rebuild (seg_len <= 10)
    snap = sim.state.get_snapshot()
    assert np.all(snap.particles.moment_inertia == [1.0, 1.0, 1.0])
    assert np.abs(snap.particles.angmom).max() > 0
