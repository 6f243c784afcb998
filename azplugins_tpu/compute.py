"""Computes: center-of-mass velocity, binned velocity fields, thermo.

Mirrors ``hoomd.azplugins.compute`` (/root/reference/src/compute.py) plus a
minimal ThermodynamicQuantities (the HOOMD substrate quantity used by the
reference's DPD statistical test, src/pytest/test_pair_dpd.py:19-46).

All computes are lazy pull-path observables (SURVEY §3.3): accessing the
property runs a small jitted reduction on the current state. Multi-device
meshes reduce with psum instead of the reference's MPI_Allreduce
(/root/reference/src/VelocityCompute.cc:50-63).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .logging import log
from .md.filter import All, ParticleFilter
from .ops.binning import bin_particles, cartesian_coords, cylindrical_coords

__all__ = [
    "VelocityCompute",
    "VelocityFieldCompute",
    "CartesianVelocityFieldCompute",
    "CylindricalVelocityFieldCompute",
    "ThermodynamicQuantities",
]


class Compute:
    def __init__(self):
        self._sim = None
        self._attached = False

    def _attach(self, sim):
        self._sim = sim
        self._attached = True

    def _require_attached(self, what: str):
        if not self._attached:
            raise RuntimeError(f"{what} is not available before attaching (run sim.run(0))")


class VelocityCompute(Compute):
    """Center-of-mass velocity of a particle group.

    Parity: /root/reference/src/compute.py:18-91,
    /root/reference/src/VelocityCompute.cc:50-76.
    """

    def __init__(self, filter: ParticleFilter | None = None, include_mpcd_particles=False):
        super().__init__()
        # filter=None + include_mpcd_particles=True is a valid reference
        # configuration (MPCD solvent only); both None/False selects nothing
        self.filter = filter
        self.include_mpcd_particles = bool(include_mpcd_particles)
        self._mask = None

    def _attach(self, sim):
        super()._attach(sim)
        if self.include_mpcd_particles and sim._mpcd is None:
            raise ValueError(
                "include_mpcd_particles=True but the snapshot carried no "
                "MPCD particles (snapshot.mpcd)"
            )
        typeids = np.asarray(sim._synced_state().typeid)
        if self.filter is None:
            self._mask = jnp.zeros(typeids.shape[0], dtype=bool)
        else:
            self._mask = jnp.asarray(self.filter.mask(typeids, sim._particle_types))

    @log(category="sequence", requires_run=True)
    def velocity(self):
        """Center-of-mass velocity of the group (loggable, category
        "sequence" — the contract the reference tests at
        /root/reference/src/pytest/test_compute.py:105-115). With
        ``include_mpcd_particles`` the MPCD solvent stream joins the
        momentum/mass sums (reference VelocityCompute.cc:50-76 via the
        ParticleDataLoader pair)."""
        self._require_attached("velocity")
        state = self._sim._synced_state()
        m = jnp.where(self._mask, state.mass, 0.0)
        mom = jnp.sum(state.velocity * m[:, None], axis=0)
        mtot = jnp.sum(m)
        if self.include_mpcd_particles:
            mpcd = self._sim._mpcd
            mom = mom + mpcd["mass"] * jnp.sum(mpcd["velocity"], axis=0)
            mtot = mtot + mpcd["mass"] * mpcd["velocity"].shape[0]
        return np.asarray(mom / jnp.maximum(mtot, 1e-38))


class VelocityFieldCompute(Compute):
    """Mass-averaged velocity field on a <=3D grid. Use a derived type.

    Parity: /root/reference/src/compute.py:94-246,
    /root/reference/src/VelocityFieldCompute.h:27-353.
    """

    _coord_fn = None

    def __init__(self, num_bins, lower_bounds, upper_bounds, filter=None,
                 include_mpcd_particles=False):
        super().__init__()
        if type(self)._coord_fn is None:
            raise TypeError(
                "VelocityFieldCompute is abstract; use "
                "CartesianVelocityFieldCompute or "
                "CylindricalVelocityFieldCompute"
            )
        self.include_mpcd_particles = bool(include_mpcd_particles)
        self.num_bins = tuple(int(b) for b in num_bins)
        self.lower_bounds = tuple(float(b) for b in lower_bounds)
        self.upper_bounds = tuple(float(b) for b in upper_bounds)
        if len(self.num_bins) != 3:
            raise ValueError("num_bins must have 3 entries")
        self.filter = filter
        self._mask = None
        self._calc_jit = None

    def _attach(self, sim):
        super()._attach(sim)
        if self.include_mpcd_particles and sim._mpcd is None:
            raise ValueError(
                "include_mpcd_particles=True but the snapshot carried no "
                "MPCD particles (snapshot.mpcd)"
            )
        typeids = np.asarray(sim._synced_state().typeid)
        if self.filter is None:
            self._mask = jnp.zeros(typeids.shape[0], dtype=bool)
        else:
            self._mask = jnp.asarray(self.filter.mask(typeids, sim._particle_types))

    @property
    def coordinates(self):
        """Bin center coordinates (compact shape, like the reference)."""
        coords = []
        shape = []
        for num, lo, hi in zip(self.num_bins, self.lower_bounds, self.upper_bounds):
            if num > 0:
                x, dx = np.linspace(lo, hi, num, endpoint=False, retstep=True)
                x = x + 0.5 * dx
                coords.append(x)
                shape.append(num)
        if len(shape) == 0:
            return None
        if len(shape) > 1:
            shape.append(len(shape))
        return np.reshape(list(itertools.product(*coords)), shape)

    def _compact_shape(self):
        return tuple(b for b in self.num_bins if b > 0)

    @log(category="object", requires_run=True)
    def velocities(self):
        """Mass-averaged velocity per bin (compact shape + vector axis)."""
        self._require_attached("velocities")
        state = self._sim._synced_state()
        if self._calc_jit is None:
            num_bins = self.num_bins
            lower = self.lower_bounds
            upper = self.upper_bounds
            coord_fn = type(self)._coord_fn
            with_mpcd = self.include_mpcd_particles

            def _grids(position, velocity, mass, image, mask, box):
                pos, _ = box.wrap(position, image)
                coords, vel = coord_fn(pos, velocity)
                return bin_particles(
                    coords, vel, mass, mask, num_bins, lower, upper
                )

            def _calc(position, velocity, mass, image, mask, box,
                      mpcd_pos=None, mpcd_vel=None, mpcd_mass=None):
                mass_grid, mom_grid = _grids(
                    position, velocity, mass, image, mask, box
                )
                if with_mpcd:
                    n_mpcd = mpcd_pos.shape[0]
                    mg2, pg2 = _grids(
                        mpcd_pos, mpcd_vel,
                        jnp.full((n_mpcd,), mpcd_mass, jnp.float32),
                        jnp.zeros((n_mpcd, 3), jnp.int32),
                        jnp.ones((n_mpcd,), bool), box,
                    )
                    mass_grid = mass_grid + mg2
                    mom_grid = mom_grid + pg2
                m_safe = jnp.where(mass_grid > 0, mass_grid, 1.0)
                return jnp.where(
                    (mass_grid > 0)[:, None], mom_grid / m_safe[:, None], 0.0
                )

            # cache the jitted wrapper: jax.jit caches per wrapper object
            self._calc_jit = jax.jit(_calc)
        args = [
            state.position, state.velocity, state.mass, state.image,
            self._mask, state.box,
        ]
        if self.include_mpcd_particles:
            mpcd = self._sim._mpcd
            args += [mpcd["position"], mpcd["velocity"],
                     jnp.float32(mpcd["mass"])]
        v = np.asarray(self._calc_jit(*args))
        return v.reshape((*self._compact_shape(), 3))


class CartesianVelocityFieldCompute(VelocityFieldCompute):
    """Velocity field binned in (x, y, z). Parity: src/compute.py:249-280."""

    _coord_fn = staticmethod(cartesian_coords)


class CylindricalVelocityFieldCompute(VelocityFieldCompute):
    """Velocity field binned in (r, theta, z) with rotated velocity basis.

    Parity: src/compute.py:281-330,
    /root/reference/src/CylindricalBinningOperation.h:43-75.
    """

    _coord_fn = staticmethod(cylindrical_coords)


class ThermodynamicQuantities(Compute):
    """Kinetic temperature / energies / pressure of a group.

    HOOMD-substrate parity (consumed by the reference's DPD statistical
    test, /root/reference/src/pytest/test_pair_dpd.py:19-46). Pressure is
    assembled from the per-particle virials the pair/bond kernels already
    compute; barriers contribute no virial by design (reference
    HarmonicBarrier.h:132-142).
    """

    def __init__(self, filter: ParticleFilter | None = None):
        super().__init__()
        self.filter = filter if filter is not None else All()
        self._mask = None

    def _attach(self, sim):
        super()._attach(sim)
        typeids = np.asarray(sim._synced_state().typeid)
        self._mask = jnp.asarray(self.filter.mask(typeids, sim._particle_types))

    @log(requires_run=True)
    def kinetic_energy(self) -> float:
        """Translational kinetic energy of the group."""
        self._require_attached("kinetic_energy")
        state = self._sim._synced_state()
        m = jnp.where(self._mask, state.mass, 0.0)
        ke = 0.5 * jnp.sum(m * jnp.sum(state.velocity**2, axis=-1))
        return float(ke)

    def _n_selected(self) -> int:
        return int(np.asarray(jnp.sum(self._mask.astype(jnp.int32))))

    @log(requires_run=True)
    def translational_degrees_of_freedom(self) -> float:
        """3N minus 3 when every integration method conserves the COM
        momentum of the full system (NVE); Langevin/Brownian thermostats
        break momentum conservation, so no modes are subtracted (HOOMD's
        DOF accounting)."""
        self._require_attached("translational_degrees_of_freedom")
        n = self._n_selected()
        integ = self._sim.operations.integrator
        conserves = True
        if integ is not None:
            conserves = all(
                getattr(m, "_conserves_momentum", False) for m in integ.methods
            )
        whole_system = isinstance(self.filter, All)
        return 3.0 * n - (3.0 if (conserves and whole_system and n > 0) else 0.0)

    @log(requires_run=True)
    def rotational_degrees_of_freedom(self) -> float:
        """Degrees of freedom of the rotating particles (zero unless the
        integrator integrates rotational DOF; one per non-zero principal
        moment of inertia)."""
        self._require_attached("rotational_degrees_of_freedom")
        integ = self._sim.operations.integrator
        if integ is None or not integ.integrate_rotational_dof:
            return 0.0
        state = self._sim._synced_state()
        active = np.asarray(state.moment_inertia) > 1e-12
        return float(np.sum(active[np.asarray(self._mask)]))

    @log(requires_run=True)
    def rotational_kinetic_energy(self) -> float:
        """Sum of L_body^2 / (2 I) over rotating particles in the group."""
        self._require_attached("rotational_kinetic_energy")
        integ = self._sim.operations.integrator
        if integ is None or not integ.integrate_rotational_dof:
            return 0.0
        from .md import rotation as R

        state = self._sim._synced_state()
        L = R.body_angular_momentum(state.orientation, state.angmom)
        inertia = state.moment_inertia
        active = inertia > 1e-12
        ke = 0.5 * jnp.sum(
            jnp.where(
                active & self._mask[:, None],
                L * L / jnp.maximum(inertia, 1e-12),
                0.0,
            )
        )
        return float(ke)

    @log(requires_run=True)
    def kinetic_temperature(self) -> float:
        """2 KE / DOF over the translational (+ rotational) modes."""
        dof = self.translational_degrees_of_freedom
        ke = self.kinetic_energy
        rdof = self.rotational_degrees_of_freedom
        if rdof > 0:
            ke += self.rotational_kinetic_energy
            dof += rdof
        return 2.0 * ke / dof

    @log(requires_run=True)
    def potential_energy(self) -> float:
        """Sum of the attached forces' potential energies."""
        self._require_attached("potential_energy")
        sim = self._sim
        total = 0.0
        if sim.operations.integrator is not None:
            for f in sim.operations.integrator.forces:
                total += f.energy
        return total

    @log(requires_run=True)
    def volume(self) -> float:
        """Volume of the global simulation box."""
        self._require_attached("volume")
        box = self._sim._synced_state().box
        L = np.asarray(box.L)
        return float(L[0] * L[1] * L[2])

    def _virial_sum(self) -> np.ndarray:
        """Total virial tensor components (xx, xy, xz, yy, yz, zz)."""
        total = np.zeros(6)
        integ = self._sim.operations.integrator
        if integ is not None:
            for f in integ.forces:
                v = f.virials
                if v is not None:
                    total += np.asarray(v).sum(axis=0)
        return total

    @log(requires_run=True)
    def pressure(self) -> float:
        """Isotropic pressure P = (2 KE + W) / (3 V), W the virial trace."""
        self._require_attached("pressure")
        w = self._virial_sum()
        return float(
            (2.0 * self.kinetic_energy + w[0] + w[3] + w[5])
            / (3.0 * self.volume)
        )

    @log(category="sequence", requires_run=True)
    def pressure_tensor(self) -> np.ndarray:
        """Pressure tensor (P_xx, P_xy, P_xz, P_yy, P_yz, P_zz)."""
        self._require_attached("pressure_tensor")
        state = self._sim._synced_state()
        m = np.where(np.asarray(self._mask), np.asarray(state.mass), 0.0)
        v = np.asarray(state.velocity)
        kin = np.stack(
            [
                (m * v[:, a] * v[:, b]).sum()
                for a, b in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
            ]
        )
        return (kin + self._virial_sum()) / self.volume
