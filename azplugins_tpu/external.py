"""External potentials: harmonic barriers and wall potentials.

Rebuild of SURVEY §2.5 (active harmonic barriers) and §2.9 (legacy wall
potentials, required by the north star).

  * ``PlanarHarmonicBarrier`` / ``SphericalHarmonicBarrier``: one-sided
    harmonic restraints with a time-dependent (Variant) location; per-type
    ``k`` and ``offset`` params. The reference deliberately does not
    compute a virial for these (/root/reference/src/HarmonicBarrier.h:132-142)
    and neither do we (zeros + one-time warning).
  * ``wall.LJ93`` / ``wall.Colloid``: integrated LJ wall potentials acting
    on the perpendicular distance to planar walls
    (/root/reference/src/WallEvaluatorLJ93.h:110-136,
    /root/reference/src/WallEvaluatorColloid.h:114-151).
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from .core.typeparam import TypeParameter
from .core.variant import Variant, as_variant
from .md.force import Force, SimContext, tables_to_device
from .ops.evaluators import BARRIERS, WALL_POTENTIALS
from .ops.pair_force import ForceResult

__all__ = [
    "HarmonicBarrier",
    "PlanarHarmonicBarrier",
    "SphericalHarmonicBarrier",
    "wall",
]


class HarmonicBarrier(Force):
    """Base: harmonic half-space barrier with variant location.

    Parity: /root/reference/src/external.py:16-80,
    /root/reference/src/HarmonicBarrier.h:25-178.
    """

    _barrier_name = ""

    def __init__(self, location):
        super().__init__()
        self.location: Variant = as_variant(location)
        self.params = TypeParameter("params", 1, {"k": float, "offset": float})
        self._def = BARRIERS[self._barrier_name]
        self._warned_virial = False

    def _build_tables(self, sim):
        types = sim._particle_types
        host = self.params.to_dict_tables(types)
        self._tbl = {"params": tables_to_device(host)}
        # validate the barrier stays inside the box over its range
        lo, hi = self.location.range()
        for extreme in (lo, hi):
            if np.isfinite(extreme) and not self._def.valid(extreme, sim._synced_state().box):
                raise ValueError(
                    f"{type(self).__name__}: location {extreme} is outside the global box"
                )
        if not self._warned_virial:
            warnings.warn(
                f"{type(self).__name__} does not compute the virial "
                "(matching reference behavior)",
                stacklevel=2,
            )
            self._warned_virial = True

    def _compute(self, state, nbr_idx, timestep, ctx: SimContext, tbl) -> ForceResult:
        loc = self.location(timestep)
        pos, _ = state.box.wrap(state.position, state.image)
        k = jnp.take(tbl["params"]["k"], state.typeid)
        offset = jnp.take(tbl["params"]["offset"], state.typeid)
        e, force = self._def.energy_force(pos, loc, k, offset)
        valid = state.tag >= 0  # dense layout: ignore empty slots
        e = jnp.where(valid, e, 0.0)
        force = jnp.where(valid[:, None], force, 0.0)
        return ForceResult(
            force=force,
            energy=e,
            virial=jnp.zeros((state.N, 6), jnp.float32),
        )


class PlanarHarmonicBarrier(HarmonicBarrier):
    """Pushes particles with y > H + offset back toward the plane.

    Parity: /root/reference/src/external.py:83-120,
    /root/reference/src/PlanarBarrierEvaluator.h:36-48.
    """

    _barrier_name = "Planar"


class SphericalHarmonicBarrier(HarmonicBarrier):
    """Pushes particles outside radius R + offset back inward.

    Parity: /root/reference/src/external.py:122-160,
    /root/reference/src/SphericalBarrierEvaluator.h:36-51.
    """

    _barrier_name = "Spherical"


# ---------------------------------------------------------------------------
# Wall potentials
# ---------------------------------------------------------------------------
class _Plane:
    """An infinite plane wall: points with dot(r - origin, normal) > 0 feel it."""

    def __init__(self, origin, normal):
        self.origin = tuple(float(x) for x in origin)
        n = np.asarray(normal, dtype=np.float64)
        n = n / np.linalg.norm(n)
        self.normal = tuple(n)

    def __repr__(self):
        return f"wall.Plane(origin={self.origin}, normal={self.normal})"

    def distance(self, pos):
        origin = jnp.asarray(self.origin, dtype=jnp.float32)
        normal = jnp.asarray(self.normal, dtype=jnp.float32)
        d = jnp.sum((pos - origin) * normal, axis=-1)
        return d, jnp.broadcast_to(normal, pos.shape)


class _Sphere:
    """A spherical wall of given radius.

    ``inside=True`` confines particles to the interior (the potential acts
    on the gap between the particle and the surface from inside);
    ``inside=False`` keeps them outside. Mirrors the sphere geometry of
    HOOMD's ``EvaluatorWalls`` that the legacy wall evaluators ride
    (/root/reference/src/WallPotentials.h:42-85).
    """

    def __init__(self, radius, origin=(0.0, 0.0, 0.0), inside=True):
        self.radius = float(radius)
        self.origin = tuple(float(x) for x in origin)
        self.inside = bool(inside)

    def __repr__(self):
        return (
            f"wall.Sphere(radius={self.radius}, origin={self.origin}, "
            f"inside={self.inside})"
        )

    def distance(self, pos):
        origin = jnp.asarray(self.origin, dtype=jnp.float32)
        rel = pos - origin
        rho = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        rho_safe = jnp.maximum(rho, 1e-12)
        rhat = rel / rho_safe[:, None]
        if self.inside:
            return self.radius - rho, -rhat
        return rho - self.radius, rhat


class _Cylinder:
    """An infinite cylindrical wall around ``axis`` through ``origin``.

    Same inside/outside semantics as ``Sphere``; distances are measured
    radially from the axis.
    """

    def __init__(
        self, radius, origin=(0.0, 0.0, 0.0), axis=(0.0, 0.0, 1.0), inside=True
    ):
        self.radius = float(radius)
        self.origin = tuple(float(x) for x in origin)
        a = np.asarray(axis, dtype=np.float64)
        a = a / np.linalg.norm(a)
        self.axis = tuple(a)
        self.inside = bool(inside)

    def __repr__(self):
        return (
            f"wall.Cylinder(radius={self.radius}, origin={self.origin}, "
            f"axis={self.axis}, inside={self.inside})"
        )

    def distance(self, pos):
        origin = jnp.asarray(self.origin, dtype=jnp.float32)
        axis = jnp.asarray(self.axis, dtype=jnp.float32)
        rel = pos - origin
        rel_r = rel - jnp.sum(rel * axis, axis=-1)[:, None] * axis
        rho = jnp.sqrt(jnp.sum(rel_r * rel_r, axis=-1))
        rho_safe = jnp.maximum(rho, 1e-12)
        rhat = rel_r / rho_safe[:, None]
        if self.inside:
            return self.radius - rho, -rhat
        return rho - self.radius, rhat


_WALL_GEOMETRIES = (_Plane, _Sphere, _Cylinder)


class _WallPotential(Force):
    """LJ-style potential between particles and a list of walls.

    Walls are plane/sphere/cylinder geometries; ``d`` is the signed
    distance to the wall surface (positive on the allowed side) and the
    force acts along the direction of increasing ``d``. Per-type
    ``r_extrap`` (default 0 = off) enables HOOMD's extrapolated mode: for
    ``d < r_extrap`` (including penetrated particles, ``d <= 0``) the
    potential continues linearly,

        U(d) = U(r_extrap) + (r_extrap - d) * F(r_extrap),
        F(d) = F(r_extrap),

    which keeps forces finite through the wall and pushes violators back
    (HOOMD ``EvaluatorWalls`` contract; consumed by the reference at
    /root/reference/src/WallPotentials.h:63-85).
    """

    _wall_name = ""

    def __init__(self, walls):
        super().__init__()
        self.walls = list(walls)
        for w in self.walls:
            if not isinstance(w, _WALL_GEOMETRIES):
                raise TypeError(
                    "walls must be wall.Plane/wall.Sphere/wall.Cylinder instances"
                )
        self._def = WALL_POTENTIALS[self._wall_name]
        spec = dict(self._def.spec)
        spec["r_cut"] = float
        spec["r_extrap"] = 0.0
        self.params = TypeParameter("params", 1, spec)

    def _build_tables(self, sim):
        types = sim._particle_types
        host = self.params.to_dict_tables(types)
        r_cut = host.pop("r_cut")
        r_extrap = host.pop("r_extrap")
        self._tbl = {
            "params": tables_to_device(self._def.precompute(host)),
            "r_cut": np.asarray(r_cut, dtype=np.float32),
            "r_extrap": np.asarray(r_extrap, dtype=np.float32),
        }

    def _compute(self, state, nbr_idx, timestep, ctx: SimContext, tbl) -> ForceResult:
        pos, _ = state.box.wrap(state.position, state.image)
        p = {k: jnp.take(v, state.typeid) for k, v in tbl["params"].items()}
        rcut = jnp.take(tbl["r_cut"], state.typeid)
        rcutsq = rcut * rcut
        r_ext = jnp.take(tbl["r_extrap"], state.typeid)
        extrap = r_ext > 0

        force = jnp.zeros((state.N, 3), jnp.float32)
        energy = jnp.zeros((state.N,), jnp.float32)
        valid = state.tag >= 0  # dense layout: ignore empty slots
        for w in self.walls:
            d, dhat = w.distance(pos)
            rsq = d * d
            in_range = valid & (d > 0) & (rsq < rcutsq)
            rsq_safe = jnp.where(in_range, rsq, 1.0)
            e, f_divr = self._def.energy_force(rsq_safe, rcutsq, p, state.diameter)
            fmag = jnp.where(in_range, f_divr * d, 0.0)
            e = jnp.where(in_range, e, 0.0)
            # static host-side branch: self._tbl holds the numpy originals
            # (md/force.tables_to_device keeps tables host-side), so zero
            # r_extrap compiles the extrapolation away entirely
            if bool(np.any(np.asarray(self._tbl["r_extrap"]) > 0)):
                # extrapolated branch: linear continuation below r_extrap
                ext_sq = r_ext * r_ext
                e_ext, f_divr_ext = self._def.energy_force(
                    jnp.where(extrap, ext_sq, 1.0), rcutsq, p, state.diameter
                )
                f_ext = f_divr_ext * r_ext
                below = valid & extrap & (d < r_ext)
                fmag = jnp.where(below, f_ext, fmag)
                e = jnp.where(below, e_ext + (r_ext - d) * f_ext, e)
            force = force + fmag[:, None] * dhat
            energy = energy + e
        return ForceResult(
            force=force, energy=energy, virial=jnp.zeros((state.N, 6), jnp.float32)
        )


class _LJ93Wall(_WallPotential):
    """9-3 integrated LJ wall: U = (2/15) eps (s/r)^9 - eps (s/r)^3 terms.

    Parity: /root/reference/src/WallEvaluatorLJ93.h:110-136.
    """

    _wall_name = "LJ93"


class _ColloidWall(_WallPotential):
    """Integrated sphere/half-space LJ wall; uses the particle diameter.

    Parity: /root/reference/src/WallEvaluatorColloid.h:114-151.
    """

    _wall_name = "Colloid"
    _needs_diameter = True


class _WallNamespace:
    Plane = _Plane
    Sphere = _Sphere
    Cylinder = _Cylinder
    LJ93 = _LJ93Wall
    Colloid = _ColloidWall


wall = _WallNamespace()
