"""Simulation: compiles the whole timestep into one jitted loop.

TPU rebuild of the HOOMD ``Simulation``/``System`` loop the reference
plugs into (SURVEY §3.2). The per-step sequence matches the reference
exactly — methods.step1 -> neighbor check/rebuild -> force computes ->
methods.step2 -> triggered updaters — but instead of dispatching dozens of
kernels per step from C++, the entire chunk of steps is one
``lax.fori_loop`` inside one ``jax.jit``, with neighbor rebuilds gated by
``lax.cond`` on the Verlet-buffer displacement check.

Capacity overflow (cell or neighbor) cannot resize under jit, so chunks are
transactional: the host inspects overflow flags after each chunk and, on
overflow, grows capacities, recompiles, and replays the chunk from the
saved state. This replaces HOOMD's host-side reallocation loop
(src/ParticleEvaporator.cc:81-91 uses the same grow-and-retry idea).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core.snapshot import Snapshot
from .core.state import State, state_from_snapshot, state_to_snapshot, thermalize_momenta
from .md.force import SimContext
from .ops.neighbor import NeighborSpec, build_neighbor_list, needs_rebuild

__all__ = ["Simulation", "Operations"]


class Operations:
    def __init__(self):
        self.integrator = None
        self.updaters: list = []
        self.computes: list = []
        self.writers: list = []

    def add(self, op):
        """hoomd-style routing: forces go to the integrator, updaters and
        computes to their lists."""
        from .compute import Compute
        from .md.force import Force
        from .update import Updater

        if isinstance(op, Force):
            if self.integrator is None:
                raise RuntimeError("set an integrator before adding forces")
            self.integrator.forces.append(op)
        elif isinstance(op, Updater):
            self.updaters.append(op)
        elif isinstance(op, Compute):
            self.computes.append(op)
        else:
            raise TypeError(f"cannot add {op!r}")

    def __iadd__(self, op):
        self.add(op)
        return self


class _StateView:
    """hoomd-like ``sim.state`` accessor."""

    def __init__(self, sim: "Simulation"):
        self._sim = sim

    @property
    def N_particles(self) -> int:
        return self._sim._state.N

    @property
    def particle_types(self) -> list[str]:
        return list(self._sim._particle_types)

    @property
    def bond_types(self) -> list[str]:
        return list(self._sim._bond_types)

    @property
    def box(self):
        return self._sim._state.box

    def get_snapshot(self) -> Snapshot:
        return state_to_snapshot(
            self._sim._state, self._sim._particle_types, self._sim._bond_types
        )

    def set_snapshot(self, snapshot: Snapshot):
        self._sim._set_snapshot(snapshot)

    def thermalize_particle_momenta(self, filter=None, kT: float = 1.0):
        sim = self._sim
        mask = None
        if filter is not None:
            typeids = np.asarray(sim._state.typeid)
            mask = jnp.asarray(filter.mask(typeids, sim._particle_types))
        sim._state = thermalize_momenta(sim._state, kT, sim.seed, mask)
        sim._invalidate()


class Simulation:
    """Owns state + operations; compiles and drives the step loop."""

    def __init__(self, device=None, seed: int = 0):
        self.device = device
        self.seed = int(seed) & 0xFFFF
        self.operations = Operations()
        self._state: State | None = None
        self._particle_types: list[str] = []
        self._bond_types: list[str] = []
        self._timestep = 0
        self._attached = False
        self._prepared = False
        self._cells = []  # Cell objects in attach order
        self._specs = []  # NeighborSpec per cell
        self._nlds = None  # tuple of NeighborListData
        self._run_chunk = None
        self.max_chunk = 1000

    # -- state management ------------------------------------------------
    def create_state_from_snapshot(self, snapshot: Snapshot):
        if self._state is not None:
            raise RuntimeError("state already created")
        self._set_snapshot(snapshot)

    def _set_snapshot(self, snapshot: Snapshot):
        self._state, self._particle_types, self._bond_types = state_from_snapshot(snapshot)
        self._invalidate()

    @property
    def state(self) -> _StateView:
        if self._state is None:
            raise RuntimeError("no state; call create_state_from_snapshot first")
        return _StateView(self)

    @property
    def timestep(self) -> int:
        return self._timestep

    @timestep.setter
    def timestep(self, value: int):
        self._timestep = int(value)

    def _invalidate(self):
        self._attached = False
        self._prepared = False
        self._nlds = None
        self._run_chunk = None

    # -- attach ------------------------------------------------------------
    def _attach(self):
        if self._state is None:
            raise RuntimeError("no state; call create_state_from_snapshot first")
        integ = self.operations.integrator
        if integ is not None:
            integ._attach(self)
        for u in self.operations.updaters:
            u._attach(self)
        for c in self.operations.computes:
            c._attach(self)

        # group nlist-consuming forces by their Cell object
        self._cells = []
        cell_rcut: dict[int, float] = {}
        forces = integ.forces if integ is not None else []
        for f in forces:
            if getattr(f, "_needs_nlist", False):
                cell = f.nlist
                if cell not in self._cells:
                    self._cells.append(cell)
                i = self._cells.index(cell)
                cell_rcut[i] = max(cell_rcut.get(i, 0.0), f._max_r_cut())
        self._specs = [
            NeighborSpec.create(self._state.box, self._state.N, cell_rcut[i], c.buffer)
            for i, c in enumerate(self._cells)
        ]
        self._build_runner()
        self._attached = True
        self._prepared = False

    def _ctx(self) -> SimContext:
        integ = self.operations.integrator
        dt = integ.dt if integ is not None else 0.0
        return SimContext(dt=dt, seed=self.seed)

    def _force_nlist_index(self, force) -> int | None:
        if getattr(force, "_needs_nlist", False):
            return self._cells.index(force.nlist)
        return None

    def _build_runner(self):
        integ = self.operations.integrator
        methods = integ.methods if integ is not None else []
        forces = integ.forces if integ is not None else []
        updaters = list(self.operations.updaters)
        specs = list(self._specs)
        dt = integ.dt if integ is not None else 0.0
        seed = self.seed
        ctx = self._ctx()
        force_cell = [self._force_nlist_index(f) for f in forces]
        N = self._state.N

        def compute_net(state, nlds, t, tbls):
            net = jnp.zeros((N, 3), jnp.float32)
            for f, ci, tbl in zip(forces, force_cell, tbls):
                idx = nlds[ci].idx if ci is not None else None
                net = net + f._compute(state, idx, t, ctx, tbl).force
            return net

        def refresh_nlists(state, nlds):
            out = []
            for nld, spec in zip(nlds, specs):
                rebuild = needs_rebuild(nld, state.position, state.box, spec.buffer)

                def do_build(nld=nld, spec=spec):
                    fresh = build_neighbor_list(state.position, state.box, spec)
                    return fresh.replace(
                        cell_overflow=fresh.cell_overflow | nld.cell_overflow,
                        nlist_overflow=fresh.nlist_overflow | nld.nlist_overflow,
                        n_builds=nld.n_builds + 1,
                    )

                out.append(jax.lax.cond(rebuild, do_build, lambda nld=nld: nld))
            return tuple(out)

        def one_step(state, nlds, t, tbls):
            for m in methods:
                state = m.step1(state, dt, t, seed)
            nlds = refresh_nlists(state, nlds)
            net = compute_net(state, nlds, t, tbls)
            state = state.replace(net_force=net)
            for m in methods:
                state = m.step2(state, dt, t, seed)
            for u in updaters:
                state = jax.lax.cond(
                    u.trigger(t), lambda s: u._update(s, t, seed), lambda s: s, state
                )
            return state, nlds

        def run_chunk(state, nlds, t0, n_steps, tbls):
            def body(i, carry):
                state, nlds = carry
                return one_step(state, nlds, t0 + i, tbls)

            return jax.lax.fori_loop(0, n_steps, body, (state, nlds))

        self._run_chunk_impl = run_chunk
        self._run_chunk = jax.jit(run_chunk)
        self._compute_net = compute_net

    # -- neighbor list management -------------------------------------------
    def _build_nlists(self):
        self._nlds = tuple(
            build_neighbor_list(self._state.position, self._state.box, spec)
            for spec in self._specs
        )
        self._check_grow_capacity(rebuild_lists=True)

    def _overflowed(self, nlds) -> tuple[bool, bool]:
        cell = any(bool(n.cell_overflow) for n in nlds)
        nmax = any(bool(n.nlist_overflow) for n in nlds)
        return cell, nmax

    def _check_grow_capacity(self, rebuild_lists: bool) -> bool:
        """Grow capacities if the current lists overflowed. True if grown."""
        grown = False
        new_specs = []
        for nld, spec in zip(self._nlds, self._specs):
            c = bool(nld.cell_overflow)
            m = bool(nld.nlist_overflow)
            if c or m:
                spec = spec.grow(c, m)
                grown = True
            new_specs.append(spec)
        if grown:
            self._specs = new_specs
            self._build_runner()
            if rebuild_lists:
                self._build_nlists()
        return grown

    def _force_tables(self):
        integ = self.operations.integrator
        forces = integ.forces if integ is not None else []
        for f in forces:
            f._refresh_tables(self)
        return tuple(f._device_tables() for f in forces)

    def _prepare(self):
        """Compute initial forces/accelerations (HOOMD's pre-run prep)."""
        if self._nlds is None:
            self._build_nlists()
        ctx_t = jnp.int32(self._timestep)
        net = jax.jit(self._compute_net)(self._state, self._nlds, ctx_t, self._force_tables())
        accel = net / self._state.mass[:, None]
        self._state = self._state.replace(net_force=net, acceleration=accel)
        self._prepared = True

    # -- running -------------------------------------------------------------
    def run(self, n_steps: int):
        n_steps = int(n_steps)
        if not self._attached:
            self._attach()
        if not self._prepared:
            self._prepare()
        remaining = n_steps
        tbls = self._force_tables()
        while remaining > 0:
            chunk = min(remaining, self.max_chunk)
            backup_state, backup_nlds = self._state, self._nlds
            t0 = jnp.int32(self._timestep)
            state, nlds = self._run_chunk(backup_state, backup_nlds, t0, jnp.int32(chunk), tbls)
            cell_of, nmax_of = self._overflowed(nlds)
            if cell_of or nmax_of:
                # transactional replay with grown capacity
                self._nlds = nlds
                self._specs = [
                    s.grow(cell_of, nmax_of) for s in self._specs
                ]
                self._build_runner()
                self._state = backup_state
                self._build_nlists()
                continue
            self._state, self._nlds = state, nlds
            self._timestep += chunk
            remaining -= chunk
        # block so exceptions/timing surface here
        jax.block_until_ready(self._state.position)

    # -- observables -----------------------------------------------------------
    def _compute_single_force(self, force):
        if not self._attached:
            self._attach()
        if self._nlds is None:
            self._build_nlists()
        ci = self._force_nlist_index(force)
        idx = self._nlds[ci].idx if ci is not None else None
        ctx = self._ctx()
        force._refresh_tables(self)
        fn = jax.jit(lambda s, i, t, tbl: force._compute(s, i, t, ctx, tbl))
        return fn(self._state, idx, jnp.int32(self._timestep), force._device_tables())
