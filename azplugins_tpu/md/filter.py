"""Particle filters (group selection).

Replaces the HOOMD ``ParticleGroup``/filter substrate
(/root/reference/src/VelocityCompute.h:29). A filter resolves to a static
boolean mask at attach time; groups are masks, not index lists, so every
kernel stays shape-static.
"""

from __future__ import annotations

import numpy as np

__all__ = ["All", "Type", "Tags", "Intersection", "Union", "Null"]


class ParticleFilter:
    def mask(self, typeids: np.ndarray, types: list[str]) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def bind(self, types: list[str]):
        """Return a traced selector ``state -> bool[N]`` for the jitted step.

        Evaluated in-graph because the dense engine permutes particles into
        cell slots during the run (empty slots have tag < 0).
        """
        raise NotImplementedError  # pragma: no cover

    def __hash__(self):
        return hash(repr(self))

    def __eq__(self, other):
        return repr(self) == repr(other)


class All(ParticleFilter):
    def mask(self, typeids, types):
        return np.ones(typeids.shape[0], dtype=bool)

    def bind(self, types):
        return lambda state: state.tag >= 0

    def __repr__(self):
        return "All()"


class Null(ParticleFilter):
    def mask(self, typeids, types):
        return np.zeros(typeids.shape[0], dtype=bool)

    def bind(self, types):
        import jax.numpy as jnp

        return lambda state: jnp.zeros(state.tag.shape, dtype=bool)

    def __repr__(self):
        return "Null()"


class Type(ParticleFilter):
    def __init__(self, types):
        if isinstance(types, str):
            types = [types]
        self.types = tuple(sorted(types))

    def mask(self, typeids, types):
        sel = np.zeros(typeids.shape[0], dtype=bool)
        for t in self.types:
            if t not in types:
                raise ValueError(f"unknown particle type {t!r}")
            sel |= typeids == types.index(t)
        return sel

    def bind(self, types):
        ids = []
        for t in self.types:
            if t not in types:
                raise ValueError(f"unknown particle type {t!r}")
            ids.append(types.index(t))

        def select(state):
            sel = state.tag < 0  # all-False of right shape
            for i in ids:
                sel = sel | (state.typeid == i)
            return sel & (state.tag >= 0)

        return select

    def __repr__(self):
        return f"Type({self.types})"


class Tags(ParticleFilter):
    def __init__(self, tags):
        self.tags = tuple(int(t) for t in tags)

    def mask(self, typeids, types):
        sel = np.zeros(typeids.shape[0], dtype=bool)
        sel[list(self.tags)] = True
        return sel

    def bind(self, types):
        tags = self.tags

        def select(state):
            sel = state.tag < 0
            for t in tags:
                sel = sel | (state.tag == t)
            return sel

        return select

    def __repr__(self):
        return f"Tags({self.tags})"


class Intersection(ParticleFilter):
    def __init__(self, f, g):
        self.f, self.g = f, g

    def mask(self, typeids, types):
        return self.f.mask(typeids, types) & self.g.mask(typeids, types)

    def bind(self, types):
        f, g = self.f.bind(types), self.g.bind(types)
        return lambda state: f(state) & g(state)

    def __repr__(self):
        return f"Intersection({self.f!r}, {self.g!r})"


class Union(ParticleFilter):
    def __init__(self, f, g):
        self.f, self.g = f, g

    def mask(self, typeids, types):
        return self.f.mask(typeids, types) | self.g.mask(typeids, types)

    def bind(self, types):
        f, g = self.f.bind(types), self.g.bind(types)
        return lambda state: f(state) | g(state)

    def __repr__(self):
        return f"Union({self.f!r}, {self.g!r})"
