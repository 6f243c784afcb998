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

    def __hash__(self):
        return hash(repr(self))

    def __eq__(self, other):
        return repr(self) == repr(other)


class All(ParticleFilter):
    def mask(self, typeids, types):
        return np.ones(typeids.shape[0], dtype=bool)

    def __repr__(self):
        return "All()"


class Null(ParticleFilter):
    def mask(self, typeids, types):
        return np.zeros(typeids.shape[0], dtype=bool)

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

    def __repr__(self):
        return f"Type({self.types})"


class Tags(ParticleFilter):
    def __init__(self, tags):
        self.tags = tuple(int(t) for t in tags)

    def mask(self, typeids, types):
        sel = np.zeros(typeids.shape[0], dtype=bool)
        sel[list(self.tags)] = True
        return sel

    def __repr__(self):
        return f"Tags({self.tags})"


class Intersection(ParticleFilter):
    def __init__(self, f, g):
        self.f, self.g = f, g

    def mask(self, typeids, types):
        return self.f.mask(typeids, types) & self.g.mask(typeids, types)

    def __repr__(self):
        return f"Intersection({self.f!r}, {self.g!r})"


class Union(ParticleFilter):
    def __init__(self, f, g):
        self.f, self.g = f, g

    def mask(self, typeids, types):
        return self.f.mask(typeids, types) | self.g.mask(typeids, types)

    def __repr__(self):
        return f"Union({self.f!r}, {self.g!r})"
