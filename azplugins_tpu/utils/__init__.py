from .jaxtools import (
    asarray_f,
    asarray_i,
    field,
    pytree_dataclass,
    static_field,
)

__all__ = [
    "asarray_f",
    "asarray_i",
    "field",
    "pytree_dataclass",
    "static_field",
]
