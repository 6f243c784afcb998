"""Native (C++) runtime components, built on demand with the system g++.

The compute path is JAX/XLA; the runtime around it — here the trajectory/
checkpoint IO engine — is native C++ (the analog of the reference's
C++ host layer; azplugins itself defers IO to HOOMD's compiled GSD stack,
SURVEY §5). Binding is a plain C ABI via ctypes (no pybind11 in the
image). If no compiler is available the callers fall back to a pure-Python
implementation of the same format.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def build_library(name: str) -> str | None:
    """Compile ``<name>.cpp`` into a cached shared library; None on failure."""
    src = os.path.join(_HERE, f"{name}.cpp")
    out = os.path.join(_HERE, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O2", "-fPIC", "-shared", "-std=c++17", src, "-o", out]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        return None
    return out


_ = sysconfig  # kept for future CPython-extension builds
