"""Build the native host-compiler shared library with g++.

Invoked automatically on first import of ``native.lib`` (best-effort; all
callers have pure-Python fallbacks) or explicitly:

    python -m ahocorasick_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "src", "ac_native.cpp")
OUT = os.path.join(_DIR, "libac_native.so")


def build(force: bool = False) -> str:
    """Compile if missing/stale; returns the .so path."""
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        OUT + ".tmp",
        SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(OUT + ".tmp", OUT)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
