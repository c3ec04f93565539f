"""On-demand g++ build of the native libraries (mtime-cached)."""

from __future__ import annotations

import os
import shutil
import subprocess

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_ROOT, "native")
_BUILD_DIR = os.path.join(_SRC_DIR, "build")

_SOURCES = {
    "robotlink": "robotlink.cpp",
    "scanloader": "scanloader.cpp",
}


def library_available() -> bool:
    return shutil.which("g++") is not None


def build_library(name: str) -> str:
    """Compile (if stale) and return the shared-object path."""
    src = os.path.join(_SRC_DIR, _SOURCES[name])
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    if not library_available():
        raise RuntimeError("g++ not available to build native library")
    os.makedirs(_BUILD_DIR, exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out, "-lpthread"],
        check=True,
        capture_output=True,
    )
    return out
