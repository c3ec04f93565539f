"""Native (C++) runtime components: comm link, fast scan loader.

Sources live in ``native/`` at the repo root and are compiled on demand into
``native/build/`` (g++, cached by source mtime).  Every binding has a pure-
Python fallback so the framework works without a toolchain.
"""

from icp_slam_yolo_tpu.native.build import build_library, library_available

__all__ = ["build_library", "library_available"]
