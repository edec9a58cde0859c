"""Build the native runtime shared library on demand.

One g++ invocation, cached by source mtime; no cmake/bazel ceremony for a
single translation unit.  The .so lands next to this file so the package is
self-contained.  Failure to build is non-fatal — the Python/PIL path in
io/kitti.py covers every capability, just slower.
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SRC = os.path.join(_REPO, "native", "viso_native.cpp")
_SO = os.path.join(_HERE, "_viso_native.so")


def so_path() -> str:
    return _SO


def needs_build() -> bool:
    if not os.path.exists(_SRC):
        return False
    if not os.path.exists(_SO):
        return True
    return os.path.getmtime(_SRC) > os.path.getmtime(_SO)


def build(verbose: bool = False) -> str | None:
    """Compile native/viso_native.cpp -> _viso_native.so; None on failure."""
    if not os.path.exists(_SRC):
        return None
    if not needs_build():
        return _SO
    tmp = f"{_SO}.tmp.{os.getpid()}"  # unique per process: concurrent
    # first-use builds (pytest-xdist, multi-host on a shared FS) must not
    # interleave g++ output into one file
    base = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
            _SRC]
    # A host with libpng but no libjpeg must not lose the whole native
    # runtime (PNG decode + prefetch carry the streaming headline) to a
    # JPEG feature it never uses: retry without -ljpeg, compiling the
    # JPEG decoder out (VN_NO_JPEG -> those files report
    # 'unsupported image format' and the PIL fallback covers them).
    attempts = [
        base + ["-lpng", "-ljpeg", "-lz", "-o", tmp],
        base + ["-DVN_NO_JPEG", "-lpng", "-lz", "-o", tmp],
    ]
    for cmd in attempts:
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
        except (OSError, subprocess.TimeoutExpired) as e:  # no g++ / hang
            if verbose:
                print(f"native build unavailable: {e}", file=sys.stderr)
            return None
        if proc.returncode == 0:
            os.replace(tmp, _SO)
            return _SO
        if verbose:
            print(f"native build failed ({' '.join(cmd[-5:-2])}):\n"
                  f"{proc.stderr}", file=sys.stderr)
    return None


if __name__ == "__main__":
    out = build(verbose=True)
    print(out or "BUILD FAILED")
    sys.exit(0 if out else 1)
