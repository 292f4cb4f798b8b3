"""ctypes loader for the C banded-DTW kernel (_dtw_kernel.c).

The shared object is compiled on demand (once per host, guarded by a
file lock so concurrent Spark python workers don't race) and cached
next to the source with a build-tag name, so a source edit triggers a
rebuild and a stale .so is never loaded.  Any failure — no compiler,
read-only dir, dlopen error — degrades silently to ``lib() is None``
and callers fall back to the numpy path, which is bit-identical.

Set ``DTW_C_KERNEL=0`` to disable the C path entirely (A/B harness).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "_dtw_kernel.c")

_lib = None
_tried = False


_CFLAGS = ["-O3", "-march=native", "-ffp-contract=off",
           "-mprefer-vector-width=512"]


def _build_dir() -> str:
    d = os.environ.get("DTW_C_BUILD_DIR")
    if d:
        return d
    pkg = os.path.dirname(_SRC)
    if os.access(pkg, os.W_OK):
        return pkg
    # read-only checkout (e.g. a driver running the tree from a
    # protected location): build under tmp instead of silently losing
    # the C path — the hash tag keeps concurrent users collision-free
    return tempfile.gettempdir()


def _so_path(tag: str) -> str:
    return os.path.join(_build_dir(), f"_dtw_kernel_{tag}.so")


def _compile(tag: str) -> str | None:
    """Compile the kernel to its tagged .so path; returns the path or
    None.  A file lock serializes concurrent builders; the compile
    writes to a temp name and renames atomically, so a reader never
    dlopens a half-written file."""
    out = _so_path(tag)
    if os.path.exists(out):
        return out
    lock_path = out + ".lock"
    try:
        import fcntl

        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if os.path.exists(out):
                return out
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_build_dir())
            os.close(fd)
            # -ffp-contract=off: forbid FMA contraction of d*d + m —
            # contraction changes the last ULP and breaks bit-equality
            # with the numpy path (numpy never fuses).
            # -mprefer-vector-width=512: gcc defaults to 256-bit vectors
            # on this uarch; measured +17% single-core and +5.6% at
            # 32-way saturation (no downclock penalty), ops unchanged.
            cmd = ["cc", *_CFLAGS, "-fPIC", "-shared", "-o", tmp, _SRC,
                   "-lm"]
            try:
                r = subprocess.run(cmd, capture_output=True, timeout=120)
                if r.returncode != 0:
                    os.unlink(tmp)
                    return None
                os.rename(tmp, out)
                return out
            except Exception:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                return None
    except Exception:
        return None


def lib():
    """The loaded C library, or None if unavailable/disabled."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("DTW_C_KERNEL", "1") != "1":
        return None
    try:
        with open(_SRC, "rb") as f:
            # tag = source + flags, so a flag change rebuilds too
            tag = hashlib.sha256(
                f.read() + " ".join(_CFLAGS).encode()).hexdigest()[:16]
        path = _compile(tag)
        if path is None:
            return None
        cdll = ctypes.CDLL(path)
        fn = cdll.dtw_batch
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,          # X1, X2
            ctypes.c_long, ctypes.c_long, ctypes.c_long,  # B, r, c
            ctypes.c_long,                             # window
            ctypes.c_long, ctypes.c_long,              # psi1b, psi1e
            ctypes.c_long, ctypes.c_long,              # psi2b, psi2e
            ctypes.c_double, ctypes.c_double,          # pen, max_step
            ctypes.c_int,                              # squared
            ctypes.c_void_p,                           # out
        ]
        fni = cdll.dtw_batch_idx
        fni.restype = ctypes.c_int
        fni.argtypes = [
            ctypes.c_void_p, ctypes.c_long,            # V, L
            ctypes.c_void_p, ctypes.c_void_p,          # ii, jj
            ctypes.c_long, ctypes.c_long,              # B, window
            ctypes.c_long, ctypes.c_long,              # psi1b, psi1e
            ctypes.c_long, ctypes.c_long,              # psi2b, psi2e
            ctypes.c_double, ctypes.c_double,          # pen, max_step
            ctypes.c_int,                              # squared
            ctypes.c_void_p,                           # out
        ]
        _lib = cdll
    except Exception:
        _lib = None
    return _lib
