"""Native (C++) host-side kernels, built on demand with g++ + ctypes.

The reference leans on compiled host code for its mesh tooling (PyMCubes'
C++ marching cubes, /root/reference/tools/extract_mesh.py:120) and on
numba for ray-AABB (datasets/geo_utils.py:111-162). The TPU build keeps
the device math in JAX/Pallas; this package holds the host-side native
equivalents. pybind11 is not available in this image, so the ABI is plain
C driven through ctypes; every native entry point has a pure-numpy
fallback and a parity test against it.

Build model: one shared object per .cpp source, compiled into
``_build/<name>-<source_hash>.so`` at first use (so stale binaries are
never picked up after a source edit), with graceful fallback to the numpy
path when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_DIR, "_build")

_lib_cache: dict = {}


def _compile(name: str) -> str | None:
    """Compile native/<name>.cpp → cached .so path, or None on failure."""
    src = os.path.join(_DIR, f"{name}.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    build_dir = _BUILD_DIR
    try:
        os.makedirs(build_dir, exist_ok=True)
        if not os.access(build_dir, os.W_OK):
            raise OSError
    except OSError:
        # installed package dir may be read-only → per-user cache
        build_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "object_nerf_tpu", "native"
        )
        os.makedirs(build_dir, exist_ok=True)
    out = os.path.join(build_dir, f"{name}-{tag}.so")
    if os.path.exists(out):
        return out
    # -march=native is safe: the .so is built on the host that runs it
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", src, "-o", out + ".tmp",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=300
        )
    except (OSError, subprocess.SubprocessError):
        # no toolchain / failed build → caller falls back to numpy
        return None
    os.replace(out + ".tmp", out)
    return out


def load_marching_lib():
    """ctypes handle to the marching-tetrahedra library, or None."""
    if "marching_tet" in _lib_cache:
        return _lib_cache["marching_tet"]
    path = _compile("marching_tet")
    lib = None
    if path is not None:
        lib = ctypes.CDLL(path)
        lib.mt_run.restype = ctypes.c_void_p
        lib.mt_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float,
        ]
        lib.mt_num_verts.restype = ctypes.c_int64
        lib.mt_num_verts.argtypes = [ctypes.c_void_p]
        lib.mt_num_faces.restype = ctypes.c_int64
        lib.mt_num_faces.argtypes = [ctypes.c_void_p]
        lib.mt_copy.restype = None
        lib.mt_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.restype = None
        lib.mt_free.argtypes = [ctypes.c_void_p]
    _lib_cache["marching_tet"] = lib
    return lib


def marching_tetrahedra_native(volume: np.ndarray, level: float):
    """C++ marching tetrahedra: volume (X,Y,Z) f32 → (verts f32, faces i64).

    Same tables/semantics as tools/marching.marching_tetrahedra (the numpy
    oracle); returns None if the native library is unavailable.
    """
    lib = load_marching_lib()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    nx, ny, nz = vol.shape
    h = lib.mt_run(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(level),
    )
    try:
        nv = lib.mt_num_verts(h)
        nf = lib.mt_num_faces(h)
        verts = np.empty((nv, 3), np.float32)
        faces = np.empty((nf, 3), np.int64)
        lib.mt_copy(
            h,
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    finally:
        lib.mt_free(h)
    return verts, faces
