"""Parity + robustness tests for the native C++ marching-tetrahedra kernel.

The numpy implementation (tools/marching.marching_tetrahedra backend
"numpy") is the oracle: the native kernel must reproduce its vertex set,
topology and orientation exactly (same tables, same edge canonicalization
— native/marching_tet.cpp). Meshes are compared as canonical triangle
soups (faces as sorted coordinate triples) because vertex/face ORDER is
an implementation detail (numpy orders vertices by np.unique edge key,
the native kernel by first emission).
"""

import numpy as np
import pytest

from object_nerf_tpu.native import marching_tetrahedra_native
from object_nerf_tpu.tools.marching import (
    largest_connected_component, marching_tetrahedra,
)

NATIVE = marching_tetrahedra_native(np.zeros((2, 2, 2), np.float32), 0.5)
needs_native = pytest.mark.skipif(
    NATIVE is None, reason="native toolchain unavailable"
)


def _canon_soup(verts, faces):
    """Orientation-preserving canonical form: each face as its 9 corner
    coords rotated so the lexicographically-smallest vertex comes first
    (cyclic rotation only — winding preserved), rows sorted."""
    rows = []
    tri = np.round(verts[faces].astype(np.float64), 5)  # (F, 3, 3)
    for f in tri:
        corners = [tuple(c) for c in f]
        s = min(range(3), key=lambda i: corners[i])
        rows.append(corners[s] + corners[(s + 1) % 3] + corners[(s + 2) % 3])
    return sorted(rows)


def _volumes():
    rng = np.random.default_rng(0)
    vols = {}
    # smooth random field (generic surface)
    v = rng.standard_normal((12, 10, 11)).astype(np.float32)
    for ax in range(3):
        v = (np.roll(v, 1, ax) + v + np.roll(v, -1, ax)) / 3.0
    vols["smooth"] = (v, 0.1)
    # sphere (watertight closed surface)
    g = np.stack(
        np.meshgrid(*[np.linspace(-1, 1, 16)] * 3, indexing="ij"), -1
    )
    vols["sphere"] = ((1.0 - np.linalg.norm(g, axis=-1)).astype(np.float32),
                      0.0)
    # values exactly AT the level (ties → inside, w clipping)
    t = np.zeros((6, 6, 6), np.float32)
    t[2:4, 2:4, 2:4] = 0.5
    vols["ties"] = (t, 0.5)
    # empty / full
    vols["empty"] = (np.zeros((5, 5, 5), np.float32), 0.5)
    vols["full"] = (np.ones((5, 5, 5), np.float32), 0.5)
    return vols


@needs_native
@pytest.mark.parametrize("name", list(_volumes().keys()))
def test_native_matches_numpy_oracle(name):
    vol, level = _volumes()[name]
    nv, nf = marching_tetrahedra(vol, level, backend="numpy")
    out = marching_tetrahedra_native(vol, level)
    assert out is not None
    cv, cf = out
    assert cv.dtype == np.float32 and cf.dtype == np.int64
    assert len(cf) == len(nf), (len(cf), len(nf))
    assert len(cv) == len(nv), (len(cv), len(nv))
    assert _canon_soup(cv, cf) == _canon_soup(nv, nf)


@needs_native
def test_auto_backend_prefers_native_and_slab_agnostic():
    vol, level = _volumes()["sphere"]
    av, af = marching_tetrahedra(vol, level, backend="auto")
    nv, nf = marching_tetrahedra(vol, level, backend="numpy", slab=4)
    assert _canon_soup(av, af) == _canon_soup(nv, nf)
    with pytest.raises(ValueError):
        marching_tetrahedra(vol, level, backend="cuda")


@needs_native
def test_native_feeds_largest_cc():
    """Two separated spheres → largest-CC keeps exactly the bigger one,
    through the native mesh's vertex indexing."""
    g = np.stack(
        np.meshgrid(np.linspace(-2, 2, 24), *[np.linspace(-1, 1, 12)] * 2,
                    indexing="ij"), -1,
    )
    big = 0.8 - np.linalg.norm(g - np.array([-1.0, 0, 0]), axis=-1)
    small = 0.4 - np.linalg.norm(g - np.array([1.2, 0, 0]), axis=-1)
    vol = np.maximum(big, small).astype(np.float32)
    verts, faces = marching_tetrahedra(vol, 0.0, backend="native")
    kv, kf = largest_connected_component(verts, faces)
    assert 0 < len(kv) < len(verts)
    assert kf.max() < len(kv)
    # kept component is the big (x<0 side) sphere
    assert (kv[:, 0] * (4.0 / 23) - 2.0).mean() < 0
