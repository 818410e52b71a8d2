import numpy as np

from object_nerf_tpu.tools.marching import (
    marching_tetrahedra,
    largest_connected_component,
)


def _sphere_volume(n=48, r=0.35):
    t = np.linspace(-0.5, 0.5, n)
    x, y, z = np.meshgrid(t, t, t, indexing="ij")
    return r - np.sqrt(x**2 + y**2 + z**2)  # >0 inside


def test_sphere_surface_radius():
    n, r = 48, 0.35
    vol = _sphere_volume(n, r)
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # convert index coords back to [-0.5, 0.5]
    pts = verts / (n - 1) - 0.5
    radii = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(radii.mean(), r, atol=0.01)
    assert radii.std() < 0.01


def test_watertight_vertex_sharing():
    vol = _sphere_volume(24, 0.3)
    verts, faces = marching_tetrahedra(vol, 0.0)
    # every edge of a closed surface is shared by exactly 2 triangles
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_empty_volume():
    vol = -np.ones((8, 8, 8))
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_largest_component_filters_blob():
    # two spheres, one bigger
    t = np.linspace(-0.5, 0.5, 40)
    x, y, z = np.meshgrid(t, t, t, indexing="ij")
    big = 0.2 - np.sqrt((x + 0.2) ** 2 + y**2 + z**2)
    small = 0.08 - np.sqrt((x - 0.3) ** 2 + y**2 + z**2)
    vol = np.maximum(big, small)
    verts, faces = marching_tetrahedra(vol, 0.0)
    v2, f2 = largest_connected_component(verts, faces)
    assert len(v2) < len(verts)
    pts = v2 / 39 - 0.5
    assert np.all(pts[:, 0] < 0.05)  # only the big sphere (x around -0.2)
