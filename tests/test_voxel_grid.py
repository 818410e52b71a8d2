"""Sparse voxel grid: build, trilinear lookup, occupancy, prune, subdivide."""

import numpy as np
import jax
import jax.numpy as jnp

from object_nerf_tpu.models import voxel_grid as vg


def _build(n_pts=500, voxel_size=0.25, neighbor=1, channels=24, cap=5000,
           seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.rand(n_pts, 3) * 2.0 - 1.0
    return vg.build_voxel_grid(
        pts, scene_center=[0, 0, 0], scale_factor=1.0,
        voxel_size_world=voxel_size, neighbor_marks=neighbor,
        channels=channels, n_freq_voxel=2, n_max_voxels=cap,
        key=jax.random.PRNGKey(seed),
    )


def test_build_marks_point_voxels():
    features, topo, static = _build()
    pts = np.random.RandomState(0).rand(500, 3) * 2.0 - 1.0
    occ = np.asarray(vg.check_occupancy(topo, static, jnp.asarray(pts, jnp.float32)))
    assert occ.mean() > 0.99  # every input point's voxel is occupied
    # far away → unoccupied
    far = np.full((10, 3), 50.0, np.float32)
    assert not np.asarray(vg.check_occupancy(topo, static, jnp.asarray(far))).any()


def test_dilation_grows_occupancy():
    f1, t1, s1 = _build(neighbor=1)
    f3, t3, s3 = _build(neighbor=3)
    assert int(t3.n_occupied) > int(t1.n_occupied)


def test_trilinear_matches_numpy_oracle():
    features, topo, static = _build(n_pts=200, voxel_size=0.5, neighbor=3)
    feats_np = np.asarray(features)
    idx_map = np.asarray(topo.idx_map).reshape(static.shape)
    offset = np.asarray(topo.voxel_offset)
    vs = float(topo.voxel_size)

    rng = np.random.RandomState(1)
    pts = (rng.rand(64, 3) * 1.6 - 0.8).astype(np.float32)

    got, invalid = vg.voxel_lookup_raw(
        features, topo, static, jnp.asarray(pts), trilinear=True
    )
    got, invalid = np.asarray(got), np.asarray(invalid)

    # numpy oracle
    scaled = (pts + offset) / vs
    base = np.floor(scaled).astype(int)
    frac = scaled - base
    expect = np.zeros((64, static.channels), np.float32)
    n_inval = np.zeros(64, int)
    for ci, (dx, dy, dz) in enumerate(
        [(0,0,0),(0,0,1),(0,1,0),(0,1,1),(1,0,0),(1,0,1),(1,1,0),(1,1,1)]
    ):
        q = base + [dx, dy, dz]
        w = (
            (frac[:, 0] if dx else 1 - frac[:, 0])
            * (frac[:, 1] if dy else 1 - frac[:, 1])
            * (frac[:, 2] if dz else 1 - frac[:, 2])
        )
        for i in range(64):
            inb = np.all((q[i] >= 0) & (q[i] < np.array(static.shape)))
            row = idx_map[tuple(q[i])] if inb else -1
            if row >= 0:
                expect[i] += w[i] * feats_np[row]
            else:
                n_inval[i] += 1
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(invalid, n_inval == 8)


def test_voxel_embed_channel_layout():
    features, topo, static = _build(channels=24)
    pts = jnp.zeros((5, 3))
    emb_xyz, inst = vg.voxel_embed(features, topo, static, pts, n_freq_xyz=10)
    # scene: 16 * (2*2+1) = 80 voxel channels + 63 xyz PE
    assert emb_xyz.shape == (5, 16 * 5 + 63)
    assert inst.shape == (5, 8 * 5)


def test_prune_removes_empty_voxels():
    features, topo, static = _build(n_pts=100, voxel_size=0.5)
    before = int(topo.n_occupied)

    def sigma_fn(emb_xyz):  # everything empty → everything pruned
        return jnp.full((emb_xyz.shape[0],), -10.0)

    topo2 = vg.prune_empty_voxels(
        features, topo, static, sigma_fn, jax.random.PRNGKey(0),
        samples_per_voxel=8, voxel_batch=64,
    )
    assert int(topo2.n_occupied) == 0
    assert before > 0
    # shapes unchanged → no recompile needed
    assert topo2.idx_map.shape == topo.idx_map.shape

    def sigma_dense(emb_xyz):  # everything solid → nothing pruned
        return jnp.full((emb_xyz.shape[0],), 100.0)

    topo3 = vg.prune_empty_voxels(
        features, topo, static, sigma_dense, jax.random.PRNGKey(0),
        samples_per_voxel=8, voxel_batch=64,
    )
    assert int(topo3.n_occupied) == before


def test_subdivision_halves_voxel_size_and_preserves_field():
    features, topo, static = _build(n_pts=60, voxel_size=0.5, cap=60000)
    f2, topo2, static2 = vg.subdivide_voxels(features, topo, static)
    assert static2.shape == tuple(2 * s for s in static.shape)
    np.testing.assert_allclose(
        float(topo2.voxel_size), float(topo.voxel_size) / 2
    )
    assert int(topo2.n_occupied) > int(topo.n_occupied)

    # the interpolated field is preserved at points well inside occupancy
    rng = np.random.RandomState(3)
    occ3 = np.asarray(topo.occupancy).reshape(static.shape)
    idx = np.argwhere(occ3)
    centers = idx * float(topo.voxel_size) - np.asarray(topo.voxel_offset)
    pts = jnp.asarray(centers[:20], jnp.float32)
    v_old, _ = vg.voxel_lookup_raw(features, topo, static, pts)
    v_new, _ = vg.voxel_lookup_raw(f2, topo2, static2, pts)
    np.testing.assert_allclose(
        np.asarray(v_new), np.asarray(v_old), rtol=1e-4, atol=1e-5
    )


def test_ray_box_intersection_tightens():
    features, topo, static = _build(n_pts=300, voxel_size=0.3, neighbor=3)
    n = 8
    rays_o = np.tile(np.array([[0.0, 0.0, 5.0]], np.float32), (n, 1))
    rays_d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    near = jnp.full((n, 1), 0.1)
    far = jnp.full((n, 1), 12.0)
    n2, f2 = vg.ray_box_intersection(
        topo, static, jnp.asarray(rays_o), jnp.asarray(rays_d), near, far
    )
    assert float(n2.min()) > 0.1  # tightened: scene is z∈[-1,1], start z=5
    assert float(f2.max()) < 12.0


def test_dense_lookup_with_addressing_matches_plain():
    """with_addressing returns the same (out, invalid) plus the (flat, wts)
    addressing the split train step's hand-derived table gradient uses;
    reducing ct[flat] by wts must reproduce the lookup exactly."""
    features, topo, static = _build(n_pts=200, voxel_size=0.5, neighbor=3)
    pts = jnp.asarray(
        (np.random.RandomState(4).rand(64, 3) * 1.6 - 0.8), jnp.float32
    )
    out, invalid = vg.voxel_lookup_dense(features, topo, static, pts)
    ct = vg.make_corner_table(features, topo, static)
    out2, invalid2, flat, wts = vg.voxel_lookup_dense(
        None, topo, static, pts, ct=ct, with_addressing=True
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(invalid2), np.asarray(invalid))
    manual = jnp.sum(
        jnp.take(ct, flat, axis=0).reshape(-1, 8, static.channels)
        * wts[..., None], axis=1,
    )
    np.testing.assert_allclose(np.asarray(manual), np.asarray(out2),
                               rtol=1e-6, atol=1e-7)


def test_prebuilt_ct_rejected_for_nearest_lookup():
    import pytest

    features, topo, static = _build(n_pts=100)
    ct = vg.make_corner_table(features, topo, static)
    pts = jnp.zeros((4, 3), jnp.float32)
    with pytest.raises(ValueError, match="trilinear"):
        vg.voxel_lookup_raw(features, topo, static, pts, trilinear=False,
                            ct=ct)


def test_corner_table_transpose_matches_autodiff():
    """The hand-written `corner_table_transpose` (8 slice-adds + one
    capacity-row gather — no forward re-run, no scatter) must equal
    autodiff's vjp of the corner-table build exactly, including after a
    prune trash-routes rows on BOTH the idx_map and row_to_cell sides."""
    features, topo, static = _build(channels=8)

    def build(f, t):
        return vg._corner_table_impl(f, t.idx_map, static)

    rng = np.random.RandomState(3)
    n_pcells = (static.shape[0] + 1) * (static.shape[1] + 1) * (static.shape[2] + 1)
    d_ct = jnp.asarray(
        rng.randn(n_pcells, 8 * static.channels).astype(np.float32)
    )

    for tag, t in (("fresh", topo), ("pruned", _pruned(features, topo, static))):
        ref = jax.vjp(lambda f: build(f, t), features)[1](d_ct)[0]
        got = vg.corner_table_transpose(d_ct, t.row_to_cell, static)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6, err_msg=tag)
        # and the custom-vjp'd public build routes through the same math
        ref2 = jax.vjp(
            lambda f: vg._cell_corner_table(f, t, static), features
        )[1](d_ct)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref2),
                                   rtol=1e-6, atol=1e-6, err_msg=tag)


def _pruned(features, topo, static):
    # drop every other occupied voxel the way prune does (trash-route both
    # the idx_map and the row_to_cell inverse)
    idx_map = np.asarray(topo.idx_map).copy()
    rtc = np.asarray(topo.row_to_cell).copy()
    occ = np.asarray(topo.occupancy).copy()
    cells = np.flatnonzero(idx_map >= 0)[::2]
    rtc[idx_map[cells]] = int(np.prod(static.shape))
    idx_map[cells] = -1
    occ[cells] = False
    return topo._replace(
        idx_map=jnp.asarray(idx_map), occupancy=jnp.asarray(occ),
        n_occupied=jnp.int32(int(occ.sum())), row_to_cell=jnp.asarray(rtc),
    )


def test_grid_sample_variant_matches_torch():
    """voxel_lookup_grid_sample vs torch F.grid_sample with the reference's
    exact call (embedding_helper.py:447-471): dense (X,Y,Z) grid read from
    the table head, align_corners=True, border padding, and the quirky
    axis order its rearrange induces (point coord k samples axis 2-k)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    X, Y, Z, C = 5, 4, 3, 6
    static = vg.VoxelStatic(shape=(X, Y, Z), channels=C, n_freq_voxel=2,
                            n_max_voxels=X * Y * Z + 7)
    table = rng.randn(static.n_max_voxels, C).astype(np.float32)
    bounds = np.asarray([[-1.0, -0.5, 0.0], [1.0, 1.5, 2.0]], np.float32)
    # interior + out-of-bounds points (border padding must clamp)
    pts = (rng.rand(64, 3) * 3.0 - 1.5).astype(np.float32)
    pts = pts * (bounds[1] - bounds[0]) + bounds[0]

    got = np.asarray(vg.voxel_lookup_grid_sample(
        jnp.asarray(table), static, jnp.asarray(pts), jnp.asarray(bounds)))

    inp = torch.from_numpy(table[: X * Y * Z]).reshape(X, Y, Z, C)
    inp = inp.permute(3, 0, 1, 2)[None]  # (1, C, n1, n2, n3)
    u = (pts - bounds[0]) / (bounds[1] - bounds[0])
    g = torch.from_numpy(u * 2.0 - 1.0).reshape(1, 1, 1, -1, 3)
    want = (
        F.grid_sample(inp, g, padding_mode="border", align_corners=True,
                      mode="bilinear")
        .squeeze()
        .permute(1, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
