"""Data-parallel correctness: the sharded step equals the single-device step.

The DDP-equivalence guarantee (SURVEY §2.5): sharding the ray batch over N
devices with replicated params must produce the same updated parameters as
running the whole batch on one device — XLA's inserted gradient psum is the
all-reduce. Verified on the 8-device virtual CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from object_nerf_tpu.config import load_config
from object_nerf_tpu.data.synthetic import SyntheticDataset
from object_nerf_tpu.train.system import ObjectNeRFSystem


def _system(cfg, ds, devices):
    mesh = Mesh(np.asarray(devices), ("data",))
    return ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None, mesh=mesh)


def _maybe_split(cfg, split):
    # split=True runs the split-program train step (train/split_step.py,
    # interpreter-mode kernels) — its hand-threaded cotangents and P8
    # grad-reduction must preserve the same DDP equivalence
    if split:
        cfg.tpu.merge(dict(use_pallas=True, pallas_interpret=True,
                           split_train_step=True))


@pytest.mark.parametrize("split", [False, True])
def test_sharded_step_matches_single_device(split):
    cfg = load_config()
    cfg.model.merge(
        dict(use_voxel_embedding=False, D=2, W=32, skips=[1], inst_D=2,
             inst_W=16, inst_skips=[1], N_samples=8, N_importance=4,
             N_max_objs=8, N_obj_code_length=8, perturb=0, noise_std=0)
    )
    cfg.train.merge(dict(batch_size=128))
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0))
    _maybe_split(cfg, split)
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    batch = ds.sample_batch(128, np.random.RandomState(0))

    sys1 = _system(cfg, ds, jax.devices()[:1])
    sys8 = _system(cfg, ds, jax.devices()[:8])
    # identical init (same seed)
    w1 = np.asarray(sys1.state.params["coarse"]["scene"]["trunk"][0]["w"])
    w8 = np.asarray(sys8.state.params["coarse"]["scene"]["trunk"][0]["w"])
    np.testing.assert_array_equal(w1, w8)

    # identical key per step: force both systems to the same PRNG state
    sys8.key = sys1.key
    for _ in range(3):
        k = sys1.key
        m1 = sys1.training_step(batch)
        sys8.key = k
        m8 = sys8.training_step(batch)

    np.testing.assert_allclose(
        float(m1["train/loss"]), float(m8["train/loss"]), rtol=1e-5
    )
    p1 = jax.tree_util.tree_leaves(jax.device_get(sys1.state.params))
    p8 = jax.tree_util.tree_leaves(jax.device_get(sys8.state.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("split", [False, True])
def test_sharded_step_matches_single_device_voxel_path(tmp_path, split):
    """Voxel-path DDP equivalence: the replicated voxel_topo buffers and the
    feature-table gradient (custom segment-sum VJP → psum over the data
    axis) must leave 1-device and 8-device training in the same state."""
    from object_nerf_tpu.data.ply_io import write_ply

    rng = np.random.RandomState(0)
    pcd = (rng.rand(500, 3) * 2.4 - 1.2).astype(np.float32)
    pcd_path = tmp_path / "scene.ply"
    write_ply(pcd_path, pcd)

    cfg = load_config()
    cfg.model.merge(
        dict(use_voxel_embedding=True, D=2, W=32, skips=[1], inst_D=2,
             inst_W=16, inst_skips=[1], N_samples=8, N_importance=4,
             N_max_objs=8, N_obj_code_length=8, perturb=0, noise_std=0,
             N_scn_voxel_size=16, N_obj_voxel_size=8, N_freq_voxel=2,
             N_max_voxels=20000)
    )
    cfg.train.merge(dict(batch_size=128))
    cfg.dataset_extra.merge(
        dict(scale_factor=1.0, near=0.5, far=5.0,
             scene_center=[0.0, 0.0, 0.0], pcd_path=str(pcd_path),
             voxel_size=0.3, neighbor_marks=3)
    )
    _maybe_split(cfg, split)
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    batch = ds.sample_batch(128, np.random.RandomState(1))

    sys1 = _system(cfg, ds, jax.devices()[:1])
    sys8 = _system(cfg, ds, jax.devices()[:8])
    np.testing.assert_array_equal(
        np.asarray(sys1.state.params["voxel_features"]),
        np.asarray(sys8.state.params["voxel_features"]),
    )
    # topology replicated on every device of the 8-mesh
    occ_shards = sys8.voxel_topo.idx_map.addressable_shards
    assert len({s.data.shape for s in occ_shards}) == 1
    assert next(iter({s.data.shape for s in occ_shards})) == \
        sys8.voxel_topo.idx_map.shape

    f_init = np.asarray(sys1.state.params["voxel_features"]).copy()
    sys8.key = sys1.key
    for _ in range(3):
        k = sys1.key
        m1 = sys1.training_step(batch)
        sys8.key = k
        m8 = sys8.training_step(batch)

    np.testing.assert_allclose(
        float(m1["train/loss"]), float(m8["train/loss"]), rtol=1e-5
    )
    f1 = np.asarray(sys1.state.params["voxel_features"])
    f8 = np.asarray(sys8.state.params["voxel_features"])
    assert np.abs(f1 - f_init).max() > 0  # table actually received gradient
    np.testing.assert_allclose(f1, f8, rtol=2e-4, atol=2e-6)
    p1 = jax.tree_util.tree_leaves(jax.device_get(sys1.state.params))
    p8 = jax.tree_util.tree_leaves(jax.device_get(sys8.state.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_sharded_eval_render_matches_single_device(use_pallas):
    """Eval-render SPMD: render_image with chunks sharded over the 8-device
    mesh (params replicated) must reproduce the single-device frame — the
    multi-chip validation/eval story, for both the XLA pipeline and the
    interpreter-mode kernel path."""
    cfg = load_config()
    cfg.model.merge(
        dict(use_voxel_embedding=False, D=2, W=32, skips=[1], inst_D=2,
             inst_W=16, inst_skips=[1], N_samples=8, N_importance=4,
             N_max_objs=8, N_obj_code_length=8, perturb=0, noise_std=0)
    )
    cfg.train.merge(dict(batch_size=128))
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0))
    if use_pallas:
        cfg.tpu.merge(dict(use_pallas=True, pallas_interpret=True,
                           pallas_dtype="float32"))
    ds = SyntheticDataset("val", img_wh=(16, 12), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    batch = ds.whole_image_batch(0)

    sys1 = _system(cfg, ds, jax.devices()[:1])
    sys8 = _system(cfg, ds, jax.devices()[:8])
    out1 = sys1.render_image(batch, chunk=48)  # 16*12 = 4 chunks of 48
    out8 = sys8.render_image(batch, chunk=48)  # 48 % 8 == 0 -> sharded

    assert set(out1) == set(out8)
    for k in out1:
        # same rounding envelope as the train-step equivalence above:
        # GSPMD partitioning reorders f32 fusions, nothing more
        np.testing.assert_allclose(
            out8[k], out1[k], rtol=5e-4, atol=1e-5, err_msg=k
        )
