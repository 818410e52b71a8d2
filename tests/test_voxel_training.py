"""End-to-end training with the sparse voxel embedding + progressive hooks."""

import numpy as np
import pytest
import jax

from object_nerf_tpu.config import load_config
from object_nerf_tpu.data.synthetic import SyntheticDataset
from object_nerf_tpu.data.ply_io import write_ply, read_ply
from object_nerf_tpu.train.system import ObjectNeRFSystem


def _scene_pointcloud():
    """Surface points of the synthetic scene (spheres + ground plane)."""
    rng = np.random.RandomState(0)
    pts = [rng.rand(400, 3) * [2.4, 2.4, 0.0] - [1.2, 1.2, 0.0]]  # plane z=0
    for c, r in ([0.3, 0.0, 0.25], 0.25), ([-0.35, 0.2, 0.2], 0.2):
        d = rng.randn(300, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append(np.asarray(c) + np.asarray(r) * d)
    return np.concatenate(pts).astype(np.float32)


@pytest.fixture
def voxel_config(tmp_path):
    pcd_path = tmp_path / "scene.ply"
    write_ply(pcd_path, _scene_pointcloud())
    assert read_ply(pcd_path)["points"].shape[0] == 1000

    cfg = load_config()
    cfg.model.merge(
        dict(
            use_voxel_embedding=True,
            D=2, W=32, skips=[1], inst_D=2, inst_W=16, inst_skips=[1],
            N_samples=12, N_importance=8, N_max_objs=8, N_obj_code_length=8,
            N_scn_voxel_size=16, N_obj_voxel_size=8, N_freq_voxel=2,
            N_max_voxels=30000, frustum_bound=0.05, noise_std=0,
        )
    )
    cfg.train.merge(dict(batch_size=256, num_epochs=1, lr=5e-3,
                         progressive_train=True,
                         prune_samples_per_voxel=32, prune_voxel_batch=512))
    cfg.dataset_extra.merge(
        dict(scale_factor=1.0, near=0.5, far=5.0, scene_center=[0.0, 0.0, 0.0],
             pcd_path=str(pcd_path), voxel_size=0.2, neighbor_marks=3)
    )
    return cfg


def test_voxel_training_improves(voxel_config):
    ds = SyntheticDataset("train", img_wh=(32, 24), n_frames=4,
                          dataset_extra=voxel_config.dataset_extra)
    val = SyntheticDataset("val", img_wh=(32, 24),
                           dataset_extra=voxel_config.dataset_extra)
    system = ObjectNeRFSystem(voxel_config, dataset=ds, val_dataset=val)
    assert "voxel_features" in system.state.params
    assert int(system.voxel_topo.n_occupied) > 100

    rng = np.random.RandomState(0)
    m0 = system.training_step(ds.sample_batch(256, rng))
    p0 = float(m0["train/psnr"])
    for _ in range(25):
        m = system.training_step(ds.sample_batch(256, rng))
    p1 = float(m["train/psnr"])
    assert np.isfinite(p1) and p1 > p0, (p0, p1)

    # voxel features actually received gradient
    f0 = np.asarray(system.state.params["voxel_features"])
    assert np.abs(f0).max() > 0

    # validation render with voxel path
    metrics, out = system.validation(chunk=256)
    assert np.isfinite(metrics["val/psnr"])


def test_progressive_hooks_prune_and_subdivide(voxel_config):
    voxel_config.model.N_max_voxels = 60000
    voxel_config.dataset_extra.voxel_size = 0.4
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=voxel_config.dataset_extra)
    system = ObjectNeRFSystem(voxel_config, dataset=ds, val_dataset=None)
    rng = np.random.RandomState(0)
    system.training_step(ds.sample_batch(256, rng))

    # train enough that some density exists, so pruning keeps something
    for _ in range(10):
        system.training_step(ds.sample_batch(256, rng))

    n_before = int(system.voxel_topo.n_occupied)
    system.on_epoch_start(epoch=3)  # prune
    n_pruned = int(system.voxel_topo.n_occupied)
    assert n_pruned <= n_before

    shape_before = system.voxel_static.shape
    system.on_epoch_start(epoch=5)  # subdivide
    assert system.voxel_static.shape == tuple(2 * s for s in shape_before)

    # training still works after topology change
    m = system.training_step(ds.sample_batch(256, rng))
    assert np.isfinite(float(m["train/loss"]))


def test_subdivision_preserves_mlp_optimizer_moments(voxel_config):
    """Subdividing the voxel table must not reset Adam moments for the
    MLPs / code library — only the (reshaped) voxel_features slice."""
    voxel_config.dataset_extra.voxel_size = 0.4
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=voxel_config.dataset_extra)
    system = ObjectNeRFSystem(voxel_config, dataset=ds, val_dataset=None)
    rng = np.random.RandomState(0)
    for _ in range(5):
        system.training_step(ds.sample_batch(256, rng))

    def non_voxel_leaves(opt_state):
        flat, _ = jax.tree_util.tree_flatten_with_path(opt_state)
        return {
            jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat
            if "voxel_features" not in jax.tree_util.keystr(path)
        }

    before = non_voxel_leaves(system.state.opt_state)
    assert any(np.abs(v).max() > 0 for v in before.values())  # moments live
    system.on_epoch_start(epoch=5)  # subdivide
    after = non_voxel_leaves(system.state.opt_state)
    assert before.keys() == after.keys()
    for k in before:
        np.testing.assert_array_equal(before[k], after[k], err_msg=k)
    # and training continues fine
    m = system.training_step(ds.sample_batch(256, rng))
    assert np.isfinite(float(m["train/loss"]))


def test_render_image_pallas_split_matches_xla(voxel_config):
    """make_render_fn's TPU fast path for voxel eval (prebuilt corner table
    + gather/kernel program split) vs the plain XLA render, driven through
    the real system surface (interpret-mode kernels on CPU)."""
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=voxel_config.dataset_extra)
    batch = ds.whole_image_batch(0)

    ref_sys = ObjectNeRFSystem(voxel_config, dataset=ds, val_dataset=None)
    out_ref = ref_sys.render_image(batch, chunk=64)

    cfg = voxel_config.copy()
    cfg.merge({"tpu": {"use_pallas": True, "pallas_interpret": True}})
    pal_sys = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None)
    # identical weights: adopt the XLA system's params
    pal_sys.state = pal_sys.state._replace(params=ref_sys.state.params)
    assert pal_sys.eval_settings.use_pallas
    out_pal = pal_sys.render_image(batch, chunk=64)

    for key in ("rgb_fine", "depth_fine", "opacity_fine",
                "rgb_instance_fine", "opacity_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(out_pal[key]), np.asarray(out_ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=key,
        )
