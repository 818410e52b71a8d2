"""End-to-end: synthetic scene → jitted sharded train step → PSNR improves."""

import numpy as np
import jax
import pytest

from object_nerf_tpu.config import load_config
from object_nerf_tpu.data.synthetic import SyntheticDataset
from object_nerf_tpu.train.system import ObjectNeRFSystem


def _tiny_config(**over):
    cfg = load_config()
    cfg.model.merge(
        dict(
            use_voxel_embedding=False,
            D=3, W=64, skips=[1], inst_D=2, inst_W=32, inst_skips=[1],
            N_samples=24, N_importance=16, N_max_objs=8, N_obj_code_length=16,
            frustum_bound=0.05, noise_std=0,
        )
    )
    cfg.train.merge(dict(batch_size=512, num_epochs=2, lr=5e-3))
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0))
    cfg.merge(over)
    return cfg


def test_train_step_improves_psnr():
    cfg = _tiny_config()
    ds = SyntheticDataset("train", img_wh=(40, 30), n_frames=6,
                          dataset_extra=cfg.dataset_extra)
    val = SyntheticDataset("val", img_wh=(40, 30),
                           dataset_extra=cfg.dataset_extra)
    system = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=val)

    rng = np.random.RandomState(0)
    m0 = system.training_step(ds.sample_batch(512, rng))
    first_psnr = float(m0["train/psnr"])
    for _ in range(100):
        m = system.training_step(ds.sample_batch(512, rng))
    last_psnr = float(m["train/psnr"])
    assert np.isfinite(first_psnr) and np.isfinite(last_psnr)
    assert last_psnr > first_psnr + 1.5, (first_psnr, last_psnr)

    # loss components all present and finite
    m = {k: float(v) for k, v in jax.device_get(m).items()}
    for k in ("train/loss", "train/color_loss", "train/opacity_loss",
              "train/instance_color_loss", "train/depth_loss", "lr"):
        assert k in m and np.isfinite(m[k]), (k, m)


def test_validation_render_and_metrics():
    cfg = _tiny_config()
    ds = SyntheticDataset("train", img_wh=(32, 24), n_frames=3,
                          dataset_extra=cfg.dataset_extra)
    val = SyntheticDataset("val", img_wh=(32, 24),
                           dataset_extra=cfg.dataset_extra)
    system = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=val)
    assert system.val_image_panel() is None  # nothing validated yet
    metrics, out = system.validation(chunk=256)
    assert np.isfinite(metrics["val/psnr"])
    assert out["rgb_fine"].shape == (32 * 24, 3)
    assert out["depth_fine"].shape == (32 * 24,)
    assert out["opacity_instance_fine"].shape == (32 * 24,)
    # the reference's 7-panel val image (train.py:212-218) is buildable
    # from the stashed validation state
    panel = system.val_image_panel()
    assert panel.shape == (7, 24, 32, 3)
    assert np.isfinite(panel).all() and panel.min() >= 0 and panel.max() <= 1


def test_rays_in_bbox_reaches_render_settings():
    """The dataset's bbox predicate must flow into RenderSettings
    (reference train.py:156-160)."""
    cfg = _tiny_config()
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=cfg.dataset_extra)

    class BBoxDataset:
        def __init__(self, base):
            self._base = base

        def __getattr__(self, name):
            return getattr(self._base, name)

        def __len__(self):
            return len(self._base)

        def is_rays_in_bbox(self):
            return True

    system = ObjectNeRFSystem(cfg, dataset=BBoxDataset(ds), val_dataset=None)
    assert system.settings.rays_in_bbox is True
    assert system.eval_settings.rays_in_bbox is True
    plain = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None)
    assert plain.settings.rays_in_bbox is False


def test_nan_guard_aborts_without_val_dataset():
    """A poisoned batch must abort fit() within nan_check_every steps even
    when NO validation dataset exists (the guard used to live only inside
    the val branch — exactly how bench.py and dryrun_multichip construct
    systems)."""
    cfg = _tiny_config()
    cfg.model.merge(dict(N_samples=8, N_importance=4))
    cfg.train.merge(dict(batch_size=128, num_epochs=1, nan_check_every=2))
    ds = SyntheticDataset("train", img_wh=(40, 30), n_frames=2,
                          dataset_extra=cfg.dataset_extra)

    class Poisoned:
        def __init__(self, base):
            self._base = base

        def __getattr__(self, name):
            return getattr(self._base, name)

        def __len__(self):
            return len(self._base)

        def sample_batch(self, n, rng=None):
            b = self._base.sample_batch(n, rng)
            b["rgbs"] = np.full_like(b["rgbs"], np.nan)
            return b

    system = ObjectNeRFSystem(cfg, dataset=Poisoned(ds), val_dataset=None)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        system.fit()


def test_batch_is_sharded_over_mesh():
    cfg = _tiny_config()
    ds = SyntheticDataset("train", img_wh=(32, 24), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    system = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None)
    assert system.n_devices == len(jax.devices())
    batch = system._device_batch(ds.sample_batch(512))
    # rays sharded over the data axis: each device holds 512/n rows
    shard_shapes = {s.data.shape for s in batch["rays"].addressable_shards}
    assert shard_shapes == {(512 // system.n_devices, 8)}
    # params replicated
    w = system.state.params["coarse"]["scene"]["trunk"][0]["w"]
    assert len({s.data.shape for s in w.addressable_shards}) == 1
    assert next(iter({s.data.shape for s in w.addressable_shards})) == w.shape
