"""Checkpoint → resume: state round-trips through the system ctor."""

import numpy as np
import jax.numpy as jnp

from object_nerf_tpu.config import load_config
from object_nerf_tpu.data.synthetic import SyntheticDataset
from object_nerf_tpu.train.system import ObjectNeRFSystem
from object_nerf_tpu.train.checkpoint import save_checkpoint, latest_checkpoint


def _cfg(**over):
    cfg = load_config()
    cfg.model.merge(
        dict(use_voxel_embedding=False, D=2, W=32, skips=[1], inst_D=2,
             inst_W=16, inst_skips=[1], N_samples=8, N_importance=4,
             N_max_objs=8, N_obj_code_length=8, noise_std=0)
    )
    cfg.train.merge(dict(batch_size=128, num_epochs=2))
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0))
    cfg.merge(over)
    return cfg


def test_resume_restores_params_opt_state_and_step(tmp_path):
    cfg = _cfg()
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    sys1 = ObjectNeRFSystem(cfg, dataset=ds)
    rng = np.random.RandomState(0)
    for _ in range(3):
        sys1.training_step(ds.sample_batch(128, rng))
    save_checkpoint(tmp_path, sys1.state, step=int(sys1.state.step))
    w_saved = np.asarray(sys1.state.params["coarse"]["scene"]["trunk"][0]["w"])

    cfg2 = _cfg(ckpt_path=str(latest_checkpoint(tmp_path)))
    sys2 = ObjectNeRFSystem(cfg2, dataset=ds)
    assert int(sys2.state.step) == 3
    np.testing.assert_array_equal(
        np.asarray(sys2.state.params["coarse"]["scene"]["trunk"][0]["w"]),
        w_saved,
    )
    # adam moments survived (nonzero after 3 steps)
    import jax as _jax

    leaves = _jax.tree_util.tree_leaves(sys2.state.opt_state)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves
               if hasattr(l, "shape") and np.asarray(l).size > 1)

    # training continues
    m = sys2.training_step(ds.sample_batch(128, rng))
    assert np.isfinite(float(m["train/loss"]))
    assert int(sys2.state.step) == 4
