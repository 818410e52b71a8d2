"""Golden BACKWARD parity: jax.grad of our full train loss vs the reference
implementation's torch autograd.

The forward golden tests (test_reference_parity.py) prove the render + loss
math; this extends the proof to the training gradients: with identical
converted weights, identical rays/batch, and deterministic settings
(perturb=0, noise_std=0 ⇒ det inverse-CDF, detached coarse weights on both
sides), dL/dθ must agree leaf-for-leaf across every MLP parameter and the
per-ray instance codes. This is the strongest statement available that a
training step here IS the reference's training step.

Reference surfaces exercised as oracle: models/rendering.py:233-337 under
autograd, models/losses.py:102-135 (TotalLoss), the weight-layout contract
of train/torch_convert.py applied to gradient tensors (gradients transform
exactly like their parameters: transposed Linear weights, concatenated
skip blocks).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference repo not available", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_modules():
    from _reference_stubs import install_reference_stubs

    install_reference_stubs()
    sys.path.insert(0, REF)
    try:
        from models.nerf_model import ObjectNeRF
        from models.rendering import render_rays as ref_render_rays
        from models.embedding_helper import Embedding as RefEmbedding
        from models.losses import TotalLoss as RefTotalLoss
    finally:
        sys.path.remove(REF)
    return ObjectNeRF, ref_render_rays, RefEmbedding, RefTotalLoss


MODEL_CFG = {
    "use_voxel_embedding": False,
    "D": 3, "W": 64, "skips": [1],
    "inst_D": 2, "inst_W": 32, "inst_skips": [1],
    "N_freq_xyz": 10, "N_freq_dir": 4, "N_freq_voxel": 6,
    "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
    "N_obj_code_length": 16,
}

LOSS_W = {
    "color_loss_weight": 1.0, "depth_loss_weight": 0.1,
    "opacity_loss_weight": 10.0, "instance_color_loss_weight": 1.0,
    "instance_depth_loss_weight": 0.1,
}


def _rays(n, seed=3):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * 0.1
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 0.6, np.float32)
    far = np.full((n, 1), 3.5, np.float32)
    return np.concatenate([o, d, near, far], -1)


def _batch(n, seed=5):
    rng = np.random.RandomState(seed)
    return {
        "rgbs": rng.rand(n, 3).astype(np.float32),
        "depths": (rng.rand(n).astype(np.float32) * 3) * (rng.rand(n) > 0.2),
        "valid_mask": rng.rand(n) > 0.1,
        "instance_mask": rng.rand(n) > 0.5,
        "instance_mask_weight": rng.rand(n).astype(np.float32),
    }


def test_train_gradient_parity(ref_modules):
    import torch
    import jax
    import jax.numpy as jnp

    from object_nerf_tpu.models.mlp import ObjectNeRFConfig
    from object_nerf_tpu.render.renderer import RenderSettings, render_rays
    from object_nerf_tpu.train.losses import total_loss
    from object_nerf_tpu.train.torch_convert import convert_state_dict
    from object_nerf_tpu.config import Config

    ObjectNeRF, ref_render_rays, RefEmbedding, RefTotalLoss = ref_modules
    torch.manual_seed(0)
    cfg = Config(MODEL_CFG)
    coarse = ObjectNeRF(cfg)
    fine = ObjectNeRF(cfg)
    embeddings = {
        "xyz": RefEmbedding(3, MODEL_CFG["N_freq_xyz"]),
        "dir": RefEmbedding(3, MODEL_CFG["N_freq_dir"]),
    }

    n = 24
    rays = _rays(n)
    batch_np = _batch(n)
    rng = np.random.RandomState(9)
    codes_np = rng.randn(n, 16).astype(np.float32) * 0.3

    # ---- torch reference: render -> TotalLoss -> autograd ---------------
    codes_t = torch.tensor(codes_np, requires_grad=True)
    results = ref_render_rays(
        models={"coarse": coarse, "fine": fine},
        embeddings=embeddings,
        rays=torch.from_numpy(rays),
        N_samples=16, use_disp=False, perturb=0, noise_std=0,
        N_importance=8, chunk=1 << 16, white_back=False,
        forward_instance=True, embedding_instance=codes_t,
        frustum_bound_th=0,
    )
    t_batch = {k: torch.from_numpy(np.asarray(v)) for k, v in batch_np.items()}
    ref_loss, _ = RefTotalLoss(LOSS_W)(results, t_batch)
    ref_loss.backward()

    grad_sd = {
        f"nerf_coarse.{k}": p.grad.detach().clone()
        for k, p in coarse.named_parameters()
    }
    grad_sd.update(
        {f"nerf_fine.{k}": p.grad.detach().clone()
         for k, p in fine.named_parameters()}
    )
    # gradients convert exactly like weights (same linear-layout transposes)
    ref_grads = convert_state_dict(grad_sd, MODEL_CFG)
    ref_code_grad = codes_t.grad.numpy()

    # ---- ours: same weights, jax.grad of the same loss -------------------
    sd = {f"nerf_coarse.{k}": v for k, v in coarse.state_dict().items()}
    sd.update({f"nerf_fine.{k}": v for k, v in fine.state_dict().items()})
    params = convert_state_dict(sd, MODEL_CFG)
    settings = RenderSettings(
        mlp=ObjectNeRFConfig.from_config(MODEL_CFG),
        N_samples=16, N_importance=8, perturb=0.0, noise_std=0.0,
        white_back=False, forward_instance=True, frustum_bound_th=0.0,
    )
    jbatch = {k: jnp.asarray(np.asarray(v)) for k, v in batch_np.items()}

    def loss_fn(p, codes):
        out = render_rays(
            p, jnp.asarray(rays), jax.random.PRNGKey(0), settings,
            embedding_instance=codes,
        )
        loss, _ = total_loss(out, jbatch, LOSS_W, use_instance=True)
        return loss

    loss_val, (g_params, g_codes) = jax.value_and_grad(
        loss_fn, argnums=(0, 1)
    )(params, jnp.asarray(codes_np))

    np.testing.assert_allclose(
        float(loss_val), float(ref_loss.detach()), rtol=1e-5
    )

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_ours = dict(jax.tree_util.tree_leaves_with_path(g_params))
    assert flat_ref, "empty reference grad pytree"
    for path, ref_leaf in flat_ref:
        ours = flat_ours[path]
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref_leaf), rtol=2e-3, atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    np.testing.assert_allclose(
        np.asarray(g_codes), ref_code_grad, rtol=2e-3, atol=2e-6
    )
