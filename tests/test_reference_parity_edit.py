"""Golden parity for the edit path and losses vs the reference implementation.

Imports /root/reference's `render_rays_multi` and `TotalLoss` as oracles
(skipped when unavailable). Deterministic settings make the multi-object
compositor an exact function of the weights; losses are compared on random
results/batches.
"""

import os
import sys
import types

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
        from models.embedding_helper import Embedding as RefEmbedding
        from models.losses import TotalLoss as RefTotalLoss
        from render_tools.multi_rendering import render_rays_multi as ref_multi
        from models.code_library import CodeLibrary as RefCodeLibrary
    finally:
        sys.path.remove(REF)
    return ObjectNeRF, RefEmbedding, RefTotalLoss, ref_multi, RefCodeLibrary


MODEL_CFG = {
    "use_voxel_embedding": False,
    "D": 3, "W": 64, "skips": [1],
    "inst_D": 2, "inst_W": 32, "inst_skips": [1],
    "N_freq_xyz": 10, "N_freq_dir": 4, "N_freq_voxel": 6,
    "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
    "N_obj_code_length": 64, "N_max_objs": 16,
}


class _EmbeddingPair:
    """Adapter: reference multi_rendering expects embedding_xyz returning a
    (scene_emb, inst_voxel_emb) tuple only for EmbeddingVoxel; for classical
    embeddings it still unpacks two values (multi_rendering.py:55)."""

    def __init__(self, emb):
        self.emb = emb

    def __call__(self, x):
        return self.emb(x), None


def test_multi_object_render_parity(ref_modules):
    import torch
    import jax
    import jax.numpy as jnp

    from object_nerf_tpu.config import Config
    from object_nerf_tpu.models.mlp import ObjectNeRFConfig
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.render.multi import render_rays_multi
    from object_nerf_tpu.train.torch_convert import convert_state_dict

    ObjectNeRF, RefEmbedding, _, ref_multi, RefCodeLibrary = ref_modules
    torch.manual_seed(3)
    cfg = Config(MODEL_CFG)
    coarse = ObjectNeRF(cfg).eval()
    fine = ObjectNeRF(cfg).eval()
    code_library = RefCodeLibrary(cfg).eval()
    embeddings = {
        "xyz": _EmbeddingPair(RefEmbedding(3, 10)),
        "dir": RefEmbedding(3, 4),
    }

    n = 12
    rng = np.random.RandomState(5)
    rays_sets = []
    for k in range(2):  # background + one object
        o = rng.randn(n, 3).astype(np.float32) * 0.1
        d = rng.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # distinct near/far per set (as bbox clipping produces in real edits)
        # — identical sets would make every z value tie, and tie order inside
        # the sort is unspecified in both implementations
        near = np.full((n, 1), 0.6 if k == 0 else 0.83, np.float32)
        far = np.full((n, 1), 3.0 if k == 0 else 2.41, np.float32)
        if k == 1:
            far[:3] = 0.0  # muted rays on the object set
            near[:3] = 0.0
        rays_sets.append(np.concatenate([o, d, near, far], -1))

    obj_ids = (0, 5)
    with torch.no_grad():
        ref = ref_multi(
            models={"coarse": coarse, "fine": fine},
            embeddings=embeddings,
            code_library=code_library,
            rays_list=[torch.from_numpy(r) for r in rays_sets],
            obj_instance_ids=list(obj_ids),
            N_samples=16, use_disp=False, perturb=0, noise_std=0,
            N_importance=8, chunk=1 << 16, white_back=False,
        )

    sd = {f"nerf_coarse.{k}": v for k, v in coarse.state_dict().items()}
    sd.update({f"nerf_fine.{k}": v for k, v in fine.state_dict().items()})
    sd.update({f"code_library.{k}": v for k, v in code_library.state_dict().items()})
    params = convert_state_dict(sd, MODEL_CFG)

    settings = RenderSettings(
        mlp=ObjectNeRFConfig.from_config(MODEL_CFG),
        N_samples=16, N_importance=8, perturb=0.0, noise_std=0.0,
        white_back=False, is_eval=True,
    )
    out = render_rays_multi(
        params, [jnp.asarray(r) for r in rays_sets], obj_ids,
        jax.random.PRNGKey(0), settings,
    )
    for key, tol in (("rgb_coarse", 3e-5), ("depth_coarse", 3e-4),
                     ("opacity_coarse", 3e-5),
                     ("rgb_fine", 1e-4), ("depth_fine", 1e-3),
                     ("opacity_fine", 1e-4)):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref[key].numpy(), rtol=2e-3, atol=tol,
            err_msg=key,
        )


def test_loss_parity(ref_modules):
    import torch
    import jax.numpy as jnp

    from object_nerf_tpu.train.losses import total_loss

    _, _, RefTotalLoss, _, _ = ref_modules
    weights = {
        "color_loss_weight": 1.0, "depth_loss_weight": 0.1,
        "opacity_loss_weight": 10.0, "instance_color_loss_weight": 1.0,
        "instance_depth_loss_weight": 0.1,
    }
    ref_loss = RefTotalLoss(weights)

    rng = np.random.RandomState(0)
    n = 64
    results_np = {
        "rgb_coarse": rng.rand(n, 3).astype(np.float32),
        "rgb_fine": rng.rand(n, 3).astype(np.float32),
        "depth_coarse": rng.rand(n).astype(np.float32) * 3,
        "depth_fine": rng.rand(n).astype(np.float32) * 3,
        "opacity_instance_coarse": rng.rand(n).astype(np.float32) * 1.4,
        "opacity_instance_fine": rng.rand(n).astype(np.float32) * 1.4,
        "rgb_instance_coarse": rng.rand(n, 3).astype(np.float32),
        "rgb_instance_fine": rng.rand(n, 3).astype(np.float32),
        "depth_instance_coarse": rng.rand(n).astype(np.float32) * 3,
        "depth_instance_fine": rng.rand(n).astype(np.float32) * 3,
    }
    batch_np = {
        "rgbs": rng.rand(n, 3).astype(np.float32),
        "depths": (rng.rand(n).astype(np.float32) * 3)
        * (rng.rand(n) > 0.2),  # some zero-depth pixels
        "valid_mask": rng.rand(n) > 0.1,
        "instance_mask": rng.rand(n) > 0.5,
        "instance_mask_weight": rng.rand(n).astype(np.float32),
    }

    t_results = {k: torch.from_numpy(v) for k, v in results_np.items()}
    t_batch = {
        k: torch.from_numpy(np.asarray(v)) for k, v in batch_np.items()
    }
    with torch.no_grad():
        ref_sum, ref_dict = ref_loss(t_results, t_batch)

    j_results = {k: jnp.asarray(v) for k, v in results_np.items()}
    j_batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    got_sum, got_dict = total_loss(j_results, j_batch, weights)

    np.testing.assert_allclose(float(got_sum), float(ref_sum), rtol=1e-5)
    for k, v in ref_dict.items():
        np.testing.assert_allclose(
            float(got_dict[k]), float(v), rtol=1e-5, err_msg=k
        )
