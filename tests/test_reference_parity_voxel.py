"""Golden voxel parity: our sparse voxel grid vs the actual reference
`EmbeddingVoxel` (models/embedding_helper.py:77-427).

The reference module hard-codes `.cuda()` throughout and loads its point
cloud through open3d; the fixture patches `Tensor.cuda`/`Module.cuda` to
identity and stubs `open3d.io.read_point_cloud`, then runs the REAL
`set_pointclouds` (quantize → Conv3d occupancy dilation → idx map) on CPU.

Covered, all with the reference as oracle:
* grid build (occupancy, idx map, shape, offset) — build parity;
* `compute_voxel_features_sparse` / `forward` trilinear lookups — including
  out-of-bounds and empty-voxel masking;
* `check_occupancy`;
* the checkpoint converter fed a state dict WITH voxel buffers
  (embedding_xyz.embedding_space_ftr.weight + registered buffers), and a
  full voxel-conditioned two-pass render from those converted buffers.
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


MODEL_CFG = {
    "use_voxel_embedding": True,
    "D": 2, "W": 32, "skips": [1],
    "inst_D": 2, "inst_W": 32, "inst_skips": [1],
    "N_freq_xyz": 10, "N_freq_dir": 4, "N_freq_voxel": 2,
    "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
    "N_obj_code_length": 16,
}
CHANNELS = MODEL_CFG["N_scn_voxel_size"] + MODEL_CFG["N_obj_voxel_size"]
MAX_VOXELS = 4096
CONF = {
    "pcd_path": "<stubbed>",
    "scene_center": [0.1, -0.2, 0.3],
    "scale_factor": 2.0,
    "voxel_size": 0.5,  # world units
    "neighbor_marks": 3,
}


def _pointcloud(n=500, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3) * [3.0, 2.5, 2.0] - [1.5, 1.2, 1.0]).astype(
        np.float64
    )


@pytest.fixture(scope="module")
def reference_voxel(request):
    """The reference EmbeddingVoxel built on CPU over `_pointcloud()`."""
    import torch

    from _reference_stubs import install_reference_stubs

    install_reference_stubs()
    pcd = _pointcloud()

    # open3d stub: serve the in-memory cloud through io.read_point_cloud
    o3d = sys.modules["open3d"]
    old_io = getattr(o3d, "io", None)
    o3d.io = types.SimpleNamespace(
        read_point_cloud=lambda path: types.SimpleNamespace(points=pcd)
    )
    # neutralize the hard-coded .cuda() calls
    old_tensor_cuda = torch.Tensor.cuda
    old_module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    sys.path.insert(0, REF)
    try:
        from models.embedding_helper import Embedding, EmbeddingVoxel
        from models.nerf_model import ObjectNeRF
        from models.rendering import render_rays as ref_render_rays

        torch.manual_seed(0)
        module = EmbeddingVoxel(
            channels=CHANNELS,
            N_freqs=MODEL_CFG["N_freq_voxel"],
            max_voxels=MAX_VOXELS,
            dataset_extra_config=dict(CONF),
        ).eval()
    finally:
        sys.path.remove(REF)

    def cleanup():
        torch.Tensor.cuda = old_tensor_cuda
        torch.nn.Module.cuda = old_module_cuda
        if old_io is not None:
            o3d.io = old_io

    request.addfinalizer(cleanup)
    return module, pcd, Embedding, ObjectNeRF, ref_render_rays


def _our_grid_from_build(reference_voxel, key=0):
    """Our grid built from the same raw point cloud (independent build)."""
    import jax

    from object_nerf_tpu.models import voxel_grid as vg

    _, pcd, *_ = reference_voxel
    return vg.build_voxel_grid(
        pcd,
        scene_center=CONF["scene_center"],
        scale_factor=CONF["scale_factor"],
        voxel_size_world=CONF["voxel_size"],
        neighbor_marks=CONF["neighbor_marks"],
        channels=CHANNELS,
        n_freq_voxel=MODEL_CFG["N_freq_voxel"],
        n_max_voxels=MAX_VOXELS,
        key=jax.random.PRNGKey(key),
        auto_capacity=False,
    )


def _our_grid_from_ckpt(reference_voxel):
    """Our grid rebuilt through the checkpoint converter (buffer adoption)."""
    from object_nerf_tpu.models import voxel_grid as vg

    module, *_ = reference_voxel
    sd = module.state_dict()
    voxel = {"features": module.embedding_space_ftr.weight.detach().numpy()}
    for name in ("voxel_size", "bounds", "voxel_offset", "voxel_shape",
                 "voxel_occupancy", "voxel_idx_map"):
        voxel[name] = sd[name].numpy()
    return vg.from_torch_buffers(voxel, MODEL_CFG["N_freq_voxel"])


def _test_points(reference_voxel, n=400, seed=5):
    """Mix of in-bounds, boundary, and far out-of-bounds query points."""
    module, pcd, *_ = reference_voxel
    rng = np.random.RandomState(seed)
    norm = (pcd - np.asarray(CONF["scene_center"])) / CONF["scale_factor"]
    lo, hi = norm.min(0), norm.max(0)
    span = hi - lo
    inside = lo + rng.rand(n, 3) * span
    fringe = lo - 0.2 * span + rng.rand(n // 2, 3) * span * 1.4
    far = rng.randn(n // 4, 3) * 10.0
    return np.concatenate([inside, fringe, far]).astype(np.float32)


def test_build_parity_occupancy_and_idx_map(reference_voxel):
    """Independent build from the raw cloud reproduces the reference's
    occupancy, idx map, shape, and offset exactly."""
    module, *_ = reference_voxel
    features, topo, static = _our_grid_from_build(reference_voxel)

    ref_shape = tuple(int(x) for x in module.voxel_shape.numpy())
    assert static.shape == ref_shape
    np.testing.assert_allclose(
        np.asarray(topo.voxel_offset), module.voxel_offset.numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(topo.voxel_size), float(module.voxel_size.numpy()), rtol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(topo.occupancy).reshape(ref_shape),
        module.voxel_occupancy.numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(topo.idx_map).reshape(ref_shape),
        module.voxel_idx_map.numpy(),
    )


def test_sparse_lookup_parity(reference_voxel):
    """compute_voxel_features_sparse (trilinear + PE split) vs voxel_embed,
    same feature table, including OOB/empty masking."""
    import torch
    import jax.numpy as jnp

    from object_nerf_tpu.models.voxel_grid import voxel_embed, voxel_lookup_raw

    module, *_ = reference_voxel
    features, topo, static = _our_grid_from_ckpt(reference_voxel)
    pts = _test_points(reference_voxel)

    with torch.no_grad():
        ref_scene_pe, ref_inst_pe = module.compute_voxel_features_sparse(
            torch.from_numpy(pts), trilinear_interpolate=True
        )
        ref_raw = module.compute_voxel_features_sparse(
            torch.from_numpy(pts), trilinear_interpolate=True,
            positional_embedding=False,
        )
        ref_full, ref_inst_full = module.forward(torch.from_numpy(pts))

    raw, invalid = voxel_lookup_raw(features, topo, static, jnp.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(raw), ref_raw.numpy(), rtol=1e-5, atol=1e-6
    )

    emb_xyz, inst_emb = voxel_embed(
        features, topo, static, jnp.asarray(pts),
        n_freq_xyz=MODEL_CFG["N_freq_xyz"],
    )
    np.testing.assert_allclose(
        np.asarray(emb_xyz), ref_full.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(inst_emb), ref_inst_full.numpy(), rtol=1e-5, atol=1e-6
    )
    # the scene-PE half alone also matches
    scene_pe_dim = ref_scene_pe.shape[-1]
    np.testing.assert_allclose(
        np.asarray(emb_xyz[:, :scene_pe_dim]), ref_scene_pe.numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_nearest_lookup_and_occupancy_parity(reference_voxel):
    import torch
    import jax.numpy as jnp

    from object_nerf_tpu.models.voxel_grid import (
        check_occupancy, voxel_lookup_raw,
    )

    module, *_ = reference_voxel
    features, topo, static = _our_grid_from_ckpt(reference_voxel)
    pts = _test_points(reference_voxel, seed=9)

    with torch.no_grad():
        ref_raw = module.compute_voxel_features_sparse(
            torch.from_numpy(pts), trilinear_interpolate=False,
            positional_embedding=False,
        )
        ref_occ = module.check_occupancy(torch.from_numpy(pts))

    raw, _ = voxel_lookup_raw(
        features, topo, static, jnp.asarray(pts), trilinear=False
    )
    np.testing.assert_allclose(
        np.asarray(raw), ref_raw.numpy(), rtol=1e-5, atol=1e-6
    )
    occ = check_occupancy(topo, static, jnp.asarray(pts))
    np.testing.assert_array_equal(np.asarray(occ), ref_occ.numpy())


def test_full_voxel_render_parity_via_converter(reference_voxel):
    """End-to-end: reference voxel-conditioned two-pass render vs ours,
    with EVERYTHING (MLPs, code-free, voxel table + topology) flowing
    through the checkpoint converter."""
    import torch
    import jax
    import jax.numpy as jnp

    from object_nerf_tpu.config import Config
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.models.mlp import ObjectNeRFConfig
    from object_nerf_tpu.render.renderer import RenderSettings, render_rays
    from object_nerf_tpu.train.torch_convert import convert_state_dict

    module, pcd, RefEmbedding, RefObjectNeRF, ref_render_rays = reference_voxel
    torch.manual_seed(3)
    cfg = Config(MODEL_CFG)
    coarse = RefObjectNeRF(cfg).eval()
    fine = RefObjectNeRF(cfg).eval()

    # a reference-style Lightning state dict, voxel buffers included
    sd = {f"nerf_coarse.{k}": v for k, v in coarse.state_dict().items()}
    sd.update({f"nerf_fine.{k}": v for k, v in fine.state_dict().items()})
    sd.update({f"embedding_xyz.{k}": v for k, v in module.state_dict().items()})
    params = convert_state_dict(sd, MODEL_CFG)
    assert "voxel" in params
    features, topo, static = vg.from_torch_buffers(
        params.pop("voxel"), MODEL_CFG["N_freq_voxel"]
    )

    n = 16
    rng = np.random.RandomState(21)
    # rays through the scene volume (normalized coords)
    norm = (pcd - np.asarray(CONF["scene_center"])) / CONF["scale_factor"]
    center = norm.mean(0).astype(np.float32)
    o = (center + rng.randn(n, 3) * 0.1 - [0, 0, 1.0]).astype(np.float32)
    d = (rng.randn(n, 3) * 0.2 + [0, 0, 1.0]).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.2, np.float32), np.full((n, 1), 2.5, np.float32)],
        -1,
    ).astype(np.float32)
    codes = rng.randn(n, MODEL_CFG["N_obj_code_length"]).astype(np.float32)

    with torch.no_grad():
        ref = ref_render_rays(
            models={"coarse": coarse, "fine": fine},
            embeddings={"xyz": module,
                        "dir": RefEmbedding(3, MODEL_CFG["N_freq_dir"])},
            rays=torch.from_numpy(rays),
            N_samples=16, use_disp=False, perturb=0, noise_std=0,
            N_importance=8, chunk=4096, white_back=False,
            forward_instance=True,
            embedding_instance=torch.from_numpy(codes),
            frustum_bound_th=0,
        )

    settings = RenderSettings(
        mlp=ObjectNeRFConfig.from_config(MODEL_CFG),
        N_samples=16, N_importance=8, perturb=0.0, noise_std=0.0,
        white_back=False, forward_instance=True, frustum_bound_th=0.0,
    )
    out = render_rays(
        params, jnp.asarray(rays), jax.random.PRNGKey(0), settings,
        voxel_ctx=(features, topo, static),
        embedding_instance=jnp.asarray(codes),
    )

    for key in ("rgb_coarse", "opacity_coarse", "rgb_instance_coarse",
                "z_vals_fine", "rgb_fine", "depth_fine",
                "rgb_instance_fine", "opacity_instance_fine"):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref[key].numpy(), rtol=1e-3, atol=5e-4,
            err_msg=key,
        )
    mse = float(np.mean((np.asarray(out["rgb_fine"]) - ref["rgb_fine"].numpy()) ** 2))
    assert mse < 1e-6, mse


def test_system_restores_reference_voxel_ckpt(reference_voxel, tmp_path):
    """ObjectNeRFSystem(ckpt_path=<reference .ckpt with voxel buffers>)
    adopts the checkpoint's voxel topology wholesale and keeps training."""
    import torch

    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.data.ply_io import write_ply
    from object_nerf_tpu.data.synthetic import SyntheticDataset
    from object_nerf_tpu.train.system import ObjectNeRFSystem

    module, pcd, RefEmbedding, RefObjectNeRF, _ = reference_voxel
    torch.manual_seed(5)
    from object_nerf_tpu.config import Config

    coarse = RefObjectNeRF(Config(MODEL_CFG)).eval()
    fine = RefObjectNeRF(Config(MODEL_CFG)).eval()
    sd = {f"nerf_coarse.{k}": v for k, v in coarse.state_dict().items()}
    sd.update({f"nerf_fine.{k}": v for k, v in fine.state_dict().items()})
    sd.update({f"embedding_xyz.{k}": v for k, v in module.state_dict().items()})
    sd["code_library.embedding_instance.weight"] = torch.randn(8, 16)
    ckpt_path = tmp_path / "reference.ckpt"
    torch.save({"state_dict": sd}, ckpt_path)

    pcd_path = tmp_path / "scene.ply"
    write_ply(pcd_path, pcd.astype(np.float32))

    cfg = load_config()
    cfg.model.merge(dict(MODEL_CFG, N_samples=8, N_importance=4,
                         N_max_objs=8, N_max_voxels=MAX_VOXELS, noise_std=0))
    cfg.train.merge(dict(batch_size=64, num_epochs=1))
    cfg.dataset_extra.merge(
        dict(scale_factor=CONF["scale_factor"], near=0.2, far=2.5,
             scene_center=CONF["scene_center"], pcd_path=str(pcd_path),
             voxel_size=CONF["voxel_size"],
             neighbor_marks=CONF["neighbor_marks"])
    )
    cfg.ckpt_path = str(ckpt_path)
    ds = SyntheticDataset("train", img_wh=(16, 12), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    system = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None)

    # topology adopted from the checkpoint buffers, not rebuilt from the pcd
    ref_shape = tuple(int(x) for x in module.voxel_shape.numpy())
    assert system.voxel_static.shape == ref_shape
    assert system.voxel_static.n_max_voxels == MAX_VOXELS
    np.testing.assert_array_equal(
        np.asarray(system.voxel_topo.idx_map).reshape(ref_shape),
        module.voxel_idx_map.numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(system.state.params["voxel_features"]),
        module.embedding_space_ftr.weight.detach().numpy(),
        rtol=1e-6,
    )
    m = system.training_step(ds.sample_batch(64))
    assert np.isfinite(float(m["train/loss"]))


def test_voxel_train_gradient_parity(reference_voxel):
    """Golden BACKWARD parity on the voxel path: jax.grad of the full
    voxel-conditioned train loss — including the FEATURE-TABLE gradient
    through the corner-table gather's segment-sum custom VJP
    (voxel_grid._take_rows) — vs the reference's torch autograd through
    EmbeddingVoxel (embedding_helper.py:325-409)."""
    import torch
    import jax
    import jax.numpy as jnp

    from object_nerf_tpu.config import Config
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.models.mlp import ObjectNeRFConfig
    from object_nerf_tpu.render.renderer import RenderSettings, render_rays
    from object_nerf_tpu.train.losses import total_loss
    from object_nerf_tpu.train.torch_convert import convert_state_dict

    sys.path.insert(0, REF)
    try:
        from models.losses import TotalLoss as RefTotalLoss
    finally:
        sys.path.remove(REF)

    module, pcd, RefEmbedding, RefObjectNeRF, ref_render_rays = reference_voxel
    torch.manual_seed(7)
    coarse = RefObjectNeRF(Config(MODEL_CFG))
    fine = RefObjectNeRF(Config(MODEL_CFG))

    loss_w = {
        "color_loss_weight": 1.0, "depth_loss_weight": 0.1,
        "opacity_loss_weight": 10.0, "instance_color_loss_weight": 1.0,
        "instance_depth_loss_weight": 0.1,
    }

    n = 16
    rng = np.random.RandomState(21)
    norm = (pcd - np.asarray(CONF["scene_center"])) / CONF["scale_factor"]
    center = norm.mean(0).astype(np.float32)
    o = (center + rng.randn(n, 3) * 0.1 - [0, 0, 1.0]).astype(np.float32)
    d = (rng.randn(n, 3) * 0.2 + [0, 0, 1.0]).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.2, np.float32),
         np.full((n, 1), 2.5, np.float32)], -1).astype(np.float32)
    codes_np = rng.randn(n, MODEL_CFG["N_obj_code_length"]).astype(np.float32)
    batch_np = {
        "rgbs": rng.rand(n, 3).astype(np.float32),
        "depths": (rng.rand(n).astype(np.float32) * 2) * (rng.rand(n) > 0.2),
        "valid_mask": rng.rand(n) > 0.1,
        "instance_mask": rng.rand(n) > 0.5,
        "instance_mask_weight": rng.rand(n).astype(np.float32),
    }

    # ---- torch: render -> loss -> autograd (incl. the feature table) ----
    codes_t = torch.tensor(codes_np, requires_grad=True)
    results = ref_render_rays(
        models={"coarse": coarse, "fine": fine},
        embeddings={"xyz": module,
                    "dir": RefEmbedding(3, MODEL_CFG["N_freq_dir"])},
        rays=torch.from_numpy(rays),
        N_samples=16, use_disp=False, perturb=0, noise_std=0,
        N_importance=8, chunk=1 << 16, white_back=False,
        forward_instance=True, embedding_instance=codes_t,
        frustum_bound_th=0,
    )
    t_batch = {k: torch.from_numpy(np.asarray(v)) for k, v in batch_np.items()}
    ref_loss, _ = RefTotalLoss(loss_w)(results, t_batch)
    ref_loss.backward()

    grad_sd = {f"nerf_coarse.{k}": p.grad.detach().clone()
               for k, p in coarse.named_parameters()}
    grad_sd.update({f"nerf_fine.{k}": p.grad.detach().clone()
                    for k, p in fine.named_parameters()})
    ref_grads = convert_state_dict(grad_sd, MODEL_CFG)
    ref_ftr_grad = module.embedding_space_ftr.weight.grad.detach().numpy()
    module.embedding_space_ftr.weight.grad = None  # keep the fixture clean

    # ---- ours ------------------------------------------------------------
    sd = {f"nerf_coarse.{k}": v for k, v in coarse.state_dict().items()}
    sd.update({f"nerf_fine.{k}": v for k, v in fine.state_dict().items()})
    sd.update({f"embedding_xyz.{k}": v for k, v in module.state_dict().items()})
    params = convert_state_dict(sd, MODEL_CFG)
    features, topo, static = vg.from_torch_buffers(
        params.pop("voxel"), MODEL_CFG["N_freq_voxel"]
    )
    settings = RenderSettings(
        mlp=ObjectNeRFConfig.from_config(MODEL_CFG),
        N_samples=16, N_importance=8, perturb=0.0, noise_std=0.0,
        white_back=False, forward_instance=True, frustum_bound_th=0.0,
    )
    jbatch = {k: jnp.asarray(np.asarray(v)) for k, v in batch_np.items()}

    def loss_fn(p, ftr, codes):
        out = render_rays(
            p, jnp.asarray(rays), jax.random.PRNGKey(0), settings,
            voxel_ctx=(ftr, topo, static), embedding_instance=codes,
        )
        loss, _ = total_loss(out, jbatch, loss_w, use_instance=True)
        return loss

    loss_val, (g_params, g_ftr, g_codes) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2)
    )(params, features, jnp.asarray(codes_np))

    np.testing.assert_allclose(
        float(loss_val), float(ref_loss.detach()), rtol=1e-5
    )
    # the headline: feature-table gradient (sparse rows) matches exactly
    # where zero and to float tolerance where touched
    np.testing.assert_allclose(
        np.asarray(g_ftr), ref_ftr_grad, rtol=2e-3, atol=2e-6
    )
    assert float(np.abs(np.asarray(g_ftr)).max()) > 0  # gradient actually flows
    flat_ours = dict(jax.tree_util.tree_leaves_with_path(g_params))
    for path, ref_leaf in jax.tree_util.tree_leaves_with_path(ref_grads):
        np.testing.assert_allclose(
            np.asarray(flat_ours[path]), np.asarray(ref_leaf),
            rtol=2e-3, atol=2e-6, err_msg=jax.tree_util.keystr(path),
        )
    np.testing.assert_allclose(
        np.asarray(g_codes), codes_t.grad.numpy(), rtol=2e-3, atol=2e-6
    )
