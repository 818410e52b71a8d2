"""Convergence A/B: the REFERENCE trainer vs ours over identical batches.

Runs the reference implementation's actual training step on CPU — its
`render_rays` under torch autograd (rendering.py:233-337), its `TotalLoss`
(losses.py:102-135), its `torch.optim.Adam` + per-epoch poly `LambdaLR`
(utils/__init__.py:25-77, train.py:117-118 configure_optimizers) — and our
`make_train_step` (optax adam + the same poly schedule), both starting
from the SAME converted initial weights and consuming the SAME numpy batch
stream from the synthetic scene. Deterministic settings (perturb=0,
noise_std=0) so neither side draws framework-specific randomness.

This closes the inferential gap left by single-step parity: the optimizer
arithmetic (Adam moments, eps placement), the per-epoch schedule staircase,
and 200 steps of compounding dynamics — not just one gradient.

Outputs debug/convergence_ab.json with both loss/psnr trajectories and
summary stats. Exit nonzero if agreement bounds are violated (see main).

Usage:
    python scripts/convergence_ab.py [--steps 200] [--batch 256] [--voxel]

`--voxel` runs the voxel-conditioned variant (the paper's headline
configuration): the reference side trains its real `EmbeddingVoxel`
(embedding_helper.py:77-427, .cuda() neutralized) and ours trains the
converted table under the same Adam — covering the sparse-gather VJP and
the voxel rows inside the optimizer, not just the MLP weights.

Expected regime (f32, identical math): per-step relative loss gap ~1e-5
early; tiny rounding differences compound over hundreds of nonconvex
steps, so late-step agreement is judged on trajectory statistics (mean
loss / PSNR over the final window), not bitwise step equality.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

# CPU-only by design: the A/B compares f32 CPU math on both sides (torch is
# CPU-only here; our side must match that precision regime). The axon TPU
# plugin ignores JAX_PLATFORMS, so force via jax.config before any compute.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REF = "/root/reference"

MODEL_CFG = {
    "use_voxel_embedding": False,
    "D": 3, "W": 64, "skips": [1],
    "inst_D": 2, "inst_W": 32, "inst_skips": [1],
    "N_freq_xyz": 10, "N_freq_dir": 4, "N_freq_voxel": 2,
    "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
    "N_obj_code_length": 16, "N_max_objs": 8,
    "N_samples": 16, "N_importance": 8,
    "N_max_voxels": 4096,
}

# Voxel-conditioned A/B (--voxel): the paper's headline configuration.
# The sparse grid is built by the REFERENCE EmbeddingVoxel.set_pointclouds
# (quantize → Conv3d dilation → idx map) over a synthetic cloud spanning
# the scene volume; our side adopts the resulting buffers through the
# checkpoint converter, exactly like a user restoring a reference ckpt.
VOXEL_CONF = {
    "pcd_path": "<stubbed>",  # open3d.io is stubbed to serve the cloud
    "scene_center": [0.0, 0.0, 0.0],
    "scale_factor": 1.0,
    "voxel_size": 0.3,
    "neighbor_marks": 3,
}


def _voxel_pointcloud(n=800, seed=11):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3) * [3.0, 3.0, 2.5] - [1.5, 1.5, 1.0]).astype(
        np.float64
    )

LOSS_W = {
    "color_loss_weight": 1.0, "depth_loss_weight": 0.1,
    "opacity_loss_weight": 10.0, "instance_color_loss_weight": 1.0,
    "instance_depth_loss_weight": 0.1,
}

TRAIN_CFG = {
    "optimizer": "adam", "lr": 1e-3, "weight_decay": 0.0,
    "lr_scheduler": "poly", "poly_exp": 2.0,
    "warmup_epochs": 0, "warmup_multiplier": 1.0,
    # num_epochs is filled in from --steps / steps_per_epoch
}


def _dataset():
    from object_nerf_tpu.config import Config
    from object_nerf_tpu.data.synthetic import SyntheticDataset

    extra = Config({"scale_factor": 1.0, "near": 0.5, "far": 5.0,
                    "scene_center": [0.0, 0.0, 0.0]})
    return SyntheticDataset("train", img_wh=(40, 30), n_frames=4,
                            dataset_extra=extra)


def _masked_psnr_np(pred, gt, mask):
    mask3 = np.repeat(mask.reshape(-1, 1), 3, axis=1).astype(bool)
    mse = np.mean((pred[mask3] - gt[mask3]) ** 2)
    return float(-10.0 * np.log10(mse))


def run_reference(batches, init_sd, n_steps, steps_per_epoch, num_epochs,
                  voxel=False):
    """The reference trainer loop, faithfully: Adam over
    [models, code_library, embedding_xyz] (train.py:67-71), poly LambdaLR
    stepped once per epoch (Lightning's default interval for
    configure_optimizers' scheduler list). With `voxel`, embedding_xyz is
    the real `EmbeddingVoxel` (train.py:46-51) and its feature table trains
    under the same Adam group."""
    import torch
    import types

    from _reference_stubs import install_reference_stubs

    install_reference_stubs()
    cleanups = []
    if voxel:
        # serve the synthetic cloud through the stubbed open3d.io and
        # neutralize the module's hard-coded .cuda() calls (same recipe as
        # tests/test_reference_parity_voxel.py's fixture)
        o3d = sys.modules["open3d"]
        old_io = getattr(o3d, "io", None)
        pcd = _voxel_pointcloud()
        o3d.io = types.SimpleNamespace(
            read_point_cloud=lambda path: types.SimpleNamespace(points=pcd)
        )
        old_tensor_cuda = torch.Tensor.cuda
        old_module_cuda = torch.nn.Module.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self

        def _restore():
            torch.Tensor.cuda = old_tensor_cuda
            torch.nn.Module.cuda = old_module_cuda
            if old_io is not None:
                o3d.io = old_io

        cleanups.append(_restore)

    sys.path.insert(0, REF)
    try:
        from models.nerf_model import ObjectNeRF
        from models.rendering import render_rays as ref_render_rays
        from models.embedding_helper import Embedding as RefEmbedding
        from models.embedding_helper import EmbeddingVoxel as RefEmbeddingVoxel
        from models.losses import TotalLoss as RefTotalLoss
        from models.code_library import CodeLibrary as RefCodeLibrary
        from utils import get_optimizer, get_scheduler
    finally:
        sys.path.remove(REF)

    from object_nerf_tpu.config import Config

    model_cfg = dict(MODEL_CFG, use_voxel_embedding=voxel)
    cfg = Config(model_cfg)
    torch.manual_seed(0)
    coarse, fine = ObjectNeRF(cfg), ObjectNeRF(cfg)
    code_library = RefCodeLibrary(cfg)
    if voxel:
        embedding_xyz = RefEmbeddingVoxel(
            channels=(MODEL_CFG["N_scn_voxel_size"]
                      + MODEL_CFG["N_obj_voxel_size"]),
            N_freqs=MODEL_CFG["N_freq_voxel"],
            max_voxels=MODEL_CFG["N_max_voxels"],
            dataset_extra_config=dict(VOXEL_CONF),
        )
    else:
        embedding_xyz = RefEmbedding(3, MODEL_CFG["N_freq_xyz"])
    embeddings = {
        "xyz": embedding_xyz,
        "dir": RefEmbedding(3, MODEL_CFG["N_freq_dir"]),
    }
    sd = {}
    sd.update({f"nerf_coarse.{k}": v for k, v in coarse.state_dict().items()})
    sd.update({f"nerf_fine.{k}": v for k, v in fine.state_dict().items()})
    sd.update({f"code_library.{k}": v
               for k, v in code_library.state_dict().items()})
    if voxel:
        sd.update({f"embedding_xyz.{k}": v
                   for k, v in embedding_xyz.state_dict().items()})
    init_sd.update({k: v.clone() for k, v in sd.items()})

    train_cfg = Config({**TRAIN_CFG, "num_epochs": num_epochs})
    models_to_train = [{"coarse": coarse, "fine": fine}, code_library,
                       embeddings["xyz"]]
    optimizer = get_optimizer(train_cfg, models_to_train)
    scheduler = get_scheduler(train_cfg, optimizer)
    loss_fn = RefTotalLoss(LOSS_W)

    losses, psnrs, lrs = [], [], []
    try:
        for step in range(n_steps):
            b = batches[step]
            t = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()}
            extra = dict(code_library(t))
            results = ref_render_rays(
                models={"coarse": coarse, "fine": fine},
                embeddings=embeddings,
                rays=t["rays"],
                N_samples=MODEL_CFG["N_samples"], use_disp=False,
                perturb=0, noise_std=0,
                N_importance=MODEL_CFG["N_importance"], chunk=1 << 16,
                white_back=False, forward_instance=True, frustum_bound_th=0,
                **extra,
            )
            loss, _ = loss_fn(results, t)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            losses.append(float(loss.detach()))
            lrs.append(float(optimizer.param_groups[0]["lr"]))
            psnrs.append(_masked_psnr_np(
                results["rgb_fine"].detach().numpy(), np.asarray(b["rgbs"]),
                np.asarray(b["valid_mask"]),
            ))
            if (step + 1) % steps_per_epoch == 0:
                scheduler.step()
    finally:
        for fn in cleanups:
            fn()
    return losses, psnrs, lrs


def run_ours(batches, init_sd, n_steps, steps_per_epoch, num_epochs,
             voxel=False):
    """Our jitted train step from the converted reference init."""
    import jax
    import jax.numpy as jnp

    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.models.mlp import ObjectNeRFConfig
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.optim import make_optimizer, make_lr_schedule
    from object_nerf_tpu.train.system import TrainState, make_train_step
    from object_nerf_tpu.train.torch_convert import convert_state_dict

    model_cfg = dict(MODEL_CFG, use_voxel_embedding=voxel)
    params = convert_state_dict(init_sd, model_cfg)
    voxel_static = voxel_topo = None
    if voxel:
        features, voxel_topo, voxel_static = vg.from_torch_buffers(
            params.pop("voxel"), MODEL_CFG["N_freq_voxel"])
        params["voxel_features"] = features
    settings = RenderSettings(
        mlp=ObjectNeRFConfig.from_config(model_cfg),
        N_samples=MODEL_CFG["N_samples"],
        N_importance=MODEL_CFG["N_importance"],
        perturb=0.0, noise_std=0.0, white_back=False,
        forward_instance=True, frustum_bound_th=0.0,
    )
    train_cfg = {**TRAIN_CFG, "num_epochs": num_epochs}
    optimizer = make_optimizer(train_cfg, steps_per_epoch)
    lr_schedule = make_lr_schedule(train_cfg, steps_per_epoch)
    step_fn = make_train_step(settings, LOSS_W, optimizer, voxel_static,
                              lr_schedule, donate=False)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))

    losses, psnrs, lrs = [], [], []
    key = jax.random.PRNGKey(0)  # unused: perturb = noise_std = 0
    for step in range(n_steps):
        b = {k: jnp.asarray(np.asarray(v)) for k, v in batches[step].items()}
        state, metrics = step_fn(state, b, key, voxel_topo)
        losses.append(float(metrics["train/loss"]))
        psnrs.append(float(metrics["train/psnr"]))
        lrs.append(float(metrics["lr"]))
    return losses, psnrs, lrs


def run_ab(n_steps=200, batch_size=256, steps_per_epoch=20, seed=7,
           voxel=False):
    ds = _dataset()
    rng = np.random.RandomState(seed)
    batches = [ds.sample_batch(batch_size, rng) for _ in range(n_steps)]
    num_epochs = max(1, -(-n_steps // steps_per_epoch))

    init_sd = {}
    ref_loss, ref_psnr, ref_lr = run_reference(
        batches, init_sd, n_steps, steps_per_epoch, num_epochs, voxel=voxel)
    our_loss, our_psnr, our_lr = run_ours(
        batches, init_sd, n_steps, steps_per_epoch, num_epochs, voxel=voxel)

    w = max(1, n_steps // 10)  # final window: last 10%
    out = {
        "n_steps": n_steps, "batch_size": batch_size,
        "steps_per_epoch": steps_per_epoch, "num_epochs": num_epochs,
        "voxel": voxel,
        "reference": {"loss": ref_loss, "psnr": ref_psnr, "lr": ref_lr},
        "ours": {"loss": our_loss, "psnr": our_psnr, "lr": our_lr},
        "summary": {
            "max_rel_loss_gap_first_20": float(max(
                abs(a - b) / max(abs(b), 1e-12)
                for a, b in zip(our_loss[:20], ref_loss[:20]))),
            "max_lr_gap": float(max(
                abs(a - b) for a, b in zip(our_lr, ref_lr))),
            "final_window_loss_ref": float(np.mean(ref_loss[-w:])),
            "final_window_loss_ours": float(np.mean(our_loss[-w:])),
            "final_window_psnr_ref": float(np.mean(ref_psnr[-w:])),
            "final_window_psnr_ours": float(np.mean(our_psnr[-w:])),
        },
    }
    s = out["summary"]
    s["final_psnr_gap_db"] = abs(
        s["final_window_psnr_ref"] - s["final_window_psnr_ours"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--voxel", action="store_true",
                    help="voxel-conditioned variant (EmbeddingVoxel trains)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        args.out = ("debug/convergence_ab_voxel.json" if args.voxel
                    else "debug/convergence_ab.json")

    out = run_ab(n_steps=args.steps, batch_size=args.batch, voxel=args.voxel)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    s = out["summary"]
    print(json.dumps(s, indent=2))

    ok = (
        s["max_rel_loss_gap_first_20"] < 1e-3
        and s["max_lr_gap"] < 1e-9
        and s["final_psnr_gap_db"] < 0.15
    )
    print("convergence A/B:", "OK" if ok else "DIVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
