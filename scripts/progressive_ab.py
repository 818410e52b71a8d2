"""Progressive-training A/B: same scene, same seed, subdivision ON vs OFF.

Round-2 evidence showed no PSNR dip at the epoch-5 subdivision (Adam
moments grafted); this script produces the stronger claim the reference's
design implies (train.py:140-145): the prune+subdivide schedule should
*help* final quality, because the halved voxel size doubles the feature
grid's spatial resolution where the scene is occupied.

Runs ObjectNeRFSystem.fit twice on the on-disk synthetic desk scene
(generated on demand) with `train.progressive_train` toggled, records the
val-PSNR trajectory of both arms, and writes debug/progressive_ab.json.

Usage:
    python scripts/progressive_ab.py [--epochs 15] [--out debug/progressive_ab.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def run_arm(progressive: bool, epochs: int, voxel_size: float,
            root_dir=None, img_wh=None, model_overrides=None):
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.data import dataset_dict
    from object_nerf_tpu.train.system import ObjectNeRFSystem

    cfg = load_config(cli_args=["dataset_config=config/synthetic_desk.yml"])
    cfg.train.merge(dict(
        num_epochs=epochs, progressive_train=progressive, seed=42,
    ))
    if model_overrides:
        cfg.model.merge(dict(model_overrides))
    if root_dir is not None:
        cfg.dataset_extra.merge(dict(
            root_dir=root_dir, pcd_path=f"{root_dir}/pcd.ply",
            bbox_dir=f"{root_dir}/bbox.json", split=f"{root_dir}/split",
        ))
    if img_wh is not None:
        cfg.img_wh = list(img_wh)
    # a COARSE start is where subdivision has something to offer: the
    # fixed arm stays at voxel_size for the whole run, the progressive
    # arm halves it at epoch 5 (the reference's schedule). Starting both
    # arms at an already-sufficient resolution only shows subdivision's
    # variance cost (measured: -1.2 dB at 0.15 start on this scene).
    cfg.dataset_extra.merge(dict(voxel_size=voxel_size))
    dataset_cls = dataset_dict[cfg.dataset_name]
    kwargs = dict(img_wh=tuple(cfg.img_wh), dataset_extra=cfg.dataset_extra)
    train_ds = dataset_cls(split="train", **kwargs)
    val_ds = dataset_cls(split="val", **kwargs)
    system = ObjectNeRFSystem(cfg, dataset=train_ds, val_dataset=val_ds)

    curve = []

    def cb(epoch, it, metrics, sys_):
        if "val/psnr" in metrics:
            curve.append({
                "epoch": epoch, "it": it, "step": int(sys_.state.step),
                "val_psnr": float(metrics["val/psnr"]),
                "n_occupied": (
                    int(np.asarray(jax.device_get(sys_.voxel_topo.n_occupied)))
                    if sys_.voxel_topo is not None else None),
                "voxel_size": (
                    float(np.asarray(jax.device_get(sys_.voxel_topo.voxel_size)))
                    if sys_.voxel_topo is not None else None),
            })

    system.fit(callbacks=[cb])
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--voxel-size", type=float, default=0.3)
    ap.add_argument("--out", default="debug/progressive_ab.json")
    ap.add_argument("--detail", action="store_true",
                    help="use the FINE-detail scene (lawn of r=0.04-0.07 "
                         "spheres + 12/unit checker at 160x120) — sub-voxel "
                         "structure that a coarse grid cannot represent")
    ap.add_argument("--capacity", action="store_true",
                    help="capacity-bound arm (VERDICT r4 #5): shrink the "
                         "scene trunk to W=64/D=4 (PE-only capacity binds) "
                         "on the fine-detail scene, to test BASELINE.md's "
                         "hypothesis that subdivision only pays when MLP "
                         "capacity is the binding constraint; implies "
                         "--detail")
    args = ap.parse_args()

    if args.capacity:
        args.detail = True
        if args.out == "debug/progressive_ab.json":
            args.out = "debug/progressive_ab_capacity.json"

    root_dir = img_wh = None
    if args.detail:
        root_dir, img_wh = "data/synthetic_desk_detail", (160, 120)
        if not os.path.isdir(root_dir):
            from scripts.make_synthetic_dataset import make_dataset

            make_dataset(root_dir, img_wh=img_wh, detail=True)
    elif not os.path.isdir("data/synthetic_desk"):
        from scripts.make_synthetic_dataset import make_dataset

        make_dataset("data/synthetic_desk")

    model_overrides = None
    if args.capacity:
        # small enough that the trunk cannot memorize the PE(xyz, 10)
        # detail on its own — voxel-feature resolution becomes the only
        # path to sub-voxel structure (skips=[2] keeps one mid-trunk skip)
        model_overrides = dict(W=64, D=4, skips=[2], inst_W=64, inst_D=4)

    results = {}
    for progressive in (True, False):
        arm = "progressive" if progressive else "fixed"
        print(f"=== arm: {arm} ({args.epochs} epochs) ===", flush=True)
        results[arm] = run_arm(progressive, args.epochs, args.voxel_size,
                               root_dir=root_dir, img_wh=img_wh,
                               model_overrides=model_overrides)
        last = results[arm][-1]
        print(f"{arm}: final val/psnr {last['val_psnr']:.2f} "
              f"(voxel_size {last['voxel_size']})", flush=True)

    w = 4  # mean of the last 4 validations
    summary = {
        arm: {
            "final_psnr_mean_last4": float(np.mean(
                [c["val_psnr"] for c in curve[-w:]])),
            "best_psnr": float(max(c["val_psnr"] for c in curve)),
        }
        for arm, curve in results.items()
    }
    summary["progressive_gain_db"] = (
        summary["progressive"]["final_psnr_mean_last4"]
        - summary["fixed"]["final_psnr_mean_last4"])
    out = {"epochs": args.epochs, "voxel_size": args.voxel_size,
           "detail": args.detail, "capacity": args.capacity,
           "model_overrides": model_overrides,
           "curves": results, "summary": summary}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
