"""Training CLI — the reference's train.py contract, TPU-native.

Usage (same dotted-override UX as the reference, train.py:275-286):

    python train.py dataset_config=config/toy_desk_2.yml exp_name=desk2 \
        "img_wh=[640,480]" train.batch_size=2048

Differences from the reference: no Lightning — the loop is
ObjectNeRFSystem.fit (jitted sharded train step, Orbax checkpoints,
TensorBoard-compatible scalar logging via tensorboardX when available).
"""

import os
import sys
import time

import numpy as np


def main(argv):
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.data import dataset_dict
    from object_nerf_tpu.train.system import ObjectNeRFSystem
    from object_nerf_tpu.train.checkpoint import (
        save_checkpoint, save_config_snapshot,
    )

    config = load_config(cli_args=argv)
    if config.get("tpu", {}).get("distributed", False):
        from object_nerf_tpu.parallel.mesh import initialize_distributed

        n = initialize_distributed(config.tpu.get("coordinator"))
        print(f"distributed: {n} global devices")
    if "root_dir" not in config.dataset_extra and config.dataset_name != "synthetic":
        raise SystemExit(
            "error: no scene selected — pass dataset_config=config/<scene>.yml "
            "(e.g. config/toy_desk_2.yml, or config/synthetic.yml for the "
            "built-in test scene)"
        )
    exp_name = time.strftime("%Y-%m-%d_%H-%M-%S") + "_" + config.exp_name
    log_path = os.path.join("logs", exp_name)
    config["log_path"] = log_path
    print("-" * 40)
    print(config.to_yaml())
    print("-" * 40)

    dataset_cls = dataset_dict[config.dataset_name]
    kwargs = dict(img_wh=tuple(config.img_wh), dataset_extra=config.dataset_extra)
    train_ds = dataset_cls(split="train", **kwargs)
    val_ds = dataset_cls(split="val", **kwargs)

    system = ObjectNeRFSystem(config, dataset=train_ds, val_dataset=val_ds)
    os.makedirs(log_path, exist_ok=True)
    save_config_snapshot(log_path, config)
    if config.get("snapshot_source", True):
        from object_nerf_tpu.utils.snapshot import make_source_code_snapshot

        make_source_code_snapshot(log_path)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(log_path)
    except Exception:
        pass

    best_psnr = -np.inf
    epoch_psnr = -np.inf  # max val/psnr observed WITHIN the current epoch

    def on_val(epoch, it, metrics, sys_):
        nonlocal best_psnr, epoch_psnr
        step = int(sys_.state.step)
        if writer:
            for k, v in metrics.items():
                writer.add_scalar(k, float(v), step)
            try:
                # the reference's per-validation image stack
                # (train.py:212-218): GT/inst/full rgb + depths + opacity.
                # Image logging is best-effort like the writer itself —
                # a missing matplotlib must not kill the run mid-epoch.
                panel = sys_.val_image_panel()
                if panel is not None:
                    writer.add_images(
                        "val/GT_pred_depth", panel, step, dataformats="NHWC"
                    )
            except Exception as e:
                print(f"  [val] image panel skipped: {e}")
        vp = metrics.get("val/psnr", -np.inf)
        epoch_psnr = max(epoch_psnr, vp)
        # mid-epoch checkpoint on improvement (finer-grained than the
        # reference's per-epoch files — resume granularity at the 0.25-epoch
        # validation cadence)
        if vp > best_psnr:
            best_psnr = vp
            save_checkpoint(
                log_path, sys_.state, sys_.voxel_topo, sys_.voxel_static,
                step=step,
            )
        print(
            f"  [val] epoch {epoch} it {it}: psnr {vp:.2f} (best {best_psnr:.2f})"
        )

    # retention parity with the reference's ModelCheckpoint
    # (train.py:241-251): one ckpt per epoch, save_top_k=-1 keeps them ALL,
    # monitor val/psnr max when a positive k prunes, plus a `last` ckpt
    save_top_k = int(config.train.get("save_top_k", -1))
    epoch_ckpts = []  # [(epoch's own max val/psnr, path)]

    def on_epoch_end(epoch, sys_):
        nonlocal epoch_psnr
        step = int(sys_.state.step)
        save_checkpoint(
            log_path, sys_.state, sys_.voxel_topo, sys_.voxel_static,
            step=step, name="last",
        )
        if save_top_k == 0:
            epoch_psnr = -np.inf
            return
        path = save_checkpoint(
            log_path, sys_.state, sys_.voxel_topo, sys_.voxel_static,
            step=step, name=f"epoch_{epoch}",
        )
        # rank by the epoch's OWN metric (the reference ModelCheckpoint
        # monitors the per-save val/psnr, train.py:241-251) — the global
        # running best would tie later epochs at the record and let a
        # regressed epoch outlive a genuinely better one
        epoch_ckpts.append((epoch_psnr, path))
        epoch_psnr = -np.inf
        if save_top_k > 0 and len(epoch_ckpts) > save_top_k:
            import shutil

            epoch_ckpts.sort(key=lambda t: t[0], reverse=True)
            for _, stale in epoch_ckpts[save_top_k:]:
                shutil.rmtree(stale, ignore_errors=True)
            del epoch_ckpts[save_top_k:]

    system.fit(callbacks=[on_val], epoch_end_callbacks=[on_epoch_end])
    save_checkpoint(
        log_path, system.state, system.voxel_topo, system.voxel_static,
        step=int(system.state.step),
    )
    print(f"Done. Logs + checkpoints in {log_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
