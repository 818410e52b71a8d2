"""Evaluation harness: render frames from a checkpoint and report PSNR/SSIM.

    python scripts/eval.py dataset_config=config/toy_desk_2.yml \
        ckpt_path=logs/<run>/step_N [split=val] [n_frames=8] [save_images=dir]

This is the quantitative-parity harness the reference lacks (its validation
metrics only appear in TensorBoard): loads any checkpoint (ours or a
reference .ckpt), renders whole frames through the fused eval pipeline, and
prints per-frame + mean masked PSNR and SSIM.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    import jax.numpy as jnp
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.data import dataset_dict
    from object_nerf_tpu.train.system import ObjectNeRFSystem
    from object_nerf_tpu.train.metrics import psnr, ssim

    config = load_config(cli_args=argv)
    assert config.ckpt_path, "ckpt_path not set"
    split = config.get("split", "val")
    n_frames = int(config.get("n_frames", 1))
    save_dir = config.get("save_images")

    dataset_cls = dataset_dict[config.dataset_name]
    kwargs = dict(img_wh=tuple(config.img_wh), dataset_extra=config.dataset_extra)
    ds = dataset_cls(split=split, **kwargs)
    system = ObjectNeRFSystem(config, dataset=None, val_dataset=ds)

    w, h = tuple(config.img_wh)
    typ = "fine" if system.eval_settings.N_importance > 0 else "coarse"
    psnrs, ssims = [], []
    count = min(n_frames, len(getattr(ds, "frames", [0])) or 1)
    for i in range(count):
        batch = ds.whole_image_batch(i)
        out = system.render_image(batch, chunk=int(config.get("chunk", 7680)))
        mask = np.asarray(batch["valid_mask"], bool)
        if "instance_mask" in batch:
            mask = mask & np.asarray(batch["instance_mask"], bool)
        p = float(psnr(jnp.asarray(out[f"rgb_{typ}"]),
                       jnp.asarray(batch["rgbs"]),
                       jnp.asarray(mask)[:, None]))
        s = float(ssim(jnp.asarray(out[f"rgb_{typ}"]).reshape(h, w, 3),
                       jnp.asarray(batch["rgbs"]).reshape(h, w, 3)))
        psnrs.append(p)
        ssims.append(s)
        print(f"frame {i}: psnr {p:.3f}  ssim {s:.4f}")
        if save_dir:
            import imageio

            os.makedirs(save_dir, exist_ok=True)
            img = np.clip(np.asarray(out[f"rgb_{typ}"]).reshape(h, w, 3), 0, 1)
            imageio.imwrite(
                os.path.join(save_dir, f"eval_{i:04d}.png"),
                (img * 255).astype(np.uint8),
            )
    print(f"mean: psnr {np.mean(psnrs):.3f}  ssim {np.mean(ssims):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
