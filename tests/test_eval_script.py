"""scripts/eval.py end-to-end: checkpoint → whole-frame render → PSNR/SSIM.

The eval harness is the quantitative-parity surface users run against
converted reference checkpoints; drive its real main() on the synthetic
scene from a just-saved checkpoint and check the reported metrics are
finite and the saved images land on disk.
"""

import os
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

TINY = [
    "dataset_config=config/synthetic.yml",
    "img_wh=[24,18]",
    "model.use_voxel_embedding=false",
    "model.D=2", "model.W=32", "model.skips=[1]",
    "model.inst_D=2", "model.inst_W=16", "model.inst_skips=[1]",
    "model.N_samples=8", "model.N_importance=4",
    "model.N_max_objs=8", "model.N_obj_code_length=8",
    "dataset_extra.scale_factor=1.0",
    "dataset_extra.near=0.5", "dataset_extra.far=5.0",
]


def test_eval_main_from_checkpoint(tmp_path, capsys):
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.data.synthetic import SyntheticDataset
    from object_nerf_tpu.train.checkpoint import (
        latest_checkpoint, save_checkpoint,
    )
    from object_nerf_tpu.train.system import ObjectNeRFSystem

    import eval as eval_script

    cfg = load_config(cli_args=list(TINY))
    ds = SyntheticDataset("train", img_wh=(24, 18), n_frames=2,
                          dataset_extra=cfg.dataset_extra)
    system = ObjectNeRFSystem(cfg, dataset=ds)
    rng = np.random.RandomState(0)
    for _ in range(2):
        system.training_step(ds.sample_batch(128, rng))
    save_checkpoint(tmp_path, system.state, step=int(system.state.step))

    save_dir = tmp_path / "imgs"
    eval_script.main(list(TINY) + [
        f"ckpt_path={latest_checkpoint(tmp_path)}",
        "n_frames=1", "chunk=216", f"save_images={save_dir}",
    ])

    out = capsys.readouterr().out
    m = re.search(r"mean: psnr ([-\d.]+)\s+ssim ([-\d.]+)", out)
    assert m, out
    assert np.isfinite(float(m.group(1))) and np.isfinite(float(m.group(2)))
    assert -1.0 <= float(m.group(2)) <= 1.0  # SSIM range
    assert os.path.exists(save_dir / "eval_0000.png")
