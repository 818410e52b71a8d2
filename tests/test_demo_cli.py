"""scripts/demo_editable_render.py CLI end-to-end on the CPU mesh.

The full user flow of the reference's edit demo
(test/demo_editable_render.py:45-108): generate the on-disk synthetic
desk scene, train briefly through the real train.py CLI (which writes the
run_config_snapshot.yaml the edit config merges in), then drive the real
demo main() — bbox init, object removal, per-frame duplication transforms,
render_edit, png output.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

TINY_MODEL = [
    "model.use_voxel_embedding=false",
    "model.D=2", "model.W=32", "model.skips=[1]",
    "model.inst_D=2", "model.inst_W=16", "model.inst_skips=[1]",
    "model.N_samples=8", "model.N_importance=4",
    "model.N_max_objs=8", "model.N_obj_code_length=8",
]


def test_edit_demo_cli_end_to_end(tmp_path, monkeypatch, capsys):
    from make_synthetic_dataset import make_dataset

    import demo_editable_render as demo
    import train as train_cli

    scene = make_dataset(tmp_path / "scene", img_wh=(24, 18), n_frames=6)

    monkeypatch.chdir(tmp_path)
    train_cli.main([
        f"dataset_config={ROOT / 'config/synthetic_desk.yml'}",
        "exp_name=demotest", "img_wh=[24,18]", "snapshot_source=false",
        f"dataset_extra.root_dir={scene}",
        f"dataset_extra.bbox_dir={scene}/bbox.json",
        f"dataset_extra.pcd_path={scene}/pcd.ply",
        "dataset_extra.validate_idx=5",  # 6 generated frames (0-5)
        "train.num_epochs=1", "train.batch_size=64",
        "train.limit_train_batches=0.1", "train.val_check_interval=1.0",
        *TINY_MODEL,
    ])
    run = next((tmp_path / "logs").iterdir())
    from object_nerf_tpu.train.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(run)
    assert ckpt is not None

    demo.main([
        f"config={ROOT / 'config/edit_synthetic_desk.yaml'}",
        f"ckpt_path={ckpt}",
        "img_wh=[24,18]", "total_frames=2", "test_frame=3", "chunk=432",
        "prefix=clitest",
    ])
    out = capsys.readouterr().out
    assert "frame 2/2" in out, out
    render_dirs = list((tmp_path / "debug/rendered_view").glob("*clitest*"))
    assert len(render_dirs) == 1
    pngs = sorted(render_dirs[0].glob("render_*.png"))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = imageio.imread(pngs[0])
    assert img.shape == (18, 24, 3)
    assert np.isfinite(img).all()
