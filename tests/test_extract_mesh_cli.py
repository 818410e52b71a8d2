"""tools/extract_mesh.py CLI end-to-end on the CPU mesh.

Train briefly on the synthetic scene, checkpoint, then drive the real
extract_mesh.main(): sigma-grid query, marching tetrahedra, largest
connected component, the color pass (inward normals as view dirs), and
the PLY written to disk — previously only drivable via the TPU verify
recipe.
"""

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

TINY = [
    f"dataset_config={ROOT / 'config/synthetic.yml'}",
    "model.use_voxel_embedding=false",
    "model.D=2", "model.W=32", "model.skips=[1]",
    "model.inst_D=2", "model.inst_W=16", "model.inst_skips=[1]",
    "model.N_samples=8", "model.N_importance=4",
    "model.N_max_objs=8", "model.N_obj_code_length=8",
    "dataset_extra.scale_factor=1.0",
    "dataset_extra.near=0.5", "dataset_extra.far=5.0",
]


def test_extract_mesh_cli(tmp_path, capsys):
    from object_nerf_tpu.config import load_config
    from object_nerf_tpu.data.ply_io import read_ply
    from object_nerf_tpu.data.synthetic import SyntheticDataset
    from object_nerf_tpu.train.checkpoint import (
        latest_checkpoint, save_checkpoint,
    )
    from object_nerf_tpu.train.system import ObjectNeRFSystem

    import extract_mesh

    cfg = load_config(cli_args=list(TINY))
    ds = SyntheticDataset("train", img_wh=(32, 24), n_frames=3,
                          dataset_extra=cfg.dataset_extra)
    system = ObjectNeRFSystem(cfg, dataset=ds)
    rng = np.random.RandomState(0)
    for _ in range(30):
        system.training_step(ds.sample_batch(256, rng))
    save_checkpoint(tmp_path, system.state, step=int(system.state.step))

    extract_mesh.main(list(TINY) + [
        f"ckpt_path={latest_checkpoint(tmp_path)}",
        "N_grid=24", "sigma_threshold=0.5", "predict_color=true",
        "chunk=4096", "prefix=test", f"out_dir={tmp_path}",
        "x_range=[-1.2,1.2]", "y_range=[-1.2,1.2]", "z_range=[-0.5,1.2]",
    ])

    out = capsys.readouterr().out
    assert "wrote" in out, out
    mesh = read_ply(tmp_path / "extracted_mesh_test.ply")
    verts, colors, faces = mesh["points"], mesh["colors"], mesh["faces"]
    assert len(verts) > 0 and len(faces) > 0
    assert colors is not None and colors.shape == (len(verts), 3)
    # vertices land inside the queried world box (after scale_factor=1)
    assert verts[:, 0].min() >= -1.2 - 1e-5 and verts[:, 0].max() <= 1.2 + 1e-5
