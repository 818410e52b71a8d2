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


def test_sigma_grid_matches_host_built_points():
    """Ordering oracle for the on-device point synthesis: the sigma grid
    must equal the same forward evaluated on host-built (x outer / y mid /
    z inner) grid points — catches any common-mode synthesis bug the
    pallas-vs-xla parity test can't see (both routes share synth). Uses a
    chunk that does NOT divide n³ to cover the tail-clamp path."""
    import jax
    import jax.numpy as jnp
    from object_nerf_tpu.config import Config, load_config
    from object_nerf_tpu.models.mlp import scene_forward
    from object_nerf_tpu.render.renderer import RenderSettings, _embed_points
    from object_nerf_tpu.train.system import init_params

    import extract_mesh

    n = 10
    grid_conf = Config({
        "N_grid": n, "chunk": 192,  # 1000 = 5*192 + 40 tail
        "x_range": [-1.0, 0.8], "y_range": [-0.5, 1.1],
        "z_range": [0.0, 0.9],
    })
    cfg = load_config(cli_args=list(TINY))
    settings = RenderSettings.from_config(cfg, is_eval=True)
    params = init_params(jax.random.PRNGKey(0), settings, cfg.model, None)

    sigma = extract_mesh.extract_sigma_grid(
        params, settings, None, grid_conf, obj_id=0)

    # host-built points with the same index*step f32 arithmetic
    idx = np.arange(n, dtype=np.float32)
    axes = [lo + idx * np.float32((hi - lo) / (n - 1))
            for lo, hi in (grid_conf.x_range, grid_conf.y_range,
                           grid_conf.z_range)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    emb, _ = _embed_points(jnp.asarray(pts), settings, None)
    ref, _ = scene_forward(params["fine"], settings.mlp, emb, None,
                           sigma_only=True)
    ref = np.maximum(np.asarray(ref), 0.0).reshape(n, n, n)
    np.testing.assert_allclose(sigma, ref, rtol=1e-5, atol=1e-5)


def test_sigma_grid_pallas_matches_xla(tmp_path):
    """extract_sigma_grid's fused-kernel route (interpret mode) matches the
    XLA route — classical scene branch, voxel-conditioned scene branch, and
    the obj_id>0 instance branch (all three reference extract_mesh modes,
    tools/extract_mesh.py:95-110)."""
    import dataclasses

    import jax
    from object_nerf_tpu.config import Config, load_config
    from object_nerf_tpu.models import voxel_grid as vg
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.system import ObjectNeRFSystem, init_params

    import extract_mesh

    grid_conf = Config({
        "N_grid": 12, "chunk": 512,
        "x_range": [-1.0, 1.0], "y_range": [-1.0, 1.0],
        "z_range": [-1.0, 1.0],
    })

    for use_voxel in (False, True):
        cfg = load_config(cli_args=list(TINY))
        cfg.model.use_voxel_embedding = use_voxel
        settings = RenderSettings.from_config(cfg, is_eval=True)
        voxel_ctx = None
        features = None
        if use_voxel:
            pts = np.random.RandomState(0).rand(500, 3) * 2.4 - 1.2
            features, topo, static = vg.build_voxel_grid(
                pts, [0, 0, 0], 1.0, 0.3, 3, 24, 6, 20000,
                key=jax.random.PRNGKey(4),
            )
        params = init_params(jax.random.PRNGKey(0), settings, cfg.model,
                             features)
        if use_voxel:
            voxel_ctx = (params["voxel_features"], topo, static)

        pallas = dataclasses.replace(
            settings, use_pallas=True, pallas_interpret=True,
            pallas_dtype="float32",
        )
        for obj_id in (0, 3):
            ref = extract_mesh.extract_sigma_grid(
                params, settings, voxel_ctx, grid_conf, obj_id=obj_id)
            got = extract_mesh.extract_sigma_grid(
                params, pallas, voxel_ctx, grid_conf, obj_id=obj_id)
            np.testing.assert_allclose(
                got, ref, rtol=2e-4, atol=2e-4,
                err_msg=f"use_voxel={use_voxel} obj_id={obj_id}",
            )
