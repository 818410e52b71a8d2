"""Every shipped scene config must parse and produce coherent settings."""

from pathlib import Path

import pytest

from object_nerf_tpu.config import load_config
from object_nerf_tpu.render.renderer import RenderSettings

CONFIG_DIR = Path(__file__).resolve().parents[1] / "config"
SCENE_CONFIGS = sorted(
    p for p in CONFIG_DIR.glob("*.yml") if not p.name.startswith("edit_")
)
EDIT_CONFIGS = sorted(CONFIG_DIR.glob("edit_*.yaml"))


@pytest.mark.parametrize("path", SCENE_CONFIGS, ids=lambda p: p.name)
def test_scene_config_parses(path):
    cfg = load_config(dataset_config=path)
    assert cfg.dataset_name in ("scannet_base", "toydesk", "synthetic",
                                "generic_dataset")
    # render settings build without error (validates the model block)
    s = RenderSettings.from_config(cfg, is_eval=True)
    assert s.N_samples > 0
    if cfg.dataset_name != "synthetic":
        extra = cfg.dataset_extra
        assert extra.near < extra.far
        assert len(extra.scene_center) == 3
        assert extra.root_dir
        ids = extra.instance_id
        assert isinstance(ids, list) and len(ids) >= 1
        assert extra.val_instance_id in ids or extra.val_instance_id == 0
        if cfg.dataset_name == "toydesk":
            assert str(extra.bbox_dir).endswith("bbox.json")
            assert float(cfg.model.frustum_bound) < 0  # disabled for ToyDesk
        else:
            assert "scene_id" in extra and "scans_dir" in extra
    # split files we ship must exist for the reference scenes
    split = cfg.dataset_extra.get("split")
    if split and str(split).startswith("datasets/"):
        assert (Path(__file__).resolve().parents[1] / split / "train.txt").exists()


@pytest.mark.parametrize("path", EDIT_CONFIGS, ids=lambda p: p.name)
def test_edit_config_parses(path):
    from object_nerf_tpu.config import Config

    cfg = Config.from_yaml(path)
    assert cfg.edit_type in ("duplication", "pure_rotation")
    assert len(cfg.obj_id_list) >= 1
    assert cfg.total_frames > 0
    assert len(cfg.img_wh) == 2
