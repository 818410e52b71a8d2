import textwrap

from object_nerf_tpu.config import Config, load_config


def test_attribute_and_nested_access():
    cfg = Config({"model": {"N_samples": 64, "skips": [4]}})
    assert cfg.model.N_samples == 64
    assert cfg["model"]["skips"] == [4]
    cfg.model.N_samples = 128
    assert cfg.model.N_samples == 128


def test_deep_merge_priority():
    base = Config({"a": 1, "m": {"x": 1, "y": 2}})
    base.merge({"m": {"y": 3, "z": 4}, "b": 5})
    assert base.m.x == 1 and base.m.y == 3 and base.m.z == 4 and base.b == 5


def test_dotlist_yaml_coercion():
    cfg = Config.from_dotlist(
        ["img_wh=[640,480]", "train.lr=1e-3", "dataset_extra.use_bbox=false",
         "exp_name=hello"]
    )
    assert cfg.img_wh == [640, 480]
    assert abs(cfg.train.lr - 1e-3) < 1e-12
    assert cfg.dataset_extra.use_bbox is False
    assert cfg.exp_name == "hello"


def test_three_layer_merge(tmp_path):
    ds = tmp_path / "scene.yml"
    ds.write_text(textwrap.dedent("""
        dataset_extra:
          near: 0.8
          scale_factor: 16.0
        loss:
          opacity_loss_weight: 10.0
    """))
    cfg = load_config(cli_args=[f"dataset_config={ds}", "model.N_samples=32"])
    assert cfg.model.N_samples == 32           # CLI wins
    assert cfg.loss.opacity_loss_weight == 10.0  # dataset over default
    assert cfg.loss.color_loss_weight == 1.0     # default preserved
    assert cfg.dataset_extra.scale_factor == 16.0
    assert cfg.dataset_extra.fg_weight == 1.0


def test_yaml_roundtrip(tmp_path):
    cfg = load_config()
    p = tmp_path / "snap.yaml"
    cfg.save(p)
    cfg2 = Config.from_yaml(p)
    assert cfg2.to_dict() == cfg.to_dict()
