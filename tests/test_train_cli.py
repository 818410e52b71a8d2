"""train.py CLI end-to-end on the CPU mesh.

The training CLI (config merge -> system -> fit with the val callback ->
TensorBoard scalars + the 7-panel val image -> checkpoints + config
snapshot) was previously only drivable on the real TPU; run its actual
main() at tiny shapes and check every artifact it promises.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ARGS = [
    f"dataset_config={Path(__file__).resolve().parents[1] / 'config/synthetic.yml'}",
    "exp_name=clitest",
    "img_wh=[24,18]",
    "snapshot_source=false",
    "model.use_voxel_embedding=false",
    "model.D=2", "model.W=32", "model.skips=[1]",
    "model.inst_D=2", "model.inst_W=16", "model.inst_skips=[1]",
    "model.N_samples=8", "model.N_importance=4",
    "model.N_max_objs=8", "model.N_obj_code_length=8",
    "dataset_extra.scale_factor=1.0",
    "dataset_extra.near=0.5", "dataset_extra.far=5.0",
    "train.num_epochs=1", "train.batch_size=64",
    "train.limit_train_batches=0.5", "train.val_check_interval=0.5",
]


def test_train_cli_end_to_end(tmp_path, monkeypatch, capsys):
    import train as train_cli

    monkeypatch.chdir(tmp_path)
    train_cli.main(list(ARGS))

    out = capsys.readouterr().out
    assert "[val]" in out and "Done." in out

    runs = list((tmp_path / "logs").iterdir())
    assert len(runs) == 1, runs
    run = runs[0]
    assert "clitest" in run.name
    # config snapshot (reference train.py:271 convention)
    assert (run / "run_config_snapshot.yaml").exists()
    # checkpoints were written and are restorable
    from object_nerf_tpu.train.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(run)
    assert ckpt is not None
    # retention parity (reference train.py:241-251: save_top_k=-1 default
    # keeps EVERY epoch's ckpt, plus save_last): one epoch ⇒ epoch_0 + last
    assert (run / "epoch_0").is_dir(), list(run.iterdir())
    assert (run / "last").is_dir()
    # tensorboard event file with the scalar + image logs
    events = list(run.glob("events.out.tfevents.*"))
    assert events, list(run.iterdir())
    assert events[0].stat().st_size > 0


def test_train_cli_ckpt_retention(tmp_path, monkeypatch):
    """save_top_k: -1 (reference default) keeps all epoch ckpts; a positive
    k prunes to the best-k by monitored val/psnr; `last` always present and
    restorable (reference ModelCheckpoint semantics, train.py:241-251)."""
    import train as train_cli
    from object_nerf_tpu.train.checkpoint import load_checkpoint

    args = [a for a in ARGS if not a.startswith("train.num_epochs")]
    args += ["train.num_epochs=3"]

    monkeypatch.chdir(tmp_path)
    train_cli.main(list(args))
    run = next((tmp_path / "logs").iterdir())
    epochs = sorted(p.name for p in run.glob("epoch_*"))
    assert epochs == ["epoch_0", "epoch_1", "epoch_2"], epochs
    assert (run / "last").is_dir()
    restored = load_checkpoint(run / "last")
    assert int(restored["step"]) > 0

    # top-1 retention prunes to a single epoch ckpt
    (tmp_path / "logs").rename(tmp_path / "logs_keepall")
    train_cli.main(list(args) + ["train.save_top_k=1"])
    run = next((tmp_path / "logs").iterdir())
    epochs = [p.name for p in run.glob("epoch_*")]
    assert len(epochs) == 1, epochs
    assert (run / "last").is_dir()
