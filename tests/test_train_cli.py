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
    # tensorboard event file with the scalar + image logs
    events = list(run.glob("events.out.tfevents.*"))
    assert events, list(run.iterdir())
    assert events[0].stat().st_size > 0
