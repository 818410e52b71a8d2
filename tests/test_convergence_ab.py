"""Trajectory parity: the reference trainer vs ours over identical batches.

Drives scripts/convergence_ab.run_ab at reduced scale: 30 steps of the
REAL reference training step (torch autograd render + TotalLoss + Adam +
per-epoch poly LambdaLR, train.py:147-180 + utils/__init__.py:25-77)
against our jitted train step from the same converted init, same batch
stream. Crossing 2 epoch boundaries exercises the schedule staircase; the
committed 200-step artifact (debug/convergence_ab.json) extends this to
full convergence depth.

The voxel variant trains the reference's real `EmbeddingVoxel`
(embedding_helper.py:77-427) against our converted sparse table — the
feature-table gradient path and its Adam rows, over many steps, not the
single-step golden check in test_reference_parity_voxel.py.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"

pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference repo not available", allow_module_level=True)


def test_training_trajectories_agree():
    from scripts.convergence_ab import run_ab

    out = run_ab(n_steps=30, batch_size=128, steps_per_epoch=10)
    s = out["summary"]
    # per-step agreement while rounding drift is still negligible
    assert s["max_rel_loss_gap_first_20"] < 1e-3, s
    # the per-epoch poly LR staircase must match exactly
    assert s["max_lr_gap"] < 1e-9, s
    np.testing.assert_allclose(
        out["ours"]["lr"], out["reference"]["lr"], rtol=1e-6
    )
    # end-of-run statistics agree (30 steps: still near-deterministic)
    assert s["final_psnr_gap_db"] < 0.05, s
    # both sides actually learned something (same direction, same amount)
    assert out["ours"]["loss"][-1] < out["ours"]["loss"][0] * 0.9
    assert out["reference"]["loss"][-1] < out["reference"]["loss"][0] * 0.9


def test_voxel_training_trajectories_agree():
    from scripts.convergence_ab import run_ab

    out = run_ab(n_steps=30, batch_size=96, steps_per_epoch=10, voxel=True)
    s = out["summary"]
    assert s["max_rel_loss_gap_first_20"] < 1e-3, s
    assert s["max_lr_gap"] < 1e-9, s
    assert s["final_psnr_gap_db"] < 0.05, s
    # both sides actually learned (window means: per-step loss is noisy
    # across the differing batches of this shorter run)
    for side in ("ours", "reference"):
        loss = out[side]["loss"]
        assert np.mean(loss[-10:]) < np.mean(loss[:10]) * 0.95, side
