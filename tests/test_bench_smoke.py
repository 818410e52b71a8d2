"""bench.py smoke: the driver runs `python bench.py` unattended at round
end and records its one JSON line as the round's perf evidence — a crash
there is unrecoverable. Run the REAL `bench.main()` on the test CPU mesh
at shrunken shapes (tiny MLP, tiny frame, one timing iter) and assert the
output contract: one JSON line carrying the headline metric plus all three
secondary metrics, every value positive.

The Pallas kernels themselves only engage on TPU (`use_pallas` gates on
the backend) and are covered by the kernel/interpret tests; this covers
everything else bench.py touches — config plumbing, make_render_fn, the
ScanNet-scale voxel-grid build, ObjectNeRFSystem construction, and the
JSON assembly (secondary metrics are try/except'd in bench.py, so only a
test can prove they actually run rather than silently skip).
"""

import json

import pytest


def _shrink(monkeypatch):
    import bench
    from object_nerf_tpu import config as config_mod

    real_load = config_mod.load_config

    def tiny_load(*args, **kwargs):
        cfg = real_load(*args, **kwargs)
        cfg.model.merge(dict(
            D=2, W=32, skips=[1], inst_D=2, inst_W=32, inst_skips=[1],
            N_samples=8, N_importance=8,
        ))
        return cfg

    monkeypatch.setattr(config_mod, "load_config", tiny_load)
    # 128×6 = 768 rays = 3 chunks of 256; one timed iteration; shrunken
    # train loops (same code path, fewer/smaller steps)
    monkeypatch.setattr(bench, "W", 128)
    monkeypatch.setattr(bench, "H", 6)
    monkeypatch.setattr(bench, "CHUNK", 256)
    monkeypatch.setattr(bench, "EDIT_W", 24)
    monkeypatch.setattr(bench, "EDIT_H", 4)
    monkeypatch.setattr(bench, "EDIT_CHUNK", 48)
    monkeypatch.setattr(bench, "ITERS", 1)
    monkeypatch.setattr(bench, "TRAIN_BATCH", 256)
    monkeypatch.setattr(bench, "TRAIN_WARMUP", 1)
    monkeypatch.setattr(bench, "TRAIN_ITERS", 2)
    return bench


def test_bench_main_smoke(monkeypatch, capsys):
    bench = _shrink(monkeypatch)

    bench.main()

    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out  # ONE JSON line on stdout (contract)
    rec = json.loads(out[0])
    assert rec["metric"] == "render_rays_per_sec_per_chip_640x480"
    assert rec["unit"] == "rays/sec/chip"
    for k in ("value", "vs_baseline", "voxel_render_rays_per_sec",
              "train_rays_per_sec", "voxel_train_rays_per_sec",
              "edit_render_rays_per_sec"):
        assert k in rec, (k, rec)
        assert rec[k] > 0, (k, rec)
    assert "errors" not in rec, rec
    # dispatch observability: ms + programs/step accompany the train metrics
    for k in ("render_ms_per_frame", "train_ms_per_step",
              "voxel_train_ms_per_step", "edit_render_ms_per_frame"):
        assert rec[k] > 0, (k, rec)
    # split multi-object path: prep, K coarse, merge, K fine, final = 2K+3
    assert rec["edit_render_programs_per_chunk"] == 7, rec
    # 1 = monolithic (CPU mesh), 7 = split step w/ merged bwd (TPU default),
    # 8 = split step w/ tpu.merge_bwd=false
    for k in ("train_programs_per_step", "voxel_train_programs_per_step"):
        assert rec[k] in (1, 7, 8), (k, rec)


def test_bench_survives_backend_failure(monkeypatch, capsys):
    """Wedge-proofing (round-3 driver record was rc=1/parsed:null): a
    metric that raises — the axon wedge surfaces as FailedPrecondition at
    the first result fetch — must not kill the run; the JSON line still
    prints with the surviving metrics plus an `errors` entry."""
    bench = _shrink(monkeypatch)

    calls = {"n": 0}

    def wedged(cfg):
        calls["n"] += 1
        raise RuntimeError("FAILED_PRECONDITION: TPU backend wedged")

    monkeypatch.setattr(bench, "_bench_voxel_render", wedged)

    bench.main()  # must not raise

    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    rec = json.loads(out[0])
    # one bounded retry: the wedged metric ran exactly twice
    assert calls["n"] == 2
    assert rec["value"] > 0  # headline metric survived
    assert "voxel_render_rays_per_sec" not in rec
    assert "FAILED_PRECONDITION" in rec["errors"]["voxel_render"]
    # the other secondary metrics still ran after the failure
    assert rec["train_rays_per_sec"] > 0
    assert rec["voxel_train_rays_per_sec"] > 0


def test_bench_survives_total_failure(monkeypatch, capsys):
    """Even with EVERY metric failing (backend dead at first touch) the
    contract line prints: value null, errors populated, exit clean."""
    bench = _shrink(monkeypatch)

    def dead(*a, **kw):
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(bench, "_bench_render", dead)
    monkeypatch.setattr(bench, "_bench_voxel_render", dead)
    monkeypatch.setattr(bench, "_bench_edit_render", dead)
    monkeypatch.setattr(bench, "_bench_train_step", dead)

    bench.main()

    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    rec = json.loads(out[0])
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert set(rec["errors"]) == {"render", "voxel_render", "edit_render",
                                  "train", "voxel_train"}
