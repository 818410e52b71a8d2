"""Benchmark: full-image render throughput on the flagship model.

Measures rays/sec/chip rendering a 640×480 image (307,200 rays) through the
full eval pipeline — 64 coarse + 64 importance samples, scene + instance
branches (the reference's headline configuration,
config/default_conf.yml:14-27) — on the default JAX device (TPU under the
driver), plus four secondary metrics (voxel render, train step, voxel
train step at the flagship ScanNet-scale grid, editable multi-object
render at the reference demo shape).

Prints ONE JSON line (ALWAYS, even when the backend fails mid-run):
  {"metric": ..., "value": N, "unit": "rays/sec/chip", "vs_baseline": N,
   <secondary metrics that succeeded>, "errors": {<metric>: <why>}?}

Wedge resilience: the axon TPU backend can wedge server-side (dispatch
works, result fetch raises FailedPrecondition/UNAVAILABLE — CLAUDE.md);
round 3's record was lost to exactly that. Every metric therefore runs
under its own try/except with ONE bounded retry, and the JSON line is
emitted no matter what — missing metrics are null with an "errors" entry,
never a silent rc=1.

Dispatch observability: train metrics also report ms/step and the number
of XLA programs dispatched per step (7-8 with the split step, depending on
tpu.merge_bwd; 1 monolithic). The classical train
step sits at its kernel floor (~19.6 ms of 20.6), so it alone swings with
the tunnel's per-program dispatch latency — reporting ms/step + program
count lets the driver record distinguish code regressions from tunnel
drift (BASELINE.md "why the train steps are ~81-96k").

Baseline: the reference publishes no numbers (BASELINE.md). The anchor used
here is an estimated 20,000 rays/s for the PyTorch CUDA reference at this
sampling budget on a V100-class GPU (nerf-pl-style renderers at 64+64
samples land at 15–25k rays/s; the reference adds the object branch on top).
`vs_baseline` = measured / 20000. This is an estimate until a CUDA
measurement of the reference is possible (torch here is CPU-only).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 20_000.0  # estimated PyTorch CUDA reference (see above)

W, H = 640, 480
CHUNK = 7680  # 640×480 = 40 chunks exactly
EDIT_W, EDIT_H = 320, 240  # the reference edit-demo frame (test/config/*.yaml:5)
EDIT_CHUNK = 4096  # edit_scannet_0113.yaml:4
ITERS = 5
TRAIN_BATCH = 2048  # the reference's train batch (default_conf.yml:39)
TRAIN_WARMUP = 5
TRAIN_ITERS = 20
RETRIES = 1  # bounded retries per metric (a wedged backend fails fast)


def _attempt(name, fn, errors):
    """Run one metric with bounded retry; record failure instead of dying."""
    last = None
    for attempt in range(1 + RETRIES):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — the whole point is isolation
            last = f"{type(e).__name__}: {e}"
            print(f"[bench] {name} attempt {attempt + 1} failed: {last}",
                  file=sys.stderr)
    errors[name] = last
    return None


def _bench_train_step(cfg, use_voxel=False):
    """Train-step throughput at the flagship budget (batch 2048, 64+64).

    use_voxel benches the sparse-voxel-conditioned path (the paper's
    headline feature) on a deterministic synthetic scene point cloud at
    the reference's ScanNet voxel size (0.1 m, default_conf.yml:17).

    Returns (rays/s, ms/step, programs/step, step kind)."""
    import tempfile

    from object_nerf_tpu.data.synthetic import SyntheticDataset
    from object_nerf_tpu.train.system import ObjectNeRFSystem

    b = TRAIN_BATCH
    cfg = cfg.copy()
    cfg.dataset_extra.merge(dict(scale_factor=1.0, near=0.5, far=5.0,
                                 scene_center=[0.0, 0.0, 0.0]))
    cfg.train.batch_size = b
    cfg.model.use_voxel_embedding = use_voxel
    with tempfile.TemporaryDirectory() as td:
        if use_voxel:
            from object_nerf_tpu.data.ply_io import write_ply

            # FLAGSHIP-scale grid: the same ScanNet-scale room the voxel
            # RENDER bench uses (0.1 m voxels on a 6×6×2.5 m scan —
            # reference scannet_base_0113.yml:37). Through round 4 this
            # bench ran a 2.4 m toy patch whose small corner table
            # overstated real-scene train throughput ~1.7× (BASELINE.md
            # big-grid campaign); the driver record now reflects the
            # real-scene cost. Rays bounded inside the normalized room.
            cfg.dataset_extra.merge(dict(
                scale_factor=2.5, scene_center=[0.0, 0.0, 1.25],
                near=0.05, far=2.4, voxel_size=0.1, neighbor_marks=3,
            ))
            pcd = f"{td}/scene.ply"
            write_ply(pcd, scannet_scale_pcd())
            cfg.dataset_extra.merge(dict(pcd_path=pcd))
        ds = SyntheticDataset("train", img_wh=(64, 48), n_frames=2,
                              dataset_extra=cfg.dataset_extra)
        system = ObjectNeRFSystem(cfg, dataset=ds, val_dataset=None)
        if use_voxel:
            print(
                f"[bench] voxel-train grid: shape={system.voxel_static.shape}"
                f" occupied="
                f"{int(np.asarray(jax.device_get(system.voxel_topo.n_occupied)))}"
                f" capacity={system.voxel_static.n_max_voxels}",
                file=sys.stderr,
            )
        rng = np.random.RandomState(0)
        batches = [ds.sample_batch(b, rng) for _ in range(8)]
        m = system.training_step(batches[0])
        float(jax.device_get(m["train/loss"]))
        for i in range(TRAIN_WARMUP):
            m = system.training_step(batches[i % 8])
        float(jax.device_get(m["train/loss"]))
        t0 = time.perf_counter()
        for i in range(TRAIN_ITERS):
            m = system.training_step(batches[i % 8])
        float(jax.device_get(m["train/loss"]))
        dt = (time.perf_counter() - t0) / TRAIN_ITERS
        return (b / dt, dt * 1e3, system.train_programs_per_step,
                system.train_step_kind)


def _frame_rays(near=0.5, far=4.0, origin=(0.0, 0.0, 0.0)):
    n = W * H
    rng = np.random.RandomState(0)
    o = np.tile(np.asarray(origin, np.float32), (n, 1))
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nearc = np.full((n, 1), near, np.float32)
    farc = np.full((n, 1), far, np.float32)
    return jnp.asarray(np.concatenate([o, d, nearc, farc], -1))


def _time_frames(frame_fn):
    frame_fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        frame_fn()
    return (time.perf_counter() - t0) / ITERS


def scannet_scale_pcd():
    """Synthetic but ScanNet-SCALE scene point cloud: a 6×6×2.5 m room
    shell (floor + 4 walls + 2 objects) — at the reference's 0.1 m ScanNet
    voxel size with neighbor_marks=3 dilation its cell count and
    occupied-voxel count are in the range of a real ScanNet scene, so the
    corner-table size, gather traffic, and table capacity all match
    real-use costs. Shared by the voxel benches and the edit profiler."""
    rng = np.random.RandomState(0)
    pts = []
    # floor + walls of a 6 × 6 × 2.5 m room (world units)
    f = rng.rand(60000, 3).astype(np.float32)
    pts.append(f * [6.0, 6.0, 0.0] - [3.0, 3.0, 0.0])
    for ax, sgn in ((0, -3.0), (0, 3.0), (1, -3.0), (1, 3.0)):
        wpts = rng.rand(25000, 3).astype(np.float32) * [6.0, 6.0, 2.5]
        wpts[:, :2] -= 3.0
        wpts[:, ax] = sgn
        pts.append(wpts)
    for c, r in ([[0.8, 0.0, 0.6], 0.6], [[-0.9, 0.5, 0.45], 0.45]):
        d = rng.randn(20000, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append((np.asarray(c) + r * d).astype(np.float32))
    return np.concatenate(pts)


def _bench_voxel_render(cfg):
    """Voxel-conditioned eval render — the paper's headline configuration
    (reference default_conf.yml:8 sets use_voxel_embedding true; the voxel
    embedding is the paper's differentiator, embedding_helper.py:325-409).

    The grid is the ScanNet-scale synthetic room (scannet_scale_pcd). Rays
    are bounded so samples land inside the grid. Returns (rays/s, ms/frame).
    """
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.system import init_params, make_render_fn
    from object_nerf_tpu.models import voxel_grid as vg

    cfg = cfg.copy()
    cfg.model.use_voxel_embedding = True
    cfg.dataset_extra.merge(dict(scale_factor=2.5,
                                 scene_center=[0.0, 0.0, 1.25],
                                 voxel_size=0.1, neighbor_marks=3))

    pcd = scannet_scale_pcd()

    use_pallas = jax.default_backend() == "tpu"
    settings = RenderSettings.from_config(cfg, is_eval=True,
                                          use_pallas=use_pallas)
    features, topo, static = vg.build_voxel_grid_from_config(
        pcd, cfg, key=jax.random.PRNGKey(2)
    )
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features)
    )
    print(
        f"[bench] voxel grid: shape={static.shape} "
        f"occupied={int(topo.n_occupied)} capacity={static.n_max_voxels}",
        file=sys.stderr,
    )

    # rays stay inside the normalized room: origin mid-room, far = room diag
    rays = _frame_rays(near=0.05, far=2.4, origin=(0.0, 0.0, 0.0))
    ids = jnp.zeros((W * H,), jnp.int32)
    key = jax.random.PRNGKey(1)
    render = make_render_fn(settings, static, CHUNK)

    def frame():
        out = render(params, rays, key, ids, topo)
        return float(np.asarray(out["rgb_fine"][0].sum()))

    dt = _time_frames(frame)
    return W * H / dt, dt * 1e3


def _bench_edit_render(cfg):
    """Editable multi-object render — the paper's headline demo surface
    (reference test/demo_editable_render.py:45-108 at 320×240, chunk 4096,
    test/config/edit_scannet_0113.yaml:4-7): background + one moved object
    with bbox-clipped near/far (~35% of object rays hit, the rest muted),
    voxel-conditioned on the ScanNet-scale grid, dispatched through the
    split-program multi-object path (render/multi.make_multi_eval_stages —
    exactly what EditableRenderer._render_multi dispatches on TPU, with
    the corner table prebuilt once per frame).

    Returns (rays/s, ms/frame, programs/chunk). rays/s counts PIXELS
    (76,800/frame); each pixel evaluates K=2 ray sets through coarse+fine.
    """
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.render.multi import make_multi_eval_stages
    from object_nerf_tpu.train.system import init_params
    from object_nerf_tpu.models import voxel_grid as vg

    cfg = cfg.copy()
    cfg.model.use_voxel_embedding = True
    cfg.dataset_extra.merge(dict(scale_factor=2.5,
                                 scene_center=[0.0, 0.0, 1.25],
                                 voxel_size=0.1, neighbor_marks=3))
    use_pallas = jax.default_backend() == "tpu"
    pallas_kw = {}
    if not use_pallas:
        # the split stages dispatch pltpu pallas_calls unconditionally —
        # off-TPU they must run interpreter-mode (smoke only)
        pallas_kw = dict(pallas_interpret=True, pallas_dtype="float32")
    settings = RenderSettings.from_config(cfg, is_eval=True,
                                          use_pallas=use_pallas, **pallas_kw)
    ids = (0, 4)  # background + the demo's duplicated object id
    features, topo, static = vg.build_voxel_grid_from_config(
        scannet_scale_pcd(), cfg, key=jax.random.PRNGKey(2)
    )
    assert vg._dense_path_ok(static)
    params = jax.device_put(
        init_params(jax.random.PRNGKey(0), settings, cfg.model, features)
    )
    lowp = use_pallas and settings.pallas_dtype == "bfloat16"
    # corner table prebuilt ONCE per frame (EditableRenderer._prebuild_...)
    ct = jax.jit(
        lambda f: vg.make_corner_table(f, topo, static, lowp=lowp)
    )(params["voxel_features"])

    n = EDIT_W * EDIT_H
    chunk = EDIT_CHUNK

    def make_rays(seed, near, far, hit_frac=1.0):
        rng = np.random.RandomState(seed)
        o = np.zeros((n, 3), np.float32)
        d = rng.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        nearc = np.full((n, 1), near, np.float32)
        farc = np.full((n, 1), far, np.float32)
        if hit_frac < 1.0:
            miss = rng.rand(n) >= hit_frac
            nearc[miss] = 0.0
            farc[miss] = 0.0
        return np.concatenate([o, d, nearc, farc], -1)

    rays_bg = make_rays(0, 0.05, 2.4)
    rays_ob = make_rays(1, 0.6, 1.4, hit_frac=0.35)

    # hit compaction, exactly as EditableRenderer._render_multi dispatches:
    # object-hit rays first, all-miss chunks run the background-only
    # program (render/multi.compact_hit_order — round-5 lever)
    from object_nerf_tpu.render.multi import compact_hit_order

    plan = compact_hit_order([rays_bg, rays_ob], ids, chunk)
    perm, n_mixed = plan if plan is not None else (np.arange(n), -(-n // chunk))
    rays_bg, rays_ob = rays_bg[perm], rays_ob[perm]
    stacks = []
    for ci, i in enumerate(range(0, n, chunk)):
        sets = (rays_bg, rays_ob) if ci < n_mixed else (rays_bg,)
        sl = [r[i : i + chunk] for r in sets]
        if sl[0].shape[0] < chunk:
            p = chunk - sl[0].shape[0]
            sl = [np.concatenate([r, np.repeat(r[-1:], p, 0)]) for r in sl]
        stacks.append(jax.device_put(jnp.stack([jnp.asarray(x) for x in sl])))
    print(
        f"[bench] edit chunks: {n_mixed} mixed (K={len(ids)}) + "
        f"{len(stacks) - n_mixed} background-only of {len(stacks)}",
        file=sys.stderr,
    )

    split_full = make_multi_eval_stages(settings, ids, voxel_static=static)
    split_bg = make_multi_eval_stages(settings, (0,), voxel_static=static)

    def frame():
        outs = [
            (split_full if ci < n_mixed else split_bg)(
                params, s, voxel_topo=topo, ct=ct)
            for ci, s in enumerate(stacks)
        ]
        return float(np.asarray(outs[-1]["rgb_fine"][0].sum()))

    dt = _time_frames(frame)
    programs = 2 * len(ids) + 3  # prep, K coarse, merge, K fine, final (mixed)
    return n / dt, dt * 1e3, programs


def _bench_render(cfg):
    """Headline metric: classical-PE 640×480 eval render.

    Returns (rays/s, ms/frame)."""
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.system import init_params, make_render_fn

    cfg = cfg.copy()
    cfg.model.use_voxel_embedding = False
    use_pallas = jax.default_backend() == "tpu"
    settings = RenderSettings.from_config(cfg, is_eval=True,
                                          use_pallas=use_pallas)
    params = init_params(jax.random.PRNGKey(0), settings, cfg.model)
    params = jax.device_put(params)

    n = W * H
    rays = _frame_rays()
    ids = jnp.zeros((n,), jnp.int32)
    key = jax.random.PRNGKey(1)

    render = make_render_fn(settings, None, CHUNK)

    def frame():
        out = render(params, rays, key, ids, None)
        # host fetch of a scalar forces real completion (block_until_ready
        # is asynchronous on the axon tunnel platform)
        return float(np.asarray(out["rgb_fine"][0].sum()))

    dt = _time_frames(frame)
    rays_per_sec = n / dt
    print(
        f"[bench] {W}x{H} render: {dt*1e3:.1f} ms/frame, "
        f"{rays_per_sec:,.0f} rays/s on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    return rays_per_sec, dt * 1e3


def main():
    errors = {}
    record = {
        "metric": "render_rays_per_sec_per_chip_640x480",
        "value": None,
        "unit": "rays/sec/chip",
        "vs_baseline": None,
    }

    def load():
        from object_nerf_tpu.config import load_config

        return load_config()

    cfg = _attempt("config", load, errors)

    if cfg is not None:
        r = _attempt("render", lambda: _bench_render(cfg), errors)
        if r is not None:
            rays_per_sec, ms = r
            record["value"] = round(rays_per_sec, 1)
            record["vs_baseline"] = round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3)
            record["render_ms_per_frame"] = round(ms, 2)

        r = _attempt("voxel_render", lambda: _bench_voxel_render(cfg), errors)
        if r is not None:
            vrender_rps, ms = r
            record["voxel_render_rays_per_sec"] = round(vrender_rps, 1)
            record["voxel_render_ms_per_frame"] = round(ms, 2)
            print(
                f"[bench] voxel render {W}x{H} (64+64, ScanNet-scale grid): "
                f"{vrender_rps:,.0f} rays/s", file=sys.stderr,
            )

        r = _attempt("edit_render", lambda: _bench_edit_render(cfg), errors)
        if r is not None:
            edit_rps, ms, progs = r
            record["edit_render_rays_per_sec"] = round(edit_rps, 1)
            record["edit_render_ms_per_frame"] = round(ms, 2)
            record["edit_render_programs_per_chunk"] = progs
            print(
                f"[bench] edit render {EDIT_W}x{EDIT_H} (K=2, 64+64, "
                f"ScanNet-scale grid, chunk {EDIT_CHUNK}): "
                f"{edit_rps:,.0f} rays/s, {ms:.1f} ms/frame, "
                f"{progs} programs/chunk", file=sys.stderr,
            )

        r = _attempt("train", lambda: _bench_train_step(cfg), errors)
        if r is not None:
            train_rps, ms, progs, kind = r
            record["train_rays_per_sec"] = round(train_rps, 1)
            record["train_ms_per_step"] = round(ms, 2)
            record["train_programs_per_step"] = progs
            record["train_step_kind"] = kind
            print(
                f"[bench] train step (b{TRAIN_BATCH}, 64+64, {kind}): "
                f"{train_rps:,.0f} rays/s, {ms:.1f} ms/step, "
                f"{progs} programs/step", file=sys.stderr,
            )

        r = _attempt("voxel_train",
                     lambda: _bench_train_step(cfg, use_voxel=True), errors)
        if r is not None:
            voxel_rps, ms, progs, kind = r
            record["voxel_train_rays_per_sec"] = round(voxel_rps, 1)
            record["voxel_train_ms_per_step"] = round(ms, 2)
            record["voxel_train_programs_per_step"] = progs
            record["voxel_train_step_kind"] = kind
            print(
                f"[bench] voxel train step (b{TRAIN_BATCH}, 64+64, {kind}): "
                f"{voxel_rps:,.0f} rays/s, {ms:.1f} ms/step, "
                f"{progs} programs/step", file=sys.stderr,
            )

    if errors:
        record["errors"] = errors
    # the ONE JSON line — emitted unconditionally (driver contract)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
