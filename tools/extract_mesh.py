"""Mesh extraction CLI — the reference tools/extract_mesh.py contract.

Usage:
    python tools/extract_mesh.py dataset_config=config/toy_desk_2.yml \
        ckpt_path=logs/.../step_N obj_id=0 N_grid=256 sigma_threshold=20

Queries the fine model's sigma on a dense N³ grid (scene branch, or the
object branch with a latent code when obj_id > 0, extract_mesh.py:95-110),
runs iso-surface extraction (marching tetrahedra here — PyMCubes is
unavailable; same capability), rescales vertices by scale_factor with the
reference's x/y swap (extract_mesh.py:124-134), optionally predicts vertex
colors with normals as view directions (extract_mesh.py:140-164), keeps the
largest connected component, and writes a PLY.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SCRIPT_CONF = {
    "N_grid": 512,
    "x_range": [-1.5, 1.5],
    "y_range": [-1.5, 1.5],
    "z_range": [-1.5, 1.5],
    "sigma_threshold": 20.0,
    "chunk": 64 * 1024,
    "predict_color": False,
    "obj_id": 0,
    "prefix": "",
    "keep_largest_component": True,
    "out_dir": "debug",
}


def extract_sigma_grid(params, settings, voxel_ctx, config, obj_id=0):
    """Dense sigma query of the fine model over the configured grid.

    With settings.use_pallas the query runs through the fused sigma-only
    kernel (ops/pallas_mlp.fused_sigma_eval — the same trunk machinery as
    the eval coarse pass), with the voxel gather dispatched as its OWN
    program before the kernel program (a gather sharing an XLA program
    with a large-VMEM pallas call runs 2-4× slower — CLAUDE.md round 3).
    Otherwise the plain XLA path (CPU/tests).

    The grid points are synthesized ON DEVICE from each chunk's scalar
    offset (x outer / y mid / z inner, matching the flat reshape below):
    at 512³ the sweep is tunnel-bound, not TPU-bound (~64 ms/chunk of RPC
    overhead vs ~1 ms of kernel — BASELINE.md), and uploading (chunk, 3)
    host-built points per chunk was 75% of the bytes on the wire."""
    import jax
    import jax.numpy as jnp
    from object_nerf_tpu.models.mlp import scene_forward, instance_forward
    from object_nerf_tpu.models.code_library import lookup_codes
    from object_nerf_tpu.render.renderer import _embed_points

    n = int(config.N_grid)
    n3 = n * n * n
    xmin, xmax = config.x_range
    ymin, ymax = config.y_range
    zmin, zmax = config.z_range

    mlp = params.get("fine", params["coarse"])
    chunk = min(int(config.chunk), n3)
    if settings.use_pallas:
        chunk = ((chunk + 63) // 64) * 64  # kernel pseudo-rows are 64 wide

    def synth(off):
        # linspace-equivalent: axis value = min + index * step, f32
        k = jnp.minimum(off + jnp.arange(chunk, dtype=jnp.int32), n3 - 1)
        i, rem = k // (n * n), k % (n * n)
        return jnp.stack(
            [xmin + i * ((xmax - xmin) / (n - 1)),
             ymin + (rem // n) * ((ymax - ymin) / (n - 1)),
             zmin + (rem % n) * ((zmax - zmin) / (n - 1))], -1
        ).astype(jnp.float32)

    codes = None
    if obj_id > 0:
        n_code_rows = chunk if not settings.use_pallas else chunk // 64
        codes = lookup_codes(
            params["code_library"],
            jnp.full((n_code_rows,), obj_id, jnp.int32),
        )

    if settings.use_pallas:
        from object_nerf_tpu.ops.pallas_mlp import fused_sigma_eval

        S = 64  # points per pseudo-row (the kernel's sample axis)
        kdtype = jnp.dtype(settings.pallas_dtype).type

        if voxel_ctx is not None:
            from object_nerf_tpu.models.voxel_grid import voxel_lookup_raw

            features, topo, static = voxel_ctx

            # point synthesis + corner-table gather share one kernel-free
            # XLA program; the pallas kernel gets its own program
            @jax.jit
            def stage_fn(off):
                pts = synth(off)
                raw, _ = voxel_lookup_raw(features, topo, static, pts)
                return pts, raw
        else:

            @jax.jit
            def stage_fn(off):
                return synth(off), None

        @jax.jit
        def kernel_fn(pts, voxel_raw):
            return fused_sigma_eval(
                mlp, settings.mlp, pts, voxel_raw=voxel_raw,
                obj_codes=codes,
                branch="instance" if obj_id > 0 else "scene",
                samples_per_row=S, dtype=kdtype,
                interpret=settings.pallas_interpret,
            )

        def sigma_fn(off):
            return kernel_fn(*stage_fn(off))
    else:

        @jax.jit
        def sigma_fn(off):
            emb, obj_voxel = _embed_points(synth(off), settings, voxel_ctx)
            if obj_id > 0:
                s, _ = instance_forward(
                    mlp, settings.mlp, emb, codes, obj_voxel, None,
                    sigma_only=True
                )
            else:
                s, _ = scene_forward(mlp, settings.mlp, emb, None,
                                     sigma_only=True)
            return s

    sigma = np.empty(n3, np.float32)
    # Dispatches are PIPELINED with a lagged fetch queue: on axon a
    # synchronous fetch costs ~25 ms of tunnel round-trip per program
    # (CLAUDE.md round 3) — at 512³/64k that would be 2048 sync points.
    from collections import deque

    pending = deque()  # (offset, device_array)

    def drain(limit):
        while len(pending) > limit:
            off, dev = pending.popleft()
            m = min(chunk, n3 - off)
            sigma[off : off + m] = np.asarray(dev)[:m]

    for ci, off in enumerate(range(0, n3, chunk)):
        pending.append((off, sigma_fn(off)))
        drain(16)
        if ci % 128 == 0:
            print(f"\rsigma grid {off}/{n3}", end="", flush=True)
    drain(0)
    print()
    return np.maximum(sigma.reshape(n, n, n), 0.0)


def main(argv):
    import jax.numpy as jnp
    from object_nerf_tpu.config import Config, load_config
    from object_nerf_tpu.render.renderer import RenderSettings
    from object_nerf_tpu.train.checkpoint import load_any_checkpoint
    from object_nerf_tpu.tools.marching import (
        marching_tetrahedra, largest_connected_component,
    )
    from object_nerf_tpu.data.ply_io import write_ply

    config = load_config(cli_args=argv)
    user_set_chunk = "chunk" in config
    config.merge({k: v for k, v in SCRIPT_CONF.items() if k not in config})
    assert config.ckpt_path, "ckpt_path not set"

    # tpu.* hooks, same contract as ObjectNeRFSystem / EditableRenderer:
    # fused sigma-only kernel on real TPUs, XLA path elsewhere
    import jax

    tpu_cfg = dict(config.get("tpu", {}) or {})
    use_pallas = tpu_cfg.get("use_pallas", "auto")
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    pallas_kw = dict(
        pallas_interpret=bool(tpu_cfg.get("pallas_interpret", False))
    )
    if pallas_kw["pallas_interpret"]:
        pallas_kw["pallas_dtype"] = "float32"
    settings = RenderSettings.from_config(
        config, is_eval=True, use_pallas=bool(use_pallas), **pallas_kw
    )
    restored = load_any_checkpoint(config.ckpt_path, config.model)
    params = restored["params"]

    voxel_ctx = None
    if config.model.get("use_voxel_embedding", True):
        from object_nerf_tpu.models import voxel_grid as vg

        topo_dict = restored.get("voxel_topo")
        static_dict = restored.get("voxel_static")
        if topo_dict is not None and static_dict is not None:
            topo = vg.topology_from_dict(
                topo_dict, capacity=int(params["voxel_features"].shape[0])
            )
            static = vg.VoxelStatic(
                shape=tuple(int(x) for x in np.asarray(static_dict["shape"])),
                channels=int(static_dict["channels"]),
                n_freq_voxel=int(static_dict["n_freq_voxel"]),
                n_max_voxels=int(static_dict["n_max_voxels"]),
            )
            voxel_ctx = (params["voxel_features"], topo, static)

    import time

    if settings.use_pallas and not user_set_chunk:
        # the sweep is tunnel-RPC-bound, not TPU-bound: 262144-point chunks
        # (one 512² slab per program) run the 512³ grid 2.1× faster than
        # the reference's 64k default (BASELINE.md 512³ section)
        config.merge(dict(chunk=262144))

    obj_id = int(config.obj_id)
    t0 = time.perf_counter()
    sigma = extract_sigma_grid(params, settings, voxel_ctx, config, obj_id)
    t_sigma = time.perf_counter() - t0

    print(f"Extracting mesh ... (sigma grid {t_sigma:.1f}s, "
          f"pallas={settings.use_pallas})")
    t0 = time.perf_counter()
    verts, faces = marching_tetrahedra(sigma, float(config.sigma_threshold))
    t_march = time.perf_counter() - t0
    print(f"{len(verts)} vertices, {len(faces)} faces ({t_march:.1f}s)")
    if len(verts) == 0:
        print("empty mesh — lower sigma_threshold?")
        return

    # index coords → world, with the reference's x/y swap (extract_mesh.py:124-130)
    n = int(config.N_grid)
    v = verts / n
    xmin, xmax = config.x_range
    ymin, ymax = config.y_range
    zmin, zmax = config.z_range
    out = np.empty_like(v)
    out[:, 0] = (ymax - ymin) * v[:, 1] + ymin
    out[:, 1] = (xmax - xmin) * v[:, 0] + xmin
    out[:, 2] = (zmax - zmin) * v[:, 2] + zmin
    out *= float(config.dataset_extra.scale_factor)

    if config.keep_largest_component:
        t0 = time.perf_counter()
        out, faces = largest_connected_component(out, faces)
        print(f"largest component: {len(out)} vertices, {len(faces)} faces "
              f"({time.perf_counter() - t0:.1f}s)")

    colors = None
    if config.predict_color:
        # vertex colors with inward normals as view dirs (extract_mesh.py:140-164)
        import jax
        from object_nerf_tpu.models.mlp import scene_forward
        from object_nerf_tpu.models.embedding import freq_encode
        from object_nerf_tpu.render.renderer import _embed_points

        nrm = _vertex_normals(out, faces)
        mlp = params.get("fine", params["coarse"])

        @jax.jit
        def color_fn(pts, dirs):
            emb, _ = _embed_points(pts, settings, voxel_ctx)
            d = freq_encode(dirs, settings.mlp.N_freq_dir)
            _, rgb = scene_forward(mlp, settings.mlp, emb, d)
            return rgb

        pts_nerf = out / float(config.dataset_extra.scale_factor)
        colors = np.asarray(
            color_fn(jnp.asarray(pts_nerf), jnp.asarray(-nrm))
        )

    os.makedirs(config.out_dir, exist_ok=True)
    out_path = os.path.join(
        config.out_dir, f"extracted_mesh_{config.prefix}.ply"
    )
    write_ply(out_path, out, colors=colors, faces=faces)
    print(f"wrote {out_path}")


def _vertex_normals(verts, faces):
    n = np.zeros_like(verts)
    fv = verts[faces]
    fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    for i in range(3):
        np.add.at(n, faces[:, i], fn)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(norm, 1e-12)


if __name__ == "__main__":
    main(sys.argv[1:])
