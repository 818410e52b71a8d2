"""Mosaic kernels inside jax.shard_map on REAL TPU hardware (1-chip mesh).

VERDICT r4 weak #4: the production multi-chip path (every Pallas launcher
wrapped in shard_map over the ray axis — ops/pallas_mlp.shard_over_rays)
had only ever executed in interpret mode on the virtual CPU mesh; the
Mosaic-compiled kernels composed with shard_map had never run on the TPU
backend anywhere. This environment has one chip, so >1-way collectives
stay untestable, but everything else about the composition — shard_map
lowering around tpu_custom_call (check_vma=False), in_specs/out_specs
plumbing, the in-wrapper lax.psum of backward weight grads — can be
exercised on hardware with a 1-device Mesh.

`shard_over_rays` deliberately declines size-1 meshes in production (the
wrapper would be pure overhead), so this probe force-enables it for both
launcher modules and checks the wrapped launches against the plain ones:

  forward : fused_mlp_eval (bf16 production kernel, 2048×64 rays)
  backward: _run_bwd incl. lax.psum(d_params) over the size-1 axis

Expected: bit-identical outputs (same kernel, same tile shapes — the one
shard IS the full array) and ~no overhead. Writes
debug/shardmap_tpu_probe.json.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from object_nerf_tpu.models.mlp import ObjectNeRFConfig, init_object_nerf
from object_nerf_tpu.models.embedding import freq_encode
from object_nerf_tpu.ops import pallas_mlp, pallas_mlp_vjp


def main():
    from jax.sharding import Mesh

    backend = jax.default_backend()
    dev = jax.devices()[0]
    print(f"backend={backend} device={dev}", file=sys.stderr)

    # force the shard_map wrapping for a size-1 mesh (production declines
    # it as pure overhead; the probe's whole point is the composition)
    def force(mesh, n_rays):
        return mesh is not None and n_rays % mesh.size == 0

    pallas_mlp.shard_over_rays = force
    pallas_mlp_vjp.shard_over_rays = force

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    cfg = ObjectNeRFConfig(use_voxel_embedding=False)
    params = init_object_nerf(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    n, s = 2048, 64
    xyz = jnp.asarray(rng.randn(n, s, 3).astype(np.float32) * 0.5)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), cfg.N_freq_dir)
    codes = jnp.asarray(rng.randn(n, 64).astype(np.float32) * 0.1)
    g_out = jnp.asarray(rng.randn(n * s, 8).astype(np.float32) * 0.1)

    kw = dict(forward_instance=True, dtype=jnp.bfloat16)

    def fwd(p, x, d, c, m):
        return pallas_mlp.fused_mlp_eval(p, cfg, x, d, c, mesh=m, **kw)

    def bwd(p, x, d, c, g, m):
        return pallas_mlp_vjp._run_bwd(
            p, x, d, c, None, g, cfg=cfg, forward_instance=True,
            bwd_rows_budget=4096, dtype=jnp.bfloat16, interpret=False,
            mesh=m,
        )

    report = {"backend": backend, "mesh_size": 1}

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        return out, (time.perf_counter() - t0) / iters * 1e3

    plain_f = jax.jit(lambda p, x, d, c: fwd(p, x, d, c, None))
    shard_f = jax.jit(lambda p, x, d, c: fwd(p, x, d, c, mesh))
    ref, t_plain = timeit(plain_f, params, xyz, dir_pe, codes)
    got, t_shard = timeit(shard_f, params, xyz, dir_pe, codes)
    fwd_max = max(
        float(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32)).max())
        for r, g in zip(ref, got)
    )
    report["fwd"] = {"max_abs_diff": fwd_max, "plain_ms": round(t_plain, 3),
                     "shard_map_ms": round(t_shard, 3)}
    print(f"fwd: max|Δ|={fwd_max:.3g} plain {t_plain:.2f} ms "
          f"shard_map {t_shard:.2f} ms", file=sys.stderr)

    plain_b = jax.jit(lambda p, x, d, c, g: bwd(p, x, d, c, g, None))
    shard_b = jax.jit(lambda p, x, d, c, g: bwd(p, x, d, c, g, mesh))
    refb, tb_plain = timeit(plain_b, params, xyz, dir_pe, codes, g_out)
    gotb, tb_shard = timeit(shard_b, params, xyz, dir_pe, codes, g_out)
    flat_r = jax.tree_util.tree_leaves(refb)
    flat_g = jax.tree_util.tree_leaves(gotb)
    bwd_max = max(
        float(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32)).max())
        for r, g in zip(flat_r, flat_g)
    )
    report["bwd"] = {"max_abs_diff": bwd_max, "plain_ms": round(tb_plain, 3),
                     "shard_map_ms": round(tb_shard, 3)}
    print(f"bwd (incl. psum d_params): max|Δ|={bwd_max:.3g} "
          f"plain {tb_plain:.2f} ms shard_map {tb_shard:.2f} ms",
          file=sys.stderr)

    ok = fwd_max == 0.0 and bwd_max == 0.0
    report["bit_identical"] = ok
    os.makedirs("debug", exist_ok=True)
    with open("debug/shardmap_tpu_probe.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if backend != "tpu":
        print("NOTE: not on TPU — rerun where jax.default_backend()=='tpu' "
              "for the hardware evidence", file=sys.stderr)


if __name__ == "__main__":
    main()
