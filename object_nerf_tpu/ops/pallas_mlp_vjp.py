"""Custom VJP for the fused two-branch MLP — training on the fast path.

The XLA training step is HBM-bound for the same reason the eval render was:
every layer's activations (and their cotangents) round-trip through HBM.
This module pairs `ops/pallas_mlp.fused_mlp_eval` with a hand-written
backward Pallas kernel:

* the backward kernel *recomputes* the forward per tile (remat inside
  VMEM — activations never touch HBM), stashing per-layer activations in
  registers/VMEM for the reverse sweep;
* weight/bias gradients accumulate across ray tiles inside the kernel via
  constant-index output blocks (zeroed at grid step 0);
* per-ray gradients (object codes) and per-sample gradients (raw voxel
  features, for the trainable voxel table) stream out per tile;
* xyz / direction cotangents are returned as zeros — sample positions and
  ray directions never depend on trainable parameters in this framework
  (importance sampling stops gradients, rendering.py:307-311), so nothing
  consumes them. Asserted by tests.

LeakyReLU cotangent uses the post-activation sign (valid since the slope
is positive and the function is monotone); sigmoid cotangent recomputes
from the stashed output.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import ObjectNeRFConfig, LEAKY_SLOPE
from .pallas_mlp import (
    prepare_kernel_weights,
    fused_mlp_eval,
    pe_uses_turns,
    shard_over_rays,
    TWO_PI,
    _broadcast_rows,
    _cos_turns,
    _dot,
    _ray_sharded,
    _sin_turns,
)


def _dot_t(a, g, dt):
    """aᵀ @ g with f32 accumulation: contract the row axis."""
    return jax.lax.dot_general(
        a.astype(dt), g.astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_nt(g, w, dt):
    """g @ wᵀ: contract the output axis."""
    return jax.lax.dot_general(
        g.astype(dt), w.astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _colsum(g):
    return jnp.sum(g, axis=0, keepdims=True)


def _bwd_kernel(
    *refs,
    cfg: ObjectNeRFConfig,
    n_samples: int,
    n_rays_tile: int,
    names: Tuple[str, ...],
    use_voxel: bool,
    forward_instance: bool,
    per_ray_blocks: bool,
    dtype,
):
    """Backward over one ray tile.

    Inputs: [xyz, dir_pe, codes, voxel_raw?, g] + weights — g is the
    per-sample (RS, 8) MLP-output cotangent computed by XLA (the
    compositing/loss VJP runs outside the kernel program; the
    split-program step keeps that glue in kernel-free programs).
    per_ray_blocks: dir_pe/codes arrive as (R, C) per-ray blocks and are
    broadcast to per-sample rows in-kernel (saves the pre-repeated (RS, C)
    HBM round-trip); requires the ray-tile R to be sublane-aligned —
    otherwise the host pre-repeats them to (RS, C).
    Outputs: [d_<weight> ...] (accumulated), d_codes (RS, Cc)
             [, d_voxel_raw (RS, C_vox)].
    """
    n_mlp = 4 if use_voxel else 3
    n_data = n_mlp + 1
    data_refs = refs[:n_data]
    xyz_ref, dir_ref, code_ref = data_refs[:3]
    vox_ref = data_refs[3] if use_voxel else None
    g_ref = data_refs[-1]

    n_w = len(names)
    w = {name: ref[:] for name, ref in zip(names, refs[n_data : n_data + n_w])}
    out_refs = refs[n_data + n_w :]
    d_w_refs = dict(zip(names, out_refs[:n_w]))
    d_code_ref = out_refs[n_w]
    d_vox_ref = out_refs[n_w + 1] if use_voxel else None

    dt = dtype
    first = pl.program_id(0) == 0

    rows = xyz_ref.shape[0]
    # two independent row-halves interleaved through every layer, forward
    # recompute AND reverse sweep — same MXU-latency argument as the fwd
    # kernel's _eval_branches (the serial layer chain stalls the MXU; two
    # parallel half-chains overlap)
    n_half = 2 if (rows % 16 == 0 and rows >= 512) else 1
    blk = rows // n_half
    H = range(n_half)

    def halves(x):
        return [x[k * blk : (k + 1) * blk] for k in H]

    # ---- recompute forward, stashing activations (per half) --------------
    # poly-sin fast path in bf16 mode (pe_uses_turns): PE matrices arrive
    # turns-prescaled, so the cos in the PE backward carries the 2π chain
    # factor the prescale removed from S
    if pe_uses_turns(dt):
        sinf = _sin_turns
        cosf = lambda p: _cos_turns(p) * TWO_PI  # noqa: E731
    else:
        sinf, cosf = jnp.sin, jnp.cos
    xyz_h = halves(xyz_ref[:])
    pre_xyz_h = [_dot(x, w["pe_xyz_S"], jnp.float32) + w["pe_xyz_phase"]
                 for x in xyz_h]
    xyz_sin_h = [sinf(p) for p in pre_xyz_h]
    if use_voxel:
        raw_h = halves(vox_ref[:])
        svox_h = [raw[:, : cfg.N_scn_voxel_size] for raw in raw_h]
        ivox_h = [raw[:, cfg.N_scn_voxel_size :] for raw in raw_h]
        pre_svox_h = [
            _dot(x, w["pe_svox_S"], jnp.float32) + w["pe_svox_phase"]
            for x in svox_h
        ]
        svox_sin_h = [sinf(p) for p in pre_svox_h]
        if forward_instance:
            # the ivox PE only exists (prepare_kernel_weights) and is only
            # consumed when the instance branch runs
            pre_ivox_h = [
                _dot(x, w["pe_ivox_S"], jnp.float32) + w["pe_ivox_phase"]
                for x in ivox_h
            ]
            ivox_sin_h = [sinf(p) for p in pre_ivox_h]
        feat_pieces_h = [
            [svox_h[k], svox_sin_h[k], xyz_h[k], xyz_sin_h[k]] for k in H
        ]
    else:
        feat_pieces_h = [[xyz_h[k], xyz_sin_h[k]] for k in H]

    def rowify(ref):
        x = ref[:]
        return _broadcast_rows(x, n_samples) if per_ray_blocks else x

    dir_pe_h = halves(rowify(dir_ref))  # (RS, C_dir)

    g_h = halves(g_ref[:])  # (RS, 8): [gσ, g_rgb(3), g_iσ, g_irgb(3)]

    def acc(name, vals):
        @pl.when(first)
        def _():
            d_w_refs[name][:] = jnp.zeros_like(d_w_refs[name])

        tot = vals[0]
        for v in vals[1:]:
            tot = tot + v
        d_w_refs[name][:] += tot

    def branch_fwd(tag, depth, skips, cat_h):
        # cat_h: per-half concatenated input features (the reference layout
        # is this concatenation) — one matmul per consuming layer.
        # activations are stashed at matmul precision (`dt`, bf16 in the
        # fast path) — they re-enter the MXU as bf16 anyway, so the stash
        # loses nothing while halving the VMEM footprint
        hs_h = [[] for _ in H]
        h_h = [None] * n_half
        for i in range(depth):
            for k in H:
                if i == 0:
                    accm = _dot(cat_h[k], w[f"{tag}_trunk_{i}_w"], dt)
                elif i in skips:
                    accm = (
                        _dot(cat_h[k], w[f"{tag}_trunk_{i}_w"], dt)
                        + _dot(h_h[k], w[f"{tag}_trunk_{i}_wh"], dt)
                    )
                else:
                    accm = _dot(h_h[k], w[f"{tag}_trunk_{i}_w"], dt)
                pre = accm + w[f"{tag}_trunk_{i}_b"]
                h_h[k] = jnp.where(pre >= 0, pre, pre * LEAKY_SLOPE).astype(dt)
                hs_h[k].append(h_h[k])
        hf_h = [
            (_dot(h_h[k], w[f"{tag}_final_w"], dt)
             + w[f"{tag}_final_b"]).astype(dt)
            for k in H
        ]
        pre_d_h = [
            _dot(hf_h[k], w[f"{tag}_dir_wh"], dt)
            + _dot(dir_pe_h[k], w[f"{tag}_dir_wd"], dt)
            + w[f"{tag}_dir_b"]
            for k in H
        ]
        denc_h = [jnp.where(p >= 0, p, p * LEAKY_SLOPE).astype(dt)
                  for p in pre_d_h]
        rgb_h = [
            jax.nn.sigmoid(
                _dot(denc_h[k], w[f"{tag}_rgb_w"], dt) + w[f"{tag}_rgb_b"]
            )
            for k in H
        ]
        return hs_h, hf_h, denc_h, rgb_h

    def branch_bwd(tag, depth, skips, cat_h, hs_h, hf_h, denc_h, rgb_h,
                   g_sigma_h, g_rgb_h, need_cat_grad):
        # rgb head
        d_pre_r_h = [g_rgb_h[k] * rgb_h[k] * (1.0 - rgb_h[k]) for k in H]
        acc(f"{tag}_rgb_w", [_dot_t(denc_h[k], d_pre_r_h[k], dt) for k in H])
        acc(f"{tag}_rgb_b", [_colsum(d) for d in d_pre_r_h])
        d_denc_h = [_dot_nt(d, w[f"{tag}_rgb_w"], dt) for d in d_pre_r_h]
        d_pre_d_h = [
            jnp.where(denc_h[k].astype(jnp.float32) >= 0, d_denc_h[k],
                      d_denc_h[k] * LEAKY_SLOPE)
            for k in H
        ]
        acc(f"{tag}_dir_wh", [_dot_t(hf_h[k], d_pre_d_h[k], dt) for k in H])
        acc(f"{tag}_dir_wd", [_dot_t(dir_pe_h[k], d_pre_d_h[k], dt) for k in H])
        acc(f"{tag}_dir_b", [_colsum(d) for d in d_pre_d_h])
        d_hf_h = [_dot_nt(d, w[f"{tag}_dir_wh"], dt) for d in d_pre_d_h]
        # final + sigma heads
        h_last_h = [hs_h[k][-1] for k in H]
        acc(f"{tag}_final_w", [_dot_t(h_last_h[k], d_hf_h[k], dt) for k in H])
        acc(f"{tag}_final_b", [_colsum(d) for d in d_hf_h])
        acc(f"{tag}_sigma_w", [_dot_t(h_last_h[k], g_sigma_h[k], dt) for k in H])
        acc(f"{tag}_sigma_b", [_colsum(g) for g in g_sigma_h])
        d_h_h = [
            _dot_nt(d_hf_h[k], w[f"{tag}_final_w"], dt)
            + _dot_nt(g_sigma_h[k], w[f"{tag}_sigma_w"], dt)
            for k in H
        ]
        # trunk, reversed; the concatenated-input cotangent is one matmul
        # per consuming layer, materialized only when a trainable consumer
        # exists (voxel features / codes — xyz and dir never feed params)
        d_cat_h = [
            (jnp.zeros(cat_h[k].shape, jnp.float32) if need_cat_grad
             else None)
            for k in H
        ]
        for i in reversed(range(depth)):
            d_pre_h = [
                jnp.where(hs_h[k][i].astype(jnp.float32) >= 0, d_h_h[k],
                          d_h_h[k] * LEAKY_SLOPE)
                for k in H
            ]
            acc(f"{tag}_trunk_{i}_b", [_colsum(d) for d in d_pre_h])
            h_in_h = [hs_h[k][i - 1] if i > 0 else None for k in H]
            if i == 0 or i in skips:
                acc(f"{tag}_trunk_{i}_w",
                    [_dot_t(cat_h[k], d_pre_h[k], dt) for k in H])
                if need_cat_grad:
                    for k in H:
                        d_cat_h[k] += _dot_nt(
                            d_pre_h[k], w[f"{tag}_trunk_{i}_w"], dt
                        )
                if i == 0:
                    d_h_h = [None] * n_half
                else:
                    acc(f"{tag}_trunk_{i}_wh",
                        [_dot_t(h_in_h[k], d_pre_h[k], dt) for k in H])
                    d_h_h = [_dot_nt(d, w[f"{tag}_trunk_{i}_wh"], dt)
                             for d in d_pre_h]
            else:
                acc(f"{tag}_trunk_{i}_w",
                    [_dot_t(h_in_h[k], d_pre_h[k], dt) for k in H])
                d_h_h = [_dot_nt(d, w[f"{tag}_trunk_{i}_w"], dt)
                         for d in d_pre_h]
        return d_cat_h

    # ---- forward recompute (both branches) --------------------------------
    # concat the feature pieces once per half (bf16, the matmul dtype); the
    # scene cotangent is only needed on the voxel path (svox channels)
    cat_s_h = [
        jnp.concatenate([p.astype(dt) for p in feat_pieces_h[k]], axis=-1)
        for k in H
    ]
    n_svox_cols = cfg.N_scn_voxel_size * (1 + 2 * cfg.N_freq_voxel)
    hs_h, hf_h, denc_h, rgb_h = branch_fwd("s", cfg.D, cfg.skips, cat_s_h)
    c_in_s = cat_s_h[0].shape[-1]
    if forward_instance:
        codes_h = halves(rowify(code_ref))  # (RS, Cc)
        extra_h = (
            [[ivox_h[k], ivox_sin_h[k], codes_h[k]] for k in H]
            if use_voxel
            else [[codes_h[k]] for k in H]
        )
        cat_o_h = [
            jnp.concatenate(
                [cat_s_h[k]] + [p.astype(dt) for p in extra_h[k]], axis=-1
            )
            for k in H
        ]
        hso_h, hfo_h, denco_h, rgbo_h = branch_fwd(
            "o", cfg.inst_D, cfg.inst_skips, cat_o_h
        )

    # ---- per-sample cotangents --------------------------------------------
    g_sigma_s_h = [g[:, 0:1] for g in g_h]
    g_rgb_s_h = [g[:, 1:4] for g in g_h]
    if forward_instance:
        g_sigma_o_h = [g[:, 4:5] for g in g_h]
        g_rgb_o_h = [g[:, 5:8] for g in g_h]

    # ---- reverse sweeps ----------------------------------------------------
    d_cat_s_h = branch_bwd(
        "s", cfg.D, cfg.skips, cat_s_h, hs_h, hf_h, denc_h, rgb_h,
        g_sigma_s_h, g_rgb_s_h,
        need_cat_grad=use_voxel,
    )

    d_codes_rows_h = None
    d_cat_o_h = None
    if forward_instance:
        d_cat_o_h = branch_bwd(
            "o", cfg.inst_D, cfg.inst_skips, cat_o_h, hso_h, hfo_h,
            denco_h, rgbo_h,
            g_sigma_o_h, g_rgb_o_h,
            need_cat_grad=True,  # codes always need their cotangent
        )
        d_codes_rows_h = [
            d_cat_o_h[k][:, -codes_h[0].shape[-1]:] for k in H
        ]
        if use_voxel:
            for k in H:
                d_cat_s_h[k] += d_cat_o_h[k][:, :c_in_s]

    # per-sample code grads (reduced to per-ray outside the kernel)
    if d_codes_rows_h is not None:
        d_code_ref[:] = jnp.concatenate(d_codes_rows_h, axis=0)
    else:
        d_code_ref[:] = jnp.zeros_like(d_code_ref)

    # voxel-feature grads: identity piece + through the sin PE. Piece
    # cotangents are slices of the concatenated-input cotangent (layout:
    # [svox | svox_sin | xyz | xyz_sin] and [... | ivox | ivox_sin | codes])
    if use_voxel:
        nsv = cfg.N_scn_voxel_size
        nov = cfg.N_obj_voxel_size
        d_vox_parts = []
        for k in H:
            d_svox = d_cat_s_h[k][:, :nsv] + _dot_nt(
                d_cat_s_h[k][:, nsv:n_svox_cols] * cosf(pre_svox_h[k]),
                w["pe_svox_S"], jnp.float32,
            )
            if forward_instance:
                d_ivox = d_cat_o_h[k][:, c_in_s : c_in_s + nov]
                d_ivox_sin = d_cat_o_h[k][
                    :, c_in_s + nov : c_in_s + nov * (1 + 2 * cfg.N_freq_voxel)
                ]
                d_ivox_full = d_ivox + _dot_nt(
                    d_ivox_sin * cosf(pre_ivox_h[k]), w["pe_ivox_S"],
                    jnp.float32,
                )
            else:
                d_ivox_full = jnp.zeros((blk, cfg.N_obj_voxel_size),
                                        jnp.float32)
            d_vox_parts.append(jnp.concatenate([d_svox, d_ivox_full], axis=-1))
        d_vox_ref[:] = jnp.concatenate(d_vox_parts, axis=0)

    # PE matrices and phases receive no gradient (constants)
    for name in names:
        if name.startswith("pe_"):
            @pl.when(first)
            def _(name=name):
                d_w_refs[name][:] = jnp.zeros_like(d_w_refs[name])


def _grads_to_pytree(cfg, names, d_arrays, forward_instance):
    """Reassemble the kernel's weight grads into the mlp param pytree."""
    d = dict(zip(names, d_arrays))

    def branch(tag, depth, skips):
        trunk = []
        for i in range(depth):
            if i in skips and i > 0:
                wgrad = jnp.concatenate(
                    [d[f"{tag}_trunk_{i}_w"], d[f"{tag}_trunk_{i}_wh"]],
                    axis=0,
                )
            else:
                wgrad = d[f"{tag}_trunk_{i}_w"]
            trunk.append({"w": wgrad, "b": d[f"{tag}_trunk_{i}_b"][0]})
        return {
            "trunk": trunk,
            "sigma": {"w": d[f"{tag}_sigma_w"], "b": d[f"{tag}_sigma_b"][0]},
            "final": {"w": d[f"{tag}_final_w"], "b": d[f"{tag}_final_b"][0]},
            "dir": {
                "w": jnp.concatenate([d[f"{tag}_dir_wh"], d[f"{tag}_dir_wd"]], 0),
                "b": d[f"{tag}_dir_b"][0],
            },
            "rgb": {"w": d[f"{tag}_rgb_w"], "b": d[f"{tag}_rgb_b"][0]},
        }

    out = {"scene": branch("s", cfg.D, cfg.skips)}
    if forward_instance:
        out["object"] = branch("o", cfg.inst_D, cfg.inst_skips)
    return out


def _run_bwd(
    mlp_params, xyz, dir_pe, codes, voxel_raw, g_array,
    *, cfg, forward_instance, bwd_rows_budget, dtype, interpret,
    bwd_vmem_limit_mb: int = 117, mesh=None,
):
    """Launch the backward kernel over ray tiles and reassemble gradients.

    g_array is the (RS, 8) per-sample MLP output cotangent (the
    compositing/loss VJP is XLA's job, outside the kernel program).

    `mesh`: shard the ray axis over a >1-device mesh via shard_map
    (pallas_mlp.shard_over_rays). The weight gradients are psum'd over the
    mesh axis inside the wrapper — the DDP all-reduce (reference
    train.py:261-262) — so they come back replicated and bit-equivalent
    (mod f32 reduction order) to the single-device gradient; per-ray
    cotangents (d_codes, d_vox) stay ray-sharded.
    """
    use_voxel = cfg.use_voxel_embedding
    n_rays, s, _ = xyz.shape

    if shard_over_rays(mesh, n_rays):
        axis = mesh.axis_names[0]
        local_kw = dict(
            cfg=cfg, forward_instance=forward_instance,
            bwd_rows_budget=bwd_rows_budget, dtype=dtype,
            interpret=interpret, bwd_vmem_limit_mb=bwd_vmem_limit_mb,
            mesh=None,
        )

        def local(p, x, d, c, v, g):
            d_params, d_codes, d_vox = _run_bwd(p, x, d, c, v, g, **local_kw)
            return jax.lax.psum(d_params, axis), d_codes, d_vox

        fn = _ray_sharded(
            local, mesh=mesh, n_replicated=1, n_sharded=5,
            out_specs=(False, True, True),
        )
        return fn(mlp_params, xyz, dir_pe, codes, voxel_raw, g_array)
    r = max(1, bwd_rows_budget // s)
    r = min(r, n_rays)
    while n_rays % r:
        r -= 1
    rows = r * s
    grid = (n_rays // r,)

    names, weight_arrays = prepare_kernel_weights(
        mlp_params, cfg, forward_instance, dtype=dtype
    )

    # per-ray (r, C) blocks when the ray tile is sublane-aligned;
    # otherwise pre-repeat to per-sample rows (Mosaic wants the
    # second-minor block dim divisible by 8)
    per_ray_blocks = r % 8 == 0
    if per_ray_blocks:
        dir_in, codes_in = dir_pe, codes
        ray_rows = r
    else:
        dir_in = jnp.repeat(dir_pe, s, axis=0)
        codes_in = jnp.repeat(codes, s, axis=0)
        ray_rows = rows
    inputs = [xyz.reshape(n_rays * s, 3), dir_in, codes_in]
    in_specs = [
        pl.BlockSpec((rows, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_rows, dir_pe.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_rows, codes.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_voxel:
        vox_flat = voxel_raw.reshape(n_rays * s, -1)
        inputs.append(vox_flat)
        in_specs.append(
            pl.BlockSpec((rows, vox_flat.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    inputs.append(g_array)
    in_specs.append(
        pl.BlockSpec((rows, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    inputs.extend(weight_arrays)
    in_specs.extend(
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_arrays
    )

    # outputs: weight grads (constant blocks, accumulated) + d_codes
    # (+ d_voxel_raw)
    out_shapes = [
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in weight_arrays
    ]
    out_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in weight_arrays
    ]
    out_shapes.append(
        jax.ShapeDtypeStruct((n_rays * s, codes.shape[-1]), jnp.float32)
    )
    out_specs.append(
        pl.BlockSpec((rows, codes.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    )
    if use_voxel:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_rays * s, vox_flat.shape[-1]),
                                 jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((rows, vox_flat.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _bwd_kernel,
        cfg=cfg, n_samples=s, n_rays_tile=r, names=names,
        use_voxel=use_voxel, forward_instance=forward_instance,
        per_ray_blocks=per_ray_blocks,
        dtype=dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MiB; the voxel bwd stash at 4096-row tiles
            # needs ~114 MiB
            vmem_limit_bytes=bwd_vmem_limit_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)

    n_w = len(weight_arrays)
    d_params = _grads_to_pytree(cfg, names, outs[:n_w], forward_instance)
    if not forward_instance:
        d_params["object"] = jax.tree_util.tree_map(
            jnp.zeros_like, mlp_params["object"]
        )
    # reduce per-sample code grads to per-ray
    d_codes = jnp.sum(outs[n_w].reshape(n_rays, s, -1), axis=1)
    d_vox = outs[n_w + 1].reshape(voxel_raw.shape) if use_voxel else None
    return d_params, d_codes, d_vox


def make_fused_fwd_bwd(
    cfg: ObjectNeRFConfig,
    forward_instance: bool,
    rows_budget: int = 2048,
    bwd_rows_budget: int = 4096,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    fwd_vmem_limit_mb: int = 100,
    bwd_vmem_limit_mb: int = 117,
    mesh=None,
):
    """Raw (fwd, bwd) kernel launchers for externally-orchestrated
    differentiation.

    `make_fused_mlp_op` wraps these in a custom VJP for single-program
    autodiff; `train/split_step.py` dispatches them directly as separate
    kernel-only XLA programs (XLA ops sharing a program with a large-VMEM
    Pallas call run 2-4× slower — see renderer.make_fused_eval_stages).

    `mesh`: shard the ray axis of both launchers over a >1-device mesh
    (pallas_mlp.shard_over_rays); bwd psums the weight grads over the mesh.

        fwd(mlp_params, xyz, dir_pe, codes, voxel_raw | None)
            -> (sigma (n,S), rgb, inst_sigma, inst_rgb)
        bwd(mlp_params, xyz, dir_pe, codes, voxel_raw | None, g_out (n·S, 8))
            -> (d_mlp_params, d_codes (n,Cc), d_vox | None)
    """

    def fwd_impl(mlp_params, xyz, dir_pe, codes, voxel_raw):
        return fused_mlp_eval(
            mlp_params, cfg, xyz, dir_pe, codes,
            forward_instance=forward_instance, voxel_raw=voxel_raw,
            rows_budget=rows_budget, dtype=dtype, interpret=interpret,
            vmem_limit_mb=fwd_vmem_limit_mb, mesh=mesh,
        )

    def bwd_impl(mlp_params, xyz, dir_pe, codes, voxel_raw, g_out):
        return _run_bwd(
            mlp_params, xyz, dir_pe, codes, voxel_raw, g_out,
            cfg=cfg, forward_instance=forward_instance,
            bwd_rows_budget=bwd_rows_budget, dtype=dtype,
            interpret=interpret, bwd_vmem_limit_mb=bwd_vmem_limit_mb,
            mesh=mesh,
        )

    return fwd_impl, bwd_impl


@functools.lru_cache(maxsize=32)
def make_fused_mlp_op(
    cfg: ObjectNeRFConfig,
    forward_instance: bool,
    rows_budget: int = 2048,
    bwd_rows_budget: int = 4096,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    fwd_vmem_limit_mb: int = 100,
    bwd_vmem_limit_mb: int = 117,
    mesh=None,
):
    """Build the differentiable fused-MLP op for a given architecture.

    Signature of the returned op:
        op(mlp_params, xyz (n,S,3), dir_pe (n,Cd), codes (n,Cc),
           voxel_raw (n,S,Cv) | None)
        -> (sigma (n,S), rgb (n,S,3), inst_sigma, inst_rgb)

    `mesh` (hashable) shards both kernel launches over the ray axis so the
    op partitions on >1-chip meshes — GSPMD cannot partition
    tpu_custom_call, so without this the surrounding jitted program would
    replicate the kernel work per chip.
    """
    fwd_impl, bwd_impl = make_fused_fwd_bwd(
        cfg, forward_instance, rows_budget=rows_budget,
        bwd_rows_budget=bwd_rows_budget, dtype=dtype, interpret=interpret,
        fwd_vmem_limit_mb=fwd_vmem_limit_mb,
        bwd_vmem_limit_mb=bwd_vmem_limit_mb, mesh=mesh,
    )

    @jax.custom_vjp
    def op(mlp_params, xyz, dir_pe, codes, voxel_raw):
        return fwd_impl(mlp_params, xyz, dir_pe, codes, voxel_raw)

    def op_fwd(mlp_params, xyz, dir_pe, codes, voxel_raw):
        out = fwd_impl(mlp_params, xyz, dir_pe, codes, voxel_raw)
        return out, (mlp_params, xyz, dir_pe, codes, voxel_raw)

    def op_bwd(res, g):
        mlp_params, xyz, dir_pe, codes, voxel_raw = res
        g_sigma, g_rgb, g_isigma, g_irgb = g
        n, s = g_sigma.shape
        g_out = jnp.concatenate(
            [
                g_sigma.reshape(n * s, 1),
                g_rgb.reshape(n * s, 3),
                g_isigma.reshape(n * s, 1),
                g_irgb.reshape(n * s, 3),
            ],
            axis=-1,
        )
        d_params, d_codes, d_vox = bwd_impl(
            mlp_params, xyz, dir_pe, codes, voxel_raw, g_out
        )
        # sample positions / ray directions never feed trainable params here
        return (d_params, jnp.zeros_like(xyz), jnp.zeros_like(dir_pe),
                d_codes, d_vox)

    op.defvjp(op_fwd, op_bwd)
    return op

