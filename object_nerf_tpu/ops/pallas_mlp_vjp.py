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
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import ObjectNeRFConfig, LEAKY_SLOPE
from .pallas_mlp import (
    prepare_kernel_weights,
    fused_mlp_eval,
    _piece_sizes,
    _broadcast_rows,
    _dot,
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
    dtype,
):
    """Backward over one ray tile.

    Inputs: [xyz, dir_pe_rep, codes_rep, voxel_raw?, g_out(RS,8)] + weights —
    per-ray quantities arrive pre-repeated per sample so every block is
    (rows, C) with rows a multiple of the sample count (no per-ray sublane
    alignment floor; smaller tiles fit VMEM on the voxel path).
    Outputs: [d_<weight> ...] (accumulated), d_codes (RS, Cc)
             [, d_voxel_raw (RS, C_vox)].
    """
    n_data = (5 if use_voxel else 4)
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

    # ---- recompute forward, stashing activations -------------------------
    xyz = xyz_ref[:]
    pre_xyz = _dot(xyz, w["pe_xyz_S"], jnp.float32) + w["pe_xyz_phase"]
    xyz_sin = jnp.sin(pre_xyz)
    if use_voxel:
        raw = vox_ref[:]
        svox = raw[:, : cfg.N_scn_voxel_size]
        ivox = raw[:, cfg.N_scn_voxel_size :]
        pre_svox = _dot(svox, w["pe_svox_S"], jnp.float32) + w["pe_svox_phase"]
        svox_sin = jnp.sin(pre_svox)
        pre_ivox = _dot(ivox, w["pe_ivox_S"], jnp.float32) + w["pe_ivox_phase"]
        ivox_sin = jnp.sin(pre_ivox)
        feat_pieces = [svox, svox_sin, xyz, xyz_sin]
    else:
        feat_pieces = [xyz, xyz_sin]

    dir_pe = dir_ref[:]  # (RS, C_dir), pre-repeated

    g = g_ref[:]  # (RS, 8): [gσ, g_rgb(3), g_iσ, g_irgb(3)]

    def acc(name, val):
        @pl.when(first)
        def _():
            d_w_refs[name][:] = jnp.zeros_like(d_w_refs[name])

        d_w_refs[name][:] += val

    def branch_fwd(tag, depth, skips, pieces):
        # activations are stashed at matmul precision (`dt`, bf16 in the
        # fast path) — they re-enter the MXU as bf16 anyway, so the stash
        # loses nothing while halving the VMEM footprint
        hs = []
        h = None
        for i in range(depth):
            if i == 0:
                accm = sum(
                    _dot(p, w[f"{tag}_trunk_{i}_w{j}"], dt)
                    for j, p in enumerate(pieces)
                )
            elif i in skips:
                accm = sum(
                    _dot(p, w[f"{tag}_trunk_{i}_w{j}"], dt)
                    for j, p in enumerate(pieces)
                ) + _dot(h, w[f"{tag}_trunk_{i}_wh"], dt)
            else:
                accm = _dot(h, w[f"{tag}_trunk_{i}_w"], dt)
            pre = accm + w[f"{tag}_trunk_{i}_b"]
            h = jnp.where(pre >= 0, pre, pre * LEAKY_SLOPE).astype(dt)
            hs.append(h)
        hf = (_dot(h, w[f"{tag}_final_w"], dt) + w[f"{tag}_final_b"]).astype(dt)
        pre_d = (
            _dot(hf, w[f"{tag}_dir_wh"], dt)
            + _dot(dir_pe, w[f"{tag}_dir_wd"], dt)
            + w[f"{tag}_dir_b"]
        )
        denc = jnp.where(pre_d >= 0, pre_d, pre_d * LEAKY_SLOPE).astype(dt)
        rgb = jax.nn.sigmoid(_dot(denc, w[f"{tag}_rgb_w"], dt) + w[f"{tag}_rgb_b"])
        return hs, hf, denc, rgb

    def branch_bwd(tag, depth, skips, pieces, hs, hf, denc, rgb,
                   g_sigma, g_rgb, need_piece_grad=None):
        # rgb head
        d_pre_r = g_rgb * rgb * (1.0 - rgb)
        acc(f"{tag}_rgb_w", _dot_t(denc, d_pre_r, dt))
        acc(f"{tag}_rgb_b", _colsum(d_pre_r))
        d_denc = _dot_nt(d_pre_r, w[f"{tag}_rgb_w"], dt)
        d_pre_d = jnp.where(denc.astype(jnp.float32) >= 0, d_denc,
                            d_denc * LEAKY_SLOPE)
        acc(f"{tag}_dir_wh", _dot_t(hf, d_pre_d, dt))
        acc(f"{tag}_dir_wd", _dot_t(dir_pe, d_pre_d, dt))
        acc(f"{tag}_dir_b", _colsum(d_pre_d))
        d_hf = _dot_nt(d_pre_d, w[f"{tag}_dir_wh"], dt)
        # final + sigma heads
        h_last = hs[-1]
        acc(f"{tag}_final_w", _dot_t(h_last, d_hf, dt))
        acc(f"{tag}_final_b", _colsum(d_hf))
        acc(f"{tag}_sigma_w", _dot_t(h_last, g_sigma, dt))
        acc(f"{tag}_sigma_b", _colsum(g_sigma))
        d_h = (
            _dot_nt(d_hf, w[f"{tag}_final_w"], dt)
            + _dot_nt(g_sigma, w[f"{tag}_sigma_w"], dt)
        )
        # trunk, reversed; piece cotangents are only materialized when a
        # consumer exists (voxel features / codes) — xyz and dir never
        # feed trainable parameters, so their cotangents are skipped
        if need_piece_grad is None:
            need_piece_grad = [True] * len(pieces)
        d_pieces = [
            (jnp.zeros_like(p) if need else None)
            for p, need in zip(pieces, need_piece_grad)
        ]
        for i in reversed(range(depth)):
            d_pre = jnp.where(hs[i].astype(jnp.float32) >= 0, d_h,
                              d_h * LEAKY_SLOPE)
            bname = f"{tag}_trunk_{i}_b"
            acc(bname, _colsum(d_pre))
            h_in = hs[i - 1] if i > 0 else None
            if i == 0 or i in skips:
                for j, p in enumerate(pieces):
                    acc(f"{tag}_trunk_{i}_w{j}", _dot_t(p, d_pre, dt))
                    if need_piece_grad[j]:
                        d_pieces[j] += _dot_nt(
                            d_pre, w[f"{tag}_trunk_{i}_w{j}"], dt
                        )
                if i == 0:
                    d_h = None
                else:
                    acc(f"{tag}_trunk_{i}_wh", _dot_t(h_in, d_pre, dt))
                    d_h = _dot_nt(d_pre, w[f"{tag}_trunk_{i}_wh"], dt)
            else:
                acc(f"{tag}_trunk_{i}_w", _dot_t(h_in, d_pre, dt))
                d_h = _dot_nt(d_pre, w[f"{tag}_trunk_{i}_w"], dt)
        return d_pieces

    # ---- scene branch ------------------------------------------------------
    # xyz / xyz_sin cotangents have no trainable consumers → skipped
    feat_need = [True, True, False, False] if use_voxel else [False, False]
    hs, hf, denc, rgb = branch_fwd("s", cfg.D, cfg.skips, feat_pieces)
    d_feat = branch_bwd(
        "s", cfg.D, cfg.skips, feat_pieces, hs, hf, denc, rgb,
        g[:, 0:1], g[:, 1:4], need_piece_grad=feat_need,
    )

    d_codes_rows = None
    d_ivox = d_ivox_sin = None
    if forward_instance:
        codes = code_ref[:]  # (RS, Cc), pre-repeated
        extra = [ivox, ivox_sin, codes] if use_voxel else [codes]
        extra_need = [True, True, True] if use_voxel else [True]
        pieces_o = feat_pieces + extra
        hso, hfo, denco, rgbo = branch_fwd("o", cfg.inst_D, cfg.inst_skips,
                                           pieces_o)
        d_pieces_o = branch_bwd(
            "o", cfg.inst_D, cfg.inst_skips, pieces_o, hso, hfo, denco, rgbo,
            g[:, 4:5], g[:, 5:8], need_piece_grad=feat_need + extra_need,
        )
        nf = len(feat_pieces)
        for j in range(nf):
            if feat_need[j]:
                d_feat[j] += d_pieces_o[j]
        if use_voxel:
            d_ivox, d_ivox_sin, d_codes_rows = d_pieces_o[nf:]
        else:
            (d_codes_rows,) = d_pieces_o[nf:]

    # per-sample code grads (reduced to per-ray outside the kernel)
    r, s = n_rays_tile, n_samples
    if d_codes_rows is not None:
        d_code_ref[:] = d_codes_rows
    else:
        d_code_ref[:] = jnp.zeros_like(d_code_ref)

    # voxel-feature grads: identity piece + through the sin PE
    if use_voxel:
        if forward_instance:
            d_svox = d_feat[0]
            d_svox_sin = d_feat[1]
        else:
            d_svox, d_svox_sin = d_feat[0], d_feat[1]
        d_svox = d_svox + _dot_nt(
            d_svox_sin * jnp.cos(pre_svox), w["pe_svox_S"], jnp.float32
        )
        if forward_instance:
            d_ivox_full = d_ivox + _dot_nt(
                d_ivox_sin * jnp.cos(pre_ivox), w["pe_ivox_S"], jnp.float32
            )
        else:
            d_ivox_full = jnp.zeros((r * s, cfg.N_obj_voxel_size), jnp.float32)
        d_vox_ref[:] = jnp.concatenate([d_svox, d_ivox_full], axis=-1)

    # PE matrices and phases receive no gradient (constants)
    for name in names:
        if name.startswith("pe_"):
            @pl.when(first)
            def _(name=name):
                d_w_refs[name][:] = jnp.zeros_like(d_w_refs[name])


def _grads_to_pytree(cfg, names, d_arrays, forward_instance):
    """Reassemble per-split weight grads into the mlp param pytree layout."""
    d = dict(zip(names, d_arrays))

    def stack(prefix, sizes_names):
        return jnp.concatenate([d[n] for n in sizes_names], axis=0)

    def branch(tag, depth, skips):
        sizes = _piece_sizes(cfg, tag)
        trunk = []
        for i in range(depth):
            if i == 0:
                wkeys = [f"{tag}_trunk_{i}_w{j}" for j in range(len(sizes))]
                wgrad = stack(tag, wkeys)
            elif i in skips:
                wkeys = [f"{tag}_trunk_{i}_w{j}" for j in range(len(sizes))]
                wgrad = jnp.concatenate(
                    [d[k] for k in wkeys] + [d[f"{tag}_trunk_{i}_wh"]], axis=0
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


@functools.lru_cache(maxsize=32)
def make_fused_mlp_op(
    cfg: ObjectNeRFConfig,
    forward_instance: bool,
    rows_budget: int = 2048,
    bwd_rows_budget: int = 4096,
    dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Build the differentiable fused-MLP op for a given architecture.

    Signature of the returned op:
        op(mlp_params, xyz (n,S,3), dir_pe (n,Cd), codes (n,Cc),
           voxel_raw (n,S,Cv) | None)
        -> (sigma (n,S), rgb (n,S,3), inst_sigma, inst_rgb)
    """
    use_voxel = cfg.use_voxel_embedding

    def fwd_impl(mlp_params, xyz, dir_pe, codes, voxel_raw):
        return fused_mlp_eval(
            mlp_params, cfg, xyz, dir_pe, codes, voxel_raw,
            forward_instance=forward_instance,
            rows_budget=rows_budget, dtype=dtype, interpret=interpret,
        )

    def bwd_impl(mlp_params, xyz, dir_pe, codes, voxel_raw, g_out):
        n_rays, s, _ = xyz.shape
        budget = bwd_rows_budget // 2 if use_voxel else bwd_rows_budget
        r = max(1, budget // s)
        r = min(r, n_rays)
        while n_rays % r:
            r -= 1
        rows = r * s
        grid = (n_rays // r,)

        names, weight_arrays = prepare_kernel_weights(
            mlp_params, cfg, forward_instance
        )

        dir_rep = jnp.repeat(dir_pe, s, axis=0)
        codes_rep = jnp.repeat(codes, s, axis=0)
        inputs = [xyz.reshape(n_rays * s, 3), dir_rep, codes_rep]
        in_specs = [
            pl.BlockSpec((rows, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dir_pe.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, codes.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        if use_voxel:
            vox_flat = voxel_raw.reshape(n_rays * s, -1)
            inputs.append(vox_flat)
            in_specs.append(
                pl.BlockSpec((rows, vox_flat.shape[-1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
        inputs.append(g_out)
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
            dtype=dtype,
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
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
