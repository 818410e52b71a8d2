"""Split-program train step: Pallas kernels isolated in kernel-only XLA
programs, with hand-threaded cotangents.

Measured on v5e: XLA ops sharing a program with a large-VMEM Pallas call
run 2-4× slower than standalone (gathers, pdf/composite glue alike;
optimization_barrier does not help, vmem_limit sweeps have no effect —
see renderer.make_fused_eval_stages for the eval-side numbers). The
monolithic `make_train_step` program contains the voxel corner-table
gather, pdf/composite/loss glue, the table-gradient segment-sum AND four
Pallas kernel launches, so every XLA op in it pays that tax.

This module rebuilds the train step as EIGHT dispatched programs — the
same math, reordered so kernel programs contain nothing but kernels:

    P1 prep         z/xyz sampling, dir PE, code lookup, corner-table
                    build + coarse gather                    (kernel-free)
    P2 coarse fwd   fused coarse MLP eval                    (kernel only)
    P3 mid glue     coarse composite → detached pdf → fine
                    xyz + fine corner gather                 (kernel-free)
    P4 fine fwd     fused fine MLP eval                      (kernel only)
    P5 loss grad    both composites + total_loss, then
                    value_and_grad w.r.t. the 8 kernel
                    outputs → per-sample cotangents          (kernel-free)
    P6 fine bwd     fused fine backward kernel               (kernel only)
    P7 coarse bwd   fused coarse backward kernel             (kernel only)
    P8 update       voxel table grad (segment-sum + linear
                    transpose of the corner-table build),
                    code-library grad, Adam + schedule       (kernel-free)

Gradient-exact vs `make_train_step`'s autodiff (tests/test_split_step.py):
the composites/losses re-run under `jax.value_and_grad` in P5 with the
same PRNG keys (noise is re-drawn bit-identically from the key), the
importance pdf is detached (ops/sampling.sample_pdf stops gradients —
reference rendering.py:307-311), so kernel outputs are the ONLY gradient
carriers between programs, and P8 reproduces the dense voxel lookup's VJP
(models/voxel_grid._take_rows segment-sum + the corner-table build
transpose) outside the kernel programs.

Host dispatch is async — all programs of a step (7 with the default
merged backward, 8 split fully) enqueue without a
sync, so per-program dispatch latency overlaps device execution exactly
as in the eval chunk pipeline.

Reference semantics covered: train.py:147-180 (training_step: render →
TotalLoss → psnr), rendering.py:233-337 (two-pass hierarchical render).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import voxel_grid as vg
from ..models.code_library import lookup_codes
from ..models.embedding import freq_encode
from ..ops.sampling import stratified_sample, sample_pdf, merge_z_vals
from ..ops.pallas_mlp_vjp import make_fused_fwd_bwd
from ..render.renderer import RenderSettings, _composite_pass
from .losses import total_loss
from .metrics import psnr


def split_step_supported(settings: RenderSettings, voxel_static) -> bool:
    """The split step covers the flagship training shape: fused kernels,
    hierarchical sampling, and (for voxel runs) the dense corner-table
    path. Everything else falls back to the monolithic step."""
    return (
        settings.use_pallas
        and settings.N_importance > 0
        and (voxel_static is None or vg._dense_path_ok(voxel_static))
    )


def make_split_train_step(
    settings: RenderSettings,
    loss_weights: Dict[str, float],
    optimizer: optax.GradientTransformation,
    voxel_static: Optional[vg.VoxelStatic] = None,
    lr_schedule=None,
    donate: bool = True,
    merge_bwd: bool = True,
):
    """Build the split train step. Same contract as `make_train_step`:
    returned callable is (state, batch, key, voxel_topo) -> (state, metrics)
    with `voxel_topo` dynamic (pruning never recompiles).

    `merge_bwd` (default ON) dispatches the fine+coarse backward kernels
    as ONE kernel-only program — 7 programs/step instead of 8. Measured
    on-chip (scripts/profile_bwd_merge.py, v5e): classical 19.42 → 19.31
    ms/step, voxel flat (34.46 → 34.56) — no scoped-VMEM staging
    competition between the two kernels sharing a program, and one fewer
    dispatch buys ~3 ms/step of headroom when the axon tunnel's
    per-program latency drifts from ~1 toward ~3 ms (the documented
    81-102k classical spread)."""
    assert split_step_supported(settings, voxel_static)
    mlp = settings.mlp
    fi = settings.forward_instance
    use_voxel = voxel_static is not None
    lowp = settings.pallas_dtype == "bfloat16"
    kdtype = jnp.dtype(settings.pallas_dtype).type

    # a >1-device shard_mesh shard_maps both kernel launchers over the ray
    # axis (P2/P4/P6/P7 in the program list above) with the weight grads
    # psum'd inside P6/P7 — the DDP all-reduce; the kernel-free glue
    # programs partition under plain GSPMD
    fwd_kernel, bwd_kernel = make_fused_fwd_bwd(
        mlp, fi, dtype=kdtype, interpret=settings.pallas_interpret,
        mesh=settings.shard_mesh,
    )

    def keys6(key):
        # the monolithic render_rays key schedule (renderer.py:428) — the
        # split step draws bit-identical perturbations and noise
        return jax.random.split(key, 6)

    def fetch(ct, voxel_topo, xyz):
        """(vox (n,S,C) f32, flat (n·S,), wts (n·S,8)) from the shared
        bf16 corner table — the canonical voxel_lookup_dense forward, with
        the (flat, wts) addressing the P8 table-gradient program needs."""
        n, s, _ = xyz.shape
        vox, _, flat, wts = vg.voxel_lookup_dense(
            None, voxel_topo, voxel_static, xyz.reshape(-1, 3), ct=ct,
            with_addressing=True,
        )
        return vox.reshape(n, s, -1), flat, wts

    @jax.jit
    def p1_prep(code_lib, voxel_features, rays, instance_ids, key,
                voxel_topo):
        k_perturb = keys6(key)[0]
        near, far = rays[:, 6:7], rays[:, 7:8]
        z_vals = stratified_sample(
            k_perturb, near, far, settings.N_samples, settings.use_disp,
            settings.perturb,
        )
        xyz_c = rays[:, None, 0:3] + rays[:, None, 3:6] * z_vals[..., None]
        dir_pe = freq_encode(rays[:, 3:6], mlp.N_freq_dir)
        if fi:
            codes = lookup_codes(code_lib, instance_ids)
        else:
            codes = jnp.zeros((rays.shape[0], mlp.N_obj_code_length),
                              jnp.float32)
        ct = vox_c = flat_c = wts_c = None
        if use_voxel:
            ct = vg.make_corner_table(voxel_features, voxel_topo,
                                      voxel_static, lowp=lowp)
            vox_c, flat_c, wts_c = fetch(ct, voxel_topo, xyz_c)
        return z_vals, xyz_c, dir_pe, codes, ct, vox_c, flat_c, wts_c

    @jax.jit
    def p_fwd_kernel(mlp_params, xyz, dir_pe, codes, vox):
        return fwd_kernel(mlp_params, xyz, dir_pe, codes, vox)

    def raw_dict(outs):
        sigma, rgb, isig, irgb = outs
        raw = {"sigma": sigma, "rgb": rgb}
        if fi:
            raw["inst_sigma"] = isig
            raw["inst_rgb"] = irgb
        return raw

    @jax.jit
    def p3_mid(rays, z_vals, outs_c, key, ct, voxel_topo, pt_mask):
        _, k_nc, k_nic, k_pdf, _, _ = keys6(key)
        results: Dict[str, Any] = {}
        _composite_pass(
            results, settings, "coarse", raw_dict(outs_c), z_vals,
            {"noise": k_nc, "noise_inst": k_nic}, pt_mask,
        )
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(
            k_pdf, z_mid, results["weights_coarse"][:, 1:-1],
            settings.N_importance, det=(settings.perturb == 0),
        )
        z_all = merge_z_vals(z_vals, z_fine)
        xyz_f = rays[:, None, 0:3] + rays[:, None, 3:6] * z_all[..., None]
        vox_f = flat_f = wts_f = None
        if use_voxel:
            vox_f, flat_f, wts_f = fetch(ct, voxel_topo, xyz_f)
        return z_all, xyz_f, vox_f, flat_f, wts_f

    def pack_g(g_outs, n, s):
        g_sigma, g_rgb, g_isig, g_irgb = g_outs
        return jnp.concatenate(
            [
                g_sigma.reshape(n * s, 1),
                g_rgb.reshape(n * s, 3),
                g_isig.reshape(n * s, 1),
                g_irgb.reshape(n * s, 3),
            ],
            axis=-1,
        )

    @jax.jit
    def p5_loss_grad(z_vals, z_all, outs_c, outs_f, key, batch):
        _, k_nc, k_nic, _, k_nf, k_nif = keys6(key)
        pt_mask = batch.get("pass_through_mask")

        def f(oc, of):
            results: Dict[str, Any] = {}
            _composite_pass(
                results, settings, "coarse", raw_dict(oc), z_vals,
                {"noise": k_nc, "noise_inst": k_nic}, pt_mask,
            )
            _composite_pass(
                results, settings, "fine", raw_dict(of), z_all,
                {"noise": k_nf, "noise_inst": k_nif}, pt_mask,
            )
            loss, logs = total_loss(results, batch, loss_weights, fi)
            train_psnr = psnr(
                results["rgb_fine"], batch["rgbs"],
                batch["valid_mask"][:, None],
            )
            return loss, (logs, train_psnr)

        (loss, (logs, train_psnr)), (g_c, g_f) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True
        )(outs_c, outs_f)
        n, s_c = outs_c[0].shape
        _, s_f = outs_f[0].shape
        return (loss, logs, train_psnr, pack_g(g_c, n, s_c),
                pack_g(g_f, n, s_f))

    @jax.jit
    def p_bwd_kernel(mlp_params, xyz, dir_pe, codes, vox, g_out):
        return bwd_kernel(mlp_params, xyz, dir_pe, codes, vox, g_out)

    @jax.jit
    def p_bwd_merged(p_fine, p_coarse, xyz_f, xyz_c, dir_pe, codes,
                     vox_f, vox_c, g_f, g_c):
        # both backward kernels in one kernel-only program; they execute
        # serially on the core, so this only changes dispatch count
        return (
            bwd_kernel(p_fine, xyz_f, dir_pe, codes, vox_f, g_f),
            bwd_kernel(p_coarse, xyz_c, dir_pe, codes, vox_c, g_c),
        )

    def table_grad(voxel_features, voxel_topo, d_vox_c, flat_c, wts_c,
                   d_vox_f, flat_f, wts_f):
        """d_features from the per-sample reduced-feature cotangents of
        both passes: the trilinear-reduce transpose (outer product with
        the zeroed weights), ONE corner-row segment-sum over the
        concatenated coarse+fine samples (≡ _take_rows_bf16's VJP — f32
        accumulation, the bf16 forward cast is identity to the gradient),
        then `vg.corner_table_transpose` — the hand-written linear
        transpose of the corner-table build. (jax.vjp(build) was measured
        re-running the full forward build for unused residuals — ~160 ms
        per step on a post-subdivision flagship grid; the hand transpose
        is value-independent: 8 slice-adds + one capacity-row gather.)"""
        c = voxel_static.channels

        def rows(d_vox, wts):
            d_flat = d_vox.reshape(-1, c)
            return (d_flat[:, None, :] * wts[:, :, None]).reshape(-1, 8 * c)

        d_rows = jnp.concatenate([rows(d_vox_c, wts_c),
                                  rows(d_vox_f, wts_f)])
        flat = jnp.concatenate([flat_c, flat_f])
        n_pcells = (
            (voxel_static.shape[0] + 1)
            * (voxel_static.shape[1] + 1)
            * (voxel_static.shape[2] + 1)
        )
        d_ct = jax.ops.segment_sum(d_rows, flat, num_segments=n_pcells)
        return vg.corner_table_transpose(
            d_ct, voxel_topo.row_to_cell, voxel_static
        )

    update_kw = dict(donate_argnums=(0,)) if donate else {}

    @functools.partial(jax.jit, **update_kw)
    def p8_update(state, instance_ids, voxel_topo, d_coarse, d_fine,
                  d_codes_c, d_codes_f, d_vox_c, flat_c, wts_c, d_vox_f,
                  flat_f, wts_f, loss, logs, train_psnr):
        grads = {"coarse": d_coarse, "fine": d_fine}
        if fi:
            lib = state.params["code_library"]
            _, code_vjp = jax.vjp(
                lambda t: lookup_codes(t, instance_ids), lib
            )
            grads["code_library"] = code_vjp(d_codes_c + d_codes_f)[0]
        else:
            grads["code_library"] = jnp.zeros_like(
                state.params["code_library"]
            )
        if use_voxel:
            grads["voxel_features"] = table_grad(
                state.params["voxel_features"], voxel_topo,
                d_vox_c, flat_c, wts_c, d_vox_f, flat_f, wts_f,
            )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {"train/loss": loss, "train/psnr": train_psnr}
        metrics.update({f"train/{k}": v for k, v in logs.items()})
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        from .system import TrainState

        return TrainState(params, opt_state, state.step + 1), metrics

    def train_step(state, batch, key, voxel_topo):
        p = state.params
        rays = batch["rays"]
        ids = batch.get("instance_ids")
        if ids is None:
            ids = jnp.zeros((rays.shape[0],), jnp.int32)
        z_vals, xyz_c, dir_pe, codes, ct, vox_c, flat_c, wts_c = p1_prep(
            p["code_library"], p.get("voxel_features"), rays, ids, key,
            voxel_topo,
        )
        outs_c = p_fwd_kernel(p["coarse"], xyz_c, dir_pe, codes, vox_c)
        z_all, xyz_f, vox_f, flat_f, wts_f = p3_mid(
            rays, z_vals, outs_c, key, ct, voxel_topo,
            batch.get("pass_through_mask"),
        )
        outs_f = p_fwd_kernel(p["fine"], xyz_f, dir_pe, codes, vox_f)
        loss, logs, train_psnr, g_c, g_f = p5_loss_grad(
            z_vals, z_all, outs_c, outs_f, key, batch
        )
        if merge_bwd:
            (d_fine, d_codes_f, d_vox_f), (d_coarse, d_codes_c, d_vox_c) = (
                p_bwd_merged(p["fine"], p["coarse"], xyz_f, xyz_c, dir_pe,
                             codes, vox_f, vox_c, g_f, g_c)
            )
        else:
            d_fine, d_codes_f, d_vox_f = p_bwd_kernel(
                p["fine"], xyz_f, dir_pe, codes, vox_f, g_f
            )
            d_coarse, d_codes_c, d_vox_c = p_bwd_kernel(
                p["coarse"], xyz_c, dir_pe, codes, vox_c, g_c
            )
        return p8_update(
            state, ids, voxel_topo, d_coarse, d_fine, d_codes_c,
            d_codes_f, d_vox_c, flat_c, wts_c, d_vox_f, flat_f, wts_f,
            loss, logs, train_psnr,
        )

    return train_step
