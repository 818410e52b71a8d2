"""Multi-object sort-merge compositing for editable rendering.

Parity with the reference `render_rays_multi` / `volume_rendering_multi` /
`inference_from_model` (render_tools/multi_rendering.py:16-325):

* one ray set per active object (0 = background scene); per set stratified
  z sampling over that set's near/far;
* object evaluation through the *object branch* with that id's latent code,
  background through the scene branch;
* muted rays (far == 0, i.e. bbox miss) get sigma = -1e5
  (multi_rendering.py:40-41,83,92);
* background samples inside removed-object boxes get sigma = -1e5
  (multi_rendering.py:239-241,309-311);
* joint compositing: concat all objects' z/rgb/sigma, sort by z, gather,
  single alpha-composite with last-delta = 0 (multi_rendering.py:96-157);
* fine pass: per-object coarse weights recovered, sample_pdf per object,
  re-evaluate, re-composite (multi_rendering.py:259-324).

TPU-first differences:

* the object count is static per call (one compiled program per edit
  configuration — the reference recompiles nothing but pays Python loops);
* the reference's per-channel `gather` workaround becomes one
  `take_along_axis`;
* per-object coarse-weight recovery inverts the sort permutation instead of
  boolean-mask reshaping (bit-equivalent: z values per object are ascending,
  and the sort is applied to the concatenated axis) — static shapes, no
  `numel()` asserts needed;
* removal muting evaluates the packed (affine, bounds) box arrays on device.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.embedding import freq_encode
from ..models.mlp import scene_forward, instance_forward
from ..models.code_library import lookup_codes
from ..ops.sampling import stratified_sample, sample_pdf
from .renderer import RenderSettings, VoxelCtx, _embed_points

MUTE_SIGMA = -1e5


def compact_hit_order(rays_list, obj_instance_ids, chunk: int):
    """Host-side chunk planner: skip object evaluation for all-miss chunks.

    The reference evaluates every object ray set densely — rays whose bbox
    intersection missed (near=far=0) still run the full coarse+fine MLP and
    are only muted at composite time (multi_rendering.py:40-41,83,92). In a
    demo frame the edited object covers a small fraction of pixels, so most
    of the object sets' kernel/gather work composites to nothing.

    TPU-first fix: static shapes forbid per-chunk ray counts, but the pixel
    ORDER within a frame is free — rays are embarrassingly parallel and the
    caller scatters results back by pixel index anyway. Return a stable
    permutation that puts rays hit by ≥1 object first, plus the number of
    leading chunks that contain any hit. Those chunks run the full K-object
    program; every later chunk is all-miss and can run the background-only
    program (K=1: no object kernels, no object voxel gathers, half-width
    sort-merge) — the same two compiled configurations for every frame.

    Muted samples are not EXACTLY free in the composite (their alpha==0
    rows still contribute the reference's `+1e-10` transmittance epsilon,
    rendering.py:160, and uniformly rescale the pdf weights), so dropping
    them changes the output at the ~1e-8 level — far below the 1e-6 parity
    budget, and documented at the call sites. Callers that need the
    bit-exact dense semantics pass compaction off.

    Returns None when compaction does not apply (no background set leading,
    duplicate/zero object ids misplaced, or every ray hits); else
    (perm (N,), n_mixed).
    """
    ids = tuple(int(i) for i in obj_instance_ids)
    if len(ids) < 2 or ids[0] != 0 or 0 in ids[1:]:
        return None
    n = int(rays_list[0].shape[0])
    any_hit = np.zeros(n, bool)
    for rays, oid in zip(rays_list, ids):
        if oid != 0:
            any_hit |= np.asarray(rays[:, 7]) > 0
    n_hit = int(any_hit.sum())
    if n_hit == n:
        return None
    perm = np.argsort(~any_hit, kind="stable")
    n_mixed = -(-n_hit // chunk)  # ceil
    return perm, n_mixed


def _in_any_box(xyz, box_affines, box_bounds, scale_factor):
    """xyz (N,3) NeRF coords → bool (N,): inside any removal box."""
    p = xyz * scale_factor
    p = jnp.einsum("bij,nj->bni", box_affines[:, :3, :3], p) + box_affines[
        :, None, :3, 3
    ]
    inb = jnp.all(
        (p >= box_bounds[:, None, 0]) & (p <= box_bounds[:, None, 1]), axis=-1
    )
    return jnp.any(inb, axis=0)


def _eval_object(
    params,
    settings: RenderSettings,
    voxel_ctx: VoxelCtx,
    typ: str,
    instance_id: int,
    xyz: jnp.ndarray,  # (N, S, 3)
    z_vals: jnp.ndarray,  # (N, S)
    dir_embedded: jnp.ndarray,  # (N, C_dir)
    skip_boxes,
):
    """(rgbs (N,S,3), sigmas (N,S)) for one object's ray set."""
    n, s, _ = xyz.shape
    flat = xyz.reshape(-1, 3)
    mlp = params[typ]

    if settings.use_pallas:
        # fused kernel: scene-only for the background set, instance-only for
        # object sets (multi_rendering.py:63-72 branch selection)
        from ..ops.pallas_mlp import fused_mlp_eval
        from ..models.voxel_grid import voxel_lookup_raw

        voxel_raw = None
        if voxel_ctx is not None:
            features, topo, static = voxel_ctx
            raw, _ = voxel_lookup_raw(features, topo, static, flat)
            voxel_raw = raw.reshape(n, s, -1)
        codes = None
        if instance_id > 0:
            codes = lookup_codes(
                params["code_library"],
                jnp.full((n,), instance_id, jnp.int32),
            )
        sigma_s, rgb_s, sigma_i, rgb_i = fused_mlp_eval(
            mlp, settings.mlp, xyz, dir_embedded,
            obj_codes=codes, voxel_raw=voxel_raw,
            forward_instance=instance_id > 0,
            compute_scene=instance_id == 0,
            dtype=jnp.dtype(settings.pallas_dtype).type,
            interpret=settings.pallas_interpret,
            mesh=settings.shard_mesh,
        )
        sigma, rgb = (sigma_i, rgb_i) if instance_id > 0 else (sigma_s, rgb_s)
    else:
        emb_xyz, obj_voxel = _embed_points(flat, settings, voxel_ctx)
        dir_flat = jnp.repeat(dir_embedded, s, axis=0)
        if instance_id > 0:
            codes = lookup_codes(
                params["code_library"],
                jnp.full((flat.shape[0],), instance_id, jnp.int32),
            )
            sigma, rgb = instance_forward(
                mlp, settings.mlp, emb_xyz, codes, obj_voxel, dir_flat
            )
        else:
            sigma, rgb = scene_forward(mlp, settings.mlp, emb_xyz, dir_flat)
        sigma = sigma.reshape(n, s)
        rgb = rgb.reshape(n, s, 3)

    inb = _removal_mask(xyz, instance_id, skip_boxes)
    return rgb, _mute_sigma(sigma, z_vals, inb)


def _removal_mask(xyz, instance_id: int, skip_boxes):
    """(N, S) bool: background samples inside removed-object boxes, or None.

    Only the background set (id 0) is carved out
    (multi_rendering.py:239-241,309-311)."""
    if instance_id != 0 or skip_boxes is None:
        return None
    affines, bounds, scale = skip_boxes
    return _in_any_box(
        xyz.reshape(-1, 3), affines, bounds, scale
    ).reshape(xyz.shape[:2])


def _mute_sigma(sigma, z_vals, inb=None):
    """Muting shared by the monolithic and split-program paths: rays whose
    bbox intersection missed (far == 0 ⇒ all-zero z) and removal-box
    samples both get sigma = -1e5 (multi_rendering.py:40-41,83,92)."""
    sigma = jnp.where((z_vals[:, -1] == 0)[:, None], MUTE_SIGMA, sigma)
    if inb is not None:
        sigma = jnp.where(inb, MUTE_SIGMA, sigma)
    return sigma


def _composite_multi(
    results: Dict[str, jnp.ndarray],
    typ: str,
    z_list, rgb_list, sigma_list,
    key, noise_std: float, white_back: bool,
    keep_sort_idx: bool,
):
    z = jnp.concatenate(z_list, axis=1)  # (N, S_total)
    rgb = jnp.concatenate(rgb_list, axis=1)
    sigma = jnp.concatenate(sigma_list, axis=1)

    idx = jnp.argsort(z, axis=-1)
    z = jnp.take_along_axis(z, idx, axis=-1)
    sigma = jnp.take_along_axis(sigma, idx, axis=-1)
    rgb = jnp.take_along_axis(rgb, idx[..., None], axis=1)
    if keep_sort_idx:
        results[f"sort_idx_{typ}"] = idx

    deltas = z[:, 1:] - z[:, :-1]
    deltas = jnp.concatenate([deltas, jnp.zeros_like(deltas[:, :1])], -1)
    if noise_std > 0 and key is not None:
        sigma = sigma + jax.random.normal(key, sigma.shape) * noise_std
    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigma))
    trans = jnp.cumprod(1.0 - alphas + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
    weights = alphas * trans

    opacity = jnp.sum(weights, -1)
    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    depth_map = jnp.sum(weights * z, -1)
    if white_back:
        rgb_map = rgb_map + 1.0 - opacity[..., None]

    results[f"weights_{typ}"] = weights
    results[f"opacity_{typ}"] = opacity
    results[f"z_vals_{typ}"] = z
    results[f"rgb_{typ}"] = rgb_map
    results[f"depth_{typ}"] = depth_map


def render_rays_multi(
    params: Dict[str, Any],
    rays_list: Sequence[jnp.ndarray],  # K × (N, 8) — or (N, 10) with a
    # per-ray bbox-mask interval in ch 8:10 (clips fine samples, see below)
    obj_instance_ids: Tuple[int, ...],
    key: jnp.ndarray,
    settings: RenderSettings,
    voxel_ctx: VoxelCtx = None,
    skip_boxes: Optional[tuple] = None,  # (affines (B,4,4), bounds (B,2,3), scale)
) -> Dict[str, jnp.ndarray]:
    """Joint multi-object render. obj_instance_ids is static (one compile per
    edit configuration)."""
    assert len(rays_list) == len(obj_instance_ids)
    k_perturb, k_nc, k_pdf, k_nf = jax.random.split(key, 4)
    n_obj = len(rays_list)
    n_samples = settings.N_samples

    z_list, xyz_list, dir_list, o_list, d_list = [], [], [], [], []
    for rays in rays_list:
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 6:7], rays[:, 7:8]
        z = stratified_sample(
            k_perturb, near, far, n_samples, settings.use_disp, settings.perturb
        )
        xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        z_list.append(z)
        xyz_list.append(xyz)
        dir_list.append(freq_encode(rays_d, settings.mlp.N_freq_dir))
        o_list.append(rays_o)
        d_list.append(rays_d)

    rgb_list, sigma_list = [], []
    for i in range(n_obj):
        rgb, sigma = _eval_object(
            params, settings, voxel_ctx, "coarse", obj_instance_ids[i],
            xyz_list[i], z_list[i], dir_list[i], skip_boxes,
        )
        rgb_list.append(rgb)
        sigma_list.append(sigma)

    results: Dict[str, jnp.ndarray] = {}
    _composite_multi(
        results, "coarse", z_list, rgb_list, sigma_list,
        k_nc, settings.noise_std, settings.white_back,
        keep_sort_idx=settings.N_importance > 0,
    )

    if settings.N_importance > 0:
        # recover per-object coarse weights by inverting the sort permutation
        idx = results.pop("sort_idx_coarse")
        inv = jnp.argsort(idx, axis=-1)
        w_orig = jnp.take_along_axis(results["weights_coarse"], inv, axis=-1)

        rgb_list, sigma_list, zf_list = [], [], []
        for i in range(n_obj):
            w_i = w_orig[:, i * n_samples : (i + 1) * n_samples]
            z = z_list[i]
            z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
            z_imp = sample_pdf(
                k_pdf, z_mid, w_i[:, 1:-1], settings.N_importance,
                det=(settings.perturb == 0),
            )
            z_all = jnp.sort(jnp.concatenate([z, z_imp], -1), -1)
            rays = rays_list[i]
            if rays.shape[1] == 10:
                # 10-ch rays carry a bbox mask interval: fine samples that
                # land inside (near_mask, far_mask) are moved to far_mask
                # (reference multi_rendering.py:279-287 — vestigial there,
                # kept for rays-API parity; shape test is static)
                near_m, far_m = rays[:, 8:9], rays[:, 9:10]
                z_all = jnp.where((z_all > near_m) & (z_all < far_m),
                                  far_m, z_all)
            xyz_f = (
                o_list[i][:, None, :] + d_list[i][:, None, :] * z_all[..., None]
            )
            rgb, sigma = _eval_object(
                params, settings, voxel_ctx, "fine", obj_instance_ids[i],
                xyz_f, z_all, dir_list[i], skip_boxes,
            )
            zf_list.append(z_all)
            rgb_list.append(rgb)
            sigma_list.append(sigma)

        _composite_multi(
            results, "fine", zf_list, rgb_list, sigma_list,
            k_nf, settings.noise_std, settings.white_back,
            keep_sort_idx=False,
        )
    return results


def make_multi_eval_stages(
    settings: RenderSettings,
    obj_instance_ids: Sequence[int],
    voxel_static=None,
):
    """The multi-object eval chunk renderer as SEPARATE jitted programs:
    Pallas kernels isolated from the sampling / sort-merge / gather glue.

    Same measured program-composition effect the single-scene eval split
    exploits (renderer.make_fused_eval_stages): an XLA op sharing a program
    with a large-VMEM Pallas call runs 2-4× slower than standalone, so the
    monolithic `render_rays_multi` jit — K kernel calls interleaved with
    stratified sampling, code/voxel gathers, two sort-merge composites and
    a pdf resample — pays that tax on every glue op. Here kernel programs
    contain ONLY the fused MLP eval (+ the trivial dir-PE matmul); all glue
    lives in kernel-free programs. Per chunk with K ray sets the dispatch
    is 2K+3 programs (prep, K coarse kernels, merge, K fine kernels,
    final composite), overlapped by the caller's async chunk pipeline.

    When a fine pass follows (N_importance > 0), the coarse kernels are
    SIGMA-ONLY (`ops.pallas_mlp.fused_sigma_eval`): the joint coarse
    composite feeds nothing but the pdf weights, so the RGB head, the
    dir-PE operand and the coarse rgb sort-gather are dropped — the same
    trick the single-scene eval coarse pass uses (measured there: ~5.5 ms
    sigma-only vs ~13 ms full kernel per 7680-ray chunk).

    Math is bit-identical to `render_rays_multi` under eval settings
    (perturb=0, noise_std=0): the same mute/composite/pdf helpers run on
    the same inputs (the rgb-free weight chain keeps _composite_multi's
    exact op order), only program boundaries move.

    Returns render_chunk(params, rays_stack (K,N,8 — or 10 with the
    bbox-mask interval channels, see render_rays_multi), voxel_topo, ct,
    skip_boxes) -> final-typ maps {rgb,depth,opacity}_{fine|coarse} — the
    contract EditableRenderer._render_multi consumes. For the voxel path
    pass voxel_static plus a prebuilt corner table `ct`
    (models/voxel_grid.make_corner_table, built once per frame).
    """
    from ..models.voxel_grid import voxel_lookup_dense
    from ..ops.pallas_mlp import fused_mlp_eval, fused_sigma_eval

    if settings.perturb != 0 or settings.noise_std != 0:
        # a bare assert would vanish under `python -O` and silently render
        # without the caller's expected stochastic sampling
        raise ValueError(
            "the split multi render is the deterministic eval path "
            "(requires perturb=0 and noise_std=0); use render_rays_multi "
            "for stochastic settings"
        )
    mlp = settings.mlp
    kdtype = jnp.dtype(settings.pallas_dtype).type
    lowp = settings.pallas_dtype == "bfloat16"
    use_voxel = voxel_static is not None
    ids = tuple(int(i) for i in obj_instance_ids)
    n_obj = len(ids)
    n_samples = settings.N_samples
    typ_final = "fine" if settings.N_importance > 0 else "coarse"

    def lookup(voxel_topo, ct, xyz):
        if not use_voxel:
            return None
        raw, _ = voxel_lookup_dense(
            None, voxel_topo, voxel_static, xyz.reshape(-1, 3), lowp=lowp,
            ct=ct,
        )
        return raw.reshape(xyz.shape[0], xyz.shape[1], -1)

    @jax.jit
    def stage_prep(params, rays_stack, voxel_topo, ct, skip_boxes):
        """Kernel-free: per object — stratified z, sample positions, voxel
        gather, latent-code lookup, removal-box mask."""
        out = []
        for i in range(n_obj):
            rays = rays_stack[i]
            z = stratified_sample(
                None, rays[:, 6:7], rays[:, 7:8], n_samples,
                settings.use_disp, 0.0,
            )
            xyz = rays[:, None, 0:3] + rays[:, None, 3:6] * z[..., None]
            codes = None
            if ids[i] > 0:
                codes = lookup_codes(
                    params["code_library"],
                    jnp.full((rays.shape[0],), ids[i], jnp.int32),
                )
            out.append((z, xyz, lookup(voxel_topo, ct, xyz), codes,
                        _removal_mask(xyz, ids[i], skip_boxes)))
        return tuple(out)

    @jax.jit
    def stage_scene_kernel(mlp_params, rays, xyz, vox):
        dir_pe = freq_encode(rays[:, 3:6], mlp.N_freq_dir)
        sigma, rgb, _, _ = fused_mlp_eval(
            mlp_params, mlp, xyz, dir_pe, voxel_raw=vox,
            forward_instance=False, compute_scene=True,
            dtype=kdtype, interpret=settings.pallas_interpret,
            mesh=settings.shard_mesh,
        )
        return sigma, rgb

    @jax.jit
    def stage_inst_kernel(mlp_params, rays, xyz, vox, codes):
        dir_pe = freq_encode(rays[:, 3:6], mlp.N_freq_dir)
        _, _, sigma, rgb = fused_mlp_eval(
            mlp_params, mlp, xyz, dir_pe, obj_codes=codes, voxel_raw=vox,
            forward_instance=True, compute_scene=False,
            dtype=kdtype, interpret=settings.pallas_interpret,
            mesh=settings.shard_mesh,
        )
        return sigma, rgb

    def _sigma_kernel_stage(branch):
        @jax.jit
        def stage(mlp_params, xyz, vox, codes):
            n, s, _ = xyz.shape
            sig = fused_sigma_eval(
                mlp_params, mlp, xyz.reshape(-1, 3),
                voxel_raw=None if vox is None else vox.reshape(n * s, -1),
                obj_codes=codes, branch=branch, samples_per_row=s,
                dtype=kdtype, interpret=settings.pallas_interpret,
                mesh=settings.shard_mesh,
            )
            return sig.reshape(n, s)
        return stage

    # coarse pass when a fine pass follows: the joint coarse composite
    # feeds ONLY the pdf weights (its rgb/depth maps are discarded), so
    # the coarse kernels drop the dir-PE operand and the RGB head — the
    # same sigma-only trick the single-scene eval coarse pass uses
    # (renderer.make_fused_eval_stages / ops.fused_coarse_weights class)
    stage_scene_sigma = _sigma_kernel_stage("scene")
    stage_inst_sigma = _sigma_kernel_stage("instance")

    def run_kernels(params, typ, rays_stack, per_obj, codes_list,
                    sigma_only=False):
        """One kernel-only program per ray set (scene or instance branch —
        multi_rendering.py:63-72 branch selection). codes_list comes from
        stage_prep and is shared by the coarse AND fine passes. With
        sigma_only, outputs are (sigma, None)."""
        outs = []
        for i in range(n_obj):
            _, xyz, vox, _, _ = per_obj[i]
            if sigma_only:
                if ids[i] > 0:
                    sig = stage_inst_sigma(params[typ], xyz, vox,
                                           codes_list[i])
                else:
                    sig = stage_scene_sigma(params[typ], xyz, vox, None)
                outs.append((sig, None))
            elif ids[i] > 0:
                outs.append(stage_inst_kernel(
                    params[typ], rays_stack[i], xyz, vox, codes_list[i]))
            else:
                outs.append(stage_scene_kernel(
                    params[typ], rays_stack[i], xyz, vox))
        return outs

    def _muted_lists(z_list, sig_rgb, inb_list):
        rgb_list, sigma_list = [], []
        for i in range(n_obj):
            sigma, rgb = sig_rgb[i]
            sigma_list.append(_mute_sigma(sigma, z_list[i], inb_list[i]))
            rgb_list.append(rgb)
        return rgb_list, sigma_list

    def _coarse_pdf_weights(z_list, sigma_list):
        """Joint-composite weights + sort permutation, rgb-free: the coarse
        pass only feeds the pdf resampler here, so this mirrors
        _composite_multi's weight chain (same op order — bit-identical
        weights) without the discarded rgb/depth/opacity maps."""
        z = jnp.concatenate(z_list, axis=1)
        sigma = jnp.concatenate(sigma_list, axis=1)
        idx = jnp.argsort(z, axis=-1)
        z = jnp.take_along_axis(z, idx, axis=-1)
        sigma = jnp.take_along_axis(sigma, idx, axis=-1)
        deltas = z[:, 1:] - z[:, :-1]
        deltas = jnp.concatenate([deltas, jnp.zeros_like(deltas[:, :1])], -1)
        alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigma))
        trans = jnp.cumprod(1.0 - alphas + 1e-10, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1
        )
        return alphas * trans, idx

    @jax.jit
    def stage_merge(rays_stack, z_tuple, inb_tuple, sig_tuple, voxel_topo,
                    ct, skip_boxes):
        """Kernel-free: joint coarse composite → per-object pdf weights →
        fine sample positions, gathers and masks. Consumes the sigma-only
        coarse kernel outputs (sig_tuple: K × (N, S))."""
        z_list = list(z_tuple)
        sigma_list = [
            _mute_sigma(sig_tuple[i], z_list[i], inb_tuple[i])
            for i in range(n_obj)
        ]
        weights, idx = _coarse_pdf_weights(z_list, sigma_list)
        inv = jnp.argsort(idx, axis=-1)
        w_orig = jnp.take_along_axis(weights, inv, axis=-1)
        out = []
        for i in range(n_obj):
            w_i = w_orig[:, i * n_samples : (i + 1) * n_samples]
            z = z_list[i]
            z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
            z_imp = sample_pdf(
                None, z_mid, w_i[:, 1:-1], settings.N_importance, det=True,
            )
            z_all = jnp.sort(jnp.concatenate([z, z_imp], -1), -1)
            if rays_stack.shape[-1] == 10:
                # bbox-mask interval clip, same as render_rays_multi
                # (reference multi_rendering.py:279-287)
                near_m = rays_stack[i][:, 8:9]
                far_m = rays_stack[i][:, 9:10]
                z_all = jnp.where((z_all > near_m) & (z_all < far_m),
                                  far_m, z_all)
            xyz_f = (
                rays_stack[i][:, None, 0:3]
                + rays_stack[i][:, None, 3:6] * z_all[..., None]
            )
            out.append((z_all, xyz_f, lookup(voxel_topo, ct, xyz_f), None,
                        _removal_mask(xyz_f, ids[i], skip_boxes)))
        return tuple(out)

    @jax.jit
    def stage_final(z_tuple, inb_tuple, sig_rgb):
        """Kernel-free: mute + joint sort-merge composite of the final pass."""
        z_list = list(z_tuple)
        rgb_list, sigma_list = _muted_lists(z_list, sig_rgb, list(inb_tuple))
        results: Dict[str, jnp.ndarray] = {}
        _composite_multi(
            results, typ_final, z_list, rgb_list, sigma_list,
            None, 0.0, settings.white_back, keep_sort_idx=False,
        )
        return {k: results[k] for k in (
            f"rgb_{typ_final}", f"depth_{typ_final}", f"opacity_{typ_final}",
        )}

    def render_chunk(params, rays_stack, voxel_topo=None, ct=None,
                     skip_boxes=None):
        prep = stage_prep(params, rays_stack, voxel_topo, ct, skip_boxes)
        codes_list = [p[3] for p in prep]
        fine_follows = settings.N_importance > 0
        coarse = run_kernels(params, "coarse", rays_stack, prep, codes_list,
                             sigma_only=fine_follows)
        if fine_follows:
            fine_meta = stage_merge(
                rays_stack, tuple(p[0] for p in prep),
                tuple(p[4] for p in prep), tuple(c[0] for c in coarse),
                voxel_topo, ct, skip_boxes,
            )
            fine = run_kernels(params, "fine", rays_stack, fine_meta,
                               codes_list)
            return stage_final(tuple(m[0] for m in fine_meta),
                               tuple(m[4] for m in fine_meta), fine)
        return stage_final(tuple(p[0] for p in prep),
                           tuple(p[4] for p in prep), coarse)

    return render_chunk
