"""The hierarchical two-branch render pipeline (training/val path).

Feature parity with the reference `render_rays` (models/rendering.py:233-337)
and `inference_model` (rendering.py:64-230): stratified coarse sampling,
coarse scene+instance evaluation and compositing, inverse-CDF importance
sampling from detached coarse weights, sort-merged fine pass.

TPU-first design (not a port):

* One fully-jitted, static-shape function per (settings, shapes) pair. The
  reference's Python chunk loops (train.py:77-105, rendering.py:106-130)
  disappear: the whole ray batch evaluates as single large matmuls on the
  MXU, and memory is bounded by the caller's choice of batch size plus
  optional `jax.checkpoint` on the MLP evals.
* Randomness is an explicit key, split once per stochastic site, so a step
  is exactly reproducible from (params, batch, key).
* The voxel-grid feature lookup is injected as a function of xyz so the
  classical-PE and sparse-voxel paths share this pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.embedding import freq_encode
from ..models.mlp import ObjectNeRFConfig, scene_forward, instance_forward
from ..ops.sampling import stratified_sample, sample_pdf, merge_z_vals
from ..ops.compositing import composite, composite_instance


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) render configuration — a jit static argument."""

    mlp: ObjectNeRFConfig
    N_samples: int = 64
    N_importance: int = 64
    use_disp: bool = False
    perturb: float = 1.0
    noise_std: float = 1.0
    white_back: bool = False
    forward_instance: bool = True
    frustum_bound_th: float = 0.0
    is_eval: bool = False
    rays_in_bbox: bool = False
    use_pallas: bool = False  # fused VMEM-resident kernels (train + eval)
    pallas_rays_per_tile: Optional[int] = None  # None = auto from VMEM budget
    pallas_dtype: str = "bfloat16"  # matmul dtype in fused kernels (f32 accum)
    pallas_interpret: bool = False  # interpreter-mode kernels (CPU tests)
    remat: bool = False  # rematerialize MLP evals in the backward pass
    # >1-device mesh: every Pallas launch shard_maps its ray axis over it
    # (GSPMD can't partition tpu_custom_call — ops/pallas_mlp.shard_over_rays)
    # jax.sharding.Mesh is hashable, so settings stay a valid static arg
    shard_mesh: Optional[Any] = None

    @classmethod
    def from_config(cls, cfg, *, white_back=False, is_eval=False, **over):
        mlp = ObjectNeRFConfig.from_config(cfg.model)
        fb = float(cfg.model.frustum_bound)
        scale = float(cfg.dataset_extra.get("scale_factor", 1.0))
        kw = dict(
            mlp=mlp,
            N_samples=int(cfg.model.N_samples),
            N_importance=int(cfg.model.N_importance),
            use_disp=bool(cfg.model.use_disp),
            perturb=0.0 if is_eval else float(cfg.model.perturb),
            noise_std=0.0 if is_eval else float(cfg.model.noise_std),
            white_back=white_back,
            frustum_bound_th=fb / scale if fb > 0 else 0.0,
            is_eval=is_eval,
        )
        kw.update(over)
        return cls(**kw)


# Voxel context: (features, topology, static[, corner_table]) or None for
# classical PE. The optional 4th element is a prebuilt eval-only corner
# table (models/voxel_grid.make_corner_table) hoisted out of per-chunk
# programs by make_render_fn.
VoxelCtx = Optional[tuple]


def _lookup_voxel_raw(settings: RenderSettings, voxel_ctx: VoxelCtx, xyz):
    """Raw (n, S, C) voxel features for the fused kernels, or None.

    The ONE place the fused paths fetch voxel features (bf16 corner-table
    gather when the kernels run in bf16) — eval, train, and the fused-MLP
    op path all share it."""
    if voxel_ctx is None:
        return None
    from ..models.voxel_grid import voxel_lookup_raw

    features, topo, static = voxel_ctx[:3]
    ct = voxel_ctx[3] if len(voxel_ctx) > 3 else None
    raw, _ = voxel_lookup_raw(
        features, topo, static, xyz.reshape(-1, 3), trilinear=True,
        lowp=settings.pallas_dtype == "bfloat16", ct=ct,
    )
    return raw.reshape(xyz.shape[0], xyz.shape[1], -1)


def _embed_points(xyz_flat, settings: RenderSettings, voxel_ctx: VoxelCtx):
    """(emb_xyz (N,C), obj_voxel (N,Cv)|None) — the EmbeddingVoxel.forward /
    classical Embedding split (train.py:45-53)."""
    if voxel_ctx is None:
        return freq_encode(xyz_flat, settings.mlp.N_freq_xyz), None
    from ..models.voxel_grid import voxel_embed

    features, topo, static = voxel_ctx[:3]
    ct = voxel_ctx[3] if len(voxel_ctx) > 3 else None
    return voxel_embed(
        features, topo, static, xyz_flat, n_freq_xyz=settings.mlp.N_freq_xyz,
        ct=ct,
    )


def _eval_models(
    params: Dict[str, Any],
    settings: RenderSettings,
    voxel_ctx: VoxelCtx,
    typ: str,
    xyz: jnp.ndarray,  # (N_rays, S, 3)
    dir_embedded: jnp.ndarray,  # (N_rays, C_dir)
    embedding_instance: Optional[jnp.ndarray],  # (N_rays, C_code)
):
    """Evaluate scene (+instance) branches over flattened rays×samples."""
    n_rays, n_samp, _ = xyz.shape
    mlp_params = params[typ]

    if settings.use_pallas:
        from ..ops.pallas_mlp_vjp import make_fused_mlp_op

        codes = embedding_instance
        if codes is None:
            codes = jnp.zeros((n_rays, settings.mlp.N_obj_code_length), xyz.dtype)
        voxel_raw = _lookup_voxel_raw(settings, voxel_ctx, xyz)
        op = make_fused_mlp_op(
            settings.mlp, settings.forward_instance,
            dtype=jnp.dtype(settings.pallas_dtype).type,
            interpret=settings.pallas_interpret,
            mesh=settings.shard_mesh,
        )
        sigma, rgb, i_sigma, i_rgb = op(
            mlp_params, xyz, dir_embedded, codes, voxel_raw
        )
        out = {"sigma": sigma, "rgb": rgb}
        if settings.forward_instance:
            out["inst_sigma"] = i_sigma
            out["inst_rgb"] = i_rgb
        return out

    xyz_flat = xyz.reshape(n_rays * n_samp, 3)
    emb_xyz, obj_voxel = _embed_points(xyz_flat, settings, voxel_ctx)
    dir_flat = jnp.repeat(dir_embedded, n_samp, axis=0)

    sigma, rgb = scene_forward(mlp_params, settings.mlp, emb_xyz, dir_flat)
    out = {
        "sigma": sigma.reshape(n_rays, n_samp),
        "rgb": rgb.reshape(n_rays, n_samp, 3),
    }
    if settings.forward_instance:
        codes = jnp.repeat(embedding_instance, n_samp, axis=0)
        i_sigma, i_rgb = instance_forward(
            mlp_params, settings.mlp, emb_xyz, codes, obj_voxel, dir_flat
        )
        out["inst_sigma"] = i_sigma.reshape(n_rays, n_samp)
        out["inst_rgb"] = i_rgb.reshape(n_rays, n_samp, 3)
    return out


def _composite_pass(
    results: Dict[str, jnp.ndarray],
    settings: RenderSettings,
    typ: str,
    raw: Dict[str, jnp.ndarray],
    z_vals: jnp.ndarray,
    keys: Dict[str, jnp.ndarray],
    pass_through_mask: Optional[jnp.ndarray],
):
    scene = composite(
        raw["sigma"],
        raw["rgb"],
        z_vals,
        key=keys["noise"],
        noise_std=settings.noise_std,
        last_delta_inf=True,
        white_back=settings.white_back,
    )
    results[f"weights_{typ}"] = scene.weights
    results[f"opacity_{typ}"] = scene.opacity
    results[f"z_vals_{typ}"] = z_vals
    results[f"rgb_{typ}"] = scene.rgb
    results[f"depth_{typ}"] = scene.depth

    if settings.forward_instance:
        inst = composite_instance(
            raw["inst_sigma"],
            raw["inst_rgb"],
            z_vals,
            scene.depth,
            key=keys["noise_inst"],
            noise_std=settings.noise_std,
            frustum_bound_th=settings.frustum_bound_th,
            pass_through_mask=pass_through_mask,
            apply_occlusion=not settings.is_eval,
        )
        results[f"rgb_instance_{typ}"] = inst.rgb
        results[f"depth_instance_{typ}"] = inst.depth
        results[f"opacity_instance_{typ}"] = inst.opacity
        if settings.rays_in_bbox:  # pdf sampling follows the object (rendering.py:228-229)
            results[f"weights_{typ}"] = inst.weights


def render_rays_fused_eval(
    params: Dict[str, Any],
    rays: jnp.ndarray,
    settings: RenderSettings,
    voxel_ctx: VoxelCtx = None,
    embedding_instance: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Deterministic eval render with BOTH passes fully fused (MLP +
    compositing in VMEM; see ops/pallas_mlp.fused_render_tiles). Emits only
    the final-typ image maps — the shape of results the eval renderer
    actually consumes. Requires perturb=0/noise_std=0 (eval settings)."""
    from ..ops.pallas_mlp import fused_coarse_weights, fused_render_tiles

    if settings.perturb != 0 or settings.noise_std != 0:
        raise ValueError("fused render is the deterministic eval path")
    if settings.rays_in_bbox:
        raise ValueError(
            "single-program fused eval derives the fine pdf from SCENE "
            "weights; rays_in_bbox (instance-weight pdf, reference "
            "rendering.py:228-229) routes through make_fused_eval_stages "
            "or the unfused render path"
        )
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    n = rays.shape[0]

    z_vals = stratified_sample(None, near, far, settings.N_samples,
                               settings.use_disp, 0.0)
    dir_pe = freq_encode(rays_d, settings.mlp.N_freq_dir)

    def lookup_vox(xyz):
        return _lookup_voxel_raw(settings, voxel_ctx, xyz)

    xyz_c = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    kdtype = jnp.dtype(settings.pallas_dtype).type
    if settings.N_importance > 0:
        # only the pdf weights survive the coarse pass (final-typ maps only
        # are emitted) — run the sigma-only kernel: scene trunk + density
        # head, no rgb/dir heads, no instance branch
        coarse_weights = fused_coarse_weights(
            params["coarse"], settings.mlp, xyz_c, z_vals,
            voxel_raw=lookup_vox(xyz_c), dtype=kdtype, interpret=interpret,
            mesh=settings.shard_mesh,
        )
        typ = "coarse"
        out = None
        z_final = z_vals
    else:
        coarse = fused_render_tiles(
            params["coarse"], settings.mlp, xyz_c, z_vals, dir_pe,
            obj_codes=embedding_instance, voxel_raw=lookup_vox(xyz_c),
            forward_instance=settings.forward_instance,
            want_weights=False,
            white_back=settings.white_back, dtype=kdtype, interpret=interpret,
            mesh=settings.shard_mesh,
        )
        typ = "coarse"
        out = coarse
        z_final = z_vals

    if settings.N_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(
            None, z_mid, coarse_weights[:, 1:-1], settings.N_importance,
            det=True,
        )
        z_final = merge_z_vals(z_vals, z_fine)
        xyz_f = rays_o[:, None, :] + rays_d[:, None, :] * z_final[..., None]
        out = fused_render_tiles(
            params["fine"], settings.mlp, xyz_f, z_final, dir_pe,
            obj_codes=embedding_instance, voxel_raw=lookup_vox(xyz_f),
            forward_instance=settings.forward_instance,
            want_weights=False, white_back=settings.white_back,
            dtype=kdtype, interpret=interpret,
            mesh=settings.shard_mesh,
        )
        typ = "fine"

    results = {
        f"rgb_{typ}": out["rgb"],
        f"depth_{typ}": out["depth"],
        f"opacity_{typ}": out["opacity"],
    }
    if settings.forward_instance:
        results[f"rgb_instance_{typ}"] = out["rgb_instance"]
        results[f"depth_instance_{typ}"] = out["depth_instance"]
        results[f"opacity_instance_{typ}"] = out["opacity_instance"]
    return results


def make_fused_eval_stages(settings: RenderSettings, voxel_static=None):
    """The eval chunk renderer as SEPARATE jitted programs: Pallas kernels
    isolated from every other XLA op.

    Measured on v5e: XLA ops sharing a program with a large-VMEM Pallas
    call run far slower than standalone — a corner-table row gather 2-4×
    (71 → 32 ms per 7680-ray voxel chunk when split out), and even the
    classical pdf/merge glue costs ~3 ms/chunk of the same tax (388k →
    454k rays/s at 640×480 when split). optimization_barrier does not
    help, and the kernel's vmem_limit has no effect (swept 24-100 MB).
    So: kernel programs contain ONLY the Pallas call (+ the trivial dir-PE
    matmul); sampling glue and voxel gathers live in kernel-free programs.
    Host dispatch (~1 ms/program, 4/chunk) overlaps device work in the
    async chunk pipeline.

    rays_in_bbox configs (toy_desk use_bbox) take the instance-weight pdf
    (reference rendering.py:228-229): the coarse pass runs the FULL fused
    kernel (both branches) and the kernel-free glue reproduces
    `_composite_pass` on its raw outputs — bit-identical weights routing,
    same program count per chunk.

    Returns render_chunk(params, rays, codes, voxel_topo, ct) -> final-typ
    maps (same contract as render_rays_fused_eval). For the classical path
    pass voxel_static=None and voxel_topo=ct=None at call time.
    """
    from ..models.voxel_grid import voxel_lookup_dense
    from ..ops.pallas_mlp import (
        fused_coarse_weights, fused_mlp_eval, fused_render_tiles,
    )

    if settings.perturb != 0 or settings.noise_std != 0:
        raise ValueError(
            "fused render is the deterministic eval path (perturb=0, "
            "noise_std=0)"
        )
    # instance-weight pdf needs an instance branch; without one the pdf is
    # scene weights and the plain sigma-only coarse stage already matches
    bbox_pdf = settings.rays_in_bbox and settings.forward_instance
    mlp = settings.mlp
    kdtype = jnp.dtype(settings.pallas_dtype).type
    lowp = settings.pallas_dtype == "bfloat16"
    use_voxel = voxel_static is not None

    def lookup(voxel_topo, ct, xyz):
        if not use_voxel:
            return None
        raw, _ = voxel_lookup_dense(
            None, voxel_topo, voxel_static, xyz.reshape(-1, 3), lowp=lowp,
            ct=ct,
        )
        return raw.reshape(xyz.shape[0], xyz.shape[1], -1)

    @jax.jit
    def stage_prep(rays, voxel_topo, ct):
        near, far = rays[:, 6:7], rays[:, 7:8]
        z_vals = stratified_sample(None, near, far, settings.N_samples,
                                   settings.use_disp, 0.0)
        xyz = rays[:, None, 0:3] + rays[:, None, 3:6] * z_vals[..., None]
        return z_vals, xyz, lookup(voxel_topo, ct, xyz)

    @jax.jit
    def stage_coarse_kernel(coarse_params, z_vals, xyz_c, vox_c):
        return fused_coarse_weights(
            coarse_params, mlp, xyz_c, z_vals, voxel_raw=vox_c,
            dtype=kdtype, interpret=settings.pallas_interpret,
            mesh=settings.shard_mesh,
        )

    @jax.jit
    def stage_glue(rays, z_vals, weights, voxel_topo, ct):
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(None, z_mid, weights[:, 1:-1],
                            settings.N_importance, det=True)
        z_all = merge_z_vals(z_vals, z_fine)
        xyz_f = rays[:, None, 0:3] + rays[:, None, 3:6] * z_all[..., None]
        return z_all, xyz_f, lookup(voxel_topo, ct, xyz_f)

    @jax.jit
    def stage_coarse_kernel_bbox(coarse_params, rays, z_vals, xyz_c, vox_c,
                                 codes):
        # rays_in_bbox coarse pass: BOTH branches (the pdf follows the
        # object, rendering.py:228-229), raw per-sample outputs to the glue
        dir_pe = freq_encode(rays[:, 3:6], mlp.N_freq_dir)
        return fused_mlp_eval(
            coarse_params, mlp, xyz_c, dir_pe, obj_codes=codes,
            voxel_raw=vox_c, forward_instance=True, dtype=kdtype,
            interpret=settings.pallas_interpret, mesh=settings.shard_mesh,
        )

    @jax.jit
    def stage_glue_bbox(rays, z_vals, outs, voxel_topo, ct):
        # the exact _composite_pass weight routing on the kernel's raw
        # outputs: under rays_in_bbox `weights_coarse` IS the instance
        # compositing's weights
        sigma, rgb, isig, irgb = outs
        raw = {"sigma": sigma, "rgb": rgb, "inst_sigma": isig,
               "inst_rgb": irgb}
        results: Dict[str, jnp.ndarray] = {}
        _composite_pass(results, settings, "coarse", raw, z_vals,
                        {"noise": None, "noise_inst": None}, None)
        return stage_glue(rays, z_vals, results["weights_coarse"],
                          voxel_topo, ct)

    @jax.jit
    def stage_render_kernel(mlp_params, rays, z, xyz, vox, codes):
        dir_pe = freq_encode(rays[:, 3:6], mlp.N_freq_dir)
        return fused_render_tiles(
            mlp_params, mlp, xyz, z, dir_pe, obj_codes=codes,
            voxel_raw=vox, forward_instance=settings.forward_instance,
            want_weights=False, white_back=settings.white_back,
            dtype=kdtype, interpret=settings.pallas_interpret,
            mesh=settings.shard_mesh,
        )

    def render_chunk(params, rays, codes, voxel_topo=None, ct=None):
        z_vals, xyz_c, vox_c = stage_prep(rays, voxel_topo, ct)
        if settings.N_importance > 0:
            if bbox_pdf:
                outs = stage_coarse_kernel_bbox(
                    params["coarse"], rays, z_vals, xyz_c, vox_c, codes
                )
                z_all, xyz_f, vox_f = stage_glue_bbox(rays, z_vals, outs,
                                                      voxel_topo, ct)
            else:
                weights = stage_coarse_kernel(params["coarse"], z_vals,
                                              xyz_c, vox_c)
                z_all, xyz_f, vox_f = stage_glue(rays, z_vals, weights,
                                                 voxel_topo, ct)
            out = stage_render_kernel(params["fine"], rays, z_all, xyz_f,
                                      vox_f, codes)
            typ = "fine"
        else:
            out = stage_render_kernel(params["coarse"], rays, z_vals, xyz_c,
                                      vox_c, codes)
            typ = "coarse"
        results = {
            f"rgb_{typ}": out["rgb"],
            f"depth_{typ}": out["depth"],
            f"opacity_{typ}": out["opacity"],
        }
        if settings.forward_instance:
            results[f"rgb_instance_{typ}"] = out["rgb_instance"]
            results[f"depth_instance_{typ}"] = out["depth_instance"]
            results[f"opacity_instance_{typ}"] = out["opacity_instance"]
        return results

    return render_chunk


def render_rays(
    params: Dict[str, Any],
    rays: jnp.ndarray,
    key: jnp.ndarray,
    settings: RenderSettings,
    voxel_ctx: VoxelCtx = None,
    embedding_instance: Optional[jnp.ndarray] = None,
    pass_through_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays.

    rays: (N, 8) = [o(3), d(3), near, far]  (generic_dataset.py:447 layout).
    params: {"coarse": mlp_params, "fine": mlp_params, ...}.
    voxel_ctx: (features, topology, static) for the sparse-voxel embedding,
    or None for the classical PE path.
    Returns the reference's result-key schema (`rgb_fine`, `opacity_instance_
    coarse`, ...) so losses/metrics/visualizers are drop-in.
    """
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]

    k_perturb, k_nc, k_nic, k_pdf, k_nf, k_nif = jax.random.split(key, 6)

    z_vals = stratified_sample(
        k_perturb, near, far, settings.N_samples, settings.use_disp, settings.perturb
    )
    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    dir_embedded = freq_encode(rays_d, settings.mlp.N_freq_dir)

    eval_models = _eval_models
    if settings.remat:
        # trade FLOPs for memory: recompute the MLP evals in the backward
        # pass instead of keeping (rays·samples, W) activations alive
        eval_models = jax.checkpoint(
            _eval_models, static_argnums=(1, 3), prevent_cse=False
        )

    results: Dict[str, jnp.ndarray] = {}
    raw = eval_models(
        params, settings, voxel_ctx, "coarse", xyz_coarse, dir_embedded,
        embedding_instance,
    )
    _composite_pass(
        results, settings, "coarse", raw, z_vals,
        {"noise": k_nc, "noise_inst": k_nic}, pass_through_mask,
    )

    if settings.N_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(
            k_pdf,
            z_mid,
            results["weights_coarse"][:, 1:-1],
            settings.N_importance,
            det=(settings.perturb == 0),
        )
        z_all = merge_z_vals(z_vals, z_fine)
        xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
        raw_f = eval_models(
            params, settings, voxel_ctx, "fine", xyz_fine, dir_embedded,
            embedding_instance,
        )
        _composite_pass(
            results, settings, "fine", raw_f, z_all,
            {"noise": k_nf, "noise_inst": k_nif}, pass_through_mask,
        )

    return results
