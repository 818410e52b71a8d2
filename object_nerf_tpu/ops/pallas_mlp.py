"""Fused two-branch ObjectNeRF MLP evaluation as a Pallas TPU kernel.

Why: the XLA path materializes every trunk layer's activations in HBM
((rays·samples, 256) f32 per layer — ~10 GB of traffic per 640×480 frame),
making the render memory-bound (measured: bf16 ≈ f32 and the instance
branch ~free ⇒ bandwidth-bound, not FLOP-bound). This kernel keeps the
whole pipeline — positional encoding, scene trunk, sigma/rgb heads, object
trunk + heads — resident in VMEM per ray tile.

Performance-critical layout decisions (measured on v5e):

* **PE as one matmul + one sin.** Building [x, sin(2^k x), cos(2^k x), ...]
  with 21 lane-level concats of 3-wide slices wastes the VPU (97% idle
  lanes) and dominated the first kernel version (~18 ms of a 25 ms call).
  Instead `pe_sin = sin(x @ S + phase)` where S stacks 2^k-scaled identity
  blocks and `phase` is π/2 on the cos columns — an MXU op plus a full-lane
  transcendental. The input pieces ([x, x_sin] / the voxel features and
  their sins) are then concatenated ONCE per branch in bf16 — the
  reference feature layout *is* that concatenation — and every consuming
  trunk layer runs a single matmul against the unsplit weight (measured: a
  sum of small-K piece matmuls is ~40% slower per consuming layer).
* **Two interleaved row-halves.** The trunk's serial layer chain leaves the
  MXU waiting on each 256×256 matmul's latency (ablation: deleting the
  whole bias+lrelu epilogue changes nothing); evaluating two independent
  half-tiles layer-by-layer overlaps their chains for ~10%.
* tiles are R_RAYS whole rays × S samples; per-ray quantities (dir PE,
  object code, raw voxel features) stream as (R_RAYS, C) blocks and
  broadcast across samples in-kernel;
* matmuls run in bf16 (configurable) with f32 accumulation.

Math parity with models/mlp.py (itself parity with the reference
nerf_model.py:97-152): skip layers consume concat([input, h]) — realized as
split matmuls; LeakyReLU(0.01); sigmoid rgb; no activation on `final`;
object branch input [emb_xyz, (obj_voxel,) obj_code]. PE channel order
([x, sin f0 x, cos f0 x, sin f1 x, ...], models/embedding.py) is preserved
by the weight-splitting maps, so converted PyTorch checkpoints work
unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import ObjectNeRFConfig, LEAKY_SLOPE


# ---------------------------------------------------------------------------
# PE-as-matmul construction (host-side constants)
# ---------------------------------------------------------------------------


TWO_PI = 2.0 * np.pi


def pe_sin_matrix(
    c_in: int, n_freqs: int, turns: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """(S, phase): sin(x @ S + phase) == the sin/cos tail of the PE.

    S: (c_in, 2*n_freqs*c_in); columns ordered [sin f0 (c_in), cos f0 (c_in),
    sin f1, ...] to match models/embedding.py. cos(t) = sin(t + π/2).

    turns=True prescales S and phase by 1/(2π) so the pre-activation is in
    TURNS and the kernel evaluates `_sin_turns` (round-reduce + polynomial)
    instead of Mosaic's ~5× costlier builtin sin — the bf16 fast path
    (measured: the builtin sin was the entire voxel-PE overhead; the
    matmuls are nearly free).
    """
    cols = 2 * n_freqs * c_in
    S = np.zeros((c_in, cols), np.float32)
    phase = np.zeros((1, cols), np.float32)
    quarter = 0.25 if turns else np.pi / 2
    for k in range(n_freqs):
        f = 2.0**k / (TWO_PI if turns else 1.0)
        base = 2 * k * c_in
        for c in range(c_in):
            S[c, base + c] = f  # sin block
            S[c, base + c_in + c] = f  # cos block
            phase[0, base + c_in + c] = quarter
    return S, phase


def pe_uses_turns(dtype) -> bool:
    """Poly-sin PE is the bf16 fast path: its ~1e-5 abs error (reduction
    rounding at the highest 2^9 frequency dominates; the polynomial itself
    is ~1e-7) sits far below the bf16 quantization the activations get
    immediately after. f32 kernels keep the exact builtin sin so interpret-
    mode parity tests stay bit-faithful to the XLA path."""
    return jnp.dtype(dtype) == jnp.bfloat16


def _sin_turns(u):
    """sin(2π·u): one round+sub range reduction (u already in turns — the
    1/(2π) lives in the prescaled PE matrix) + degree-11 odd minimax
    polynomial on [-0.5, 0.5], max abs error 9.7e-8."""
    z = u - jnp.round(u)
    w = z * z
    p = jnp.float32(-12.27205003)
    p = p * w + 41.20590088
    p = p * w - 76.58021788
    p = p * w + 81.59619567
    p = p * w - 41.34142188
    p = p * w + 6.28318282
    return p * z


def _cos_turns(u):
    """cos(2π·u) = sin(2π·(u + 1/4))."""
    return _sin_turns(u + 0.25)


def _split_rows(w: jnp.ndarray, sizes: Sequence[int]) -> List[jnp.ndarray]:
    """Split a weight matrix along input-rows into aligned pieces."""
    out, ofs = [], 0
    for s in sizes:
        out.append(w[ofs : ofs + s])
        ofs += s
    assert ofs == w.shape[0], (ofs, w.shape)
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _lrelu(x):
    # max(x, slope·x) ≡ LeakyReLU for 0<slope<1 — one mul+max on the VPU
    # instead of mul+compare+select (the kernel is VPU-bound between matmuls)
    return jnp.maximum(x, LEAKY_SLOPE * x)


def _dot(a, w, dt):
    return jax.lax.dot_general(
        a.astype(dt), w.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _broadcast_rows(per_ray, s: int):
    r, c = per_ray.shape
    return jnp.broadcast_to(per_ray[:, None, :], (r, s, c)).reshape(r * s, c)


def _eval_branches(
    data_refs,
    w,
    cfg: ObjectNeRFConfig,
    n_samples: int,
    use_voxel: bool,
    forward_instance: bool,
    dt,
    compute_scene: bool = True,
    sigma_only: bool = False,
):
    """Shared branch evaluation: returns (sigma, rgb, i_sigma, i_rgb) as
    (RS, 1)/(RS, 3) arrays (instance outputs None when disabled; scene
    outputs None when compute_scene=False — the editable renderer evaluates
    objects through the instance branch alone, multi_rendering.py:63-68).
    sigma_only skips the rgb heads entirely (no dir operands): the coarse
    eval pass only needs scene density for the importance pdf, and the
    mesh-extraction sigma grid needs scene OR instance density. In
    sigma-only mode with forward_instance the code ref rides LAST in
    data_refs (layout: xyz[, voxel_raw][, codes])."""
    if sigma_only:
        xyz_ref, dir_ref = data_refs[0], None
        code_ref = data_refs[-1] if forward_instance else None
    else:
        xyz_ref, dir_ref, code_ref = data_refs[:3]

    xyz = xyz_ref[:]  # (RS, 3)
    rows = xyz.shape[0]
    # Interleave two independent row-halves through every layer: the trunk is
    # MXU-latency-bound on its serial layer chain (measured: deleting the
    # whole bias+lrelu epilogue changes nothing, but two parallel half-chains
    # run ~10% faster — Mosaic overlaps the halves' matmuls/epilogues).
    n_half = 2 if (rows % 16 == 0 and rows >= 512) else 1
    blk = rows // n_half

    def halves(x):
        return [x[k * blk : (k + 1) * blk] for k in range(n_half)]

    sinf = _sin_turns if pe_uses_turns(dt) else jnp.sin

    def pe(x, sname, pname):
        return sinf(_dot(x, w[sname], jnp.float32) + w[pname])

    xyz_h = halves(xyz)
    xyz_sin_h = [pe(x, "pe_xyz_S", "pe_xyz_phase") for x in xyz_h]

    # scene-branch input pieces, ordered as the reference feature layout:
    # voxel path: [vox_id(16), vox_sin(192), x(3), x_sin(60)]
    # classical:  [x(3), x_sin(60)]
    ivox_h = ivox_sin_h = None
    if use_voxel:
        raw = data_refs[1 if sigma_only else 3][:]  # (RS, C_vox)
        svox_h = halves(raw[:, : cfg.N_scn_voxel_size])
        svox_sin_h = [pe(x, "pe_svox_S", "pe_svox_phase") for x in svox_h]
        if forward_instance:
            ivox_h = halves(raw[:, cfg.N_scn_voxel_size :])
            ivox_sin_h = [pe(x, "pe_ivox_S", "pe_ivox_phase") for x in ivox_h]
        feat_h = [
            [svox_h[k], svox_sin_h[k], xyz_h[k], xyz_sin_h[k]]
            for k in range(n_half)
        ]
    else:
        feat_h = [[xyz_h[k], xyz_sin_h[k]] for k in range(n_half)]

    dir_pe_h = None
    if not sigma_only:
        dir_pe_h = halves(_broadcast_rows(dir_ref[:], n_samples))  # (RS, C_dir)

    def run_branch(tag, depth, skips, extra_h):
        # concat the input pieces once (bf16): the reference feature layout
        # IS this concatenation, so cat @ w_full ≡ the sum of piece matmuls
        # — but one K=271 matmul beats 4 small-K matmuls by ~40% (measured)
        cat_h = [
            jnp.concatenate(
                [p.astype(dt) for p in
                 (feat_h[k] + extra_h[k] if extra_h else feat_h[k])],
                axis=-1,
            )
            for k in range(n_half)
        ]
        hs = [None] * n_half
        for i in range(depth):
            if i == 0:
                accs = [_dot(cat_h[k], w[f"{tag}_trunk_{i}_w"], dt)
                        for k in range(n_half)]
            elif i in skips:
                accs = [
                    _dot(cat_h[k], w[f"{tag}_trunk_{i}_w"], dt)
                    + _dot(hs[k], w[f"{tag}_trunk_{i}_wh"], dt)
                    for k in range(n_half)
                ]
            else:
                accs = [_dot(hs[k], w[f"{tag}_trunk_{i}_w"], dt)
                        for k in range(n_half)]
            # activations carried at matmul precision: they re-enter the MXU
            # as `dt` anyway, and this halves live VMEM in bf16 mode
            # (measured: a bf16 epilogue is NOT faster — VPU rate is
            # dtype-independent here — so keep the f32 bias+lrelu)
            hs = [_lrelu(a + w[f"{tag}_trunk_{i}_b"]).astype(dt) for a in accs]
        sigma_h = [_dot(h, w[f"{tag}_sigma_w"], dt) + w[f"{tag}_sigma_b"]
                   for h in hs]
        if sigma_only:
            return jnp.concatenate(sigma_h, axis=0), None
        rgb_h = []
        for k in range(n_half):
            hf = (_dot(hs[k], w[f"{tag}_final_w"], dt)
                  + w[f"{tag}_final_b"]).astype(dt)
            d_enc = _lrelu(
                _dot(hf, w[f"{tag}_dir_wh"], dt)
                + _dot(dir_pe_h[k], w[f"{tag}_dir_wd"], dt)
                + w[f"{tag}_dir_b"]
            ).astype(dt)
            rgb_h.append(
                jax.nn.sigmoid(
                    _dot(d_enc, w[f"{tag}_rgb_w"], dt) + w[f"{tag}_rgb_b"]
                )
            )
        return (jnp.concatenate(sigma_h, axis=0),
                jnp.concatenate(rgb_h, axis=0))

    sigma = rgb = i_sigma = i_rgb = None
    if compute_scene:
        sigma, rgb = run_branch("s", cfg.D, cfg.skips, None)
    if forward_instance:
        codes_h = halves(_broadcast_rows(code_ref[:], n_samples))
        extra_h = (
            [[ivox_h[k], ivox_sin_h[k], codes_h[k]] for k in range(n_half)]
            if use_voxel
            else [[codes_h[k]] for k in range(n_half)]
        )
        i_sigma, i_rgb = run_branch("o", cfg.inst_D, cfg.inst_skips, extra_h)
    return sigma, rgb, i_sigma, i_rgb


def _mlp_kernel(
    *refs,
    cfg: ObjectNeRFConfig,
    n_samples: int,
    names: Tuple[str, ...],
    use_voxel: bool,
    forward_instance: bool,
    compute_scene: bool,
    dtype,
):
    n_data = 4 if use_voxel else 3
    data_refs = refs[:n_data]
    w = {name: ref[:] for name, ref in zip(names, refs[n_data:-1])}
    out_ref = refs[-1]

    sigma, rgb, i_sigma, i_rgb = _eval_branches(
        data_refs, w, cfg, n_samples, use_voxel, forward_instance, dtype,
        compute_scene=compute_scene,
    )
    rows = out_ref.shape[0]
    if sigma is None:
        sigma = jnp.zeros((rows, 1), jnp.float32)
        rgb = jnp.zeros((rows, 3), jnp.float32)
    if i_sigma is None:
        i_sigma = jnp.zeros((rows, 1), jnp.float32)
        i_rgb = jnp.zeros((rows, 3), jnp.float32)
    out_ref[:] = jnp.concatenate([sigma, rgb, i_sigma, i_rgb], axis=-1)


# ---------------------------------------------------------------------------
# Host-side weight splitting
# ---------------------------------------------------------------------------


def _piece_sizes(cfg: ObjectNeRFConfig, branch: str) -> List[int]:
    """Input-row split sizes per branch, matching the kernel's piece order."""
    xyz_sizes = (
        [cfg.N_scn_voxel_size, 2 * cfg.N_freq_voxel * cfg.N_scn_voxel_size, 3,
         2 * cfg.N_freq_xyz * 3]
        if cfg.use_voxel_embedding
        else [3, 2 * cfg.N_freq_xyz * 3]
    )
    if branch == "s":
        return xyz_sizes
    extra = (
        [cfg.N_obj_voxel_size, 2 * cfg.N_freq_voxel * cfg.N_obj_voxel_size,
         cfg.N_obj_code_length]
        if cfg.use_voxel_embedding
        else [cfg.N_obj_code_length]
    )
    return xyz_sizes + extra


def prepare_kernel_weights(
    mlp_params: Dict[str, Any],
    cfg: ObjectNeRFConfig,
    forward_instance: bool,
    sigma_only: bool = False,
    dtype=jnp.bfloat16,
) -> Tuple[Tuple[str, ...], List[jnp.ndarray]]:
    """Flatten + split one ObjectNeRF param pytree for the fused kernel.

    sigma_only keeps just the scene trunk + sigma head (coarse-pass pdf
    weights): the rgb/dir head weights and the instance branch never reach
    the kernel. `dtype` must match the kernel's matmul dtype: in bf16 mode
    the PE matrices are turns-prescaled for the poly-sin fast path
    (pe_uses_turns)."""
    names: List[str] = []
    arrays: List[jnp.ndarray] = []
    turns = pe_uses_turns(dtype)

    def add(name, arr):
        names.append(name)
        arrays.append(arr)

    S, phase = pe_sin_matrix(3, cfg.N_freq_xyz, turns=turns)
    add("pe_xyz_S", jnp.asarray(S))
    add("pe_xyz_phase", jnp.asarray(phase))
    if cfg.use_voxel_embedding:
        S, phase = pe_sin_matrix(cfg.N_scn_voxel_size, cfg.N_freq_voxel,
                                 turns=turns)
        add("pe_svox_S", jnp.asarray(S))
        add("pe_svox_phase", jnp.asarray(phase))
        if forward_instance:
            S, phase = pe_sin_matrix(cfg.N_obj_voxel_size, cfg.N_freq_voxel,
                                     turns=turns)
            add("pe_ivox_S", jnp.asarray(S))
            add("pe_ivox_phase", jnp.asarray(phase))

    def add_branch(tag, branch, depth, width, skips):
        sizes = _piece_sizes(cfg, tag)
        c_in = sum(sizes)
        for i, layer in enumerate(branch["trunk"]):
            wi, bi = layer["w"], layer["b"].reshape(1, -1)
            if i in skips and i > 0:
                # the feature block stays whole: the kernel concatenates its
                # input pieces once and runs ONE matmul per consuming layer
                # (measured: a sum of small-K piece matmuls is ~40% slower
                # per layer than the single concat matmul)
                wf, wh = _split_rows(wi, [c_in, width])
                add(f"{tag}_trunk_{i}_w", wf)
                add(f"{tag}_trunk_{i}_wh", wh)
            else:
                add(f"{tag}_trunk_{i}_w", wi)
            add(f"{tag}_trunk_{i}_b", bi)
        add(f"{tag}_sigma_w", branch["sigma"]["w"])
        add(f"{tag}_sigma_b", branch["sigma"]["b"].reshape(1, -1))
        if sigma_only:
            return
        add(f"{tag}_final_w", branch["final"]["w"])
        add(f"{tag}_final_b", branch["final"]["b"].reshape(1, -1))
        wh, wd = _split_rows(branch["dir"]["w"], [width, cfg.in_channels_dir])
        add(f"{tag}_dir_wh", wh)
        add(f"{tag}_dir_wd", wd)
        add(f"{tag}_dir_b", branch["dir"]["b"].reshape(1, -1))
        add(f"{tag}_rgb_w", branch["rgb"]["w"])
        add(f"{tag}_rgb_b", branch["rgb"]["b"].reshape(1, -1))

    add_branch("s", mlp_params["scene"], cfg.D, cfg.W, cfg.skips)
    if forward_instance:
        add_branch("o", mlp_params["object"], cfg.inst_D, cfg.inst_W,
                   cfg.inst_skips)
    return tuple(names), arrays


def _ray_tile(n_rays: int, s: int, rows_budget: int, *,
              interpret: bool = False, exact: Optional[int] = None) -> int:
    """Rays per tile: the largest r ≤ rows_budget // s that divides n_rays
    AND keeps the per-ray (r, C) blocks sublane-aligned — Mosaic requires
    the second-minor block dim divisible by 8 unless the block spans the
    whole array. (Found the hard way: a 7680-ray voxel chunk yielded
    r = 1536 // 128 = 12, which divides 7680 but is not a multiple of 8 —
    lowering error.)

    `exact` (interpret mode only) honors a caller-requested tile that
    divides n_rays even when unaligned — interpreter kernels have no
    sublane constraint, and CPU tests use it to exercise the multi-tile
    grid path at tiny shapes.

    When no aligned divisor fits the budget: clamp to the minimum aligned
    tile (r=8) if n_rays allows, fall back to one all-rays tile for tiny
    unaligned shapes (interpret-mode tests), and otherwise REFUSE — an
    n_rays·s-row tile would silently blow the ~16 MB/core VMEM budget the
    rows_budget exists to respect."""
    if exact is not None and interpret and n_rays % exact == 0:
        return exact
    r = min(max(1, rows_budget // s), n_rays)
    if r < n_rays:
        r = (r // 8) * 8
        while r >= 8 and n_rays % r:
            r -= 8
        if r < 8:
            if n_rays % 8 == 0:
                # smallest aligned tile (8·s rows may exceed rows_budget —
                # bounded and loud is better than an n_rays·s-row tile)
                r = 8
            elif interpret or n_rays * s <= max(rows_budget, 8 * s):
                r = n_rays  # tiny CPU-test shapes
            else:
                raise ValueError(
                    f"no 8-aligned ray tile divides n_rays={n_rays} under "
                    f"rows_budget={rows_budget} (S={s}); pad the ray count "
                    f"to a multiple of 8"
                )
    return r


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def shard_over_rays(mesh, n_rays: int) -> bool:
    """Should a kernel launch shard its leading (ray) axis over `mesh`?

    GSPMD has no partitioning rule for `tpu_custom_call`, so a Pallas call
    inside a jitted program would otherwise run replicated on every chip of
    a >1-device mesh. Every launcher in this module therefore wraps itself
    in `jax.shard_map` over the mesh's (single) axis when given one — rays
    are embarrassingly parallel, parameters replicate, and the backward
    kernel psums its weight grads (the reference's DDP all-reduce,
    train.py:261-262). The surrounding glue programs stay under plain
    GSPMD, which partitions them bit-exactly."""
    return (
        mesh is not None
        and getattr(mesh, "size", 1) > 1
        and n_rays % mesh.size == 0
    )


def _ray_sharded(fn, mesh, *, n_replicated: int, n_sharded: int, out_specs):
    """shard_map `fn(replicated..., sharded...)` over the mesh's ray axis.

    `out_specs` is the output pytree with bool leaves: True = ray-sharded,
    False = replicated (e.g. psum'd weight grads)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    specs = (P(),) * n_replicated + (P(axis),) * n_sharded
    out = jax.tree_util.tree_map(
        lambda shard: P(axis) if shard else P(), out_specs,
        is_leaf=lambda x: isinstance(x, bool),
    )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=specs, out_specs=out, check_vma=False
    )


def fused_mlp_eval(
    mlp_params: Dict[str, Any],
    cfg: ObjectNeRFConfig,
    xyz: jnp.ndarray,  # (n_rays, S, 3)
    dir_pe: jnp.ndarray,  # (n_rays, C_dir) — frequency-encoded directions
    obj_codes: Optional[jnp.ndarray] = None,  # (n_rays, C_code)
    voxel_raw: Optional[jnp.ndarray] = None,  # (n_rays, S, C_vox)
    forward_instance: bool = True,
    compute_scene: bool = True,
    rays_per_tile: Optional[int] = None,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    rows_budget: int = 2048,
    vmem_limit_mb: int = 100,
    mesh=None,
):
    """Evaluate both branches over all rays×samples in one fused kernel.

    Tile size defaults to ~rows_budget rows (rays_per_tile = rows_budget // S)
    — measured sweet spot on v5e: big enough to fill the MXU, small enough
    that the f32 activations (rows × W) stay within the VMEM budget.

    `mesh`: shard the ray axis over a >1-device mesh via shard_map
    (see `shard_over_rays`); params replicate, outputs stay ray-sharded.

    Returns (sigma (n_rays,S), rgb (n_rays,S,3), inst_sigma, inst_rgb);
    instance outputs are zeros when forward_instance=False.
    """
    n_rays, s, _ = xyz.shape
    use_voxel = cfg.use_voxel_embedding
    if use_voxel and voxel_raw is None:
        raise ValueError("voxel_raw required when cfg.use_voxel_embedding")

    if shard_over_rays(mesh, n_rays):
        local = functools.partial(
            fused_mlp_eval, cfg=cfg, forward_instance=forward_instance,
            compute_scene=compute_scene, rays_per_tile=rays_per_tile,
            dtype=dtype, interpret=interpret, rows_budget=rows_budget,
            vmem_limit_mb=vmem_limit_mb, mesh=None,
        )
        fn = _ray_sharded(
            lambda p, x, d, c, v: local(p, xyz=x, dir_pe=d, obj_codes=c,
                                        voxel_raw=v),
            mesh=mesh, n_replicated=1, n_sharded=4,
            out_specs=(True, True, True, True),
        )
        return fn(mlp_params, xyz, dir_pe, obj_codes, voxel_raw)

    if rays_per_tile is None:
        if use_voxel:
            # wider voxel inputs want smaller tiles (measured post-concat
            # refactor: 1536 ≈ 1024 < 2048)
            rows_budget = (3 * rows_budget) // 4
    else:
        rows_budget = rays_per_tile * s
    r = _ray_tile(n_rays, s, rows_budget, interpret=interpret,
                  exact=rays_per_tile)
    rows = r * s
    grid = (n_rays // r,)

    names, weight_arrays = prepare_kernel_weights(
        mlp_params, cfg, forward_instance, dtype=dtype
    )
    if obj_codes is None:
        obj_codes = jnp.zeros((n_rays, cfg.N_obj_code_length), xyz.dtype)

    inputs = [xyz.reshape(n_rays * s, 3), dir_pe, obj_codes]
    in_specs = [
        pl.BlockSpec((rows, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, dir_pe.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, obj_codes.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_voxel:
        vox_flat = voxel_raw.reshape(n_rays * s, -1)
        inputs.append(vox_flat)
        in_specs.append(
            pl.BlockSpec((rows, vox_flat.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    inputs.extend(weight_arrays)
    in_specs.extend(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_arrays)

    kernel = functools.partial(
        _mlp_kernel,
        cfg=cfg,
        n_samples=s,
        names=names,
        use_voxel=use_voxel,
        forward_instance=forward_instance,
        compute_scene=compute_scene,
        dtype=dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rays * s, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)

    out = out.reshape(n_rays, s, 8)
    return out[..., 0], out[..., 1:4], out[..., 4], out[..., 5:8]


# ---------------------------------------------------------------------------
# Fully-fused render tile: MLP + alpha compositing in one kernel
# ---------------------------------------------------------------------------


def _alphas_from_sig(sig, dl):
    """alpha = 1 - exp(-δ·relu(σ)) — σ arrives pre-noised on train paths."""
    return 1.0 - jnp.exp(-dl * jnp.maximum(sig, 0.0))


def _trans_from_alphas(alphas, r, s):
    """EXCLUSIVE transmittance T_i = Π_{j<i}(1-a_j+ε) over (r, s) lanes.
    Hillis-Steele inclusive cumprod (jnp.cumprod is not lowerable on TPU
    Pallas) then a one-lane shift. ε=1e-10 matches ops/compositing.py."""
    x = 1.0 - alphas + 1e-10
    k = 1
    while k < s:
        pad = jnp.ones((r, k), x.dtype)
        x = x * jnp.concatenate([pad, x[:, :-k]], axis=-1)
        k *= 2
    return jnp.concatenate(
        [jnp.ones((r, 1), jnp.float32), x[:, :-1]], axis=-1
    )


def _composite_weights(sig, dl, r, s):
    """Alpha-compositing weights over (r, s) lane tiles — the ONE shared
    implementation behind _render_kernel and _weights_kernel (their pdf
    parity depends on it). Math matches ops/compositing.py."""
    alphas = _alphas_from_sig(sig, dl)
    return alphas * _trans_from_alphas(alphas, r, s)


def _render_kernel(
    *refs,
    cfg: ObjectNeRFConfig,
    n_samples: int,
    n_rays_tile: int,
    names: Tuple[str, ...],
    use_voxel: bool,
    forward_instance: bool,
    last_delta_inf: bool,
    want_weights: bool,
    dtype,
):
    n_mlp = 4 if use_voxel else 3
    n_data = n_mlp + 1  # + z
    data_refs = refs[:n_data]
    z_ref = data_refs[n_mlp]
    n_out = 2 if want_weights else 1
    w = {name: ref[:] for name, ref in zip(names, refs[n_data:-n_out])}
    maps_ref = refs[-n_out]
    weights_ref = refs[-1] if want_weights else None

    sigma, rgb, i_sigma, i_rgb = _eval_branches(
        data_refs[:n_mlp], w, cfg, n_samples, use_voxel,
        forward_instance, dtype,
    )

    r, s = n_rays_tile, n_samples
    z = z_ref[:]  # (R, S)
    deltas = z[:, 1:] - z[:, :-1]
    last = jnp.full((r, 1), 1e10 if last_delta_inf else 0.0, jnp.float32)
    deltas_scene = jnp.concatenate([deltas, last], axis=-1)

    def maps_from(wts, rgb_flat):
        opacity = jnp.sum(wts, axis=-1, keepdims=True)
        depth = jnp.sum(wts * z, axis=-1, keepdims=True)
        chans = [
            jnp.sum(wts * rgb_flat[:, c].reshape(r, s), axis=-1, keepdims=True)
            for c in range(3)
        ]
        return jnp.concatenate(chans + [depth, opacity], axis=-1)  # (R, 5)

    sig_s = sigma[:, 0].reshape(r, s)
    scene_w = _composite_weights(sig_s, deltas_scene, r, s)
    scene_maps = maps_from(scene_w, rgb)
    if forward_instance:
        deltas_inst = jnp.concatenate(
            [deltas, jnp.zeros((r, 1), jnp.float32)], axis=-1
        )
        sig_i = i_sigma[:, 0].reshape(r, s)
        alphas_i = _alphas_from_sig(sig_i, deltas_inst)
        inst_w = alphas_i * _trans_from_alphas(alphas_i, r, s)
        inst_maps = maps_from(inst_w, i_rgb)
        # instance rgb is always white-backed (rendering.py:221-223)
        i_op = inst_maps[:, 4:5]
        inst_maps = jnp.concatenate(
            [inst_maps[:, 0:3] + (1.0 - i_op), inst_maps[:, 3:4], i_op], axis=-1
        )
        pad = jnp.zeros((r, 6), jnp.float32)
        maps_ref[:] = jnp.concatenate([scene_maps, inst_maps, pad], axis=-1)
    else:
        pad = jnp.zeros((r, 11), jnp.float32)
        maps_ref[:] = jnp.concatenate([scene_maps, pad], axis=-1)
    if want_weights:
        weights_ref[:] = scene_w


def fused_render_tiles(
    mlp_params: Dict[str, Any],
    cfg: ObjectNeRFConfig,
    xyz: jnp.ndarray,  # (n_rays, S, 3)
    z_vals: jnp.ndarray,  # (n_rays, S)
    dir_pe: jnp.ndarray,  # (n_rays, C_dir)
    obj_codes: Optional[jnp.ndarray] = None,
    voxel_raw: Optional[jnp.ndarray] = None,
    forward_instance: bool = True,
    last_delta_inf: bool = True,
    want_weights: bool = False,
    white_back: bool = False,
    rows_budget: int = 2048,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    vmem_limit_mb: int = 100,
    mesh=None,
):
    """One fused pass: PE → both MLP branches → alpha compositing, all in
    VMEM. HBM sees only per-ray inputs/outputs (plus xyz/voxel per sample) —
    the (rays·samples, 8) intermediate of `fused_mlp_eval` never exists.

    Deterministic eval semantics (perturb=0/noise=0 — the train step
    composites in XLA outside the kernel programs; train/split_step.py).

    `mesh`: shard the ray axis over a >1-device mesh (see shard_over_rays).

    Returns a dict: rgb (n,3), depth (n,), opacity (n,), and when
    forward_instance also rgb_instance/depth_instance/opacity_instance,
    plus weights (n, S) when want_weights (for the coarse→fine pdf).
    """
    n_rays, s, _ = xyz.shape
    use_voxel = cfg.use_voxel_embedding
    if use_voxel and voxel_raw is None:
        raise ValueError("voxel_raw required when cfg.use_voxel_embedding")

    if shard_over_rays(mesh, n_rays):
        local = functools.partial(
            fused_render_tiles, cfg=cfg, forward_instance=forward_instance,
            last_delta_inf=last_delta_inf, want_weights=want_weights,
            white_back=white_back, rows_budget=rows_budget, dtype=dtype,
            interpret=interpret, vmem_limit_mb=vmem_limit_mb, mesh=None,
        )
        fn = _ray_sharded(
            lambda p, x, z, d, c, v: local(p, xyz=x, z_vals=z, dir_pe=d,
                                           obj_codes=c, voxel_raw=v),
            mesh=mesh, n_replicated=1, n_sharded=5,
            out_specs=True,  # every output map is per-ray
        )
        return fn(mlp_params, xyz, z_vals, dir_pe, obj_codes, voxel_raw)

    r = _ray_tile(n_rays, s, rows_budget, interpret=interpret)
    rows = r * s
    grid = (n_rays // r,)

    names, weight_arrays = prepare_kernel_weights(
        mlp_params, cfg, forward_instance, dtype=dtype
    )
    if obj_codes is None:
        obj_codes = jnp.zeros((n_rays, cfg.N_obj_code_length), xyz.dtype)

    inputs = [xyz.reshape(n_rays * s, 3), dir_pe, obj_codes]
    in_specs = [
        pl.BlockSpec((rows, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, dir_pe.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, obj_codes.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_voxel:
        vox_flat = voxel_raw.reshape(n_rays * s, -1)
        inputs.append(vox_flat)
        in_specs.append(
            pl.BlockSpec((rows, vox_flat.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    inputs.append(z_vals)
    in_specs.append(
        pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    inputs.extend(weight_arrays)
    in_specs.extend(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_arrays)

    kernel = functools.partial(
        _render_kernel,
        cfg=cfg,
        n_samples=s,
        n_rays_tile=r,
        names=names,
        use_voxel=use_voxel,
        forward_instance=forward_instance,
        last_delta_inf=last_delta_inf,
        want_weights=want_weights,
        dtype=dtype,
    )

    out_shapes = [jax.ShapeDtypeStruct((n_rays, 16), jnp.float32)]
    out_specs = [
        pl.BlockSpec((r, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if want_weights:
        out_shapes.append(jax.ShapeDtypeStruct((n_rays, s), jnp.float32))
        out_specs.append(
            pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if want_weights else out_specs[0],
        out_shape=out_shapes if want_weights else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)

    maps = outs[0] if want_weights else outs
    rgb = maps[:, 0:3]
    opacity = maps[:, 4]
    if white_back:
        rgb = rgb + (1.0 - opacity[:, None])
    result = {"rgb": rgb, "depth": maps[:, 3], "opacity": opacity}
    if forward_instance:
        result.update(
            rgb_instance=maps[:, 5:8],
            depth_instance=maps[:, 8],
            opacity_instance=maps[:, 9],
        )
    if want_weights:
        result["weights"] = outs[1]
    return result


# ---------------------------------------------------------------------------
# Sigma-only coarse pass: scene density → compositing weights, nothing else
# ---------------------------------------------------------------------------


def _weights_kernel(
    *refs,
    cfg: ObjectNeRFConfig,
    n_samples: int,
    n_rays_tile: int,
    names: Tuple[str, ...],
    use_voxel: bool,
    last_delta_inf: bool,
    dtype,
):
    n_data = 3 if use_voxel else 2  # xyz(, voxel_raw), z_vals
    data_refs = refs[:n_data]
    z_ref = data_refs[-1]
    w = {name: ref[:] for name, ref in zip(names, refs[n_data:-1])}
    out_ref = refs[-1]

    sigma, _, _, _ = _eval_branches(
        data_refs[:-1], w, cfg, n_samples, use_voxel,
        forward_instance=False, dt=dtype, sigma_only=True,
    )

    r, s = n_rays_tile, n_samples
    z = z_ref[:]  # (R, S)
    deltas = z[:, 1:] - z[:, :-1]
    last = jnp.full((r, 1), 1e10 if last_delta_inf else 0.0, jnp.float32)
    dl = jnp.concatenate([deltas, last], axis=-1)
    out_ref[:] = _composite_weights(sigma[:, 0].reshape(r, s), dl, r, s)


def fused_coarse_weights(
    mlp_params: Dict[str, Any],
    cfg: ObjectNeRFConfig,
    xyz: jnp.ndarray,  # (n_rays, S, 3)
    z_vals: jnp.ndarray,  # (n_rays, S)
    voxel_raw: Optional[jnp.ndarray] = None,
    last_delta_inf: bool = True,
    rows_budget: int = 2048,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    vmem_limit_mb: int = 100,
    mesh=None,
) -> jnp.ndarray:
    """Coarse-pass pdf weights only: scene trunk + sigma head + compositing
    scan, fused in VMEM. The eval renderer discards every other coarse
    output (render paths emit final-typ maps only), so the coarse pass
    skips the rgb/dir heads and the whole instance branch — ~40% of the
    coarse FLOPs and all of its head weight traffic. Bit-matches the
    `weights` output of `fused_render_tiles` (same trunk math, same scan).

    `mesh`: shard the ray axis over a >1-device mesh (see shard_over_rays).

    Returns (n_rays, S) float32 weights.
    """
    n_rays, s, _ = xyz.shape
    use_voxel = cfg.use_voxel_embedding
    if use_voxel and voxel_raw is None:
        raise ValueError("voxel_raw required when cfg.use_voxel_embedding")

    if shard_over_rays(mesh, n_rays):
        local = functools.partial(
            fused_coarse_weights, cfg=cfg, last_delta_inf=last_delta_inf,
            rows_budget=rows_budget, dtype=dtype, interpret=interpret,
            vmem_limit_mb=vmem_limit_mb, mesh=None,
        )
        fn = _ray_sharded(
            lambda p, x, z, v: local(p, xyz=x, z_vals=z, voxel_raw=v),
            mesh=mesh, n_replicated=1, n_sharded=3, out_specs=True,
        )
        return fn(mlp_params, xyz, z_vals, voxel_raw)

    r = _ray_tile(n_rays, s, rows_budget, interpret=interpret)
    rows = r * s
    grid = (n_rays // r,)

    names, weight_arrays = prepare_kernel_weights(
        mlp_params, cfg, forward_instance=False, sigma_only=True,
        dtype=dtype,
    )

    inputs = [xyz.reshape(n_rays * s, 3)]
    in_specs = [
        pl.BlockSpec((rows, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if use_voxel:
        vox_flat = voxel_raw.reshape(n_rays * s, -1)
        inputs.append(vox_flat)
        in_specs.append(
            pl.BlockSpec((rows, vox_flat.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    inputs.append(z_vals)
    in_specs.append(
        pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    inputs.extend(weight_arrays)
    in_specs.extend(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_arrays)

    kernel = functools.partial(
        _weights_kernel,
        cfg=cfg,
        n_samples=s,
        n_rays_tile=r,
        names=names,
        use_voxel=use_voxel,
        last_delta_inf=last_delta_inf,
        dtype=dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rays, s), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)


# ---------------------------------------------------------------------------
# Point-wise sigma: the mesh-extraction density query through the fused trunk
# ---------------------------------------------------------------------------


def _sigma_kernel(
    *refs,
    cfg: ObjectNeRFConfig,
    n_samples: int,
    n_rays_tile: int,
    names: Tuple[str, ...],
    use_voxel: bool,
    forward_instance: bool,
    dtype,
):
    n_data = 1 + int(use_voxel) + int(forward_instance)
    data_refs = refs[:n_data]
    w = {name: ref[:] for name, ref in zip(names, refs[n_data:-1])}
    out_ref = refs[-1]

    sigma, _, i_sigma, _ = _eval_branches(
        data_refs, w, cfg, n_samples, use_voxel,
        forward_instance=forward_instance, dt=dtype,
        compute_scene=not forward_instance, sigma_only=True,
    )
    s = i_sigma if forward_instance else sigma  # (rows, 1)
    # lane-changing reshape (rows,1)→(r,s) must go through the [:, 0]
    # pattern (Mosaic "unsupported shape cast" otherwise — CLAUDE.md)
    out_ref[:] = s[:, 0].reshape(n_rays_tile, n_samples)


def fused_sigma_eval(
    mlp_params: Dict[str, Any],
    cfg: ObjectNeRFConfig,
    pts: jnp.ndarray,  # (N, 3) — N divisible by samples_per_row
    voxel_raw: Optional[jnp.ndarray] = None,  # (N, C_vox)
    obj_codes: Optional[jnp.ndarray] = None,  # (N // samples_per_row, C_code)
    branch: str = "scene",
    samples_per_row: int = 64,
    rows_budget: int = 2048,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    vmem_limit_mb: int = 100,
    mesh=None,
) -> jnp.ndarray:
    """Density of N arbitrary points through the fused sigma-only kernel —
    the mesh-extraction hot loop (reference tools/extract_mesh.py:78-111
    queries the fine model's sigma over a dense 512³ = 134M-point grid).

    Same trunk machinery as `fused_coarse_weights` (the eval coarse pass):
    points are tiled as (N/samples_per_row) pseudo-rays × samples_per_row
    samples so the existing block layout applies; no z/dir/rgb operands
    ever reach the kernel. branch='scene' evaluates the scene trunk +
    sigma head (obj_id 0); branch='instance' evaluates the OBJECT branch
    with per-row latent codes (obj_id > 0, one code per pseudo-row).

    `mesh`: shard the point axis over a >1-device mesh (shard_over_rays).

    Returns (N,) float32 sigma (pre-ReLU, the reference's raw head output).
    """
    n, three = pts.shape
    assert three == 3
    s = samples_per_row
    if n % s:
        raise ValueError(f"N={n} not divisible by samples_per_row={s}")
    n_rays = n // s
    use_voxel = cfg.use_voxel_embedding
    if use_voxel and voxel_raw is None:
        raise ValueError("voxel_raw required when cfg.use_voxel_embedding")
    forward_instance = branch == "instance"
    if forward_instance and obj_codes is None:
        raise ValueError("obj_codes required for branch='instance'")

    if shard_over_rays(mesh, n_rays):
        local = functools.partial(
            fused_sigma_eval, cfg=cfg, branch=branch,
            samples_per_row=s, rows_budget=rows_budget, dtype=dtype,
            interpret=interpret, vmem_limit_mb=vmem_limit_mb, mesh=None,
        )
        fn = _ray_sharded(
            lambda p, x, v, c: local(p, pts=x.reshape(-1, 3),
                                     voxel_raw=None if v is None
                                     else v.reshape(x.shape[0] * s, -1),
                                     obj_codes=c),
            mesh=mesh, n_replicated=1, n_sharded=3, out_specs=True,
        )
        vox_rows = (None if voxel_raw is None
                    else voxel_raw.reshape(n_rays, s, -1))
        return fn(mlp_params, pts.reshape(n_rays, s, 3), vox_rows,
                  obj_codes).reshape(-1)

    r = _ray_tile(n_rays, s, rows_budget, interpret=interpret)
    rows = r * s
    grid = (n_rays // r,)

    names, weight_arrays = prepare_kernel_weights(
        mlp_params, cfg, forward_instance=forward_instance, sigma_only=True,
        dtype=dtype,
    )

    inputs = [pts]
    in_specs = [
        pl.BlockSpec((rows, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if use_voxel:
        inputs.append(voxel_raw)
        in_specs.append(
            pl.BlockSpec((rows, voxel_raw.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    if forward_instance:
        inputs.append(obj_codes)
        in_specs.append(
            pl.BlockSpec((r, obj_codes.shape[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    inputs.extend(weight_arrays)
    in_specs.extend(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_arrays)

    kernel = functools.partial(
        _sigma_kernel,
        cfg=cfg,
        n_samples=s,
        n_rays_tile=r,
        names=names,
        use_voxel=use_voxel,
        forward_instance=forward_instance,
        dtype=dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rays, s), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    return out.reshape(-1)
