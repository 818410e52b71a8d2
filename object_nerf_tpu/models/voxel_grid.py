"""Sparse voxel feature grid with trilinear interpolation, pruning, subdivision.

Feature parity with the reference `EmbeddingVoxel`
(models/embedding_helper.py:77-479):

* Build: normalize a scene point cloud by (scene_center, scale_factor),
  quantize at voxel_size, mark occupancy, dilate with an all-ones 3D
  convolution of size `neighbor_marks`, and map occupied cells to rows of a
  fixed-capacity `(N_max_voxels, channels)` feature table
  (embedding_helper.py:86-200).
* Lookup: trilinear interpolation over the 8 neighbor corners via sparse
  gather; out-of-bounds or empty corners contribute zero; a point is invalid
  only when all 8 corners are empty (embedding_helper.py:354-394). Features
  split into scene (first C-8) and instance (last 8) channels, each
  frequency-encoded; the scene half is concatenated with the classical
  PE(xyz, 10) (embedding_helper.py:325-329, 404-409).
* Progressive training: `prune` drops voxels whose max alpha over 16³
  samples is below threshold (embedding_helper.py:202-245);
  `subdivide` halves the voxel size, spawns 8 children per voxel, and
  trilinearly resamples features into the new rows
  (embedding_helper.py:247-302).

TPU-first design:

* Topology (occupancy / idx map / voxel size) is a `VoxelTopology` pytree of
  device arrays with *static shapes per phase*; subdivision changes shapes
  and therefore triggers exactly one recompile (the reference pays a CUDA
  realloc at the same point).
* The dense idx map is flattened so corner lookups are single 1-D gathers;
  the feature fetch is one `(8·N, C)` row gather from the table — both lower
  to efficient TPU dynamic-gathers.
* The feature table is fixed capacity (`N_max_voxels`), so the trainable
  param never changes shape — optimizer state survives prune/subdivide.
* Pruning only *masks* (occupancy/idx updates); no shape change, no
  recompile.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .embedding import freq_encode

INSTANCE_FTR_C = 8  # instance channels at the tail of the table (embedding_helper.py:185)


class VoxelTopology(NamedTuple):
    """Non-trainable voxel-grid state (buffers in the reference)."""

    idx_map: jnp.ndarray  # (X*Y*Z,) int32 flattened; -1 = empty
    occupancy: jnp.ndarray  # (X*Y*Z,) bool
    voxel_size: jnp.ndarray  # () f32 — normalized units
    voxel_offset: jnp.ndarray  # (3,) f32 — -bounds_min
    n_occupied: jnp.ndarray  # () int32
    # inverse of idx_map: table row -> flat cell index (X*Y*Z = trash for
    # dead/unused rows). Drives the dense-scatter in the cell-table lookup.
    row_to_cell: jnp.ndarray  # (capacity,) int32


@dataclasses.dataclass(frozen=True)
class VoxelStatic:
    """Shape-defining metadata (a jit static argument)."""

    shape: Tuple[int, int, int]
    channels: int
    n_freq_voxel: int
    n_max_voxels: int

    @property
    def scene_channels(self) -> int:
        return self.channels - INSTANCE_FTR_C


# ---------------------------------------------------------------------------
# Build (host-side numpy; runs once at dataset setup)
# ---------------------------------------------------------------------------


def _row_to_cell_from_idx_map(idx_map: np.ndarray, capacity: int) -> np.ndarray:
    """Invert a dense cell->row idx map into row->flat-cell (host-side).

    Dead/unused rows map to the trash cell `n_cells` (one past the grid), so
    scattering `features[row]` into a `(n_cells + 1, C)` buffer is total.
    """
    idx = np.asarray(idx_map).reshape(-1)
    n_cells = idx.shape[0]
    rtc = np.full((capacity,), n_cells, np.int32)
    cells = np.flatnonzero(idx >= 0)
    rtc[idx[cells]] = cells.astype(np.int32)
    return rtc


def topology_from_dict(d, capacity: int = None) -> "VoxelTopology":
    """Rebuild a VoxelTopology from a checkpoint dict. `capacity` is the
    feature-table row count; row_to_cell is derived when absent (pre-round-2
    checkpoints lack it)."""
    d = {k: jnp.asarray(v) for k, v in d.items()}
    if "row_to_cell" not in d:
        idx = np.asarray(d["idx_map"])
        if capacity is None:
            capacity = int(idx.max()) + 1 if (idx >= 0).any() else 1
        d["row_to_cell"] = jnp.asarray(_row_to_cell_from_idx_map(idx, capacity))
    return VoxelTopology(**d)


def _dilate_occupancy(occ: np.ndarray, k: int) -> np.ndarray:
    """All-ones k³ dilation (the reference's Conv3d trick,
    embedding_helper.py:154-169) via shifted ORs — no conv dependency."""
    if k <= 1:
        return occ
    r = (k - 1) // 2
    out = np.zeros_like(occ)
    for dx in range(-r, k - r):
        for dy in range(-r, k - r):
            for dz in range(-r, k - r):
                src = occ[
                    max(0, -dx) : occ.shape[0] - max(0, dx),
                    max(0, -dy) : occ.shape[1] - max(0, dy),
                    max(0, -dz) : occ.shape[2] - max(0, dz),
                ]
                out[
                    max(0, dx) : occ.shape[0] - max(0, -dx),
                    max(0, dy) : occ.shape[1] - max(0, -dy),
                    max(0, dz) : occ.shape[2] - max(0, -dz),
                ] |= src
    return out


def build_voxel_grid(
    pcd_xyz: np.ndarray,
    scene_center,
    scale_factor: float,
    voxel_size_world: float,
    neighbor_marks: int,
    channels: int,
    n_freq_voxel: int,
    n_max_voxels: int,
    key=None,
    auto_capacity: bool = True,
):
    """Construct (features, topology, static) from a raw point cloud.

    pcd_xyz: (N, 3) world-space points (e.g. from read_ply).
    Returns (features (capacity, channels) f32, VoxelTopology, VoxelStatic).

    auto_capacity: size the feature table to ~9× the occupied count
    (rounded to a power of two, capped by n_max_voxels) instead of always
    n_max_voxels. The reference always allocates the full 800k×24 table
    (default_conf.yml:36); on TPU the table size directly scales the cost
    of the row gathers and of the scatter-add in the feature-gradient
    (measured 2.5× train-step speedup on a small scene). 9× slack covers
    the one 8× subdivision of progressive training with 12.5% headroom.
    """
    pts = (np.asarray(pcd_xyz, np.float64) - np.asarray(scene_center)) / scale_factor
    voxel_size = voxel_size_world / scale_factor
    bounds_min = pts.min(0)
    bounds_max = pts.max(0)
    offset = -bounds_min
    # +3 margin matches the reference (embedding_helper.py:119-123)
    shape = tuple(
        int((bounds_max[i] - bounds_min[i]) / voxel_size) + 3 for i in range(3)
    )

    q = np.round((pts + offset) / voxel_size).astype(np.int64)
    valid = np.all((q >= 0) & (q < np.array(shape)), axis=1)
    q = q[valid]
    occ = np.zeros(shape, dtype=bool)
    occ[q[:, 0], q[:, 1], q[:, 2]] = True
    occ = _dilate_occupancy(occ, neighbor_marks)

    n_occ = int(occ.sum())
    if n_occ > n_max_voxels:
        raise ValueError(f"{n_occ} occupied voxels exceed capacity {n_max_voxels}")

    capacity = n_max_voxels
    if auto_capacity:
        # 9× slack: the one 8× subdivision of progressive training fits,
        # with 12.5% headroom (table size scales the dense scatter and the
        # checkpoint; occupancy growth beyond that raises n_max_voxels)
        capacity = min(
            n_max_voxels, max(1024, 1 << int(np.ceil(np.log2(n_occ * 9))))
        )

    idx_map = np.full(shape, -1, dtype=np.int32)
    idx_map[occ] = np.arange(n_occ, dtype=np.int32)

    if key is None:
        key = jax.random.PRNGKey(0)
    # torch.nn.Embedding default init: N(0, 1)
    features = jax.random.normal(key, (capacity, channels), jnp.float32)

    topo = VoxelTopology(
        idx_map=jnp.asarray(idx_map.reshape(-1)),
        occupancy=jnp.asarray(occ.reshape(-1)),
        voxel_size=jnp.float32(voxel_size),
        voxel_offset=jnp.asarray(offset, dtype=jnp.float32),
        n_occupied=jnp.int32(n_occ),
        row_to_cell=jnp.asarray(
            _row_to_cell_from_idx_map(idx_map, capacity)
        ),
    )
    static = VoxelStatic(
        shape=shape,
        channels=channels,
        n_freq_voxel=n_freq_voxel,
        n_max_voxels=capacity,
    )
    return features, topo, static


def from_torch_buffers(vt, n_freq_voxel: int):
    """(features, topo, static) from converted reference checkpoint buffers.

    `vt` is the "voxel" dict produced by train.torch_convert from the
    reference's registered buffers (embedding_helper.py:107-137,187-200):
    features table + voxel_size/voxel_offset/voxel_shape/voxel_occupancy/
    voxel_idx_map. Row indices in the table are preserved exactly, so a
    reference voxel checkpoint renders bit-compatibly.
    """
    features = jnp.asarray(np.asarray(vt["features"], np.float32))
    shape = tuple(int(x) for x in np.asarray(vt["voxel_shape"]))
    idx_map = np.asarray(vt["voxel_idx_map"]).reshape(-1).astype(np.int32)
    topo = VoxelTopology(
        idx_map=jnp.asarray(idx_map),
        occupancy=jnp.asarray(
            np.asarray(vt["voxel_occupancy"]).reshape(-1).astype(bool)
        ),
        voxel_size=jnp.float32(float(np.asarray(vt["voxel_size"]))),
        voxel_offset=jnp.asarray(np.asarray(vt["voxel_offset"]), dtype=jnp.float32),
        n_occupied=jnp.int32(int((idx_map >= 0).sum())),
        row_to_cell=jnp.asarray(
            _row_to_cell_from_idx_map(idx_map, int(features.shape[0]))
        ),
    )
    static = VoxelStatic(
        shape=shape,
        channels=int(features.shape[-1]),
        n_freq_voxel=int(n_freq_voxel),
        n_max_voxels=int(features.shape[0]),
    )
    return features, topo, static


def build_voxel_grid_from_config(pcd_xyz, cfg, key=None):
    """Convenience wrapper reading the reference config schema."""
    return build_voxel_grid(
        pcd_xyz,
        scene_center=cfg.dataset_extra.scene_center,
        scale_factor=float(cfg.dataset_extra.scale_factor),
        voxel_size_world=float(cfg.dataset_extra.voxel_size),
        neighbor_marks=int(cfg.dataset_extra.neighbor_marks),
        channels=int(cfg.model.N_scn_voxel_size) + int(cfg.model.N_obj_voxel_size),
        n_freq_voxel=int(cfg.model.N_freq_voxel),
        n_max_voxels=int(cfg.model.N_max_voxels),
        key=key,
    )


# ---------------------------------------------------------------------------
# Lookup (jitted, on the render hot path)
# ---------------------------------------------------------------------------

_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
    dtype=np.int32,
)  # binary order matches the reference's itertools.product weights


def _flat_index(q: jnp.ndarray, shape) -> jnp.ndarray:
    return (q[..., 0] * shape[1] + q[..., 1]) * shape[2] + q[..., 2]


@jax.custom_vjp
def _take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather with a segment-sum backward.

    XLA's auto-derived VJP of `jnp.take` produces a scatter that compiles
    and runs pathologically on this TPU toolchain (an isolated 3.1M-row
    take-grad did not finish compiling in 10 min); `segment_sum` over the
    same cotangent rows lowers to a well-behaved ~30 ms program. Identical
    math: d_table[r] = Σ_{i: idx_i = r} g_i."""
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _take_rows_bwd(res, g):
    idx, capacity = res
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    d_table = jax.ops.segment_sum(flat_g, flat_idx, num_segments=capacity)
    return d_table, None


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def _take_rows_bf16(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather through a bf16 copy of the table (halves gather traffic —
    the corner-table rows are 768 B in f32 and the gather is the voxel
    path's single largest cost). The backward is the same f32 segment-sum
    as `_take_rows`: the cast's derivative is treated as identity, so the
    TABLE gradient keeps full f32 accumulation precision; only the forward
    activation value is rounded (it feeds bf16 MLP matmuls anyway)."""
    return jnp.take(table.astype(jnp.bfloat16), idx, axis=0)


def _take_rows_bf16_fwd(table, idx):
    return _take_rows_bf16(table, idx), (idx, table.shape[0])


def _take_rows_bf16_bwd(res, g):
    idx, capacity = res
    flat_idx = idx.reshape(-1)
    flat_g = g.astype(jnp.float32).reshape(-1, g.shape[-1])
    d_table = jax.ops.segment_sum(flat_g, flat_idx, num_segments=capacity)
    return d_table, None


_take_rows_bf16.defvjp(_take_rows_bf16_fwd, _take_rows_bf16_bwd)


def _gather_rows(
    features: jnp.ndarray,
    topo: VoxelTopology,
    static: VoxelStatic,
    q: jnp.ndarray,  # (..., 3) int32 quantized coords
):
    """Row-gather with out-of-bounds / empty masking.

    Returns (ftr (..., C), invalid (...,) bool) — matches
    get_voxel_feature_sparse_from_quantized (embedding_helper.py:331-352).
    """
    shape = jnp.asarray(static.shape, jnp.int32)
    oob = jnp.any((q < 0) | (q >= shape), axis=-1)
    q_safe = jnp.clip(q, 0, shape - 1)
    emb_idx = topo.idx_map[_flat_index(q_safe, static.shape)]
    invalid = oob | (emb_idx < 0)
    ftr = _take_rows(features, jnp.maximum(emb_idx, 0))
    ftr = jnp.where(invalid[..., None], 0.0, ftr)
    return ftr, invalid


# Transient (cells, 8·C) corner-table budget for the dense lookup path.
# Above this the per-corner gather path is used instead. 2 GiB covers the
# reference's flagship progressive run POST-subdivision — an ~8×8×3 m
# ScanNet scene at 0.1 m voxels subdivides to (166,166,66) ⇒ a 1.34 GiB
# f32 table (reference train.py:140-145 + embedding_helper.py:247-302) —
# while leaving the ~3× build/gradient transients comfortable in v5e's
# 16 GB HBM (the table lives only within a step/frame). Callers that lose
# the fast path log loudly (train/system._build_train_step).
DENSE_CELL_TABLE_LIMIT_BYTES = 2 << 30


def dense_table_bytes(static: "VoxelStatic") -> int:
    """f32 size of the transient dense corner table for this grid."""
    n_pcells = (
        (static.shape[0] + 1) * (static.shape[1] + 1) * (static.shape[2] + 1)
    )
    return n_pcells * 8 * static.channels * 4


def _trilinear_weights(p: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) corner weights in _CORNERS binary order from fractions (N, 3)."""
    u, v, w = p[:, 0:1], p[:, 1:2], p[:, 2:3]
    lu, lv, lw = 1.0 - u, 1.0 - v, 1.0 - w
    return jnp.concatenate(
        [lu * lv * lw, lu * lv * w, lu * v * lw, lu * v * w,
         u * lv * lw, u * lv * w, u * v * lw, u * v * w],
        axis=-1,
    )


@functools.lru_cache(maxsize=8)
def _corner_conv_kernels(channels: int):
    """One-hot VALID-2×2×2 conv kernels realizing the corner-table build
    and its transpose on the MXU (host numpy; cached per channel count).

    Forward: ct[p, (k,c)] = padded_dense[p + corner_k, c]
        ⇒ K_f[t, c_in, k·C + c_out] = δ(t = corner_k) δ(c_in = c_out)
    Transpose: d_dense[c] = Σ_k d_ct[c + (1 − corner_k), block k]
        ⇒ K_t[t, k·C + c_in, c_out] = δ(t = 1 − corner_k) δ(c_in = c_out)
    """
    C = channels
    k_f = np.zeros((2, 2, 2, C, 8 * C), np.float32)
    k_t = np.zeros((2, 2, 2, 8 * C, C), np.float32)
    for k, (bx, by, bz) in enumerate(_CORNERS):
        for c in range(C):
            k_f[bx, by, bz, c, k * C + c] = 1.0
            k_t[1 - bx, 1 - by, 1 - bz, k * C + c, c] = 1.0
    return k_f, k_t


def _corner_conv(x, kernel, dtype):
    """VALID 2×2×2 conv with a one-hot kernel. Precision policy: HIGHEST
    for f32 (TPU's default conv path rounds inputs to bf16 — 2.2e-3 rel
    error on the table GRADIENT, unacceptable; HIGHEST is bit-exact here,
    rel err ≤1.2e-7 vs the slice-add form) and DEFAULT for bf16 (every
    output sums exactly one nonzero product, so bf16 copies are exact)."""
    prec = (jax.lax.Precision.DEFAULT if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    return jax.lax.conv_general_dilated(
        x[None], kernel.astype(dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=prec, preferred_element_type=dtype,
    )[0]


def _corner_table_impl(features, idx_map, static):
    """((X+1)·(Y+1)·(Z+1), 8·C) — each row holds the features of a base
    cell's 8 corners:

    1. GATHER the dense cell grid from the table (`features[idx_map]`,
       empty cells zeroed). A gather of n_cells rows, NOT a scatter of
       capacity rows: TPU scatter latency/row degrades superlinearly with
       destination size (measured ~190 ns/row at an 800k-row capacity vs
       ~10 ns at 262k — scripts/profile_big_table_ops.py), so the scatter
       form cost 141-160 ms per build on the post-subdivision flagship
       grid,
    2. zero-pad the grid by 1 cell on every side (out-of-bounds corners
       therefore contribute exactly 0, the reference's invalid-corner rule,
       embedding_helper.py:346-351),
    3. replicate the 8 shifted views via a one-hot VALID 2×2×2 conv — the
       MXU runs it at full 192-lane width, vs ~19% lane occupancy for the
       C=24 shifted-concat form (measured 78→60 ms f32 / 60→32 ms bf16 on
       the post-subdivision grid; bit-exact, each output copies exactly
       one input).

    Base cells are indexed in the PADDED frame: pb = floor(xyz_scaled) + 1,
    valid for floor coords in [-1, shape-1].
    """
    X, Y, Z = static.shape
    C = static.channels
    dense = jnp.where(
        (idx_map >= 0)[:, None],
        jnp.take(features, jnp.maximum(idx_map, 0), axis=0),
        jnp.zeros((), features.dtype),
    )
    p = jnp.pad(dense.reshape(X, Y, Z, C),
                ((1, 1), (1, 1), (1, 1), (0, 0)))
    k_f, _ = _corner_conv_kernels(C)
    ct = _corner_conv(p, jnp.asarray(k_f), features.dtype)
    return ct.reshape(-1, 8 * C)


def corner_table_transpose(d_ct, row_to_cell, static):
    """d_features from a corner-table cotangent — the exact linear
    transpose of `_corner_table_impl`, hand-written because it is
    value-independent: autodiff's vjp re-runs the full forward build for
    residuals it never uses (~160 ms per step on the post-subdivision
    flagship grid). One one-hot conv (the corner accumulation, f32 HIGHEST
    — exact) plus ONE capacity-row gather. Exactness of the gather relies
    on idx_map/row_to_cell being mutually inverse (each live table row
    owns exactly one cell — true by construction; pruning trash-routes
    both sides), which makes gather-by-row_to_cell identical to
    segment-summing over idx_map."""
    X, Y, Z = static.shape
    C = static.channels
    _, k_t = _corner_conv_kernels(C)
    d = d_ct.reshape(X + 1, Y + 1, Z + 1, 8 * C).astype(jnp.float32)
    d_dense = _corner_conv(d, jnp.asarray(k_t), jnp.float32).reshape(-1, C)
    # trash row (pruned/dead table rows point one past the grid) reads 0
    d_dense = jnp.concatenate([d_dense, jnp.zeros((1, C), d_dense.dtype)])
    return jnp.take(d_dense, row_to_cell, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _corner_table_op(features, idx_map, row_to_cell, static):
    return _corner_table_impl(features, idx_map, static)


def _corner_table_op_fwd(features, idx_map, row_to_cell, static):
    return _corner_table_impl(features, idx_map, static), row_to_cell


def _corner_table_op_bwd(static, row_to_cell, d_ct):
    d_f = corner_table_transpose(d_ct, row_to_cell, static)
    # idx_map / row_to_cell are integer topology — no cotangent. Shapes must
    # match the primal args (idx_map is (X·Y·Z,), derived from the nondiff
    # static; row_to_cell is the (capacity,) residual) — custom_vjp may
    # start validating symbolic-zero shapes for integer args.
    X, Y, Z = static.shape
    zero_idx_map = np.zeros((X * Y * Z,), jax.dtypes.float0)
    zero_rtc = np.zeros(row_to_cell.shape, jax.dtypes.float0)
    return (d_f, zero_idx_map, zero_rtc)


_corner_table_op.defvjp(_corner_table_op_fwd, _corner_table_op_bwd)


def _cell_corner_table(features, topo, static):
    """See `_corner_table_impl`; differentiable w.r.t. `features` via the
    hand-written `corner_table_transpose` (no forward re-run, no scatter)."""
    return _corner_table_op(features, topo.idx_map, topo.row_to_cell, static)


def make_corner_table(features, topo, static: VoxelStatic, lowp: bool = False):
    """Materialize the ((X+1)·(Y+1)·(Z+1), 8·C) corner table once.

    Eval renderers call this ONE time per frame and thread the result
    through every chunk program (`voxel_lookup_dense(..., ct=...)`): the
    features don't change within a frame, so rebuilding the table (scatter
    + pad + 8-view concat + f32→bf16 cast) inside each of the ~40 chunk
    programs is pure waste. The prebuilt table carries no feature gradient
    — autodiff training paths must build it in-graph (voxel_lookup_dense
    with ct=None); the split-program train step may call this per step
    because it derives the table gradient by hand (split_step.py P8).

    lowp casts the FEATURES to bf16 before the build (the build is a pure
    copy, so cast-then-build ≡ build-then-cast exactly) — the bf16 conv
    build runs ~2× the f32 one on big grids."""
    if lowp:
        features = features.astype(jnp.bfloat16)
    return _cell_corner_table(features, topo, static)


def corner_index_weights(topo: VoxelTopology, static: VoxelStatic, xyz):
    """Dense-path sample addressing: (flat (N,) int32 padded-cell row index,
    wts (N, 8) f32 trilinear weights, ZEROED for out-of-bounds samples).

    `sum(ct[flat].reshape(N, 8, C) * wts[..., None], 1)` then reproduces
    `voxel_lookup_dense`'s masked trilinear lookup exactly (zeroed weights
    ≡ the where-mask on finite rows), and `wts`-scaled row cotangents
    segment-summed over `flat` are its exact table gradient — the
    split-program train step (train/split_step.py) relies on both.
    Also returns sample_valid (N,) bool (in-bounds mask).
    """
    _, Y, Z = static.shape
    xyz_scaled = (xyz + topo.voxel_offset) / topo.voxel_size
    base = jnp.floor(xyz_scaled)
    q0 = base.astype(jnp.int32)
    shape = jnp.asarray(static.shape, jnp.int32)
    sample_valid = jnp.all((q0 >= -1) & (q0 <= shape - 1), axis=-1)
    pb = jnp.clip(q0 + 1, 0, shape)  # padded-frame base cell
    flat = (pb[:, 0] * (Y + 1) + pb[:, 1]) * (Z + 1) + pb[:, 2]
    wts = _trilinear_weights(xyz_scaled - base) * sample_valid[:, None]
    return flat, wts, sample_valid


def voxel_lookup_dense(
    features: jnp.ndarray,
    topo: VoxelTopology,
    static: VoxelStatic,
    xyz: jnp.ndarray,  # (N, 3) normalized coords
    lowp: bool = False,
    ct: Optional[jnp.ndarray] = None,
    with_addressing: bool = False,
):
    """Trilinear lookup via the corner table: ONE row gather per sample.

    TPU gathers/scatters pay per ROW, not per byte (measured ~12 ns/row on
    v5e): 8 corner gathers of (N, C) rows cost 8× a single (N, 8·C) gather.
    The corner table converts the per-corner indirection into contiguous
    slicing, cutting the voxel lookup from ~38 ms to ~8 ms per train step
    and its gradient segment-sum from ~53 ms to ~11 ms at the flagship
    batch. The gradient path reuses _take_rows' segment-sum VJP; empty and
    out-of-bounds corners read zero PAD rows, so no gradient ever reaches
    rows outside the live table (reference masking semantics preserved).

    ct: a prebuilt table from `make_corner_table` (skips the in-program
    build and carries no feature gradient; `features` may be None then).
    with_addressing additionally returns (flat, wts) — the split-program
    train step (train/split_step.py) hand-derives the table gradient from
    exactly this forward, so it must share this reduce, not re-implement it.
    """
    flat, wts, sample_valid = corner_index_weights(topo, static, xyz)
    if ct is None:
        take = _take_rows_bf16 if lowp else _take_rows
        rows = take(_cell_corner_table(features, topo, static), flat)
    else:
        rows = jnp.take(ct, flat, axis=0)  # (N, 8·C)
    out = jnp.sum(
        rows.reshape(-1, 8, static.channels).astype(jnp.float32)
        * wts[..., None],
        axis=1,
    )
    if with_addressing:
        return out, ~sample_valid, flat, wts
    return out, ~sample_valid


def _dense_path_ok(static: VoxelStatic) -> bool:
    return dense_table_bytes(static) <= DENSE_CELL_TABLE_LIMIT_BYTES


def voxel_lookup_raw(
    features: jnp.ndarray,
    topo: VoxelTopology,
    static: VoxelStatic,
    xyz: jnp.ndarray,  # (N, 3) normalized coords
    trilinear: bool = True,
    lowp: bool = False,
    ct: Optional[jnp.ndarray] = None,
):
    """Raw (un-encoded) voxel features at xyz. Returns (ftr (N, C), invalid).

    Trilinear lookups dispatch to the corner-table path (one gather per
    sample) when the grid is small enough to materialize it; the per-corner
    gather path remains for huge grids and nearest lookups. `invalid` means
    all-8-corners-empty on the gather path and sample-out-of-bounds on the
    dense path — the render pipeline consumes only `ftr` (the reference
    zeroes invalid corners, embedding_helper.py:390-394, which both paths
    honor exactly).

    lowp gathers the corner table in bf16 (the fused-kernel training path,
    where the features feed bf16 matmuls anyway); the table gradient stays
    f32 (see _take_rows_bf16). `ct` is a prebuilt `make_corner_table`
    (eval-only; implies the dense path).
    """
    if ct is not None and not trilinear:
        raise ValueError(
            "ct (prebuilt corner table) implies the trilinear dense path; "
            "the nearest-neighbor lookup never consults it"
        )
    xyz_scaled = (xyz + topo.voxel_offset) / topo.voxel_size
    if not trilinear:
        q = jnp.round(xyz_scaled).astype(jnp.int32)
        return _gather_rows(features, topo, static, q)

    if ct is not None or _dense_path_ok(static):
        return voxel_lookup_dense(features, topo, static, xyz, lowp=lowp,
                                  ct=ct)

    base = jnp.floor(xyz_scaled)
    q0 = base.astype(jnp.int32)
    # (N, 8, 3) corner coordinates
    q = q0[:, None, :] + jnp.asarray(_CORNERS)[None, :, :]
    ftr, invalid = _gather_rows(features, topo, static, q)  # (N, 8, C), (N, 8)

    wts = _trilinear_weights(xyz_scaled - base)  # (N, 8)
    out = jnp.sum(ftr * wts[..., None], axis=1)
    all_invalid = jnp.all(invalid, axis=-1)
    return out, all_invalid


def voxel_embed(
    features: jnp.ndarray,
    topo: VoxelTopology,
    static: VoxelStatic,
    xyz: jnp.ndarray,
    n_freq_xyz: int = 10,
    ct: Optional[jnp.ndarray] = None,
):
    """The full EmbeddingVoxel.forward (embedding_helper.py:325-329):

    returns (emb_xyz = [PE(scene_ftr), PE(xyz)], obj_voxel = PE(inst_ftr)).
    """
    raw, _ = voxel_lookup_raw(features, topo, static, xyz, trilinear=True,
                              ct=ct)
    scene_x = raw[:, : static.scene_channels]
    inst_x = raw[:, static.scene_channels :]
    scene_emb = freq_encode(scene_x, static.n_freq_voxel)
    inst_emb = freq_encode(inst_x, static.n_freq_voxel)
    xyz_emb = freq_encode(xyz, n_freq_xyz)
    return jnp.concatenate([scene_emb, xyz_emb], axis=-1), inst_emb


def check_occupancy(topo: VoxelTopology, static: VoxelStatic, xyz: jnp.ndarray):
    """Occupancy at rounded xyz (embedding_helper.py:413-427)."""
    q = jnp.round((xyz + topo.voxel_offset) / topo.voxel_size).astype(jnp.int32)
    shape = jnp.asarray(static.shape, jnp.int32)
    oob = jnp.any((q < 0) | (q >= shape), axis=-1)
    q_safe = jnp.clip(q, 0, shape - 1)
    occ = topo.occupancy[_flat_index(q_safe, static.shape)]
    return jnp.where(oob, False, occ)


def voxel_lookup_grid_sample(
    features: jnp.ndarray,
    static: VoxelStatic,
    xyz: jnp.ndarray,
    bounds: jnp.ndarray,
):
    """Dense grid_sample-style trilinear lookup — the reference's unused
    `forward_voxel_features_dense` variant (embedding_helper.py:429-479).

    The first X*Y*Z table rows are read as a dense (X, Y, Z, C) grid (the
    variant predates the sparse idx_map and requires capacity >= X*Y*Z);
    points normalize to [0, 1] over `bounds` ((2, 3): lo/hi) and sample
    with torch `grid_sample(align_corners=True, padding_mode="border")`
    semantics: coord = u * (size - 1), clamped to the border.

    Two reference quirks reproduced on purpose (verified against torch's
    F.grid_sample in tests/test_voxel_grid.py):
    * axis order — its `rearrange("(n1 n2 n3) c -> 1 c n1 n2 n3")` keeps
      spatial order (X, Y, Z) while grid_sample's x grid coordinate
      addresses the INNERMOST axis, so point coordinate k samples grid
      axis 2-k (x runs along Z and vice versa);
    * occupancy is computed but dead (`ind_occu = ind_full`,
      embedding_helper.py:441-443) — no sample is zeroed here either.

    Returns raw (M, C) features; callers frequency-encode like the
    reference's `embedding_final` (models/embedding.freq_encode).
    """
    X, Y, Z = static.shape
    sizes = jnp.asarray([X, Y, Z], jnp.float32)
    lo, hi = bounds[0], bounds[1]
    u = (xyz - lo) / (hi - lo)
    # point coordinate k addresses grid axis 2-k (see quirk note above)
    p = u[:, ::-1] * (sizes - 1.0)
    p = jnp.clip(p, 0.0, sizes - 1.0)  # border padding
    i0 = jnp.floor(p).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(static.shape, jnp.int32) - 1)
    f = p - i0
    out = jnp.zeros((xyz.shape[0], features.shape[-1]), features.dtype)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = jnp.where(cx, i1[:, 0], i0[:, 0])
                iy = jnp.where(cy, i1[:, 1], i0[:, 1])
                iz = jnp.where(cz, i1[:, 2], i0[:, 2])
                w = (
                    jnp.where(cx, f[:, 0], 1.0 - f[:, 0])
                    * jnp.where(cy, f[:, 1], 1.0 - f[:, 1])
                    * jnp.where(cz, f[:, 2], 1.0 - f[:, 2])
                )
                rows = features[(ix * Y + iy) * Z + iz]
                out = out + rows * w[:, None]
    return out


def ray_box_intersection(
    topo: VoxelTopology,
    static: VoxelStatic,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int = 256,
):
    """Brute-force near/far tightening by occupancy probing
    (embedding_helper.py:304-323)."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    z = near * (1 - t) + far * t  # (N, S)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    occ = check_occupancy(topo, static, xyz.reshape(-1, 3)).reshape(z.shape)
    near_out = jnp.min(z + (~occ) * 1e9, axis=-1, keepdims=True)
    near_out = jnp.where(near_out > 1e5, near, near_out)
    far_out = jnp.max(z * occ, axis=-1, keepdims=True)
    far_out = jnp.where(far_out == 0, far, far_out)
    return near_out, far_out


# ---------------------------------------------------------------------------
# Progressive training: prune + subdivide (host-orchestrated)
# ---------------------------------------------------------------------------


def prune_empty_voxels(
    features: jnp.ndarray,
    topo: VoxelTopology,
    static: VoxelStatic,
    sigma_fn,
    key,
    max_alpha_th: float = 0.5,
    samples_per_voxel: int = 16**3,
    voxel_batch: int = 256,
):
    """Drop voxels whose max alpha over random interior samples is below
    threshold (embedding_helper.py:202-245). sigma_fn: (emb_xyz (M, C)) ->
    sigma (M,), typically the fine scene branch with sigma_only.

    Returns a new VoxelTopology (same shapes — no recompile).
    """
    occ3 = np.asarray(topo.occupancy).reshape(static.shape)
    idx_occ = np.argwhere(occ3)  # (K, 3)
    if len(idx_occ) == 0:
        return topo  # nothing left to prune
    voxel_size = float(topo.voxel_size)
    offset = np.asarray(topo.voxel_offset)
    voxel_xyz = idx_occ.astype(np.float32) * voxel_size - offset

    @jax.jit
    def eval_batch(xyz_batch, k):
        jitter = (
            jax.random.uniform(k, xyz_batch.shape) * voxel_size - voxel_size / 2
        )
        pts = xyz_batch + jitter
        emb_xyz, _ = voxel_embed(features, topo, static, pts)
        sigma = sigma_fn(emb_xyz)
        # alpha over 1 m of field (embedding_helper.py:224-226)
        return 1.0 - jnp.exp(-jax.nn.relu(sigma))

    empty = []
    n = len(voxel_xyz)
    step = voxel_batch
    for i in range(0, n, step):
        chunk = voxel_xyz[i : i + step]
        pad = step - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
        pts = np.repeat(chunk, samples_per_voxel, axis=0)
        key, sub = jax.random.split(key)
        alphas = eval_batch(jnp.asarray(pts), sub)
        alphas = np.asarray(alphas).reshape(step, samples_per_voxel).max(-1)
        empty.append(alphas[: len(chunk) - pad if pad else step] < max_alpha_th)
    empty = np.concatenate(empty)[:n]

    keep3 = occ3.copy()
    drop = idx_occ[empty]
    keep3[drop[:, 0], drop[:, 1], drop[:, 2]] = False
    idx_map = np.asarray(topo.idx_map).reshape(static.shape).copy()
    dropped_rows = idx_map[drop[:, 0], drop[:, 1], drop[:, 2]]
    idx_map[drop[:, 0], drop[:, 1], drop[:, 2]] = -1
    # pruned rows point at the trash cell so the dense scatter skips them
    row_to_cell = np.asarray(topo.row_to_cell).copy()
    row_to_cell[dropped_rows[dropped_rows >= 0]] = int(np.prod(static.shape))
    return topo._replace(
        idx_map=jnp.asarray(idx_map.reshape(-1)),
        occupancy=jnp.asarray(keep3.reshape(-1)),
        n_occupied=jnp.int32(int(keep3.sum())),
        row_to_cell=jnp.asarray(row_to_cell),
    )


def subdivide_voxels(
    features: jnp.ndarray,
    topo: VoxelTopology,
    static: VoxelStatic,
    chunk: int = 1 << 18,
):
    """Halve voxel size; each voxel spawns 8 children whose features are the
    trilinear resample of the parent grid at the child corner positions
    (embedding_helper.py:247-302).

    Returns (new_features, new_topology, new_static) — shapes double, so the
    caller should expect one recompile of lookup-consuming programs.
    """
    occ3 = np.asarray(topo.occupancy).reshape(static.shape)
    idx_occ = np.argwhere(occ3)
    voxel_size = float(topo.voxel_size)
    offset = np.asarray(topo.voxel_offset, np.float64)
    voxel_xyz = idx_occ.astype(np.float64) * voxel_size - offset

    target = voxel_size / 2
    children = [voxel_xyz + c * target for c in _CORNERS.astype(np.float64)]
    new_xyz = np.concatenate(children, 0)
    new_coord = np.round((new_xyz + offset) / target).astype(np.int64)

    new_shape = tuple(s * 2 for s in static.shape)
    if len(new_xyz) > static.n_max_voxels:
        raise ValueError(
            f"subdivision needs {len(new_xyz)} voxels > capacity {static.n_max_voxels}"
        )

    # resample features at child positions from the OLD grid
    feats = []
    lookup = jax.jit(
        lambda pts: voxel_lookup_raw(features, topo, static, pts, trilinear=True)[0]
    )
    for i in range(0, len(new_xyz), chunk):
        feats.append(np.asarray(lookup(jnp.asarray(new_xyz[i : i + chunk], jnp.float32))))
    new_ftrs = np.concatenate(feats, 0)

    occ_new = np.zeros(new_shape, dtype=bool)
    occ_new[new_coord[:, 0], new_coord[:, 1], new_coord[:, 2]] = True
    n_occ = int(occ_new.sum())
    idx_map_new = np.full(new_shape, -1, dtype=np.int32)
    idx_map_new[occ_new] = np.arange(n_occ, dtype=np.int32)

    # scatter resampled features into the new rows (last write wins on dup
    # coordinates, mirroring the reference's index_put semantics)
    assign = idx_map_new[new_coord[:, 0], new_coord[:, 1], new_coord[:, 2]]
    feat_np = np.asarray(features).copy()
    feat_np[assign] = new_ftrs

    new_topo = VoxelTopology(
        idx_map=jnp.asarray(idx_map_new.reshape(-1)),
        occupancy=jnp.asarray(occ_new.reshape(-1)),
        voxel_size=jnp.float32(target),
        voxel_offset=jnp.asarray(offset, dtype=jnp.float32),
        n_occupied=jnp.int32(n_occ),
        row_to_cell=jnp.asarray(
            _row_to_cell_from_idx_map(idx_map_new, int(features.shape[0]))
        ),
    )
    new_static = dataclasses.replace(static, shape=new_shape)
    return jnp.asarray(feat_np), new_topo, new_static
