"""Custom-VJP fused MLP: gradients must match jax.grad of the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_nerf_tpu.models.mlp import (
    ObjectNeRFConfig, init_object_nerf, scene_forward, instance_forward,
)
from object_nerf_tpu.models.embedding import freq_encode
from object_nerf_tpu.ops.pallas_mlp_vjp import make_fused_mlp_op


def _xla_forward(params, cfg, xyz, dir_pe, codes, voxel_raw):
    n, s, _ = xyz.shape
    flat = xyz.reshape(-1, 3)
    d = jnp.repeat(dir_pe, s, axis=0)
    c = jnp.repeat(codes, s, axis=0)
    if cfg.use_voxel_embedding:
        raw = voxel_raw.reshape(n * s, -1)
        scene_emb = freq_encode(raw[:, : cfg.N_scn_voxel_size], cfg.N_freq_voxel)
        inst_emb = freq_encode(raw[:, cfg.N_scn_voxel_size :], cfg.N_freq_voxel)
        emb = jnp.concatenate([scene_emb, freq_encode(flat, cfg.N_freq_xyz)], -1)
    else:
        emb = freq_encode(flat, cfg.N_freq_xyz)
        inst_emb = None
    sigma, rgb = scene_forward(params, cfg, emb, d)
    isigma, irgb = instance_forward(params, cfg, emb, c, inst_emb, d)
    return (
        sigma.reshape(n, s), rgb.reshape(n, s, 3),
        isigma.reshape(n, s), irgb.reshape(n, s, 3),
    )


def _loss_weights(key, n, s):
    ks = jax.random.split(key, 4)
    return (
        jax.random.normal(ks[0], (n, s)),
        jax.random.normal(ks[1], (n, s, 3)),
        jax.random.normal(ks[2], (n, s)),
        jax.random.normal(ks[3], (n, s, 3)),
    )


def _rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-8)


@pytest.mark.parametrize("use_voxel", [False, True])
def test_vjp_matches_xla_grads(use_voxel):
    cfg = ObjectNeRFConfig(
        D=3, W=32, skips=(1,), inst_D=2, inst_W=16, inst_skips=(1,),
        use_voxel_embedding=use_voxel, N_obj_code_length=8,
        N_freq_xyz=4, N_freq_dir=2, N_freq_voxel=2,
        N_scn_voxel_size=16, N_obj_voxel_size=8,
    )
    params = init_object_nerf(jax.random.PRNGKey(0), cfg)
    n, s = 4, 8
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(n, s, 3).astype(np.float32) * 0.3)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), cfg.N_freq_dir)
    codes = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.2)
    voxel_raw = (
        jnp.asarray(rng.randn(n, s, 24).astype(np.float32) * 0.2)
        if use_voxel else None
    )
    lw = _loss_weights(jax.random.PRNGKey(7), n, s)

    def xla_loss(params, codes, voxel_raw):
        outs = _xla_forward(params, cfg, xyz, dir_pe, codes, voxel_raw)
        return sum(jnp.sum(o * w) for o, w in zip(outs, lw))

    argnums = (0, 1, 2) if use_voxel else (0, 1)
    ref_grads = jax.grad(xla_loss, argnums=argnums)(params, codes, voxel_raw)

    op = make_fused_mlp_op(cfg, True, dtype=jnp.float32, interpret=True)

    def fused_loss(params, codes, voxel_raw):
        outs = op(params, xyz, dir_pe, codes, voxel_raw)
        return sum(jnp.sum(o * w) for o, w in zip(outs, lw))

    got_grads = jax.grad(fused_loss, argnums=argnums)(params, codes, voxel_raw)

    # params grads
    ref_flat, treedef = jax.tree_util.tree_flatten(ref_grads[0])
    got_flat, treedef2 = jax.tree_util.tree_flatten(got_grads[0])
    paths = jax.tree_util.tree_structure(ref_grads[0])
    assert treedef == treedef2
    for i, (a, b) in enumerate(zip(got_flat, ref_flat)):
        err = _rel_err(a, b)
        assert err < 5e-4, (i, err)

    # code grads
    assert _rel_err(got_grads[1], ref_grads[1]) < 5e-4
    if use_voxel:
        assert _rel_err(got_grads[2], ref_grads[2]) < 5e-4


@pytest.mark.parametrize("use_voxel", [False, True])
def test_vjp_shard_map_mesh_matches_single_device(use_voxel):
    """The op's mesh= shard_maps fwd AND bwd kernels over the ray axis with
    the weight grads psum'd inside — the multi-chip training fast path.
    Gradients must equal the unsharded op's (mod f32 reduction order)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    cfg = ObjectNeRFConfig(
        D=3, W=32, skips=(1,), inst_D=2, inst_W=16, inst_skips=(1,),
        use_voxel_embedding=use_voxel, N_obj_code_length=8,
        N_freq_xyz=4, N_freq_dir=2, N_freq_voxel=2,
        N_scn_voxel_size=16, N_obj_voxel_size=8,
    )
    params = init_object_nerf(jax.random.PRNGKey(0), cfg)
    n, s = 16, 8  # 2 rays per device shard
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(n, s, 3).astype(np.float32) * 0.3)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), cfg.N_freq_dir)
    codes = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.2)
    voxel_raw = (
        jnp.asarray(rng.randn(n, s, 24).astype(np.float32) * 0.2)
        if use_voxel else None
    )
    lw = _loss_weights(jax.random.PRNGKey(7), n, s)
    argnums = (0, 1, 2) if use_voxel else (0, 1)

    def loss_fn(op):
        def loss(params, codes, voxel_raw):
            outs = op(params, xyz, dir_pe, codes, voxel_raw)
            return sum(jnp.sum(o * w) for o, w in zip(outs, lw))
        return loss

    op1 = make_fused_mlp_op(cfg, True, dtype=jnp.float32, interpret=True)
    op8 = make_fused_mlp_op(cfg, True, dtype=jnp.float32, interpret=True,
                            mesh=mesh)
    ref = jax.grad(loss_fn(op1), argnums=argnums)(params, codes, voxel_raw)
    got = jax.jit(jax.grad(loss_fn(op8), argnums=argnums))(
        params, codes, voxel_raw
    )

    for i, (a, b) in enumerate(zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(ref)
    )):
        assert _rel_err(a, b) < 5e-5, i


def test_vjp_forward_matches():
    cfg = ObjectNeRFConfig(
        D=2, W=32, skips=(1,), inst_D=2, inst_W=16, inst_skips=(1,),
        use_voxel_embedding=False, N_obj_code_length=8,
        N_freq_xyz=4, N_freq_dir=2,
    )
    params = init_object_nerf(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(4, 8, 3).astype(np.float32))
    dir_pe = freq_encode(jnp.asarray(rng.randn(4, 3).astype(np.float32)), 2)
    codes = jnp.zeros((4, 8))
    op = make_fused_mlp_op(cfg, True, dtype=jnp.float32, interpret=True)
    got = op(params, xyz, dir_pe, codes, None)
    ref = _xla_forward(params, cfg, xyz, dir_pe, codes, None)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-4)
