"""The bf16 poly-sin PE fast path (ops/pallas_mlp._sin_turns).

In bf16 kernel mode the PE matrices are turns-prescaled and sin is a
round-reduce + degree-11 polynomial (pe_uses_turns). These tests pin:

* the polynomial against numpy sin/cos over the full argument range the
  PE produces (|u| up to 2^9·|x|/2π);
* the turns-mode (S, phase) matrix against the classical freq_encode;
* forward AND gradient parity of the bf16 interpret kernels vs the XLA
  path — at bf16-appropriate tolerance. The gradient check would catch a
  missing 2π chain-rule factor in the PE backward (a 6.28× error) at any
  tolerance.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from object_nerf_tpu.ops.pallas_mlp import (
    TWO_PI, _cos_turns, _sin_turns, pe_sin_matrix, pe_uses_turns,
)


def test_pe_uses_turns_gate():
    assert pe_uses_turns(jnp.bfloat16)
    assert not pe_uses_turns(jnp.float32)


def test_sin_cos_turns_accuracy():
    u = np.concatenate([
        np.linspace(-0.5, 0.5, 4001),
        np.linspace(-300.0, 300.0, 40001),  # high-freq PE range
    ]).astype(np.float32)
    got_s = np.asarray(_sin_turns(jnp.asarray(u)))
    got_c = np.asarray(_cos_turns(jnp.asarray(u)))
    ref_s = np.sin(TWO_PI * u.astype(np.float64))
    ref_c = np.cos(TWO_PI * u.astype(np.float64))
    # poly error ~1e-7; f32 reduction rounding grows with |u| (~|u|·2^-23
    # turns of phase). Both are far below the bf16 cast downstream.
    assert np.abs(got_s - ref_s).max() < 3e-4
    assert np.abs(got_c - ref_c).max() < 3e-4
    tight = np.abs(u) <= 0.5
    assert np.abs(got_s - ref_s)[tight].max() < 5e-7


def test_turns_matrix_matches_freq_encode():
    from object_nerf_tpu.models.embedding import freq_encode

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 3).astype(np.float32) * 1.5)
    S, phase = pe_sin_matrix(3, 10, turns=True)
    got = _sin_turns(x @ jnp.asarray(S) + jnp.asarray(phase))
    ref = freq_encode(x, 10)[:, 3:]  # drop the identity block
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("use_voxel", [False, True])
def test_bf16_interpret_forward_and_grad_parity(use_voxel):
    """bf16 interpret kernels (poly-sin path) vs the f32 XLA path."""
    from object_nerf_tpu.models.mlp import (
        ObjectNeRFConfig, init_object_nerf, scene_forward, instance_forward,
    )
    from object_nerf_tpu.models.embedding import freq_encode
    from object_nerf_tpu.ops.pallas_mlp_vjp import make_fused_mlp_op

    cfg = ObjectNeRFConfig.from_config({
        "use_voxel_embedding": use_voxel,
        "D": 2, "W": 32, "skips": [1], "inst_D": 2, "inst_W": 32,
        "inst_skips": [1], "N_freq_xyz": 10, "N_freq_dir": 4,
        "N_freq_voxel": 6, "N_scn_voxel_size": 16, "N_obj_voxel_size": 8,
        "N_obj_code_length": 16,
    })
    params = init_object_nerf(jax.random.PRNGKey(0), cfg)
    n, s = 8, 6
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(n, s, 3).astype(np.float32))
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dir_pe = freq_encode(jnp.asarray(dirs), cfg.N_freq_dir)
    codes = jnp.asarray(rng.randn(n, 16).astype(np.float32) * 0.3)
    vox = (jnp.asarray(rng.randn(n, s, 24).astype(np.float32) * 0.5)
           if use_voxel else None)

    op = make_fused_mlp_op(cfg, True, dtype=jnp.bfloat16, interpret=True)

    def loss_pallas(p, c, v):
        sig, rgb, isig, irgb = op(p, xyz, dir_pe, c, v)
        return (jnp.sum(sig * 0.3) + jnp.sum(rgb) + jnp.sum(isig * 0.1)
                + jnp.sum(irgb * 0.7))

    def loss_xla(p, c, v):
        xyz_flat = xyz.reshape(n * s, 3)
        if use_voxel:
            svox = v.reshape(n * s, 24)[:, :16]
            ivox = v.reshape(n * s, 24)[:, 16:]
            emb = jnp.concatenate(
                [freq_encode(svox, cfg.N_freq_voxel),
                 freq_encode(xyz_flat, cfg.N_freq_xyz)], -1)
            obj_vox = freq_encode(ivox, cfg.N_freq_voxel)
        else:
            emb = freq_encode(xyz_flat, cfg.N_freq_xyz)
            obj_vox = None
        dflat = jnp.repeat(dir_pe, s, axis=0)
        cflat = jnp.repeat(c, s, axis=0)
        sig, rgb = scene_forward(p, cfg, emb, dflat)
        isig, irgb = instance_forward(p, cfg, emb, cflat, obj_vox, dflat)
        return (jnp.sum(sig * 0.3) + jnp.sum(rgb) + jnp.sum(isig * 0.1)
                + jnp.sum(irgb * 0.7))

    args = (params, codes, vox) if use_voxel else (params, codes, None)
    lp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1) if not use_voxel
                                else (0, 1, 2))(*args)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1) if not use_voxel
                                else (0, 1, 2))(*args)
    # bf16 matmuls + poly sin vs f32 XLA: agreement at bf16 scale
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(1e-3, float(np.abs(b).max()))
        assert np.abs(a - b).max() / denom < 5e-2, (
            np.abs(a - b).max(), denom)
