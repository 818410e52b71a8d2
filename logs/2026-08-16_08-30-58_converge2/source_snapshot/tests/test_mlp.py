import jax
import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.models.mlp import (
    ObjectNeRFConfig,
    init_object_nerf,
    scene_forward,
    instance_forward,
    LEAKY_SLOPE,
)
from object_nerf_tpu.models.embedding import freq_encode

CFG_NOVOX = ObjectNeRFConfig(use_voxel_embedding=False)
CFG_VOX = ObjectNeRFConfig(use_voxel_embedding=True)


def test_channel_arithmetic_matches_reference():
    # nerf_model.py:24-36: in_channels_xyz = 63 + 208 = 271 with voxels
    assert CFG_VOX.in_channels_xyz == 271
    assert CFG_NOVOX.in_channels_xyz == 63
    assert CFG_VOX.in_channels_dir == 27
    # nerf_model.py:70-72: inst_channel_in = 271 + 64 + 104 = 439
    assert CFG_VOX.inst_channel_in == 439
    assert CFG_NOVOX.inst_channel_in == 63 + 64


def test_shapes_and_param_structure():
    params = init_object_nerf(jax.random.PRNGKey(0), CFG_NOVOX)
    assert len(params["scene"]["trunk"]) == 8
    assert params["scene"]["trunk"][0]["w"].shape == (63, 256)
    assert params["scene"]["trunk"][4]["w"].shape == (256 + 63, 256)  # skip at 4
    assert params["object"]["trunk"][2]["w"].shape == (128 + 127, 128)

    n = 17
    emb_xyz = freq_encode(jnp.ones((n, 3)), 10)
    emb_dir = freq_encode(jnp.ones((n, 3)), 4)
    sigma, rgb = scene_forward(params, CFG_NOVOX, emb_xyz, emb_dir)
    assert sigma.shape == (n,) and rgb.shape == (n, 3)
    assert np.all(np.asarray(rgb) >= 0) and np.all(np.asarray(rgb) <= 1)

    code = jnp.zeros((n, 64))
    isigma, irgb = instance_forward(params, CFG_NOVOX, emb_xyz, code, None, emb_dir)
    assert isigma.shape == (n,) and irgb.shape == (n, 3)


def test_sigma_only_skips_rgb():
    params = init_object_nerf(jax.random.PRNGKey(1), CFG_NOVOX)
    emb_xyz = freq_encode(jnp.ones((4, 3)), 10)
    sigma, rgb = scene_forward(params, CFG_NOVOX, emb_xyz, None, sigma_only=True)
    assert rgb is None and sigma.shape == (4,)


def test_numpy_golden_forward():
    """Independent numpy re-implementation of the branch topology."""
    cfg = ObjectNeRFConfig(D=3, W=8, skips=(1,), use_voxel_embedding=False,
                           N_freq_xyz=2, N_freq_dir=1)
    params = init_object_nerf(jax.random.PRNGKey(2), cfg)
    x = np.random.RandomState(3).randn(6, 3).astype(np.float32)
    d = np.random.RandomState(4).randn(6, 3).astype(np.float32)

    def pe(v, n):
        parts = [v]
        for k in range(n):
            parts += [np.sin(2.0**k * v), np.cos(2.0**k * v)]
        return np.concatenate(parts, -1)

    def lrelu(v):
        return np.where(v >= 0, v, LEAKY_SLOPE * v)

    p = jax.tree_util.tree_map(np.asarray, params["scene"])
    ex, ed = pe(x, 2), pe(d, 1)
    h = ex
    for i, layer in enumerate(p["trunk"]):
        if i in cfg.skips:
            h = np.concatenate([ex, h], -1)
        h = lrelu(h @ layer["w"] + layer["b"])
    sigma_np = (h @ p["sigma"]["w"] + p["sigma"]["b"])[:, 0]
    hf = h @ p["final"]["w"] + p["final"]["b"]
    de = lrelu(np.concatenate([hf, ed], -1) @ p["dir"]["w"] + p["dir"]["b"])
    rgb_np = 1 / (1 + np.exp(-(de @ p["rgb"]["w"] + p["rgb"]["b"])))

    sigma, rgb = scene_forward(
        params, cfg, jnp.asarray(pe(x, 2)), jnp.asarray(pe(d, 1))
    )
    np.testing.assert_allclose(np.asarray(sigma), sigma_np, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb), rgb_np, rtol=2e-5, atol=1e-5)
