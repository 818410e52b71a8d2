"""Multi-object sort-merge compositing tests."""

import jax
import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.models.mlp import ObjectNeRFConfig, init_object_nerf
from object_nerf_tpu.models.code_library import init_code_library
from object_nerf_tpu.render.renderer import RenderSettings
from object_nerf_tpu.render.multi import render_rays_multi, _composite_multi

CFG = ObjectNeRFConfig(
    D=2, W=32, skips=(1,), inst_D=2, inst_W=16, inst_skips=(1,),
    use_voxel_embedding=False, N_obj_code_length=8,
)
SETTINGS = RenderSettings(
    mlp=CFG, N_samples=12, N_importance=6, perturb=0.0, noise_std=0.0,
    is_eval=True,
)


def _params():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "coarse": init_object_nerf(k1, CFG),
        "fine": init_object_nerf(k2, CFG),
        "code_library": init_code_library(k3, 16, 8),
    }


def _rays(n=6, near=0.5, far=3.0, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * 0.05
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(
        np.concatenate(
            [o, d, np.full((n, 1), near, np.float32), np.full((n, 1), far, np.float32)],
            -1,
        )
    )


def test_single_set_scene_runs_and_shapes():
    out = render_rays_multi(
        _params(), [_rays()], (0,), jax.random.PRNGKey(0), SETTINGS
    )
    assert out["rgb_fine"].shape == (6, 3)
    assert out["rgb_coarse"].shape == (6, 3)
    assert out["z_vals_fine"].shape == (6, 18)
    z = np.asarray(out["z_vals_fine"])
    assert np.all(np.diff(z, axis=-1) >= 0)


def test_muted_rays_transparent():
    """far == 0 rays must render fully transparent (sigma = -1e5)."""
    rays = np.asarray(_rays()).copy()
    rays[:3, 6:8] = 0.0  # mute first 3 rays
    out = render_rays_multi(
        _params(), [jnp.asarray(rays)], (0,), jax.random.PRNGKey(0), SETTINGS
    )
    op = np.asarray(out["opacity_fine"])
    assert np.all(op[:3] < 1e-5)


def test_sort_merge_orders_two_sets():
    """Two ray sets with analytic sigmas: the closer object wins."""
    n, s = 4, 8
    z1 = jnp.broadcast_to(jnp.linspace(2.0, 3.0, s), (n, s))  # far object
    z2 = jnp.broadcast_to(jnp.linspace(0.5, 1.0, s), (n, s))  # near object
    sig_hi = jnp.full((n, s), 1e6)
    rgb_red = jnp.zeros((n, s, 3)).at[..., 0].set(1.0)
    rgb_blue = jnp.zeros((n, s, 3)).at[..., 2].set(1.0)
    results = {}
    _composite_multi(
        results, "coarse", [z1, z2], [rgb_red, rgb_blue], [sig_hi, sig_hi],
        None, 0.0, False, keep_sort_idx=True,
    )
    rgb = np.asarray(results["rgb_coarse"])
    np.testing.assert_allclose(rgb, [[0, 0, 1]] * n, atol=1e-4)  # blue in front
    # weight recovery by inverse permutation: all mass on set 2's first sample
    idx = results["sort_idx_coarse"]
    inv = jnp.argsort(idx, axis=-1)
    w_orig = np.asarray(
        jnp.take_along_axis(results["weights_coarse"], inv, axis=-1)
    )
    w_far, w_near = w_orig[:, :s], w_orig[:, s:]
    assert w_near[:, 0].min() > 0.99
    assert w_far.max() < 1e-6


def test_removal_boxes_mute_background():
    params = _params()
    rays = _rays()
    # a big box containing everything
    affine = jnp.eye(4)[None]
    bounds = jnp.asarray([[[-100.0, -100, -100], [100, 100, 100]]])
    out_removed = render_rays_multi(
        params, [rays], (0,), jax.random.PRNGKey(0), SETTINGS,
        skip_boxes=(affine, bounds, 1.0),
    )
    assert float(np.asarray(out_removed["opacity_fine"]).max()) < 1e-5

    out_plain = render_rays_multi(
        params, [rays], (0,), jax.random.PRNGKey(0), SETTINGS
    )
    assert float(np.asarray(out_plain["opacity_fine"]).max()) > 1e-4


def test_object_branch_used_for_nonzero_ids():
    params = _params()
    out0 = render_rays_multi(
        params, [_rays()], (0,), jax.random.PRNGKey(0), SETTINGS
    )
    out5 = render_rays_multi(
        params, [_rays()], (5,), jax.random.PRNGKey(0), SETTINGS
    )
    # different branches → different images
    d = np.abs(
        np.asarray(out0["rgb_fine"]) - np.asarray(out5["rgb_fine"])
    ).max()
    assert d > 1e-4


def test_pallas_path_matches_xla():
    """The fused multi-object path (interpret mode) equals the XLA path."""
    import dataclasses
    from unittest import mock
    from object_nerf_tpu.ops import pallas_mlp

    params = _params()
    rays = _rays()
    ref = render_rays_multi(
        params, [rays, rays], (0, 5), jax.random.PRNGKey(0), SETTINGS
    )
    settings_p = dataclasses.replace(SETTINGS, use_pallas=True)
    orig = pallas_mlp.fused_mlp_eval

    def interp_eval(*a, **k):
        k["interpret"] = True
        k["dtype"] = jnp.float32
        return orig(*a, **k)

    with mock.patch.object(pallas_mlp, "fused_mlp_eval", interp_eval):
        got = render_rays_multi(
            params, [rays, rays], (0, 5), jax.random.PRNGKey(0), settings_p
        )
    for key in ("rgb_coarse", "rgb_fine", "opacity_fine", "depth_fine"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-3, atol=5e-4, err_msg=key,
        )


def test_jit_compiles():
    params = _params()
    rays = _rays()

    @jax.jit
    def f(p, r, k):
        out = render_rays_multi(p, [r, r], (0, 5), k, SETTINGS)
        return out["rgb_fine"]

    out = f(params, rays, jax.random.PRNGKey(0))
    assert out.shape == (6, 3)


def test_ten_channel_rays_clip_fine_samples():
    """10-ch rays carry a bbox mask interval in ch 8:10: fine samples
    inside (near_m, far_m) move to far_m (reference
    multi_rendering.py:279-287). An empty interval must be a no-op."""
    rays8 = _rays()
    base = render_rays_multi(
        _params(), [rays8], (0,), jax.random.PRNGKey(0), SETTINGS
    )

    empty = jnp.concatenate([rays8, jnp.zeros((rays8.shape[0], 2))], -1)
    out_e = render_rays_multi(
        _params(), [empty], (0,), jax.random.PRNGKey(0), SETTINGS
    )
    np.testing.assert_allclose(
        np.asarray(out_e["rgb_fine"]), np.asarray(base["rgb_fine"]),
        rtol=0, atol=0,
    )

    near_m, far_m = 1.0, 2.0
    masked = jnp.concatenate(
        [rays8,
         jnp.full((rays8.shape[0], 1), near_m),
         jnp.full((rays8.shape[0], 1), far_m)], -1,
    )
    out_m = render_rays_multi(
        _params(), [masked], (0,), jax.random.PRNGKey(0), SETTINGS
    )
    z = np.asarray(out_m["z_vals_fine"])
    assert not np.any((z > near_m) & (z < far_m))  # interval emptied
    assert np.all(np.diff(z, axis=-1) >= 0)  # clip preserves sort order
