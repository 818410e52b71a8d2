import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.ops.compositing import (
    composite,
    composite_instance,
    compute_deltas,
    weights_from_alphas,
)


def test_deltas_conventions():
    z = jnp.asarray([[1.0, 2.0, 4.0]])
    d_inf = np.asarray(compute_deltas(z, last_delta_inf=True))
    d_zero = np.asarray(compute_deltas(z, last_delta_inf=False))
    np.testing.assert_allclose(d_inf[0], [1.0, 2.0, 1e10])
    np.testing.assert_allclose(d_zero[0], [1.0, 2.0, 0.0])


def test_constant_sigma_closed_form():
    """Constant σ over [near, far] with infinite last delta ⇒ opacity ≈ 1
    and analytic per-sample weights w_i = (1-exp(-σδ)) exp(-σ z_i_rel)."""
    sigma_val = 0.7
    n = 64
    z = jnp.broadcast_to(jnp.linspace(1.0, 3.0, n), (1, n))
    sig = jnp.full((1, n), sigma_val)
    rgb = jnp.ones((1, n, 3)) * 0.5
    out = composite(sig, rgb, z, noise_std=0.0, last_delta_inf=True)
    assert abs(float(out.opacity[0]) - 1.0) < 1e-4  # inf delta absorbs all
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [0.5, 0.5, 0.5], atol=1e-4)
    # depth ≈ E[z] under exponential attenuation from z=1
    # analytic: 1 + 1/σ (truncated at far, but opacity→1 via last slab at z=3)
    d = float(out.depth[0])
    assert 1.0 < d < 3.0


def test_zero_sigma_transparent():
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (2, 8))
    out = composite(jnp.zeros((2, 8)), jnp.ones((2, 8, 3)), z, last_delta_inf=False)
    np.testing.assert_allclose(np.asarray(out.opacity), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rgb), 0.0, atol=1e-6)
    out_wb = composite(
        jnp.zeros((2, 8)), jnp.ones((2, 8, 3)), z, last_delta_inf=False, white_back=True
    )
    np.testing.assert_allclose(np.asarray(out_wb.rgb), 1.0, atol=1e-6)


def test_weights_exclusive_cumprod():
    alphas = jnp.asarray([[0.5, 0.5, 1.0]])
    w = np.asarray(weights_from_alphas(alphas))[0]
    np.testing.assert_allclose(w, [0.5, 0.25, 0.25], rtol=1e-5)


def test_opaque_first_sample_wins():
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 4), (1, 4))
    sig = jnp.asarray([[1e8, 0.0, 0.0, 0.0]])
    rgb = jnp.zeros((1, 4, 3)).at[0, 0].set(jnp.asarray([1.0, 0.0, 0.0]))
    out = composite(sig, rgb, z, last_delta_inf=True)
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(float(out.depth[0]), 1.0, atol=1e-5)


def test_instance_occlusion_suppression():
    """Instance density behind the scene surface must be zeroed in training."""
    n = 16
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, n), (2, n))
    # scene depth says surface at 1.2
    scene_depth = jnp.asarray([1.2, 1.2])
    inst_sig = jnp.full((2, n), 50.0)  # instance density everywhere
    inst_rgb = jnp.zeros((2, n, 3))
    pt_mask = jnp.asarray([False, True])  # ray 1 passes through

    out = composite_instance(
        inst_sig, inst_rgb, z, scene_depth,
        noise_std=0.0, frustum_bound_th=0.05,
        pass_through_mask=pt_mask, apply_occlusion=True,
    )
    w = np.asarray(out.weights)
    zn = np.asarray(z)
    # ray 0: no weight beyond 1.25
    assert w[0][zn[0] > 1.25 + 1e-6].max() < 1e-6
    # ray 1 (pass-through): weights unaffected where transmittance remains
    out_no = composite_instance(
        inst_sig, inst_rgb, z, scene_depth,
        noise_std=0.0, frustum_bound_th=0.0, apply_occlusion=False,
    )
    np.testing.assert_allclose(w[1], np.asarray(out_no.weights)[1], rtol=1e-5)


def test_instance_always_white_back():
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 4), (1, 4))
    out = composite_instance(
        jnp.zeros((1, 4)), jnp.zeros((1, 4, 3)), z, jnp.asarray([1.5]),
        apply_occlusion=False,
    )
    np.testing.assert_allclose(np.asarray(out.rgb[0]), 1.0, atol=1e-6)
