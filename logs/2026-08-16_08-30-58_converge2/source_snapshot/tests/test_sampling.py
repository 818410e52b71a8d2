import jax
import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.ops.sampling import stratified_sample, sample_pdf, merge_z_vals


def test_stratified_linear_depth():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = stratified_sample(jax.random.PRNGKey(0), near, far, 8, perturb=0.0)
    assert z.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(z[0]), np.linspace(2, 6, 8), rtol=1e-6)


def test_stratified_disparity():
    near = jnp.full((1, 1), 1.0)
    far = jnp.full((1, 1), 4.0)
    z = stratified_sample(jax.random.PRNGKey(0), near, far, 3, use_disp=True)
    # disparity-linear: 1/z linear between 1 and 0.25 -> mid z = 1/0.625
    np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.6, 4.0], rtol=1e-5)


def test_perturb_stays_in_bins():
    near = jnp.zeros((64, 1))
    far = jnp.ones((64, 1)) * 10
    z0 = stratified_sample(jax.random.PRNGKey(0), near, far, 16, perturb=0.0)
    z = stratified_sample(jax.random.PRNGKey(1), near, far, 16, perturb=1.0)
    z0, z = np.asarray(z0), np.asarray(z)
    mid = 0.5 * (z0[:, :-1] + z0[:, 1:])
    lower = np.concatenate([z0[:, :1], mid], -1)
    upper = np.concatenate([mid, z0[:, -1:]], -1)
    assert np.all(z >= lower - 1e-6) and np.all(z <= upper + 1e-6)
    assert np.all(np.diff(z, axis=-1) > 0)  # still sorted


def test_sample_pdf_concentrates_mass():
    """All mass in one bin ⇒ all samples land in that bin."""
    n_bins = 8
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_bins + 1), (16, n_bins + 1))
    weights = np.full((16, n_bins), 1e-8, np.float32)
    weights[:, 3] = 1.0  # bin [3/8, 4/8)
    s = sample_pdf(jax.random.PRNGKey(0), bins, jnp.asarray(weights), 64, det=False)
    s = np.asarray(s)
    inside = (s >= 3 / 8 - 1e-3) & (s <= 4 / 8 + 1e-3)
    assert inside.mean() > 0.98


def test_sample_pdf_uniform_det_matches_linspace():
    n_bins = 4
    bins = jnp.broadcast_to(jnp.linspace(2.0, 3.0, n_bins + 1), (2, n_bins + 1))
    weights = jnp.ones((2, n_bins))
    s = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, weights, 9, det=True))
    np.testing.assert_allclose(s[0], np.linspace(2, 3, 9), atol=1e-5)


def test_sample_pdf_matches_numpy_searchsorted():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(8, 11).astype(np.float32), -1)
    weights = rng.rand(8, 10).astype(np.float32)
    key = jax.random.PRNGKey(7)
    u = np.asarray(jax.random.uniform(key, (8, 33)))

    # numpy oracle (same math as the reference, rendering.py:29-61)
    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((8, 1)), np.cumsum(pdf, -1)], -1)
    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right") for i in range(8)])
    below = np.clip(inds - 1, 0, None)
    above = np.clip(inds, None, 10)
    cdf_lo = np.take_along_axis(cdf, below, -1)
    cdf_hi = np.take_along_axis(cdf, above, -1)
    b_lo = np.take_along_axis(bins, below, -1)
    b_hi = np.take_along_axis(bins, above, -1)
    denom = cdf_hi - cdf_lo
    denom[denom < 1e-5] = 1
    expect = b_lo + (u - cdf_lo) / denom * (b_hi - b_lo)

    got = np.asarray(
        sample_pdf(key, jnp.asarray(bins), jnp.asarray(weights), 33, det=False)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_merge_z_vals_sorted():
    a = jnp.asarray([[1.0, 3.0, 5.0]])
    b = jnp.asarray([[2.0, 4.0]])
    np.testing.assert_allclose(np.asarray(merge_z_vals(a, b))[0], [1, 2, 3, 4, 5])
