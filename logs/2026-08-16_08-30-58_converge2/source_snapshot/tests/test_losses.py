import jax.numpy as jnp
import numpy as np

from object_nerf_tpu.train.losses import total_loss, _masked_mean

W = {
    "color_loss_weight": 1.0,
    "depth_loss_weight": 0.1,
    "opacity_loss_weight": 10.0,
    "instance_color_loss_weight": 1.0,
    "instance_depth_loss_weight": 0.1,
}


def _batch(n=8, inst=True):
    b = {
        "rgbs": jnp.ones((n, 3)) * 0.5,
        "depths": jnp.ones((n,)) * 2.0,
        "valid_mask": jnp.ones((n,), bool),
    }
    if inst:
        b["instance_mask"] = jnp.asarray([True] * (n // 2) + [False] * (n - n // 2))
        b["instance_mask_weight"] = jnp.ones((n,))
    return b


def _results(n=8, val=0.5, fine=True):
    r = {
        "rgb_coarse": jnp.full((n, 3), val),
        "depth_coarse": jnp.full((n,), 2.0),
        "opacity_instance_coarse": jnp.ones((n,)),
        "rgb_instance_coarse": jnp.full((n, 3), val),
        "depth_instance_coarse": jnp.full((n,), 2.0),
    }
    if fine:
        r.update({k.replace("coarse", "fine"): v for k, v in r.items()})
    return r


def test_perfect_prediction_color_depth_zero():
    loss, d = total_loss(_results(), _batch(), W)
    assert float(d["color_loss"]) < 1e-10
    assert float(d["depth_loss"]) < 1e-10
    assert float(d["instance_color_loss"]) < 1e-10
    # opacity: predicted 1 everywhere but mask is half zeros → mse = 0.5
    np.testing.assert_allclose(float(d["opacity_loss"]), 0.5 * 2, rtol=1e-5)  # c+f


def test_weights_applied_and_log_dict_deweighted():
    res = _results(val=0.7)
    loss, d = total_loss(res, _batch(), W)
    # color err (0.2^2)=0.04 per elem, coarse+fine = 0.08
    np.testing.assert_allclose(float(d["color_loss"]), 0.08, rtol=1e-4)
    # loss_sum includes weight 1.0 for color; opacity term weighted by 10
    raw_opacity = float(d["opacity_loss"])
    total = float(loss)
    assert total > 10 * raw_opacity * 0.99  # dominated by weighted opacity


def test_empty_mask_contributes_zero():
    b = _batch()
    b["valid_mask"] = jnp.zeros((8,), bool)
    loss, d = total_loss(_results(val=0.9), b, W)
    assert float(loss) == 0.0


def test_empty_instance_mask_zero_instance_terms():
    b = _batch()
    b["instance_mask"] = jnp.zeros((8,), bool)
    res = _results(val=0.9)
    loss, d = total_loss(res, b, W)
    assert float(d["instance_color_loss"]) == 0.0
    assert float(d["instance_depth_loss"]) == 0.0
    assert float(d["color_loss"]) > 0.0


def test_masked_mean_matches_boolean_indexing():
    rng = np.random.RandomState(0)
    x = rng.rand(50).astype(np.float32)
    m = rng.rand(50) > 0.5
    got = float(_masked_mean(jnp.asarray(x), jnp.asarray(m)))
    np.testing.assert_allclose(got, x[m].mean(), rtol=1e-6)


def test_depth_zero_pixels_excluded():
    b = _batch()
    b["depths"] = jnp.asarray([0.0] * 4 + [2.0] * 4)
    res = _results()
    res["depth_coarse"] = jnp.asarray([99.0] * 4 + [2.0] * 4)  # wrong where depth=0
    res["depth_fine"] = res["depth_coarse"]
    _, d = total_loss(res, b, W)
    assert float(d["depth_loss"]) < 1e-10
