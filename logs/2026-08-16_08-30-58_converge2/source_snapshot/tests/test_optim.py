"""Optimizer/scheduler factory: reference semantics (utils/__init__.py:25-77)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from object_nerf_tpu.train.optim import make_optimizer, make_lr_schedule, lookahead


def _cfg(**over):
    base = dict(
        optimizer="adam", lr=1e-3, momentum=0.9, weight_decay=0,
        lr_scheduler="poly", poly_exp=2, num_epochs=30,
        decay_step=[20], decay_gamma=0.1,
        warmup_epochs=0, warmup_multiplier=1.0,
    )
    base.update(over)
    return base


def test_poly_schedule_staircase():
    sched = make_lr_schedule(_cfg(), steps_per_epoch=100)
    # epoch 0 → lr; epoch 15 → lr*(1-0.5)^2
    np.testing.assert_allclose(float(sched(jnp.int32(0))), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.int32(99))), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(
        float(sched(jnp.int32(1500))), 1e-3 * 0.25, rtol=1e-6
    )


def test_steplr_schedule():
    sched = make_lr_schedule(
        _cfg(lr_scheduler="steplr", decay_step=[2, 4], decay_gamma=0.1),
        steps_per_epoch=10,
    )
    np.testing.assert_allclose(float(sched(jnp.int32(0))), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.int32(25))), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.int32(45))), 1e-5, rtol=1e-5)


def test_warmup():
    sched = make_lr_schedule(
        _cfg(warmup_epochs=2, warmup_multiplier=4.0), steps_per_epoch=10
    )
    # starts at lr/multiplier, ramps to lr by epoch 2
    assert float(sched(jnp.int32(0))) < 1e-3 / 2
    np.testing.assert_allclose(float(sched(jnp.int32(30))), 1e-3 * (1 - 3/30)**2,
                               rtol=1e-5)


@pytest.mark.parametrize("kind", ["sgd", "adam", "radam", "ranger"])
def test_optimizers_step(kind):
    opt = make_optimizer(_cfg(optimizer=kind), steps_per_epoch=10)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    for _ in range(8):
        grads = {"w": jnp.ones((4, 4)) * 0.1}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert float(params["w"][0, 0]) < 1.0  # descended
    assert np.isfinite(np.asarray(params["w"])).all()


def test_lookahead_syncs_to_slow():
    inner = optax.sgd(0.1)
    opt = lookahead(inner, sync_period=2, slow_step_size=0.5)
    params = {"w": jnp.asarray(10.0)}
    state = opt.init(params)
    history = []
    for _ in range(4):
        updates, state = opt.update({"w": jnp.asarray(1.0)}, state, params)
        params = optax.apply_updates(params, updates)
        history.append(float(params["w"]))
    # steps: fast 9.9; sync → slow 10 + 0.5*(9.8-10) = 9.9; fast 9.8;
    # sync → slow 9.9 + 0.5*(9.7-9.9) = 9.8
    np.testing.assert_allclose(history, [9.9, 9.9, 9.8, 9.8], rtol=1e-6)


def test_weight_decay_coupled():
    opt = make_optimizer(
        _cfg(optimizer="sgd", weight_decay=0.1, momentum=0.0,
             lr_scheduler="steplr", decay_step=[99]),
        steps_per_epoch=10,
    )
    params = {"w": jnp.asarray(2.0)}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.asarray(0.0)}, state, params)
    # grad 0 + wd*param = 0.2 → update -lr*0.2
    np.testing.assert_allclose(float(updates["w"]), -1e-3 * 0.2, rtol=1e-5)
