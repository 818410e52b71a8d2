"""Optimizer + LR schedule factory (optax).

Parity with the reference factory (utils/__init__.py:25-77): optimizers
sgd / adam / radam / ranger (RAdam+Lookahead), schedulers steplr / cosine /
poly with optional gradual warmup. The reference steps schedulers per
*epoch*; here schedules are functions of the global step with
`steps_per_epoch` baked in, which reproduces the same per-epoch staircase.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import optax


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    step: jnp.ndarray


def lookahead(
    inner: optax.GradientTransformation,
    sync_period: int = 6,
    slow_step_size: float = 0.5,
) -> optax.GradientTransformation:
    """Lookahead wrapper (Ranger = RAdam + Lookahead, the reference's
    torch_optimizer.Ranger). Keeps slow weights in optimizer state; every
    `sync_period` steps the emitted update snaps params onto the
    interpolated slow weights — no param-pytree restructuring needed."""

    def init(params):
        return LookaheadState(inner.init(params), jax.tree_util.tree_map(
            jnp.asarray, params), jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        upd, inner_state = inner.update(grads, state.inner, params)
        fast = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        step = state.step + 1
        sync = (step % sync_period) == 0
        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + slow_step_size * (f - s), s),
            state.slow, fast,
        )
        updates = jax.tree_util.tree_map(
            lambda f, ns, p: jnp.where(sync, ns, f) - p, fast, new_slow, params
        )
        return updates, LookaheadState(inner_state, new_slow, step)

    return optax.GradientTransformation(init, update)


def make_lr_schedule(train_cfg, steps_per_epoch: int):
    lr = float(train_cfg["lr"])
    num_epochs = int(train_cfg["num_epochs"])
    kind = train_cfg.get("lr_scheduler", "poly")

    def epoch_of(step):
        return step // steps_per_epoch

    if kind == "poly":
        exp = float(train_cfg.get("poly_exp", 2))

        def sched(step):
            e = epoch_of(step).astype(jnp.float32) if hasattr(step, "astype") else float(epoch_of(step))
            return lr * (1.0 - e / num_epochs) ** exp

    elif kind == "steplr":
        milestones = [int(m) for m in train_cfg.get("decay_step", [20])]
        gamma = float(train_cfg.get("decay_gamma", 0.1))

        def sched(step):
            e = epoch_of(step)
            factor = jnp.float32(1.0)
            for m in milestones:
                factor = factor * jnp.where(e >= m, gamma, 1.0)
            return lr * factor

    elif kind == "cosine":

        def sched(step):
            e = epoch_of(step)
            eps = 1e-8
            return eps + 0.5 * (lr - eps) * (1 + jnp.cos(jnp.pi * e / num_epochs))

    else:
        raise ValueError(f"scheduler {kind!r} not recognized")

    warmup_epochs = int(train_cfg.get("warmup_epochs", 0))
    optimizer_kind = train_cfg.get("optimizer", "adam")
    if warmup_epochs > 0 and optimizer_kind not in ("radam", "ranger"):
        multiplier = float(train_cfg.get("warmup_multiplier", 1.0))
        base = sched

        def sched(step):  # noqa: F811 — GradualWarmupScheduler semantics
            e = step / steps_per_epoch
            frac = jnp.minimum(e / warmup_epochs, 1.0)
            warm = lr * ((multiplier - 1.0) * frac + 1.0) / multiplier
            return jnp.where(e < warmup_epochs, warm, base(step))

    return sched


def make_optimizer(train_cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_lr_schedule(train_cfg, steps_per_epoch)
    kind = train_cfg.get("optimizer", "adam")
    wd = float(train_cfg.get("weight_decay", 0))
    eps = 1e-8

    if kind == "sgd":
        momentum = float(train_cfg.get("momentum", 0.9))
        chain = [optax.trace(decay=momentum)]
    elif kind == "adam":
        chain = [optax.scale_by_adam(eps=eps)]
    elif kind in ("radam", "ranger"):
        chain = [optax.scale_by_radam(eps=eps)]
    else:
        raise ValueError(f"optimizer {kind!r} not recognized")

    if wd > 0:
        # torch couples L2 into the gradient before the moments
        chain.insert(0, optax.add_decayed_weights(wd))

    chain.append(optax.scale_by_learning_rate(sched))
    opt = optax.chain(*chain)
    if kind == "ranger":
        opt = lookahead(opt, sync_period=6, slow_step_size=0.5)
    return opt
