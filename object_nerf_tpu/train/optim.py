"""Optimizer + LR schedule factory (optax).

Parity with the reference factory (utils/__init__.py:25-77): optimizers
sgd / adam / radam / ranger (RAdam+Lookahead), schedulers steplr / cosine /
poly with optional gradual warmup. The reference steps schedulers per
*epoch*; here schedules are functions of the global step with
`steps_per_epoch` baked in, which reproduces the same per-epoch staircase.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


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
    elif kind == "radam":
        chain = [optax.scale_by_radam(eps=eps)]
    elif kind == "ranger":
        # Ranger = RAdam + Lookahead; approximated by RAdam here (lookahead's
        # slow weights need a wrapper state — tracked as future work)
        chain = [optax.scale_by_radam(eps=eps)]
    else:
        raise ValueError(f"optimizer {kind!r} not recognized")

    if wd > 0:
        # torch couples L2 into the gradient before the moments
        chain.insert(0, optax.add_decayed_weights(wd))

    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain)
