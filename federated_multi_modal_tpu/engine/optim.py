"""Optimizer and LR-schedule factories (optax).

Equivalent of Dassl's ``build_optimizer`` / ``build_lr_scheduler`` as used
by the reference (``trainers/maple.py:498-499``): SGD with momentum +
coupled weight decay, cosine annealing stepped **per epoch**, and a
constant-LR warmup epoch (cfg ``configs/trainers/MaPLe/...yaml:16-23``).

The schedule is a pure function ``lr(epoch)`` so the federated
broadcast-time scheduler rebuild with ``last_epoch = epoch - 1``
(``trainers/maple_fed.py:327-339``) is just evaluating it at the client's
global epoch — no hidden state to reconstruct.

Gradient clipping (global-norm 1.0, ``trainers/maple.py:577-596``) is part
of the optax chain, ordered exactly like torch: clip -> weight decay ->
momentum -> lr scaling.
"""

from __future__ import annotations

import math

import optax


def build_lr_schedule(cfg_optim):
    """Return ``lr(epoch: int|float) -> float`` (per-epoch stepping)."""
    base_lr = cfg_optim.LR
    max_epoch = cfg_optim.MAX_EPOCH
    warmup_epoch = cfg_optim.WARMUP_EPOCH
    warmup_type = cfg_optim.WARMUP_TYPE
    warmup_cons_lr = cfg_optim.WARMUP_CONS_LR
    warmup_min_lr = cfg_optim.WARMUP_MIN_LR
    scheduler = cfg_optim.LR_SCHEDULER
    stepsize = cfg_optim.STEPSIZE
    gamma = cfg_optim.GAMMA

    def main_lr(epoch: float) -> float:
        if scheduler == "cosine":
            return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / max_epoch))
        if scheduler == "single_step":
            # Dassl takes the LAST element of a list-valued STEPSIZE for
            # single_step (lr_scheduler.py: "stepsize = stepsize[-1]")
            step = stepsize[-1] if stepsize and stepsize[-1] > 0 else max_epoch
            return base_lr * (gamma ** (int(epoch) // step))
        if scheduler == "multi_step":
            n_passed = sum(1 for s in stepsize if epoch >= s)
            return base_lr * (gamma ** n_passed)
        if scheduler == "constant":
            return base_lr
        raise ValueError(f"Unknown LR scheduler: {scheduler}")

    warmup_recount = bool(getattr(cfg_optim, "WARMUP_RECOUNT", True))

    def lr(epoch: float) -> float:
        """LR for training epoch ``epoch``, matching Dassl's warmup wrapper
        exactly: the successor scheduler only starts stepping once warmup
        ends, so post-warmup epoch ``e`` runs at successor counter
        ``e - warmup`` (``WARMUP_RECOUNT``, the default) or ``e - 1``
        (successor fast-forwarded through warmup)."""
        if warmup_epoch > 0 and epoch < warmup_epoch:
            if warmup_type == "constant":
                return warmup_cons_lr
            if warmup_type == "linear":
                # Dassl LinearWarmupScheduler: epoch 0 at min_lr, then
                # base_lr * e / warmup (min_lr is NOT interpolated)
                if epoch == 0:
                    return warmup_min_lr
                return base_lr * epoch / warmup_epoch
            raise ValueError(f"Unknown warmup type: {warmup_type}")
        if warmup_epoch > 0:
            return main_lr(epoch - (warmup_epoch if warmup_recount else 1))
        return main_lr(epoch)

    return lr


def build_optimizer(cfg_optim, learning_rate: float = None):
    """Create the optax gradient transformation.

    Matches torch SGD semantics: ``buf = m*buf + (g + wd*p)``,
    ``update = -lr*buf`` (plus optional nesterov), with the reference's
    global-norm-1.0 clip applied to raw gradients first.
    """
    lr = learning_rate if learning_rate is not None else cfg_optim.LR
    clip = getattr(cfg_optim, "GRAD_CLIP_NORM", 0.0)
    # expose the LR as an injectable hyperparameter so per-epoch schedule
    # stepping is a cheap state update, not a re-jit
    return optax.inject_hyperparams(
        lambda learning_rate: tx_with_lr(cfg_optim, learning_rate, clip)
    )(learning_rate=lr)


def tx_with_lr(cfg_optim, learning_rate, clip):
    name = cfg_optim.NAME.lower()
    chain = []
    if clip and clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    if name == "sgd":
        if cfg_optim.WEIGHT_DECAY:
            chain.append(optax.add_decayed_weights(cfg_optim.WEIGHT_DECAY))
        chain.append(
            optax.trace(
                decay=cfg_optim.MOMENTUM, nesterov=bool(cfg_optim.SGD_NESTEROV)
            )
        )
    elif name == "adam":
        # torch Adam couples L2 into the gradient BEFORE the moment
        # estimates (g + wd*p feeds the first/second moments)
        if cfg_optim.WEIGHT_DECAY:
            chain.append(optax.add_decayed_weights(cfg_optim.WEIGHT_DECAY))
        chain.append(
            optax.scale_by_adam(b1=cfg_optim.ADAM_BETA1, b2=cfg_optim.ADAM_BETA2)
        )
    elif name == "adamw":
        # decoupled decay (applied after the moments, scaled by lr like
        # torch AdamW)
        chain.append(
            optax.scale_by_adam(b1=cfg_optim.ADAM_BETA1, b2=cfg_optim.ADAM_BETA2)
        )
        if cfg_optim.WEIGHT_DECAY:
            chain.append(optax.add_decayed_weights(cfg_optim.WEIGHT_DECAY))
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR in-place-ish (returns new opt_state).

    Stored as a strong-typed f32 array: ``inject_hyperparams`` initializes
    the leaf that way, and swapping in a weak-typed python float would
    change the jit aval and force a full retrace of the (donated) train
    step on the first post-update batch — an extra remote compile on the
    TPU tunnel.
    """
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
