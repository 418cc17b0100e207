"""Optimizer: SGD + momentum with per-parameter-group LR multipliers and
weight decay masks, plus the reference LR schedules.

Behavioral reference in twke18/SPML:
* lib/nn/optimizer.py:18-104 — SGD.step(lr): d_p = grad + wd*p;
  buf = momentum*buf + d_p; p -= lr * group_mult * buf (wd folded in
  BEFORE momentum, per-group multiplier, schedule LR passed per step);
* per-group multipliers (resnet_deeplab.py:185-220,
  segsort_softmax.py:270-289): backbone res3-5 weights x1 / biases x2
  (wd 0 on biases), head (aspp/pspp) weights x10 / biases x20 (wd 0),
  classifier weights x10 / biases x20 (wd 0); stem + res2 are absent
  from every group -> frozen;
* spml/utils/general/train.py:8-57 — lr_poly (power .9, 1/10-ramp
  warmup, min with poly) and lr_step.

optax formulation: add_decayed_weights(mask) -> trace(momentum) ->
per-leaf multiplier scale -> scale by -schedule(step).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def lr_poly(base_lr: float, max_iter: int, warmup_iter: int = 0,
            power: float = 0.9) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        poly = base_lr * (1.0 - step / max_iter) ** power
        if warmup_iter > 0:
            alpha = step / warmup_iter
            ramp = base_lr * (0.1 * (1.0 - alpha) + alpha)
            warm = jnp.minimum(ramp, poly)
            return jnp.where(step < warmup_iter, warm, poly)
        return poly
    return schedule


def lr_step(base_lr: float, decay_iters: tuple[int, ...],
            warmup_iter: int = 0) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.sum(jnp.asarray(
            [step >= d for d in decay_iters], jnp.float32)) \
            if decay_iters else 0.0
        lr = base_lr * (0.1 ** idx)
        if warmup_iter > 0:
            alpha = step / warmup_iter
            ramp = base_lr * (0.1 * (1.0 - alpha) + alpha)
            return jnp.where(step < warmup_iter, ramp, lr)
        return lr
    return schedule


def make_schedule(train_cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if train_cfg.lr_policy == "step":
        return lr_step(train_cfg.base_lr, tuple(train_cfg.decay_iterations),
                       train_cfg.warmup_iteration)
    return lr_poly(train_cfg.base_lr, train_cfg.max_iteration,
                   train_cfg.warmup_iteration)


# ---------------------------------------------------------------------------
# Parameter grouping
# ---------------------------------------------------------------------------

FROZEN = "frozen"
BACKBONE_W = "backbone_w"     # x1, wd
BACKBONE_B = "backbone_b"     # x2, no wd
HEAD_W = "head_w"             # x10, wd
HEAD_B = "head_b"             # x20, no wd

GROUP_MULT = {FROZEN: 0.0, BACKBONE_W: 1.0, BACKBONE_B: 2.0,
              HEAD_W: 10.0, HEAD_B: 20.0}
GROUP_WD = {FROZEN: False, BACKBONE_W: True, BACKBONE_B: False,
            HEAD_W: True, HEAD_B: False}

def label_param(path: tuple[str, ...]) -> str:
    """Map a flax param path to its optimizer group.

    Paths look like (...,'resnet_backbone','res3','block0','conv1','conv',
    'kernel') or (...,'aspp','aspp_1','kernel') or classifier-head paths;
    a leading namespace ('embedding'/'prediction') may prefix them. The
    leaf is 'kernel'/'scale' (weight-like, the reference's 'weight'
    suffix) or 'bias'.
    """
    leaf = path[-1]
    is_bias = leaf == "bias"
    if "resnet_backbone" in path:
        stage = path[path.index("resnet_backbone") + 1]
        if stage in ("stem", "res2"):
            return FROZEN
        return BACKBONE_B if is_bias else BACKBONE_W
    # everything else is a "head" in the reference's LR scheme
    return HEAD_B if is_bias else HEAD_W


def param_labels(params) -> Any:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def to_name(kp):
        return tuple(getattr(k, "key", str(k)) for k in kp)

    labels = {to_name(kp): label_param(to_name(kp)) for kp, _ in flat}
    # rebuild as a pytree matching params
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: labels[to_name(kp)], params)


def make_optimizer(params, train_cfg,
                   schedule: Callable | None = None) -> optax.GradientTransformation:
    """SGD chain with the reference's exact update order
    (lib/nn/optimizer.py:77-102): d_p = g + wd*p, THEN the per-group
    multiplier and the step's schedule LR scale d_p, THEN the momentum
    buffer accumulates (buf = m*buf + lr_t*mult*d_p; p -= buf). Folding
    the LR into the buffer (rather than scaling the buffer by the
    current LR) matters whenever the schedule changes over time: old
    gradients decay at the LR of THEIR step."""
    labels = param_labels(params)
    if schedule is None:
        schedule = make_schedule(train_cfg)

    wd_mask = jax.tree.map(lambda lab: GROUP_WD[lab], labels)
    mults = jax.tree.map(lambda lab: GROUP_MULT[lab], labels)

    def scale_by_group(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    group_scale = optax.GradientTransformation(
        lambda params: optax.EmptyState(), scale_by_group)

    return optax.chain(
        optax.add_decayed_weights(train_cfg.weight_decay, mask=wd_mask),
        group_scale,
        optax.scale_by_schedule(schedule),   # +lr(step) into the buffer
        optax.trace(decay=train_cfg.momentum),
        optax.scale(-1.0),
    )


def _scale_by_reference_adam(b1: float, b2: float, eps: float):
    """Adam moment scaling with the reference's (old-torch) epsilon
    placement: denom = sqrt(nu) + eps computed on the UNCORRECTED second
    moment, then the update is scaled by sqrt(1-b2^t)/(1-b1^t)
    (lib/nn/optimizer.py:160-179). Differs from optax.scale_by_adam,
    whose eps is added after bias correction.
    """
    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        t = count.astype(jnp.float32)
        scale = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        out = jax.tree.map(
            lambda m, v: scale * m / (jnp.sqrt(v) + eps), mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_adam_optimizer(params, train_cfg, schedule: Callable | None = None,
                        betas=(0.9, 0.999),
                        eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with the same per-group LR multiplier / wd-mask chain as the
    SGD path.

    Reference: lib/nn/optimizer.py:107-179 (Adam.step(lr)) — wd is L2
    folded into the gradient BEFORE the moment updates (:165-166), the
    per-group multiplier and the per-step schedule LR both scale the
    final step (:174-176). Unused by the reference's shipped pipelines
    but part of its optimizer surface.
    """
    labels = param_labels(params)
    if schedule is None:
        schedule = make_schedule(train_cfg)
    wd_mask = jax.tree.map(lambda lab: GROUP_WD[lab], labels)
    mults = jax.tree.map(lambda lab: GROUP_MULT[lab], labels)

    def scale_by_group(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    group_scale = optax.GradientTransformation(
        lambda params: optax.EmptyState(), scale_by_group)

    return optax.chain(
        optax.add_decayed_weights(train_cfg.weight_decay, mask=wd_mask),
        _scale_by_reference_adam(betas[0], betas[1], eps),
        group_scale,
        optax.scale_by_learning_rate(schedule),
    )


def build_optimizer(params, train_cfg,
                    schedule: Callable | None = None
                    ) -> optax.GradientTransformation:
    """Dispatch on train.optimizer ('sgd' | 'adam') — the config-level
    counterpart of the reference importing SGD or Adam from
    lib/nn/optimizer.py."""
    kind = getattr(train_cfg, "optimizer", "sgd")
    if kind == "adam":
        return make_adam_optimizer(params, train_cfg, schedule)
    if kind != "sgd":
        raise ValueError(f"train.optimizer must be 'sgd' or 'adam', "
                         f"got {kind!r}")
    return make_optimizer(params, train_cfg, schedule)


def clip_grads(grads, clip_value: float):
    """Elementwise gradient clamp to [-clip_value, clip_value].

    Reference: lib/nn/optimizer.py:182-197 (clip_grad) in twke18/SPML —
    provided for parity; the reference train scripts don't enable it.
    """
    return jax.tree.map(
        lambda g: jnp.clip(g, -clip_value, clip_value), grads)
