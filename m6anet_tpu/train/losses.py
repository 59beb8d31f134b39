"""Loss functions (reference: m6anet/utils/loss_functions/loss_functions.py).

Registered by name for the TOML ``[loss_function]`` contract
(reference: m6anet/utils/builder.py:93-110).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# torch.nn.BCELoss clamps each log term at -100 for stability; match it.
_LOG_CLAMP = -100.0
# torch's native BCELoss backward clamps the p*(1-p) denominator at 1e-12
# (aten/src/ATen/native/Loss.cpp::binary_cross_entropy_backward)
_GRAD_EPS = 1e-12


def _bce_elementwise(y_pred, y_true):
    p = y_pred.reshape(-1)
    y = y_true.reshape(-1).astype(p.dtype)
    return _bce_core(p, y)


@jax.custom_vjp
def _bce_core(p, y):
    log_p = jnp.maximum(jnp.log(p), _LOG_CLAMP)
    log_1mp = jnp.maximum(jnp.log1p(-p), _LOG_CLAMP)
    return -(y * log_p + (1.0 - y) * log_1mp)


def _bce_core_fwd(p, y):
    return _bce_core(p, y), (p, y)


def _bce_core_bwd(res, g):
    # Torch-semantics backward: (p - y) / max(p*(1-p), 1e-12)
    # (aten BCELoss backward).  The naive autodiff of the clamped-log
    # forward produces 0 * inf = NaN at exactly p == 0 or p == 1 — and the
    # noisy-OR pooling SATURATES site probabilities at 1.0 whenever
    # prod(1-p_read) underflows, so a fresh init hits that boundary
    # routinely (2/5 multi-seed training runs NaN'd before this; the torch
    # reference survives because its backward is this clamped closed form,
    # huge-but-finite at the boundary).
    p, y = res
    grad = (p - y) / jnp.maximum(p * (1.0 - p), _GRAD_EPS)
    return g * grad, jnp.zeros_like(y)


_bce_core.defvjp(_bce_core_fwd, _bce_core_bwd)


def binary_cross_entropy_loss(y_pred, y_true, mask=None):
    """Plain BCE on probabilities
    (reference: loss_functions.py:8-20).

    ``mask`` (same length as the batch, 1.0 = real sample, 0.0 = padding)
    turns the reduction into a masked mean so wrap-around padded duplicates
    in the final batch of an epoch carry zero loss weight."""
    e = _bce_elementwise(y_pred, y_true)
    if mask is None:
        return jnp.mean(e)
    m = mask.reshape(-1).astype(e.dtype)
    return jnp.sum(e * m) / jnp.maximum(jnp.sum(m), 1.0)


def weighted_binary_cross_entropy_loss(y_pred, y_true, mask=None):
    """Inverse-class-frequency weighted BCE: label-0 samples weighted by the
    positive count and label-1 samples by the negative count
    (reference: loss_functions.py:23-39, whose tuple unpacking of sorted
    unique counts produces exactly this pairing).  ``mask`` excludes padded
    rows from both the class counts and the reduction."""
    y_true_f = y_true.reshape(-1).astype(y_pred.dtype)
    m = None if mask is None else mask.reshape(-1).astype(y_pred.dtype)
    counted = y_true_f if m is None else y_true_f * m
    n_pos = jnp.sum(counted)
    n_total = y_true_f.size if m is None else jnp.sum(m)
    n_neg = n_total - n_pos
    weights = jnp.where(y_true_f == 0, n_pos, n_neg)
    # single-class batch: the inverse-frequency weights are all zero (the
    # reference crashes on its 2-tuple unpack here); fall back to plain BCE
    # so the batch still contributes gradients
    degenerate = jnp.logical_or(n_pos == 0, n_neg == 0)
    weights = jnp.where(degenerate, jnp.ones_like(weights), weights)
    e = _bce_elementwise(y_pred, y_true) * weights
    if m is None:
        return jnp.mean(e)
    return jnp.sum(e * m) / jnp.maximum(jnp.sum(m), 1.0)


LOSS_REGISTRY = {
    "binary_cross_entropy_loss": binary_cross_entropy_loss,
    "weighted_binary_cross_entropy_loss": weighted_binary_cross_entropy_loss,
}


def build_loss_function(config: dict):
    """Resolve ``loss_function_type`` (+ extra kwargs) from a train config
    (reference: m6anet/utils/builder.py:93-110)."""
    config = dict(config)
    if "loss_function_type" not in config:
        raise ValueError("Config must specify loss_function_type")
    name = config.pop("loss_function_type")
    if name not in LOSS_REGISTRY:
        raise ValueError(f"Unknown loss function {name!r}; available: {sorted(LOSS_REGISTRY)}")
    fn = LOSS_REGISTRY[name]
    if config:
        import functools

        fn = functools.partial(fn, **config)
    return fn
