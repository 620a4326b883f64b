"""Numerically clamped sigmoid / logit.

Behavioral parity with the reference's clamped ops
(reference: model/utils/safe_ops.py:7-13 — sigmoid input clamped to ±9.21,
logit input clamped to [1e-4, 0.9999]).
"""
import jax
import jax.numpy as jnp

SIGMOID_CLAMP = 9.21
LOGIT_MAX = 0.9999


def safe_sigmoid(x):
    x = jnp.clip(x, -SIGMOID_CLAMP, SIGMOID_CLAMP)
    return jax.nn.sigmoid(x)


def safe_inverse_sigmoid(x):
    x = jnp.clip(x, 1.0 - LOGIT_MAX, LOGIT_MAX)
    return jnp.log(x / (1.0 - x))
