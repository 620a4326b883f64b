"""Lovász-softmax loss with static-shape masking and an analytic VJP.

Math parity with the Berman implementation vendored by the reference
(loss/utils/lovasz_softmax.py:22-200): per present class c, errors
``|fg_c - p_c|`` are sorted descending and dotted with the Lovász gradient
of the Jaccard loss. The reference removes `ignore` pixels by boolean
indexing (dynamic shape); here they are masked instead: an ignored pixel
contributes fg = 0 and error = 0, so it sorts behind every positive error
and its contribution (error * grad) vanishes, and the trailing cumsum
positions it perturbs only multiply zero errors.

The whole loss carries ONE custom VJP over the probability matrix: the
Jaccard-gradient vector is a function of the labels only (the sort
permutation is piecewise-constant in p — exactly how torch.autograd
differentiates the reference's ``dot(errors.sort(), lovasz_grad(...))``),
so ``d loss / d p[i, c] = -sign(fg - p) * grad[rank(i)] / #present``.
Autodiffing the sort/gather graph instead materializes several
128x-padded copies of the 640k-voxel grid per class; the analytic
backward is a handful of 1-D ops and one [N, C] stack.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _lovasz_forward(probas, labels, validf):
    """Batched over classes: ONE variadic lax.sort of the [C, N] error
    matrix with (fg, valid, index) co-sorted as payloads replaces the
    reference's per-class sort + three gathers + one scatter (18 separate
    640k-element sort pipelines → one batched pipeline; ~3x on v5e).
    Math parity: reference lovasz_softmax.py:22-33 per class."""
    n, c = probas.shape
    dtype = probas.dtype
    cls = jnp.arange(c, dtype=jnp.int32)
    fgs = (labels[None, :] == cls[:, None]).astype(dtype) \
        * validf[None, :]                          # [C, N]
    pt = probas.T
    errors = jnp.abs(fgs - pt) * validf[None, :]
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None], (c, n))
    validb = jnp.broadcast_to(validf[None], (c, n))
    neg_err_s, fg_s, valid_s, idx_s = jax.lax.sort(
        (-errors, fgs, validb, iota), dimension=1, num_keys=1)
    err_s = -neg_err_s

    gts = jnp.sum(fg_s, axis=1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_s, axis=1)
    union = gts + jnp.cumsum(valid_s - fg_s, axis=1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    grad = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)

    losses = jnp.sum(err_s * grad, axis=1)         # [C]
    present = gts[:, 0] > 0
    num_present = jnp.maximum(jnp.sum(present), 1)
    loss = jnp.sum(jnp.where(present, losses, 0.0)) / num_present

    grad_unsorted = jnp.zeros((c, n), dtype).at[
        jnp.arange(c)[:, None], idx_s].set(grad)
    dcol = -jnp.sign(fgs - pt) * validf[None, :] * grad_unsorted
    dp = (jnp.where(present[:, None], dcol, 0.0) / num_present).T
    return loss, dp


@jax.custom_vjp
def _lovasz(probas, labels, validf):
    return _lovasz_forward(probas, labels, validf)[0]


def _lovasz_fwd(probas, labels, validf):
    loss, dp = _lovasz_forward(probas, labels, validf)
    return loss, dp


def _lovasz_bwd(dp, g):
    return g * dp, None, None


_lovasz.defvjp(_lovasz_fwd, _lovasz_bwd)


def lovasz_softmax(probas, labels, valid=None, classes="present"):
    """probas: [N, C] probabilities; labels: [N] int; valid: [N] bool.

    Returns scalar loss (mean over present classes), matching
    ``lovasz_softmax_flat`` with ``classes='present'``.
    """
    n, c = probas.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    validf = valid.astype(probas.dtype)
    return _lovasz(probas, labels.astype(jnp.int32), validf)
