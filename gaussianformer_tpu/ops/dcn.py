"""Deformable convolution v2 (modulated) — TPU-native formulations.

Needed for checkpoint fidelity with the reference's ResNet-101 backbone
(DCNv2 in stages 3-4, config/nuscenes_gs144000.py:91). Instead of the mmcv
CUDA op we compute, for each of the K*K taps, bilinearly sampled inputs at
``p + p_k + Δp_k`` scaled by the modulation mask, then contract with the
kernel weights.

This module holds the exact gather formulation, :func:`deform_conv2d`:
all taps and corners flattened into a single row gather from the [H*W, C]
image. Exact for arbitrary offsets, but XLA's TPU gather engine tops out
at ~100 GB/s on v5e and each stage-3 R101 block gathers ~600 MB →
~6 ms/block, ~500 ms/frame across the 52 DCN blocks of the two flagship
towers. The backbone therefore defaults to the fused Pallas
interpolation-matrix kernel (ops/pallas/dcn_kernel.py) whenever the
shapes qualify, and uses this path as the CPU / ineligible-shape fallback
and for bit-exact verification in tests.

Offset layout matches torchvision/mmcv ModulatedDeformConv2d: the offset
conv produces [2*K*K] channels ordered (dy_0, dx_0, dy_1, dx_1, ...) and
[K*K] mask logits (sigmoid applied by the caller).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def deform_conv2d(x, offset, mask, weight, bias=None, *, stride: int = 1,
                  padding: int = 1, dilation: int = 1):
    """Modulated deformable conv (DCNv2), NHWC.

    The body is rematerialized: the im2col corner tensor is ~570MB per
    R101 stage-3 block at 6x864x1600 and 46 DCN blocks would otherwise be
    live together in the backward.

    x:      [B, H, W, C_in]
    offset: [B, H_out, W_out, 2*K*K]  (dy, dx interleaved per tap)
    mask:   [B, H_out, W_out, K*K]    (already sigmoid-ed)
    weight: [K, K, C_in, C_out]
    """
    b, h, w, c_in = x.shape
    k = weight.shape[0]
    h_out = offset.shape[1]
    w_out = offset.shape[2]
    kk = k * k

    base_y = (jnp.arange(h_out, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(w_out, dtype=jnp.float32) * stride - padding)
    tap_y = (jnp.arange(k, dtype=jnp.float32) * dilation)
    tap_x = (jnp.arange(k, dtype=jnp.float32) * dilation)
    # [H_out, W_out, K*K] static tap positions; tap t = ky * K + kx
    tap_y_full = jnp.repeat(tap_y, k)   # [kk]: ky per tap
    tap_x_full = jnp.tile(tap_x, k)     # [kk]: kx per tap
    grid_y = base_y[:, None, None] + tap_y_full[None, None, :] \
        + jnp.zeros((1, w_out, 1))
    grid_x = base_x[None, :, None] + tap_x_full[None, None, :] \
        + jnp.zeros((h_out, 1, 1))

    off = offset.reshape(b, h_out, w_out, kk, 2)
    sy = grid_y[None] + off[..., 0]
    sx = grid_x[None] + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ly = sy - y0
    lx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # corner indices and weights, flattened together: [..., K*K, 4]
    ys = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)
    xs = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)
    cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                    ly * (1 - lx), ly * lx], axis=-1)
    valid = ((ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1))
    cw = cw * valid

    flat_idx = (jnp.clip(ys, 0, h - 1) * w
                + jnp.clip(xs, 0, w - 1))  # [B, H_out, W_out, K*K, 4]
    # fold the batch into the row table so the whole op is ONE gather
    # (TPU gathers have multi-ms fixed cost; per-image gathers dominate)
    img_base = (jnp.arange(b, dtype=jnp.int32) * (h * w)
                )[:, None, None, None, None]

    # scan over row chunks, each chunk rematerialized: the full im2col
    # corner tensor is ~570MB per R101 stage-3 block at 6x864x1600 and the
    # backward would keep several alive at once. All traced values thread
    # through carry/xs (closure tracers in scan bodies leak under grad in
    # jax 0.9.0; see ops/splat.py).
    rows = 8
    h_pad = -(-h_out // rows) * rows
    n_chunks = h_pad // rows

    def pad_rows(a):
        return jnp.pad(a, [(0, 0), (0, h_pad - h_out)]
                       + [(0, 0)] * (a.ndim - 2))

    # fold the modulation mask into the corner weights and pack trailing
    # dims to kk*4: a trailing dim of 4 (or 9) pads up to 32x on TPU,
    # multiplying the scan's saved xs by gigabytes across 46 DCN blocks
    cwm = cw * mask[..., None]
    idx_all = pad_rows(flat_idx + img_base).reshape(
        b, n_chunks, rows * w_out, kk * 4).transpose(1, 0, 2, 3)
    cw_all = pad_rows(cwm).reshape(
        b, n_chunks, rows * w_out, kk * 4).transpose(1, 0, 2, 3)
    w_mat = weight.reshape(kk * c_in, -1)

    @jax.checkpoint
    def row_chunk(x_flat, w_mat, idx, cwc):
        g = x_flat[idx.reshape(-1)]
        g = g.reshape(b, rows * w_out, kk, 4, c_in)
        v = jnp.einsum("bnkrc,bnkr->bnkc", g,
                       cwc.reshape(b, rows * w_out, kk, 4).astype(g.dtype))
        return jnp.dot(v.reshape(b, rows * w_out, kk * c_in), w_mat,
                       preferred_element_type=jnp.float32)

    def body(carry, xs):
        x_flat, w_mat = carry
        idx, cwc = xs
        return (x_flat, w_mat), row_chunk(x_flat, w_mat, idx, cwc)

    _, out = jax.lax.scan(
        body, (x.reshape(b * h * w, c_in), w_mat),
        (idx_all, cw_all))
    out = out.transpose(1, 0, 2, 3).reshape(b, h_pad, w_out, -1)
    out = out[:, :h_out]
    if bias is not None:
        out = out + bias
    return out
