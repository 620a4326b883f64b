"""Deformable convolution v2 (modulated) as bilinear gather + matmul.

Needed for checkpoint fidelity with the reference's ResNet-101 backbone
(DCNv2 in stages 3-4, config/nuscenes_gs144000.py:91). Instead of the mmcv
CUDA op we compute, for each of the K*K taps, bilinearly sampled inputs at
``p + p_k + Δp_k`` scaled by the modulation mask, then contract with the
kernel weights — a K*K-tap gather followed by one MXU matmul.

Offset layout matches torchvision/mmcv ModulatedDeformConv2d: the offset
conv produces [2*K*K] channels ordered (dy_0, dx_0, dy_1, dx_1, ...) and
[K*K] mask logits (sigmoid applied here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_hw(img, y, x):
    """img: [H, W, C]; y, x: [...] absolute pixel coords. Zero padding."""
    h, w, _ = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    ly = y - y0
    lx = x - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * valid[..., None]

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    return (v00 * ((1 - ly) * (1 - lx))[..., None]
            + v01 * ((1 - ly) * lx)[..., None]
            + v10 * (ly * (1 - lx))[..., None]
            + v11 * (ly * lx)[..., None])


def deform_conv2d(x, offset, mask, weight, bias=None, *, stride: int = 1,
                  padding: int = 1, dilation: int = 1):
    """Modulated deformable conv (DCNv2), NHWC single image batch handled
    via vmap by the caller's module.

    x:      [B, H, W, C_in]
    offset: [B, H_out, W_out, 2*K*K]  (dy, dx interleaved per tap)
    mask:   [B, H_out, W_out, K*K]    (already sigmoid-ed)
    weight: [K, K, C_in, C_out]
    """
    b, h, w, c_in = x.shape
    k = weight.shape[0]
    h_out = offset.shape[1]
    w_out = offset.shape[2]

    base_y = jnp.arange(h_out) * stride - padding
    base_x = jnp.arange(w_out) * stride - padding
    gy = base_y[:, None]  # [H_out, 1]
    gx = base_x[None, :]  # [1, W_out]

    def single(img, off, m):
        cols = []
        for ky in range(k):
            for kx in range(k):
                t = ky * k + kx
                dy = off[..., 2 * t]
                dx = off[..., 2 * t + 1]
                sy = gy + ky * dilation + dy
                sx = gx + kx * dilation + dx
                v = _bilinear_hw(img, sy, sx)  # [H_out, W_out, C_in]
                cols.append(v * m[..., t:t + 1])
        cols = jnp.stack(cols, axis=-2)  # [H_out, W_out, K*K, C_in]
        wmat = weight.reshape(k * k * c_in, -1)
        out = jnp.dot(cols.reshape(h_out, w_out, k * k * c_in), wmat,
                      preferred_element_type=jnp.float32)
        return out

    out = jax.vmap(single)(x, offset, mask)
    if bias is not None:
        out = out + bias
    return out
