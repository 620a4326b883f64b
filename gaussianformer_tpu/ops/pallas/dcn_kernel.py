"""Pallas TPU kernel for modulated deformable conv (DCNv2).

Replaces the XLA row-gather formulation (ops/dcn.py) on TPU: XLA's gather
engine tops out at ~100 GB/s and each stage-3 R101 DCN block gathers
~600 MB (≈6 ms). Here every (output-tile, tap, corner) sample is a row of
a sparse interpolation matrix M built *in VMEM*, so the sampling becomes
two MXU matmuls per tile and the image is read once, densely:

    per 8x8 output tile (grid step), per tap k (9 static taps):
      window_k <- strip[tap_y-margin : +WIN-TILE rows, j*T : j*T+WIN, :]
                  (static dim-0 slice of the one strip DMA per tile row)
      M_T[p, s] = R[p_y, s] * C[p_x, s]                (VPU, separable)
      acc_k    = M_T^T @ window_k.reshape((WIN-T)*WIN, C)   (MXU)
      out     += acc_k @ W[k]                          (MXU)

The per-tap row windows contract K = (WIN-TILE)*WIN instead of WIN*WIN
(1.5x fewer sampling-matmul MACs and 1.5x less M-build at WIN=24).
Sampling positions are exact while every offset stays within the static
window of its tap: row margin ``(WIN - 2*TILE) / 2`` (±4 feature px at
the default WIN=24), column margin ``(WIN - TILE - 3) / 2`` (±6.5).
Corners farther out are dropped (zero weight AND zero gradient) instead
of sampled. Trained DCN offsets are overwhelmingly within ±4 px; widen
via the config's ``dcn_win`` (utils.check_dcn_offset_margin guards
converted checkpoints). The exact gather path remains available for
verification (ops/dcn.py).

Layouts are chosen so nothing ever needs a Mosaic relayout: per-tile
offset/mask data arrives tap-major as a [32, 64] block (rows = 9*dy, 9*dx,
9*mask, pad; cols = 64 positions), sample order is s = k*64 + p, and the
second matmul slices acc by static tap ranges.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, offm_ref, w_ref, epi_ref, out_ref, strip_buf, sem, *,
            h: int, w: int, c_in: int, c_out: int, win: int, tile: int,
            num_tc: int, w_strip: int, epilogue: bool):
    i = pl.program_id(1)
    b = pl.program_id(0)
    lead = (win - tile) // 2
    kk = 9
    # per-tap row-window height: tap k samples rows i*T + tap_y +
    # [-(wty-T)/2, ...), a STATIC dim-0 slice of the strip — so the
    # sampling matmul contracts K = wty*win instead of win*win
    # (1.5x fewer MACs and 1.5x less M-build at win=24). Row margin is
    # (win - 2*tile)/2 (= ±4 at 24); column margin stays (win-tile-3)/2.
    wty = win - tile
    lead_ty = (wty - tile) // 2

    # One DMA per TILE ROW: adjacent windows overlap by (win - tile)
    # columns, so the strip read moves ~3x fewer bytes than per-tile
    # windows, and the per-invocation fixed cost is amortized over
    # num_tc tiles. x arrives W-padded only (columns shifted by `lead`
    # so interior window loads stay sublane-aligned — Mosaic requires
    # 8-aligned DMA slice shapes); ROWS are unpadded: the DMA start is
    # clamped into [0, h-win] and each tap group's window origin is
    # re-derived dynamically below (out-of-image corners already carry
    # zero M weight via oky, so clamped strips are value-exact).
    s_c = jnp.clip(i * tile - lead, 0, h - win)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(s_c, win), :, :], strip_buf, sem)
    copy.start()

    s_tap = tile * tile
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (1, s_tap), 1)
    py = (q_iota // tile).astype(jnp.float32)
    px = (q_iota % tile).astype(jnp.float32)
    iota_ty = jax.lax.broadcasted_iota(jnp.int32, (wty, 1), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)

    # offm arrives in its NATURAL conv-output layout [1, T, Wp, 3kk]
    # (dy/dx interleaved then mask — no host-side repack: the packed
    # [B, nt, 8, kk*T*T] relayout chain measured ~16 ms/frame across the
    # 52 flagship blocks). Each tile's [T*T, 3kk] slab is transposed to
    # [3kk, T*T] lane vectors ON THE MXU via an identity matmul: exact
    # for bf16 inputs at one pass, and for normal f32 at HIGHEST (the
    # 3-term bf16 split x = hi+mid+lo is exact, and each term times the
    # 0/1 identity accumulates back losslessly in f32).
    od = offm_ref.dtype
    eye = (jax.lax.broadcasted_iota(jnp.int32, (s_tap, s_tap), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (s_tap, s_tap), 1)
           ).astype(od)
    prec = (jax.lax.Precision.HIGHEST if od == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def transpose_slab(j):
        # clamped at j == num_tc (the prefetched value past the last
        # tile is discarded)
        slab = offm_ref[0, :, pl.ds(jnp.minimum(j, num_tc - 1) * tile,
                                    tile), :].reshape(s_tap, 3 * kk)
        return jax.lax.dot_general(
            slab, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                             # [3kk, T*T]

    copy.wait()

    def one_tile(j, t_om):
        # ---- sample geometry: everything lives on [1, 64] lane vectors
        # per tap (tap-major packing s = k*64 + p). Taps with the same
        # tap_y share the SAME row window, so the sampling matmul runs
        # once per row group with S = 3*64 = 192 samples (long enough to
        # keep the MXU pipeline filled; per-tap S=64 measured neutral).

        # software pipeline: tile j+1's transpose (MXU) is issued here,
        # independent of tile j's M build (VPU), so the two can overlap
        t_om_next = transpose_slab(j + 1)

        out = jnp.zeros((tile * tile, c_out), jnp.float32)
        for ty in (-1, 0, 1):
            # desired window origin (image row) for this tap group, and
            # its clamp into the strip's actual coverage [s_c, s_c+win):
            # rows the clamp pushes out of the window are exactly the
            # rows oky/iota-range already weight to zero (see fwd notes)
            o = i * tile + ty - lead_ty
            o_c = jnp.clip(o, s_c, s_c + win - wty)
            m_parts = []
            for tx in (-1, 0, 1):
                k = (ty + 1) * 3 + (tx + 1)
                off_y = t_om[2 * k:2 * k + 1, :]
                off_x = t_om[2 * k + 1:2 * k + 2, :]
                mask = t_om[2 * kk + k:2 * kk + k + 1, :]

                sy = (i * tile + ty).astype(jnp.float32) + py + off_y
                sx = (j * tile + tx).astype(jnp.float32) + px + off_x
                y0 = jnp.floor(sy)
                x0 = jnp.floor(sx)
                fy = sy - y0
                fx = sx - x0
                y0i = y0.astype(jnp.int32)
                x0i = x0.astype(jnp.int32)

                # M^T via the SEPARABLE bilinear build: corner weight
                # wy*wx factors into row and column one-hot builds on
                # [wty, 64] / [win, 64] blocks; out-of-window corners
                # match no iota row and drop out (zero weight),
                # image-bounds validity factors per axis.
                # tap-row windows: global [o_c, o_c + wty)
                ry0 = y0i - o_c
                rx0 = x0i - (j * tile - lead)
                oky0 = (y0i >= 0) & (y0i <= h - 1)
                oky1 = (y0i >= -1) & (y0i <= h - 2)
                okx0 = (x0i >= 0) & (x0i <= w - 1)
                okx1 = (x0i >= -1) & (x0i <= w - 2)
                r_fac = (jnp.where(iota_ty == ry0,
                                   (1.0 - fy) * oky0, 0.0)
                         + jnp.where(iota_ty == ry0 + 1,
                                     fy * oky1, 0.0)) * mask
                c_fac = (jnp.where(iota_w == rx0,
                                   (1.0 - fx) * okx0, 0.0)
                         + jnp.where(iota_w == rx0 + 1,
                                     fx * okx1, 0.0))
                m_parts.append(
                    (r_fac[:, None, :] * c_fac[None, :, :]).reshape(
                        wty * win, s_tap))
            m_t = jnp.concatenate(m_parts, axis=1).astype(
                strip_buf.dtype)                    # [wty*win, 192]

            # strip rows of the group window (dynamic start: the strip's
            # own origin s_c is row-clamped at the image edges)
            win_k = strip_buf[pl.ds(o_c - s_c, wty),
                              pl.ds(j * tile, win), :].reshape(
                                  wty * win, c_in)

            acc = jax.lax.dot_general(
                m_t, win_k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(
                strip_buf.dtype)                    # [192, C]
            for tx in (-1, 0, 1):
                k = (ty + 1) * 3 + (tx + 1)
                acc_k = acc[(tx + 1) * s_tap:(tx + 2) * s_tap, :]
                out = out + jax.lax.dot_general(
                    acc_k, w_ref[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        if epilogue:
            # fused frozen-BN + ReLU (inference path): XLA cannot fuse
            # elementwise consumers into a custom call, so without this
            # every DCN block pays a separate full-map pass
            out = jnp.maximum(out * epi_ref[0:1, :] + epi_ref[1:2, :],
                              0.0)
        out_ref[0, :, pl.ds(j * tile, tile), :] = out.reshape(
            tile, tile, c_out).astype(out_ref.dtype)
        return t_om_next

    jax.lax.fori_loop(0, num_tc, one_tile, transpose_slab(0))


def _natural_offmask(offset, mask, num_tr, num_tc, tile):
    """offset [B,H,W,2kk] (dy,dx interleaved) + mask [B,H,W,kk] →
    [B, Hp, Wp, 3kk] in the natural conv-output layout: one cheap
    pad+concat fusion (the kernels transpose each tile's [T*T, 3kk]
    slab to lane vectors on the MXU — see _kernel)."""
    b, h, w, _ = offset.shape
    return jnp.pad(
        jnp.concatenate([offset, mask.astype(offset.dtype)], axis=-1),
        ((0, 0), (0, num_tr * tile - h), (0, num_tc * tile - w), (0, 0)))


def deform_conv2d_pallas_fwd(x, offset, mask, weight, *, win: int = 24,
                             tile: int = 8, interpret: bool = False,
                             epilogue=None):
    """Forward-only Pallas DCN. x [B,H,W,C] (bf16 recommended),
    offset/mask as in ops/dcn.deform_conv2d, weight [3,3,C_in,C_out].

    ``epilogue``: optional (inv [C_out], shift [C_out]) f32 pair — the
    kernel then emits ``relu(out * inv + shift)`` (fused frozen-BN +
    ReLU; forward-only, used on the inference path)."""
    b, h, w, c_in = x.shape
    k = weight.shape[0]
    c_out = weight.shape[-1]
    assert k == 3
    assert h >= win and w >= win, (h, w, win)
    num_tr = -(-h // tile)
    num_tc = -(-w // tile)

    offm = _natural_offmask(offset, mask, num_tr, num_tc, tile)
    w_taps = weight.reshape(k * k, c_in, c_out).astype(x.dtype)
    if epilogue is not None:
        inv, shift = epilogue
        epi = jnp.concatenate(
            [inv.astype(jnp.float32)[None], shift.astype(jnp.float32)[None],
             jnp.zeros((6, c_out), jnp.float32)], axis=0)
    else:
        epi = jnp.zeros((8, c_out), jnp.float32)

    # W-only pad (lead columns of zeros on the left, tile-grid + lead
    # slack on the right) keeps the kernel's window loads
    # sublane-aligned; rows go in UNPADDED — the kernel clamps its
    # strip DMA rows into [0, h-win] (see _kernel notes).
    lead = (win - tile) // 2
    w_strip = num_tc * tile + 2 * lead
    xp = jnp.pad(x, ((0, 0), (0, 0), (lead, w_strip - w - lead), (0, 0)))
    out = _fwd_call(b, num_tr, num_tc, h, w, c_in, c_out, win, tile,
                    epilogue is not None, jnp.dtype(x.dtype).name,
                    jnp.dtype(offm.dtype).name,
                    interpret)(xp, offm, w_taps, epi)
    return out[:, :h, :w]


@functools.lru_cache(maxsize=64)
def _fwd_call(b, num_tr, num_tc, h, w, c_in, c_out, win, tile,
              epilogue: bool, dtype_name: str, off_dtype_name: str,
              interpret: bool):
    """Memoized pallas_call: the flagship forward holds 52 DCN blocks
    of only a few distinct shapes; a fresh kernel partial per block
    defeats JAX's tracing cache (JAX_EXPLAIN_CACHE_MISSES: "function is
    being re-defined repeatedly, preventing caching") and re-lowers /
    re-compiles the identical Mosaic kernel dozens of times per cold
    process."""
    lead = (win - tile) // 2
    w_strip = num_tc * tile + 2 * lead
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(
        _kernel, h=h, w=w, c_in=c_in, c_out=c_out, win=win, tile=tile,
        num_tc=num_tc, w_strip=w_strip, epilogue=epilogue)

    return pl.pallas_call(
        kernel,
        grid=(b, num_tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),        # x stays in HBM
            pl.BlockSpec((1, tile, num_tc * tile, 3 * 9),
                         lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),       # natural offmask
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),       # epilogue coeffs
        ],
        out_specs=pl.BlockSpec(
            (1, tile, num_tc * tile, c_out),
            lambda bb, ii: (bb, ii, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, num_tr * tile, num_tc * tile, c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((win, w_strip, c_in), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )


def _bwd_kernel(x_hbm, offm_ref, w_ref, gout_ref, gx_ref, goffm_ref,
                gw_ref, strip_buf, gstrip_buf, sem, *,
                h: int, w: int, c_in: int, c_out: int, win: int, tile: int,
                num_tc: int, w_strip: int):
    """Hand-derived backward for one tile row (mirrors backward.cu's role;
    reference autograd: ops/deformable_aggregation.py backward).

    Per tile: recompute M and acc (forward math), then
        g_acc = concat_k (g_out @ W_k^T)           [S, C_in]
        g_W_k += acc_k^T @ g_out                   (accumulated output)
        g_M    = win2d . g_acc^T                   [p_win, S]
        g_win += M @ g_acc                         (strip scratch, x-overlap)
        gv_c   = sum_p g_M[p, s] [p == pos_c[s]]   (per-corner extraction)
        g_mask / g_off via the bilinear-weight chain rule on [1, S] rows.
    Strip grads land in a per-row output (overlap-added in XLA); offset /
    mask grads reuse the offm packing.
    """
    i = pl.program_id(1)
    b = pl.program_id(0)
    lead = (win - tile) // 2
    kk = 9
    wty = win - tile                # per-tap row window (see _kernel)
    lead_ty = (wty - tile) // 2

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, win), :, :], strip_buf, sem)
    copy.start()

    s_tap = tile * tile
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (1, s_tap), 1)
    py = (q_iota // tile).astype(jnp.float32)
    px = (q_iota % tile).astype(jnp.float32)
    iota_ty = jax.lax.broadcasted_iota(jnp.int32, (wty, 1), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)

    first = (b == 0) & (i == 0)

    @pl.when(first)
    def _():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gstrip_buf[...] = jnp.zeros_like(gstrip_buf)

    # natural-layout offmask (see _kernel): per-tile MXU transpose in,
    # and the per-tap grad rows are transposed BACK to the natural
    # [T, T, 3kk] layout before the write (HIGHEST precision — grads
    # are true f32)
    od = offm_ref.dtype
    eye = (jax.lax.broadcasted_iota(jnp.int32, (s_tap, s_tap), 0) ==
           jax.lax.broadcasted_iota(jnp.int32, (s_tap, s_tap), 1))
    eye_od = eye.astype(od)
    eye_f32 = eye.astype(jnp.float32)
    prec = (jax.lax.Precision.HIGHEST if od == jnp.float32
            else jax.lax.Precision.DEFAULT)

    copy.wait()

    def one_tile(j, _):
        win3d = strip_buf[:, pl.ds(j * tile, win), :]   # [win, win, C]
        g_out = gout_ref[0, :, pl.ds(j * tile, tile), :].reshape(
            tile * tile, c_out).astype(strip_buf.dtype)

        slab = offm_ref[0, :, pl.ds(j * tile, tile), :].reshape(
            s_tap, 3 * kk)
        t_om = jax.lax.dot_general(
            slab, eye_od, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                             # [3kk, T*T]

        gwin_parts = []          # (r0, [wty, win, C]) per tap; summed
                                 # via static zero-pads below (an
                                 # .at[r0:].add on a value lowers to an
                                 # unsupported in-kernel scatter-add)
        g_dy_rows = [None] * kk  # per-tap [1, 64] grad rows, assembled
        g_dx_rows = [None] * kk  # into one [3kk, 64] block after the
        g_m_rows = [None] * kk   # tap loop and transposed back
        for k in range(kk):
            ty = k // 3 - 1
            tx = k % 3 - 1
            off_y = t_om[2 * k:2 * k + 1, :]
            off_x = t_om[2 * k + 1:2 * k + 2, :]
            mask = t_om[2 * kk + k:2 * kk + k + 1, :]

            sy = (i * tile + ty).astype(jnp.float32) + py + off_y
            sx = (j * tile + tx).astype(jnp.float32) + px + off_x
            y0 = jnp.floor(sy)
            x0 = jnp.floor(sx)
            fy = sy - y0
            fx = sx - x0
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)

            # separable per-tap M build (see _kernel): r_t/c_t are the
            # mask-free row/col factors, reused for the chain rule
            ry0 = y0i - (i * tile + ty - lead_ty)
            rx0 = x0i - (j * tile - lead)
            oky0 = (y0i >= 0) & (y0i <= h - 1)
            oky1 = (y0i >= -1) & (y0i <= h - 2)
            okx0 = (x0i >= 0) & (x0i <= w - 1)
            okx1 = (x0i >= -1) & (x0i <= w - 2)
            r_t = (jnp.where(iota_ty == ry0, (1.0 - fy) * oky0, 0.0)
                   + jnp.where(iota_ty == ry0 + 1, fy * oky1, 0.0))
            c_t = (jnp.where(iota_w == rx0, (1.0 - fx) * okx0, 0.0)
                   + jnp.where(iota_w == rx0 + 1, fx * okx1, 0.0))
            m_t = ((r_t * mask)[:, None, :] * c_t[None, :, :]).reshape(
                wty * win, s_tap).astype(strip_buf.dtype)

            r0 = lead + ty - lead_ty
            win_k = win3d[r0:r0 + wty].reshape(wty * win, c_in)

            acc_k = jax.lax.dot_general(
                m_t, win_k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(
                strip_buf.dtype)

            gw_ref[k] = gw_ref[k] + jax.lax.dot_general(
                acc_k, g_out, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g_acc = jax.lax.dot_general(
                g_out, w_ref[k], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(
                strip_buf.dtype)                         # [64, C_in]

            g_m = jax.lax.dot_general(
                win_k, g_acc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [wty*win, 64]

            g_win = jax.lax.dot_general(
                m_t, g_acc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [wty*win, C_in]
            gwin_parts.append((r0, g_win.reshape(wty, win, c_in)))

            # offset/mask chain rule through M = mask * (R ⊗ C):
            #   g_mask = Σ_ry R E,  E[ry, s] = Σ_cx g_M[(ry,cx), s] C[cx, s]
            #   g_sy   = mask Σ_ry R' E   (R' = dR/dsy: ∓ok one-hots)
            #   g_sx   = mask Σ_cx C' F,  F[cx, s] = Σ_ry g_M R[ry, s]
            g_m3 = g_m.reshape(wty, win, s_tap)
            e_r = jnp.sum(g_m3 * c_t[None, :, :], axis=1)   # [wty, 64]
            f_c = jnp.sum(g_m3 * r_t[:, None, :], axis=0)   # [win, 64]
            dr = (jnp.where(iota_ty == ry0 + 1, 1.0 * oky1, 0.0)
                  - jnp.where(iota_ty == ry0, 1.0 * oky0, 0.0))
            dc = (jnp.where(iota_w == rx0 + 1, 1.0 * okx1, 0.0)
                  - jnp.where(iota_w == rx0, 1.0 * okx0, 0.0))
            g_dy_rows[k] = mask * jnp.sum(dr * e_r, axis=0, keepdims=True)
            g_dx_rows[k] = mask * jnp.sum(dc * f_c, axis=0, keepdims=True)
            g_m_rows[k] = jnp.sum(r_t * e_r, axis=0, keepdims=True)

        # [3kk, 64] in channel order (dy/dx interleaved, then mask) →
        # MXU transpose back to the natural [T, T, 3kk] tile layout
        g_rows = []
        for k in range(kk):
            g_rows.append(g_dy_rows[k])
            g_rows.append(g_dx_rows[k])
        g_rows.extend(g_m_rows)
        g_t = jnp.concatenate(g_rows, axis=0)            # [3kk, 64]
        g_nat = jax.lax.dot_general(
            eye_f32, g_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [64, 3kk]
        goffm_ref[0, :, pl.ds(j * tile, tile), :] = g_nat.reshape(
            tile, tile, 3 * kk)

        gwin_cols = jnp.zeros((win, win, c_in), jnp.float32)
        for r0, g in gwin_parts:
            gwin_cols = gwin_cols + jnp.pad(
                g, ((r0, win - r0 - wty), (0, 0), (0, 0)))
        sl_cols = pl.ds(j * tile, win)
        gstrip_buf[:, sl_cols, :] = gstrip_buf[:, sl_cols, :] + gwin_cols
        return 0

    jax.lax.fori_loop(0, num_tc, one_tile, 0)
    gx_ref[0, 0] = gstrip_buf[...].astype(gx_ref.dtype)


def deform_conv2d_pallas_bwd(x, offset, mask, weight, g_out, *,
                             win: int = 24, tile: int = 8,
                             interpret: bool = False):
    """Hand-derived gradients for deform_conv2d_pallas_fwd.

    Returns (g_x, g_offset, g_mask, g_weight). Window-overlap
    accumulation for g_x happens host-side over disjoint per-row strips.
    """
    b, h, w, c_in = x.shape
    k = weight.shape[0]
    c_out = weight.shape[-1]
    num_tr = -(-h // tile)
    num_tc = -(-w // tile)
    lead = (win - tile) // 2
    w_strip = num_tc * tile + 2 * lead

    offm = _natural_offmask(offset, mask, num_tr, num_tc, tile)
    w_taps = weight.reshape(k * k, c_in, c_out).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0),
                     (lead, num_tr * tile + lead - h),
                     (lead, num_tc * tile + lead - w),
                     (0, 0)))
    g_out_p = jnp.pad(g_out, ((0, 0), (0, num_tr * tile - h),
                              (0, num_tc * tile - w), (0, 0)))

    gx_strips, goffm, gw = _bwd_call(
        b, num_tr, num_tc, h, w, c_in, c_out, win, tile,
        jnp.dtype(x.dtype).name, jnp.dtype(offm.dtype).name,
        interpret)(xp, offm, w_taps, g_out_p)

    # overlap-add the per-row strips into the padded image grad
    h_pad = num_tr * tile + 2 * lead
    g_xp = jnp.zeros((b, h_pad, w_strip, c_in), jnp.float32)
    for i in range(num_tr):
        g_xp = g_xp.at[:, i * tile:i * tile + win, :, :].add(
            gx_strips[:, i])
    g_x = g_xp[:, lead:lead + h, lead:lead + w].astype(x.dtype)

    # goffm comes back in the natural [B, Hp, Wp, 3kk] layout: unpack
    # is a crop + channel split
    g_off = goffm[:, :h, :w, :2 * 9]
    g_mask = goffm[:, :h, :w, 2 * 9:]
    return (g_x, g_off.astype(offset.dtype), g_mask.astype(mask.dtype),
            gw.reshape(k, k, c_in, c_out).astype(weight.dtype))


@functools.lru_cache(maxsize=64)
def _bwd_call(b, num_tr, num_tc, h, w, c_in, c_out, win, tile,
              dtype_name: str, off_dtype_name: str, interpret: bool):
    """Memoized backward pallas_call (see _fwd_call)."""
    k = 3
    lead = (win - tile) // 2
    w_strip = num_tc * tile + 2 * lead
    dtype = jnp.dtype(dtype_name)
    kernel = functools.partial(
        _bwd_kernel, h=h, w=w, c_in=c_in, c_out=c_out, win=win, tile=tile,
        num_tc=num_tc, w_strip=w_strip)

    return pl.pallas_call(
        kernel,
        grid=(b, num_tr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),        # x (padded)
            pl.BlockSpec((1, tile, num_tc * tile, 3 * 9),
                         lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),       # natural offmask
            pl.BlockSpec(memory_space=pltpu.VMEM),       # weights
            pl.BlockSpec((1, tile, num_tc * tile, c_out),
                         lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),       # g_out
        ],
        out_specs=[
            pl.BlockSpec((1, 1, win, w_strip, c_in),
                         lambda bb, ii: (bb, ii, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, num_tc * tile, 3 * 9),
                         lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),       # natural g_offmask
            pl.BlockSpec((k * k, c_in, c_out),
                         lambda bb, ii: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, num_tr, win, w_strip, c_in),
                                 jnp.float32),
            jax.ShapeDtypeStruct(
                (b, num_tr * tile, num_tc * tile, 3 * 9), jnp.float32),
            jax.ShapeDtypeStruct((k * k, c_in, c_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((win, w_strip, c_in), dtype),
            pltpu.VMEM((win, w_strip, c_in), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        # the f32 g_w accumulator (9*C_in*C_out) plus the C=512 strip
        # buffers exceed the default 16 MB scoped-vmem budget at stage 4
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def deform_conv2d_pallas(x, offset, mask, weight, bias=None, *,
                         stride: int = 1, padding: int = 1,
                         dilation: int = 1, win: int = 24, tile: int = 8,
                         interpret: bool = False, epilogue=None):
    """DCNv2 with a Pallas forward and a hand-derived Pallas backward.

    The backward (``deform_conv2d_pallas_bwd``) recomputes the per-tile
    interpolation matrix and derives g_x / g_offset / g_mask / g_weight
    with MXU matmuls; like the forward, its gradient domain is clamped to
    the static window (corners beyond ±(win-tile-3)/2 px of their tap get
    zero value AND zero gradient — see the module docstring).

    ``epilogue=(inv, shift)`` fuses frozen-BN + ReLU into the kernel and
    returns the activated output; this path is FORWARD-ONLY (no custom
    VJP — differentiating it fails at the pallas_call), used when the
    caller is on the inference path.
    """
    assert stride == 1 and dilation == 1 and padding == 1
    if epilogue is not None:
        assert bias is None, "fold a conv bias into the epilogue shift"
        return deform_conv2d_pallas_fwd(x, offset, mask, weight, win=win,
                                        tile=tile, interpret=interpret,
                                        epilogue=epilogue)

    @jax.custom_vjp
    def f(x, offset, mask, weight):
        return deform_conv2d_pallas_fwd(x, offset, mask, weight,
                                        win=win, tile=tile,
                                        interpret=interpret)

    def f_fwd(x, offset, mask, weight):
        return f(x, offset, mask, weight), (x, offset, mask, weight)

    def f_bwd(res, g):
        x, offset, mask, weight = res
        return deform_conv2d_pallas_bwd(x, offset, mask, weight, g,
                                        win=win, tile=tile,
                                        interpret=interpret)

    f.defvjp(f_fwd, f_bwd)
    out = f(x, offset, mask, weight)
    if bias is not None:
        out = out + bias
    return out
