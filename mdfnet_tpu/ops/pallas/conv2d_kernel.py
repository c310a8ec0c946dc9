"""Pallas fused 2D convolution for small-channel feature maps.

The FPN backbone's convs (reference net/unit/backbone.py:17-38) carry 3-64
channels at up to 1600x1184 resolution; XLA's NHWC conv puts those channels
on the 128-lane axis (2-16x physical padding) and measures 0.4-2.6 TF/s on a
v5e. This kernel keeps activations in (H, C, W) layout — C on sublanes, W on
lanes — and fuses the epilogue (folded BN + ReLU, or bias) into the conv.

Design:
- MXU shape: a per-row matmul would be (Co, k*Ci) x (k*Ci, W) with M = Co as
  small as 8 — 6% of the systolic array's rows. R = ~128/Co output ROWS are
  folded into the M axis: one (R*Co, rows*K) x (rows*K, W) matmul per
  row-block with a block-banded folded weight (row r's taps sit at input
  rows stride*r..stride*r+k-1).
- Taps: each grid step DMAs ONE lane-aligned raw slab (double-buffered) and
  forms the k dx-shifted tap planes in VMEM with 32-bit lane rolls (bf16
  packs pairs along sublanes, so a uint32 roll shifts bf16 by exact lanes).
  No pre-stacked k-fold HBM tensor. gg = tile/ci taps share one sublane
  slot so small-ci layers pay no per-tap sublane padding.
- Stride 2 reads two W-parity streams: tap j = stream (j-p) mod 2 shifted
  floor((j-p)/2) lanes.

Supported: kernel 1/3/5, stride 1 (kernel 1/3) or 2 (kernel 3/5), torch
padding (k-1)//2. Eval-only (no autodiff rule).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_lanes_left(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """out[..., w] = x[..., w + n] (circular; callers pad so wraps land in
    discarded columns). pltpu.roll rotates right by a non-negative amount:
    left-by-n == right-by-(W-n)."""
    size = x.shape[-1]
    if x.dtype == jnp.bfloat16:
        # bf16 packs pairs along SUBLANES (two 16-bit halves per 32-bit
        # word), so a 32-bit lane roll moves every bf16 element by exactly
        # n lanes — no half-word recombination needed. The bitcast needs an
        # even sublane extent; odd C pads one sublane around the roll.
        odd = x.shape[-2] % 2
        if odd:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 0)])
        u = pltpu.bitcast(x, jnp.uint32)  # (..., C/2, W)
        y = pltpu.bitcast(pltpu.roll(u, shift=(size - n) % size,
                                     axis=u.ndim - 1), jnp.bfloat16)
        return y[..., :-1, :] if odd else y
    assert x.dtype == jnp.float32
    return pltpu.roll(x, shift=(size - n) % size, axis=x.ndim - 1)


def _conv2d_kernel_unstacked(
        x_ref,        # (N, Hp, ci_pad, Wq) ANY/HBM — raw padded input
        w_ref,        # (R*Co, rows*k*ci_pad) VMEM folded weights
        scale_ref,    # (1, R*Co) VMEM f32
        offset_ref,   # (1, R*Co) VMEM f32
        out_ref,      # (1, R*Co, Wp) VMEM block
        slab, taps, sems,  # (2, rows, ci, Wq), (rows, nblk*sub, Wp)
        *, r_fold: int, k: int, relu: bool, gg: int, sub: int):
    """Stride-1 path without host-side tap stacking: ONE lane-aligned slab
    DMA per block; the k dx-shifted tap planes are formed in VMEM by lane
    rolls. The pre-stacked tensor's extra HBM write+read (3-4x the layer
    input) was the dominant cost at these bandwidth-bound shapes. ``gg``
    taps share one sublane-tile block (sub) when ci divides it, so small-ci
    layers pay no per-tap sublane padding in HBM or K."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    total = pl.num_programs(0) * n_hb
    rows = r_fold + k - 1
    wp = taps.shape[-1]
    ci = slab.shape[2]

    def dma(slot, nn, hh):
        return pltpu.make_async_copy(
            x_ref.at[nn, pl.ds(hh * r_fold, rows)],
            slab.at[slot],
            sems.at[slot],
        )

    i = n * n_hb + hb

    @pl.when(i == 0)
    def _():
        dma(0, n, hb).start()

    @pl.when(i + 1 < total)
    def _():
        dma((i + 1) % 2, (i + 1) // n_hb, (i + 1) % n_hb).start()

    dma(i % 2, n, hb).wait()
    blk = slab[i % 2]  # (rows, ci, Wq); col j holds src col j - 128

    nblk = taps.shape[1] // sub
    for b in range(nblk):
        parts = []
        for t in range(gg):
            dx = b * gg + t
            if dx < k:
                # tap dx: src col w + dx - p = slab col w + 128 + dx - p
                parts.append(_shift_lanes_left(blk, 128 + dx - (k - 1) // 2)
                             [..., :wp])
            else:
                parts.append(jnp.zeros((rows, ci, wp), blk.dtype))
        block = (parts[0] if len(parts) == 1
                 else jnp.concatenate(parts, axis=1))
        if block.shape[1] < sub:
            block = jnp.pad(block,
                            ((0, 0), (0, sub - block.shape[1]), (0, 0)))
        taps[:, b * sub:(b + 1) * sub, :] = block

    cur = taps[...].reshape(rows * nblk * sub, wp)
    acc = jax.lax.dot_general(
        w_ref[...], cur,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (R*Co, Wp)
    y = acc * scale_ref[0][:, None] + offset_ref[0][:, None]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _conv2d_kernel_s2(
        x_ref,        # (2, N, Hp, ci_pad, Wq) ANY/HBM even/odd W streams
        w_ref,        # (R*Co, rows*k*ci_pad) VMEM folded weights
        scale_ref,    # (1, R*Co) VMEM f32
        offset_ref,   # (1, R*Co) VMEM f32
        out_ref,      # (1, R*Co, Wp) VMEM block
        slab, taps, sems,  # (2, 2, rows, ci, Wq), (rows, nblk*sub, Wp)
        *, r_fold: int, k: int, relu: bool, gg: int, sub: int):
    """Stride-2 path on W-parity streams: tap j reads stream (j-p) mod 2 at
    lane shift floor((j-p)/2) — two 1x streams replace the k-fold stacked
    tensor (its HBM write+read dominated the downsampling convs). ``gg``
    taps share a sublane block like the stride-1 kernel."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    total = pl.num_programs(0) * n_hb
    rows = 2 * r_fold + (k - 2)
    wp = taps.shape[-1]
    ci = slab.shape[3]
    p = (k - 1) // 2

    def dma(slot, par, nn, hh):
        return pltpu.make_async_copy(
            x_ref.at[par, nn, pl.ds(hh * r_fold * 2, rows)],
            slab.at[slot, par],
            sems.at[slot, par],
        )

    i = n * n_hb + hb

    @pl.when(i == 0)
    def _():
        for par in range(2):
            dma(0, par, n, hb).start()

    @pl.when(i + 1 < total)
    def _():
        for par in range(2):
            dma((i + 1) % 2, par, (i + 1) // n_hb, (i + 1) % n_hb).start()

    for par in range(2):
        dma(i % 2, par, n, hb).wait()

    nblk = taps.shape[1] // sub
    for b in range(nblk):
        parts = []
        for t in range(gg):
            j = b * gg + t
            if j < k:
                par = (j - p) % 2
                sh = 128 + (j - p - par) // 2
                parts.append(_shift_lanes_left(slab[i % 2, par], sh)
                             [..., :wp])
            else:
                parts.append(jnp.zeros((rows, ci, wp), slab.dtype))
        block = (parts[0] if len(parts) == 1
                 else jnp.concatenate(parts, axis=1))
        if block.shape[1] < sub:
            block = jnp.pad(block,
                            ((0, 0), (0, sub - block.shape[1]), (0, 0)))
        taps[:, b * sub:(b + 1) * sub, :] = block

    cur = taps[...].reshape(rows * nblk * sub, wp)
    acc = jax.lax.dot_general(
        w_ref[...], cur,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = acc * scale_ref[0][:, None] + offset_ref[0][:, None]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _fold_rows_grouped(kernel: jnp.ndarray, r_fold: int, k: int,
                       stride: int, gg: int, sub: int,
                       ci_e: int) -> jnp.ndarray:
    """Folded weight (R*Co, rows*nblk*sub): rows-major, tap dx at sublane
    offset (dx//gg)*sub + (dx%gg)*ci_e (ci_e = DMA-aligned channel extent),
    matching the kernels' grouped taps scratch. Output row r's dy tap reads
    slab row stride*r + dy."""
    _, _, ci, co = kernel.shape
    rows = stride * r_fold + (k - stride)
    nblk = -(-k // gg)
    w = jnp.zeros((r_fold, co, rows, nblk * sub), kernel.dtype)
    for r in range(r_fold):
        for dy in range(k):
            for dx in range(k):
                off = (dx // gg) * sub + (dx % gg) * ci_e
                w = w.at[r, :, stride * r + dy, off:off + ci].set(
                    kernel[dy, dx].T)
    return w.reshape(r_fold * co, rows * nblk * sub)


@functools.partial(jax.jit, static_argnames=("th", "stride", "relu",
                                             "interpret"))
def conv2d_fused(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                 offset: jnp.ndarray, *, th: int | None = None,
                 stride: int = 1, relu: bool = True,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused conv2d + per-channel scale/offset (+ ReLU) on (N, H, C, W).

    Args:
        x: (N, H, Ci, W).
        kernel: (k, k, Ci, Co) conv weights (HWIO, as stored by ConvND);
            k in {1, 3, 5}; padding is torch's (k-1)//2.
        scale, offset: (Co,) folded epilogue: y = conv(x)*scale + offset.
            BN eval: scale = gamma*rsqrt(var+eps), offset = beta - mean*scale.
            Plain bias: scale = 1, offset = bias.
        th: output rows folded into the matmul M axis per grid step
            (default ~128/Co, the MXU row count).
    Returns:
        (N, H_out, Co, W_out), *_out = ceil(*/stride).
    """
    n, h, ci, w = x.shape
    k = kernel.shape[0]
    co = kernel.shape[-1]
    assert k in (1, 3, 5) and stride in (1, 2)
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    r_fold = th or max(1, min(128 // co, 16, h_out))
    h_out_pad = -(-h_out // r_fold) * r_fold
    wp = -(-w_out // 128) * 128
    sub = 16 if x.dtype == jnp.bfloat16 else 8

    # DMA-aligned channel extent (Mosaic requires slab slices aligned to
    # the chosen sublane tiling, observed >= 4 bf16 / 8 f32)
    align = 4 if x.dtype == jnp.bfloat16 else 8
    ci_e = -(-ci // align) * align
    if ci_e != ci:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ci_e - ci), (0, 0)))
    # per-tap sublane slot: group gg small-ci taps per hardware tile, or
    # round a large ci up to the tile
    if ci_e < sub and sub % ci_e == 0:
        gg = sub // ci_e
        slot = sub
    else:
        gg = 1
        slot = -(-ci_e // sub) * sub
    nblk = -(-k // gg)

    if stride == 1:
        # unstacked path: ONE lane-aligned slab DMA per block; dx taps are
        # lane rolls in VMEM (no 3-4x pre-stacked HBM tensor)
        p = (k - 1) // 2
        rows = r_fold + k - 1
        wq = wp + 256  # slab col j = src col j - 128; covers w+1 with slack
        xs = jnp.pad(x, ((0, 0), (p, h_out_pad + k - 1 - h - p), (0, 0),
                         (128, wq - 128 - w)))
        wfold = _fold_rows_grouped(kernel.astype(x.dtype), r_fold, k, 1,
                                   gg, slot, ci_e)
        scale2 = jnp.tile(scale.reshape(1, co).astype(jnp.float32),
                          (1, r_fold))
        offset2 = jnp.tile(offset.reshape(1, co).astype(jnp.float32),
                           (1, r_fold))
        kern = functools.partial(_conv2d_kernel_unstacked, r_fold=r_fold,
                                 k=k, relu=relu, gg=gg, sub=slot)
        out = pl.pallas_call(
            kern,
            grid=(n, h_out_pad // r_fold),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((r_fold * co, rows * nblk * slot),
                             lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r_fold * co), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r_fold * co), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r_fold * co, wp),
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h_out_pad * co, wp), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, rows, ci_e, wq), x.dtype),
                pltpu.VMEM((rows, nblk * slot, wp), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xs, wfold, scale2, offset2)
        out = out.reshape(n, h_out_pad, co, wp)
        return out[:, :h_out, :, :w_out]

    # stride 2: W-parity streams + in-kernel rolls (no k-fold stacked tensor)
    p = (k - 1) // 2
    rows = 2 * r_fold + (k - 2)
    wq = wp + 256
    hp = 2 * h_out_pad + (k - 2)
    xw = jnp.pad(x, ((0, 0), (p, hp - h - p), (0, 0),
                     (256, 2 * wq - 256 - w)))
    # stream position q <-> input col 2q - 256 (+par); q=128 <-> col 0(+par)
    xs2 = jnp.stack([xw[..., 0::2], xw[..., 1::2]])  # (2, N, Hp, Ci, Wq)
    wfold = _fold_rows_grouped(kernel.astype(x.dtype), r_fold, k, 2, gg, slot,
                               ci_e)

    scale2 = jnp.tile(scale.reshape(1, co).astype(jnp.float32), (1, r_fold))
    offset2 = jnp.tile(offset.reshape(1, co).astype(jnp.float32), (1, r_fold))

    kern = functools.partial(_conv2d_kernel_s2, r_fold=r_fold, k=k, relu=relu,
                             gg=gg, sub=slot)
    out = pl.pallas_call(
        kern,
        grid=(n, h_out_pad // r_fold),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((r_fold * co, rows * nblk * slot),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_fold * co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_fold * co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_fold * co, wp),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out_pad * co, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, rows, ci_e, wq), x.dtype),
            pltpu.VMEM((rows, nblk * slot, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xs2, wfold, scale2, offset2)
    out = out.reshape(n, h_out_pad, co, wp)
    return out[:, :h_out, :, :w_out]
