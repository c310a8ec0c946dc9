"""Pallas fused 2D convolution for small-channel feature maps.

The FPN backbone's convs (reference net/unit/backbone.py:17-38) carry 3-64
channels at up to 1600x1184 resolution; XLA's NHWC conv puts those channels
on the 128-lane axis (2-16x physical padding) and measures 0.4-2.6 TF/s on a
v5e. This kernel keeps activations in (H, C, W) layout — C on sublanes, W on
lanes — and fuses the epilogue (folded BN + ReLU, or bias) into the conv.

Same design as ops/pallas/conv3d_kernel.py minus the depth axis: the dx taps
are pre-shifted host-side into the sublane axis (Mosaic rejects unaligned
lane slices, and lane rotates are 32-bit-only on this toolchain), each grid
step DMAs a double-buffered row slab, and the conv reduces to K_h
(Co, k*Ci) x (k*Ci, W) MXU matmuls per output row.

Supported: kernel 1/3/5, stride 1 (kernel 1/3) or 2 (kernel 3/5), torch
padding (k-1)//2. Eval-only (no autodiff rule).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv2d_kernel(x_ref,        # (N, Hp, kCi, Wp) ANY/HBM (pre-stacked taps)
                   w_ref,        # (k, Co, kCi) VMEM
                   scale_ref,    # (1, Co) VMEM f32
                   offset_ref,   # (1, Co) VMEM f32
                   out_ref,      # (1, th, Co, Wp) VMEM block
                   slab, sems,   # scratch (2, rows, kCi, Wp), DMA sems
                   *, th: int, stride: int, k: int, relu: bool):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    total = pl.num_programs(0) * n_hb
    rows = stride * th + (k - stride)

    def dma(slot, nn, hh):
        return pltpu.make_async_copy(
            x_ref.at[nn, pl.ds(hh * th * stride, rows)],
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
    cur = slab[i % 2]  # (rows, kCi, Wp)

    scale = scale_ref[0]
    offset = offset_ref[0]
    co = w_ref.shape[1]
    wp = cur.shape[-1]

    for hh in range(th):
        acc = jnp.zeros((co, wp), jnp.float32)
        for dy in range(k):
            acc = acc + jax.lax.dot_general(
                w_ref[dy], cur[stride * hh + dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = acc * scale[:, None] + offset[:, None]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[0, hh] = y.astype(out_ref.dtype)


def _stack_taps(x: jnp.ndarray, k: int, stride: int, h_out_pad: int,
                wp: int) -> jnp.ndarray:
    """Host-side tap pre-shift: (N, H, Ci, W) -> (N, Hp, k*Ci, Wp) where the
    sublane axis holds the k dx-shifted (stride 1) or parity-decomposed
    (stride 2) column taps, so in-kernel W-taps ride the matmul contraction.
    """
    n, h, ci, w = x.shape
    p = (k - 1) // 2
    if stride == 1:
        hp = h_out_pad + k - 1
        xp = jnp.pad(x, ((0, 0), (p, hp - h - p), (0, 0), (p, p + wp - w)))
        return jnp.concatenate([xp[..., dx:dx + wp] for dx in range(k)],
                               axis=2)
    # stride 2: out column w reads in[2w + j - p] for j in [0, k);
    # with xq = pad-left-p, index 2w + j: j even -> even stream at w + j//2,
    # j odd -> odd stream at w + j//2.
    h_rows = 2 * h_out_pad + (k - 2)  # rows the kernel slabs will touch
    w_cols = 2 * wp + (k - 2)
    xp = jnp.pad(x, ((0, 0), (p, max(h_rows - h - p, 0)), (0, 0),
                     (p, max(w_cols - w - p, 0))))
    even = xp[..., 0::2]
    odd = xp[..., 1::2]
    taps = []
    for j in range(k):
        src = even if j % 2 == 0 else odd
        taps.append(src[..., j // 2:j // 2 + wp])
    return jnp.concatenate(taps, axis=2)


@functools.partial(jax.jit, static_argnames=("th", "stride", "relu",
                                             "interpret"))
def conv2d_fused(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                 offset: jnp.ndarray, *, th: int = 8, stride: int = 1,
                 relu: bool = True, interpret: bool = False) -> jnp.ndarray:
    """Fused conv2d + per-channel scale/offset (+ ReLU) on (N, H, C, W).

    Args:
        x: (N, H, Ci, W).
        kernel: (k, k, Ci, Co) conv weights (HWIO, as stored by ConvND);
            k in {1, 3, 5}; padding is torch's (k-1)//2.
        scale, offset: (Co,) folded epilogue: y = conv(x)*scale + offset.
            BN eval: scale = gamma*rsqrt(var+eps), offset = beta - mean*scale.
            Plain bias: scale = 1, offset = bias.
    Returns:
        (N, H_out, Co, W_out), *_out = ceil(*/stride).
    """
    n, h, ci, w = x.shape
    k = kernel.shape[0]
    co = kernel.shape[-1]
    assert k in (1, 3, 5) and stride in (1, 2)
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    h_out_pad = -(-h_out // th) * th
    wp = -(-w_out // 128) * 128

    if k == 1 and stride == 1:
        hp = h_out_pad
        xs = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, wp - w)))
    else:
        xs = _stack_taps(x, k, stride, h_out_pad, wp)

    # (k, Co, k*Ci): dy-major taps; dx taps match _stack_taps' sublane order
    kk = jnp.transpose(kernel, (0, 3, 1, 2)).reshape(k, co, k * ci)
    kk = kk.astype(x.dtype)

    # keep the contraction/sublane dim a multiple of 8 (RGB input: k*Ci = 9)
    kci = k * ci
    kci_pad = -(-kci // 8) * 8
    if kci_pad != kci:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, kci_pad - kci), (0, 0)))
        kk = jnp.pad(kk, ((0, 0), (0, 0), (0, kci_pad - kci)))
    scale2 = scale.reshape(1, co).astype(jnp.float32)
    offset2 = offset.reshape(1, co).astype(jnp.float32)

    kern = functools.partial(_conv2d_kernel, th=th, stride=stride, k=k,
                             relu=relu)
    rows = stride * th + (k - stride)
    out = pl.pallas_call(
        kern,
        grid=(n, h_out_pad // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, co, kci_pad), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, co, wp),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out_pad, co, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, kci_pad, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xs, kk, scale2, offset2)
    return out[:, :h_out, :, :w_out]
