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
        *, r_fold: int, k: int, relu: bool, gg: int, sub: int,
        wvalid: int = 0):
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
    if 0 < wvalid < wp:
        # zero the junk lane-pad columns so keep_wpad outputs can feed the
        # next fused consumer without a host-side slice copy
        yi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        y = y * (yi < wvalid).astype(y.dtype)
    out_ref[0] = y.astype(out_ref.dtype)


def _conv2d_kernel_s2(
        x_ref,        # (2, N, Hp, ci_pad, Wq) ANY/HBM even/odd W streams
        w_ref,        # (R*Co, rows*k*ci_pad) VMEM folded weights
        scale_ref,    # (1, R*Co) VMEM f32
        offset_ref,   # (1, R*Co) VMEM f32
        out_ref,      # (1, R*Co, Wp) VMEM block
        slab, taps, sems,  # (2, 2, rows, ci, Wq), (rows, nblk*sub, Wp)
        *, r_fold: int, k: int, relu: bool, gg: int, sub: int,
        wvalid: int = 0):
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
    if 0 < wvalid < wp:
        yi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        y = y * (yi < wvalid).astype(y.dtype)
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
                                             "valid_w", "keep_wpad",
                                             "interpret"))
def conv2d_fused(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                 offset: jnp.ndarray, *, th: int | None = None,
                 stride: int = 1, relu: bool = True,
                 valid_w: int | None = None, keep_wpad: bool = False,
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
        valid_w: true image width when x carries 128-aligned lane padding
            from an upstream fused kernel (the junk columns are dropped in
            this kernel's existing host-side pad copy — zero extra cost).
        keep_wpad: return the full 128-aligned lane extent for the next
            fused consumer (columns beyond ceil(W_out) hold junk).
    Returns:
        (N, H_out, Co, W_out), *_out = ceil(*/stride).
    """
    n, h, ci, w = x.shape
    k = kernel.shape[0]
    co = kernel.shape[-1]
    assert k in (1, 3, 5) and stride in (1, 2)
    if stride == 1:
        # the chain kernel with one layer IS this conv, with in-kernel edge
        # padding — no host-side pad copy of the activation (XLA profile:
        # those pads were ~4 ms/forward at bench size)
        align = 4 if x.dtype == jnp.bfloat16 else 8
        if ci % align:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, align - ci % align), (0, 0)))
            kernel = jnp.pad(kernel, ((0, 0), (0, 0),
                                      (0, align - ci % align), (0, 0)))
        return conv2d_chain_fused(x, [kernel], [scale], [offset], th=th,
                                  relu_flags=(relu,), valid_w=valid_w,
                                  keep_wpad=keep_wpad, interpret=interpret)
    if valid_w is not None and valid_w != w:
        x = x[..., :valid_w]
        w = valid_w
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
                                 k=k, relu=relu, gg=gg, sub=slot,
                                 wvalid=w_out if keep_wpad else 0)
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
        return out[:, :h_out] if keep_wpad else out[:, :h_out, :, :w_out]

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
                             gg=gg, sub=slot,
                             wvalid=w_out if keep_wpad else 0)
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
    return out[:, :h_out] if keep_wpad else out[:, :h_out, :, :w_out]


def _layer_geometry(ci_e: int, dtype) -> tuple[int, int]:
    """(gg, slot): taps per sublane-tile block and the block's sublane size."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    if ci_e < sub and sub % ci_e == 0:
        return sub // ci_e, sub
    return 1, -(-ci_e // sub) * sub


def _conv2d_chain_kernel(x_ref, *refs, r_fold: int, layers, h: int,
                         relu_flags, valid_w: int):
    """L stride-1 convs on one row strip, intermediates held in VMEM.

    refs: per-layer (w, scale, offset) VMEM refs, then out_ref, then
    scratch: slab, taps_0..taps_{L-1}, buf_0..buf_{L-2}, sems.
    layers: list of (k, ci_e, co, gg, slot, nblk) static descriptors.
    """
    nlayers = len(layers)
    w_refs = [refs[3 * l] for l in range(nlayers)]
    s_refs = [refs[3 * l + 1] for l in range(nlayers)]
    o_refs = [refs[3 * l + 2] for l in range(nlayers)]
    out_ref = refs[3 * nlayers]
    scratch = refs[3 * nlayers + 1:]
    slab = scratch[0]
    taps = scratch[1:1 + nlayers]
    bufs = scratch[1 + nlayers:1 + 2 * nlayers - 1]
    sems = scratch[-1]

    n = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    total = pl.num_programs(0) * n_hb
    i = n * n_hb + hb

    pads = [(k - 1) // 2 for k, *_ in layers]
    ptot = sum(pads)
    # rows of layer l's OUTPUT needed per strip
    rows_out = [r_fold + 2 * sum(pads[j + 1:]) for j in range(nlayers)]
    rows_in = rows_out[0] + 2 * pads[0]
    wimg = x_ref.shape[-1]
    wp = out_ref.shape[-1]

    # per-block copy geometry: (dst0, row0, length) for blocks whose strip
    # [hb*R - P, hb*R - P + rows_in) leaves the image — with h % R != 0 the
    # tail can cover SEVERAL blocks, not just the last one
    specials = {}
    for v in range(n_hb):
        row0 = v * r_fold - ptot
        dst0 = max(0, -row0)
        row0 = max(0, row0)
        length = min(rows_in - dst0, h - row0)
        if dst0 != 0 or length != rows_in:
            specials[v] = (dst0, row0, length)

    def issue(what, slot, nn, hh):
        """Edge-aware slab DMA: rows [hh*r_fold - ptot, +rows_in) of the
        UNPADDED input, with out-of-image rows zero-filled in VMEM."""
        def go(row0, dst0, length):
            cp = pltpu.make_async_copy(
                x_ref.at[nn, pl.ds(row0, length)],
                slab.at[slot, pl.ds(dst0, length), :, pl.ds(0, wimg)],
                sems.at[slot])
            if what == "start":
                cp.start()
            else:
                cp.wait()

        def zero(a, b):
            if what == "start" and b > a:
                slab[slot, a:b] = jnp.zeros(
                    (b - a,) + slab.shape[2:], slab.dtype)

        def do(spec):
            dst0, row0, length = spec
            zero(0, dst0)
            zero(dst0 + length, rows_in)
            go(row0, dst0, length)

        if n_hb == 1:
            do(specials.get(0, (0, 0, rows_in)))
            return
        for v, spec in specials.items():
            @pl.when(hh == v)
            def _(spec=spec):
                do(spec)
        if len(specials) < n_hb:
            gen = hh >= 0
            for v in specials:
                gen = gen & (hh != v)

            @pl.when(gen)
            def _():
                go(hh * r_fold - ptot, 0, rows_in)

    @pl.when(i == 0)
    def _():
        if wimg != slab.shape[-1]:
            slab[:, :, :, wimg:] = jnp.zeros(
                slab.shape[:3] + (slab.shape[-1] - wimg,), slab.dtype)
        for b in bufs:
            if b.shape[-1] != wp:
                b[:, :, wp:] = jnp.zeros(
                    b.shape[:2] + (b.shape[-1] - wp,), b.dtype)
        issue("start", 0, 0, 0)

    @pl.when(i + 1 < total)
    def _():
        issue("start", (i + 1) % 2, (i + 1) // n_hb, (i + 1) % n_hb)

    issue("wait", i % 2, n, hb)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)

    cur = slab  # indexed [slot] for layer 0
    for l, (k, ci_e, co, gg, slot_sz, nblk) in enumerate(layers):
        # layer-0 input needs no mask: every producer (the image pad, this
        # kernel, conv2d_fused) zeroes its own junk lane-pad columns
        src = cur[i % 2] if l == 0 else cur[...]
        in_rows = rows_out[l] + k - 1
        tp = taps[l]
        if k == 1:
            tp[...] = src[:, :tp.shape[1], :wp] if src.shape[1] >= tp.shape[1] \
                else jnp.pad(src[..., :wp],
                             ((0, 0), (0, tp.shape[1] - src.shape[1]), (0, 0)))
        else:
            for b in range(nblk):
                parts = []
                for t in range(gg):
                    dx = b * gg + t
                    if dx < k:
                        parts.append(
                            _shift_lanes_left(src, dx - (k - 1) // 2)
                            [..., :wp])
                    else:
                        parts.append(jnp.zeros((in_rows, ci_e, wp),
                                               src.dtype))
                block = (parts[0] if len(parts) == 1
                         else jnp.concatenate(parts, axis=1))
                if block.shape[1] < slot_sz:
                    block = jnp.pad(
                        block, ((0, 0), (0, slot_sz - block.shape[1]),
                                (0, 0)))
                tp[:, b * slot_sz:(b + 1) * slot_sz, :] = block

        acc = jax.lax.dot_general(
            w_refs[l][...], tp[...].reshape(in_rows * nblk * slot_sz, wp),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (rows_l*co, Wp)
        y = acc * s_refs[l][0][:, None] + o_refs[l][0][:, None]
        if relu_flags[l]:
            y = jnp.maximum(y, 0.0)
        # zero the out-of-image lane tail: intermediates so the next
        # layer's taps see grid-conv zero padding, the output so junk-free
        # lane padding flows to the next fused consumer
        if valid_w < wp:
            yiota = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            y = y * (yiota < valid_w).astype(y.dtype)

        if l == nlayers - 1:
            out_ref[0] = y.astype(out_ref.dtype)
        else:
            buf = bufs[l]
            buf[:, :, :wp] = y.astype(buf.dtype).reshape(rows_out[l], co, wp)
            # out-of-image ROWS of this intermediate must be zero too (the
            # next conv's torch zero padding); like the slab DMA, the tail
            # can span several blocks when h % r_fold != 0
            off = sum(pads[l + 1:])
            ro = rows_out[l]
            for v in range(n_hb):
                top = max(0, off - v * r_fold)
                btm = max(0, min(ro, (v * r_fold - off + ro) - h))
                if not (top or btm):
                    continue

                @pl.when(hb == v)
                def _(buf=buf, top=top, btm=btm, ro=ro):
                    if top:
                        buf[:top] = jnp.zeros(
                            (top,) + buf.shape[1:], buf.dtype)
                    if btm:
                        buf[ro - btm:ro] = jnp.zeros(
                            (btm,) + buf.shape[1:], buf.dtype)
            cur = buf


@functools.partial(jax.jit, static_argnames=("th", "relu_flags", "valid_w",
                                             "keep_wpad", "interpret"))
def conv2d_chain_fused(x: jnp.ndarray, kernels, scales, offsets, *,
                       th: int | None = None,
                       relu_flags: tuple = (),
                       valid_w: int | None = None,
                       keep_wpad: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """A chain of stride-1 convs (+ per-channel scale/offset/ReLU epilogues)
    over (N, H, C, W), fused into ONE kernel pass per row strip.

    The intermediate activations live only in VMEM: for an L-layer chain at
    backbone resolution this removes L-1 full feature-map HBM round trips
    plus every host-side pad copy (the strip is zero-padded in-kernel on
    both axes). Hot path of the FPN trunk (reference net/unit/backbone.py:
    17-38 runs conv pairs at each scale).

    Args:
        x: (N, H, Ci, W); Ci must be DMA-aligned (pad to 4 bf16 / 8 f32).
            If W is 128-aligned but wider than the true image, pass
            ``valid_w`` — junk pad columns are masked in-kernel (HBM DMA
            lane extents must be 128-aligned, so producers keep their lane
            padding instead of slicing).
        kernels: list of (k, k, ci, co) HWIO weights, k in {1, 3}.
        scales, offsets: per-layer (co,) f32 folded epilogues.
        relu_flags: per-layer bool (default: all True).
        keep_wpad: return the full 128-aligned lane extent (columns beyond
            valid_w hold junk) so the next fused consumer can DMA it
            without a host-side slice copy.
    Returns:
        (N, H, Co_last, valid_w | Wp) = exact composition of the layers
        with torch zero padding at each step.
    """
    n, h, ci, w_in = x.shape
    vw = valid_w or w_in
    nlayers = len(kernels)
    relu_flags = relu_flags or (True,) * nlayers
    assert len(relu_flags) == nlayers
    co_last = kernels[-1].shape[-1]
    r_fold = th or max(1, min(128 // co_last, 16, h))
    ptot = sum((kk.shape[0] - 1) // 2 for kk in kernels)
    if h > r_fold:  # multi-block: strip DMAs must stay in-image
        r_fold = min(r_fold, max(ptot, h - ptot))
        r_fold = max(r_fold, ptot)
    n_hb = -(-h // r_fold)
    wp = -(-vw // 128) * 128
    assert w_in in (vw, wp), (w_in, vw)
    if w_in != wp:
        # unaligned true-width input: one host-side lane pad (aligned DMA)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - w_in)))
    wq = wp + 128
    w = vw

    align = 4 if x.dtype == jnp.bfloat16 else 8
    assert ci % align == 0, f"chain input channels {ci} not DMA-aligned"

    layers = []
    wfs, sc2, of2 = [], [], []
    cis = ci
    pads = [(kk.shape[0] - 1) // 2 for kk in kernels]
    for l, kk in enumerate(kernels):
        k = kk.shape[0]
        assert k in (1, 3) and kk.shape[2] == cis
        co = kk.shape[-1]
        ci_e = cis
        gg, slot = _layer_geometry(ci_e, x.dtype)
        nblk = -(-k // gg)
        rows_l = r_fold + 2 * sum(pads[l + 1:])
        layers.append((k, ci_e, co, gg, slot, nblk))
        wfs.append(_fold_rows_grouped(kk.astype(x.dtype), rows_l, k, 1, gg,
                                      slot, ci_e))
        sc2.append(jnp.tile(scales[l].reshape(1, co).astype(jnp.float32),
                            (1, rows_l)))
        of2.append(jnp.tile(offsets[l].reshape(1, co).astype(jnp.float32),
                            (1, rows_l)))
        cis = co

    rows_out = [r_fold + 2 * sum(pads[j + 1:]) for j in range(nlayers)]
    rows_in = rows_out[0] + 2 * pads[0]

    kern = functools.partial(_conv2d_chain_kernel, r_fold=r_fold,
                             layers=layers, h=h, relu_flags=relu_flags,
                             valid_w=vw)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [x]
    for l, (k, ci_e, co, gg, slot, nblk) in enumerate(layers):
        in_rows = rows_out[l] + k - 1
        in_specs += [
            pl.BlockSpec((rows_out[l] * co, in_rows * nblk * slot),
                         lambda i, j, l=l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_out[l] * co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_out[l] * co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [wfs[l], sc2[l], of2[l]]

    scratch = [pltpu.VMEM((2, rows_in, ci, wq), x.dtype)]
    for l, (k, ci_e, co, gg, slot, nblk) in enumerate(layers):
        in_rows = rows_out[l] + k - 1
        scratch.append(pltpu.VMEM((in_rows, nblk * slot, wp), x.dtype))
    for l in range(nlayers - 1):
        _, _, co, _, _, _ = layers[l]
        scratch.append(pltpu.VMEM((rows_out[l], co, wq), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    out = pl.pallas_call(
        kern,
        grid=(n, n_hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_fold * co_last, wp),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_hb * r_fold * co_last, wp),
                                       x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    out = out.reshape(n, n_hb * r_fold, co_last, wp)
    return out[:, :h] if keep_wpad else out[:, :h, :, :w]
