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

from mdfnet_tpu.ops.pallas import runtime as _rt
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


def _conv2d_kernel_s2i(
        x_ref,        # (N, Hp, ci_pad, Wq) ANY/HBM — interleaved input
        w_ref,        # (R*Co, rows*k*ci_pad) VMEM folded weights (stride 2)
        scale_ref,    # (1, R*Co) VMEM f32
        offset_ref,   # (1, R*Co) VMEM f32
        sel_ref,      # (Wpi, Wpo) VMEM 0/1 even-column selection matrix
        out_ref,      # (1, R*Co, Wpo) VMEM block
        slab, taps, sems,  # (2, rows, ci, Wq), (rows, nblk*sub, Wpi)
        *, r_fold: int, k: int, relu: bool, gg: int, sub: int,
        wvalid: int = 0):
    """Stride-2 path on the INTERLEAVED input: the conv is evaluated at all
    stride-1 x positions (taps = lane rolls, rows at stride 2 via the folded
    weight) and the even columns are selected by a constant 0/1 matmul on
    the MXU. The previous design pre-split the input into W-parity streams
    host-side — a full read+write of the layer input (~300 MB/forward at
    DTU eval size across the three downsampling convs); the extra MXU
    columns are far cheaper than that HBM round trip."""
    n = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    total = pl.num_programs(0) * n_hb
    rows = 2 * r_fold + (k - 2)
    wpi = taps.shape[-1]
    ci = slab.shape[2]
    p = (k - 1) // 2

    def dma(slot, nn, hh):
        return pltpu.make_async_copy(
            x_ref.at[nn, pl.ds(hh * r_fold * 2, rows)],
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
                parts.append(_shift_lanes_left(blk, 128 + dx - p)
                             [..., :wpi])
            else:
                parts.append(jnp.zeros((rows, ci, wpi), blk.dtype))
        block = (parts[0] if len(parts) == 1
                 else jnp.concatenate(parts, axis=1))
        if block.shape[1] < sub:
            block = jnp.pad(block,
                            ((0, 0), (0, sub - block.shape[1]), (0, 0)))
        taps[:, b * sub:(b + 1) * sub, :] = block

    cur = taps[...].reshape(rows * nblk * sub, wpi)
    acc = jax.lax.dot_general(
        w_ref[...], cur,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (R*Co, Wpi)
    y = acc * scale_ref[0][:, None] + offset_ref[0][:, None]
    if relu:
        y = jnp.maximum(y, 0.0)
    # select even columns: exact (0/1 weights on already-rounded values)
    y2 = jax.lax.dot_general(
        y.astype(out_ref.dtype), sel_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (R*Co, Wpo)
    if 0 < wvalid < y2.shape[-1]:
        yi = jax.lax.broadcasted_iota(jnp.int32, y2.shape, 1)
        y2 = y2 * (yi < wvalid).astype(y2.dtype)
    out_ref[0] = y2.astype(out_ref.dtype)


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
    # junk lane-pad columns from keep_wpad producers are zero, which is
    # exactly grid-conv zero padding — compute on the padded width and let
    # the 0/1 selection matrix pick the true even columns (no slice copy)
    if valid_w is not None and valid_w != w:
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
            interpret=interpret or _rt.force_interpret(),
        )(xs, wfold, scale2, offset2)
        out = out.reshape(n, h_out_pad, co, wp)
        return out[:, :h_out] if keep_wpad else out[:, :h_out, :, :w_out]

    # stride 2 on the interleaved input: taps are lane rolls (like stride 1),
    # rows ride the stride-2 folded weight, even columns are selected by a
    # constant 0/1 matmul — no host-side parity-split round trip
    import numpy as np
    p = (k - 1) // 2
    rows = 2 * r_fold + (k - 2)
    w_arr = x.shape[-1]
    wpi = -(-max(w_arr, w) // 128) * 128
    wq = wpi + 256
    hp = 2 * h_out_pad + (k - 2)
    xw = jnp.pad(x, ((0, 0), (p, hp - h - p), (0, 0),
                     (128, wq - 128 - w_arr)))
    wfold = _fold_rows_grouped(kernel.astype(x.dtype), r_fold, k, 2, gg, slot,
                               ci_e)
    # numpy constant: baked into the executable, not rebuilt per call
    sel_np = np.zeros((wpi, wp), np.float32)
    cols = np.arange(w_out)
    sel_np[2 * cols, cols] = 1.0
    sel = jnp.asarray(sel_np, x.dtype)

    scale2 = jnp.tile(scale.reshape(1, co).astype(jnp.float32), (1, r_fold))
    offset2 = jnp.tile(offset.reshape(1, co).astype(jnp.float32), (1, r_fold))

    kern = functools.partial(_conv2d_kernel_s2i, r_fold=r_fold, k=k,
                             relu=relu, gg=gg, sub=slot,
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
            pl.BlockSpec((wpi, wp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_fold * co, wp),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out_pad * co, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, ci_e, wq), x.dtype),
            pltpu.VMEM((rows, nblk * slot, wpi), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret or _rt.force_interpret(),
    )(xw, wfold, scale2, offset2, sel)
    out = out.reshape(n, h_out_pad, co, wp)
    return out[:, :h_out] if keep_wpad else out[:, :h_out, :, :w_out]


def _layer_geometry(ci_e: int, dtype) -> tuple[int, int]:
    """(gg, slot): taps per sublane-tile block and the block's sublane size."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    if ci_e < sub and sub % ci_e == 0:
        return sub // ci_e, sub
    return 1, -(-ci_e // sub) * sub


def _chain_rows(layers, r_fold: int, final_stride: int):
    """Per-layer output rows per strip + input rows + input-row advance."""
    nlayers = len(layers)
    pads = [(k - 1) // 2 for k, *_ in layers]
    k_last = layers[-1][0]
    if final_stride == 2:
        base = 2 * r_fold + (k_last - 2)
        rows_out = [base + 2 * sum(pads[j + 1:-1]) for j in range(nlayers)]
        rows_out[-1] = r_fold
        adv = 2 * r_fold
    else:
        rows_out = [r_fold + 2 * sum(pads[j + 1:]) for j in range(nlayers)]
        adv = r_fold
    rows_in = rows_out[0] + 2 * pads[0]
    # left context: input rows above the strip's first advanced row
    # (stride-2 tail: out row r reads input rows 2r+dy-p_last, so the same
    # sum-of-pads applies with the doubled advance)
    ptot = sum(pads)
    return rows_out, rows_in, adv, ptot


def _conv2d_chain_kernel(x_ref, *refs, r_fold: int, layers, h: int,
                         relu_flags, valid_w: int, residuals=None,
                         final_stride: int = 1, w_out: int = 0):
    """L stride-1 convs (optionally a final stride-2 conv) on one row strip,
    intermediates held in VMEM.

    refs: per-layer (w, scale, offset) VMEM refs, [sel matrix], then
    out_ref, then scratch: slab, taps (shared), buf_0..buf_{L-2}, sems.
    layers: list of (k, ci_e, co, gg, slot, nblk) static descriptors.
    residuals: per-layer ``None`` or an earlier layer index j — adds layer
    j's (post-epilogue, post-residual) VMEM buffer to this layer's output
    after its ReLU, realising Res-block skips without leaving the kernel.
    final_stride == 2: the LAST layer is a stride-2 conv — rows ride its
    stride-2 folded weight and the even output columns are selected by the
    constant 0/1 ``sel`` matmul (same scheme as _conv2d_kernel_s2i), so a
    backbone scale transition fuses into the trunk chain and its stride-1
    input never reaches HBM.
    """
    nlayers = len(layers)
    w_refs = [refs[3 * l] for l in range(nlayers)]
    s_refs = [refs[3 * l + 1] for l in range(nlayers)]
    o_refs = [refs[3 * l + 2] for l in range(nlayers)]
    nin = 3 * nlayers
    sel_ref = None
    if final_stride == 2:
        sel_ref = refs[nin]
        nin += 1
    out_ref = refs[nin]
    scratch = refs[nin + 1:]
    slab = scratch[0]
    # ONE shared tap buffer: layers run sequentially, so the per-layer tap
    # planes can time-share the max-size allocation (9-layer chains OOMed
    # the 16 MB scoped-VMEM limit with per-layer buffers)
    taps_s = scratch[1]
    bufs = scratch[2:2 + nlayers - 1]
    sems = scratch[-1]

    n = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    total = pl.num_programs(0) * n_hb
    i = n * n_hb + hb

    pads = [(k - 1) // 2 for k, *_ in layers]
    rows_out, rows_in, adv, ptot = _chain_rows(layers, r_fold, final_stride)
    wimg = x_ref.shape[-1]
    wp = taps_s.shape[-1]   # working width of the stride-1 body (== out
    # width when final_stride == 1; the sel matmul narrows it otherwise)

    # per-block copy geometry: (dst0, row0, length) for blocks whose strip
    # [hb*adv - P, hb*adv - P + rows_in) leaves the image — with h % adv
    # != 0 the tail can cover SEVERAL blocks, not just the last one
    specials = {}
    for v in range(n_hb):
        row0 = v * adv - ptot
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
                go(hh * adv - ptot, 0, rows_in)

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
        s2_tail = final_stride == 2 and l == nlayers - 1
        in_rows = (2 * rows_out[l] + k - 2) if s2_tail \
            else rows_out[l] + k - 1
        tw = nblk * slot_sz
        if k == 1:
            taps_s[:in_rows, :tw] = (
                src[:, :tw, :wp] if src.shape[1] >= tw
                else jnp.pad(src[..., :wp],
                             ((0, 0), (0, tw - src.shape[1]), (0, 0))))
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
                taps_s[:in_rows, b * slot_sz:(b + 1) * slot_sz, :] = block

        acc = jax.lax.dot_general(
            w_refs[l][...],
            taps_s[:in_rows, :tw, :].reshape(in_rows * tw, wp),
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
        if residuals is not None and residuals[l] is not None:
            j = residuals[l]
            # center-aligned rows: buf_j carries 2*sum(pads[j+1..l]) extra
            off = (rows_out[j] - rows_out[l]) // 2
            src = bufs[j][off:off + rows_out[l], :, :wp]
            y = (y.reshape(rows_out[l], co, wp)
                 + src.astype(jnp.float32)).reshape(rows_out[l] * co, wp)

        if l == nlayers - 1:
            if s2_tail:
                # even-column selection on the MXU (constant 0/1 matrix),
                # then the junk-tail mask at the HALF-res width
                y2 = jax.lax.dot_general(
                    y.astype(out_ref.dtype), sel_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if 0 < w_out < y2.shape[-1]:
                    yi = jax.lax.broadcasted_iota(jnp.int32, y2.shape, 1)
                    y2 = y2 * (yi < w_out).astype(y2.dtype)
                y = y2
            out_ref[0] = y.astype(out_ref.dtype)
        else:
            buf = bufs[l]
            buf[:, :, :wp] = y.astype(buf.dtype).reshape(rows_out[l], co, wp)
            # out-of-image ROWS of this intermediate must be zero too (the
            # next conv's torch zero padding); like the slab DMA, the tail
            # can span several blocks when h % adv != 0
            off = sum(pads[l + 1:])
            ro = rows_out[l]
            for v in range(n_hb):
                top = max(0, off - v * adv)
                btm = max(0, min(ro, (v * adv - off + ro) - h))
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
                                             "keep_wpad", "residuals",
                                             "final_stride", "interpret"))
def conv2d_chain_fused(x: jnp.ndarray, kernels, scales, offsets, *,
                       th: int | None = None,
                       relu_flags: tuple = (),
                       valid_w: int | None = None,
                       keep_wpad: bool = False,
                       residuals: tuple | None = None,
                       final_stride: int = 1,
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
        residuals: per-layer ``None`` or earlier layer index j — add layer
            j's output (post-epilogue/-residual) after this layer's ReLU,
            i.e. Res-block skip adds inside the kernel (reference
            net/unit/base.py:71-82). Layer j must have the same out
            channels and cannot be the last layer.
        final_stride: 2 makes the LAST layer a stride-2 conv (k in {3, 5})
            via the stride-2 row fold + constant even-column selection
            matmul — fuses a backbone downsampling transition into the
            trunk chain so its stride-1 input never reaches HBM.
    Returns:
        (N, ceil(H/fs), Co_last, W_out | Wp_out) = exact composition of the
        layers with torch zero padding at each step (fs = final_stride).
    """
    n, h, ci, w_in = x.shape
    vw = valid_w or w_in
    nlayers = len(kernels)
    relu_flags = relu_flags or (True,) * nlayers
    assert len(relu_flags) == nlayers
    assert final_stride in (1, 2)
    if residuals is not None:
        assert len(residuals) == nlayers
        for l, j in enumerate(residuals):
            if j is None:
                continue
            assert 0 <= j < l < nlayers and j < nlayers - 1
            assert kernels[j].shape[-1] == kernels[l].shape[-1], \
                "residual source/target channel mismatch"
        assert final_stride == 1 or residuals[-1] is None
    co_last = kernels[-1].shape[-1]
    h_out = -(-h // final_stride)
    w_out_t = -(-vw // final_stride)
    r_fold = th or max(1, min(128 // co_last, 16, h_out))
    ptot = sum((kk.shape[0] - 1) // 2 for kk in kernels)
    adv0 = final_stride * r_fold
    if h > adv0:  # multi-block: strip DMAs must stay in-image
        r_fold = min(r_fold, max(ptot, h - ptot) // final_stride)
        r_fold = max(r_fold, -(-ptot // final_stride))
    n_hb = -(-h_out // r_fold)
    wp = -(-vw // 128) * 128
    wpo = -(-w_out_t // 128) * 128 if final_stride == 2 else wp
    if w_in > wp:
        # producer kept a wider lane extent (the rowsweep kernel's 256-col
        # x-window floor exceeds the natural alignment at small scenes);
        # pad columns are zeros, so slicing is exact (mirrors conv3d)
        x = x[..., :wp]
        w_in = wp
    assert w_in in (vw, wp), (w_in, vw)
    if w_in != wp:
        # unaligned true-width input: one host-side lane pad (aligned DMA)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - w_in)))
    wq = wp + 128
    w = vw

    align = 4 if x.dtype == jnp.bfloat16 else 8
    assert ci % align == 0, f"chain input channels {ci} not DMA-aligned"

    pads = [(kk.shape[0] - 1) // 2 for kk in kernels]
    layers = []
    cis = ci
    for l, kk in enumerate(kernels):
        k = kk.shape[0]
        last_s2 = final_stride == 2 and l == nlayers - 1
        assert k in ((3, 5) if last_s2 else (1, 3)) and kk.shape[2] == cis
        co = kk.shape[-1]
        gg, slot = _layer_geometry(cis, x.dtype)
        layers.append((k, cis, co, gg, slot, -(-k // gg)))
        cis = co

    rows_out, rows_in, adv, _ = _chain_rows(layers, r_fold, final_stride)

    wfs, sc2, of2 = [], [], []
    for l, kk in enumerate(kernels):
        k, ci_e, co, gg, slot, nblk = layers[l]
        last_s2 = final_stride == 2 and l == nlayers - 1
        wfs.append(_fold_rows_grouped(kk.astype(x.dtype), rows_out[l], k,
                                      2 if last_s2 else 1, gg, slot, ci_e))
        sc2.append(jnp.tile(scales[l].reshape(1, co).astype(jnp.float32),
                            (1, rows_out[l])))
        of2.append(jnp.tile(offsets[l].reshape(1, co).astype(jnp.float32),
                            (1, rows_out[l])))

    kern = functools.partial(_conv2d_chain_kernel, r_fold=r_fold,
                             layers=layers, h=h, relu_flags=relu_flags,
                             valid_w=vw, residuals=residuals,
                             final_stride=final_stride, w_out=w_out_t)

    def layer_in_rows(l):
        k = layers[l][0]
        if final_stride == 2 and l == nlayers - 1:
            return 2 * rows_out[l] + k - 2
        return rows_out[l] + k - 1

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [x]
    for l, (k, ci_e, co, gg, slot, nblk) in enumerate(layers):
        in_rows = layer_in_rows(l)
        in_specs += [
            pl.BlockSpec((rows_out[l] * co, in_rows * nblk * slot),
                         lambda i, j, l=l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_out[l] * co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_out[l] * co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [wfs[l], sc2[l], of2[l]]

    if final_stride == 2:
        import numpy as np
        sel_np = np.zeros((wp, wpo), np.float32)
        cols = np.arange(w_out_t)
        sel_np[2 * cols, cols] = 1.0
        in_specs.append(pl.BlockSpec((wp, wpo), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(sel_np, x.dtype))

    scratch = [pltpu.VMEM((2, rows_in, ci, wq), x.dtype)]
    taps_rows = max(layer_in_rows(l) for l in range(nlayers))
    taps_sub = max(nblk * slot for _, _, _, _, slot, nblk in layers)
    scratch.append(pltpu.VMEM((taps_rows, taps_sub, wp), x.dtype))
    for l in range(nlayers - 1):
        _, _, co, _, _, _ = layers[l]
        scratch.append(pltpu.VMEM((rows_out[l], co, wq), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    out = pl.pallas_call(
        kern,
        grid=(n, n_hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_fold * co_last, wpo),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_hb * r_fold * co_last, wpo),
                                       x.dtype),
        scratch_shapes=scratch,
        interpret=interpret or _rt.force_interpret(),
    )(*args)
    out = out.reshape(n, n_hb * r_fold, co_last, wpo)
    return out[:, :h_out] if keep_wpad else out[:, :h_out, :, :w_out_t]
