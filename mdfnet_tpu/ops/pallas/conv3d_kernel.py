"""Pallas fused Conv3d(3x3x3, stride 1) + BN(eval) + ReLU for small-C volumes.

XLA's conv layouts put the channel axis of the cost-volume U-Nets (C in
8..64) on the 128-lane dim, padding tensors 2-16x physically and dragging
every conv and its surrounding copies to a fraction of HBM bandwidth. This
kernel keeps activations in (D, H, C, W) layout — C on sublanes, W on lanes,
zero padding waste — and fuses the folded BN scale/offset + ReLU.

Stride 1: each grid step DMAs a raw (3, Th+2, Ci, Wq) halo slab
(double-buffered, lane-aligned) and forms the dx in {-1,0,1} shifted tap
copies IN VMEM with 32-bit lane rolls (bf16 pairs pack along sublanes, so a
uint32 roll shifts bf16 by exact lanes); 9 (Co, 3Ci) x (3Ci, W) MXU matmuls
accumulate per output row. The previous host-side tap pre-stack wrote+read
a 3x copy of every volume through HBM — the dominant cost of these
bandwidth-bound layers. Stride 2 keeps the host-side parity-decomposed
stack (strided lane reads cannot be expressed as rolls).

Eval-only (BN running stats folded host-side; no autodiff rule — training
uses the XLA path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref,            # (Dp, Hp, 3Ci, Wp) ANY/HBM (pre-padded)
                 w_ref,            # (9, Co, 3Ci) VMEM
                 scale_ref,        # (1, Co) VMEM f32
                 offset_ref,       # (1, Co) VMEM f32
                 out_ref,          # (1, Th, Co, Wp) VMEM block
                 slab, sems,       # scratch (2, 3, s*Th+2, 3Ci, Wp), DMA sems
                 *, th: int, stride: int):
    """Stride-2 path: consumes the host-side parity-stacked input."""
    d = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    n = pl.num_programs(0) * n_hb
    rows = stride * th + 2

    def dma(slot, dd, hh):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(stride * dd, 3), pl.ds(hh * th * stride, rows)],
            slab.at[slot],
            sems.at[slot],
        )

    i = d * n_hb + hb

    @pl.when(i == 0)
    def _():
        dma(0, d, hb).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, (i + 1) // n_hb, (i + 1) % n_hb).start()

    dma(i % 2, d, hb).wait()
    cur = slab[i % 2]  # (3, rows, 3Ci, Wp)

    scale = scale_ref[0]
    offset = offset_ref[0]
    co = w_ref.shape[1]
    wp = cur.shape[-1]

    for hh in range(th):
        acc = jnp.zeros((co, wp), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                acc = acc + jax.lax.dot_general(
                    w_ref[dz * 3 + dy], cur[dz, stride * hh + dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * scale[:, None] + offset[:, None], 0.0)
        out_ref[0, hh] = y.astype(out_ref.dtype)


def _conv_kernel_unstacked(
        x_ref,            # (Dp, Hp, ci_e, Wq) ANY/HBM raw padded input
        w_ref,            # (3, Co, 3*nblk*sub) VMEM (dy-major; dz in K)
        scale_ref,        # (1, Co) VMEM f32
        offset_ref,       # (1, Co) VMEM f32
        out_ref,          # (1, Th, Co, Wp) VMEM block
        slab, taps, sems,  # (2, 3, Th+2, ci_e, Wq), (Th+2, 3*nblk*sub, Wp)
        *, th: int, gg: int, nblk: int):
    """Stride-1 path: raw slab DMA + in-VMEM lane-roll taps."""
    from mdfnet_tpu.ops.pallas.conv2d_kernel import _shift_lanes_left

    d = pl.program_id(0)
    hb = pl.program_id(1)
    n_hb = pl.num_programs(1)
    n = pl.num_programs(0) * n_hb
    rows = th + 2

    def dma(slot, dd, hh):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(dd, 3), pl.ds(hh * th, rows)],
            slab.at[slot],
            sems.at[slot],
        )

    i = d * n_hb + hb

    @pl.when(i == 0)
    def _():
        dma(0, d, hb).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, (i + 1) // n_hb, (i + 1) % n_hb).start()

    dma(i % 2, d, hb).wait()
    blk = slab[i % 2]          # (3, rows, ci_e, Wq); col j = src col j-128
    ci_e = blk.shape[2]
    wp = taps.shape[-1]

    z = taps.shape[1] // 3        # nblk*sub: one dz segment of K
    sub = z // nblk
    for b in range(nblk):
        parts = []
        for t in range(gg):
            dx = b * gg + t
            if dx < 3:
                parts.append(_shift_lanes_left(blk, 127 + dx)[..., :wp])
            else:
                parts.append(jnp.zeros(blk.shape[:2] + (ci_e, wp),
                                       blk.dtype))
        block = (parts[0] if len(parts) == 1
                 else jnp.concatenate(parts, axis=2))
        if block.shape[2] < sub:
            block = jnp.pad(block, ((0, 0), (0, 0),
                                    (0, sub - block.shape[2]), (0, 0)))
        for dz in range(3):
            taps[:, dz * z + b * sub:dz * z + (b + 1) * sub, :] = block[dz]

    scale = scale_ref[0]
    offset = offset_ref[0]
    co = w_ref.shape[1]

    for hh in range(th):
        acc = jnp.zeros((co, wp), jnp.float32)
        for dy in range(3):
            # dz rides the contraction: one (Co, 3*Z) x (3*Z, Wp) matmul
            acc = acc + jax.lax.dot_general(
                w_ref[dy], taps[hh + dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * scale[:, None] + offset[:, None], 0.0)
        out_ref[0, hh] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "stride", "interpret"))
def conv3d_bn_relu(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                   offset: jnp.ndarray, *, th: int = 16, stride: int = 1,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused conv3d (stride 1 or isotropic 2) + scale/offset + relu on
    (D, H, C, W) layout.

    Args:
        x: (D, H, Ci, W).
        kernel: (3, 3, 3, Ci, Co) conv weights (as stored by ConvND).
        scale, offset: (Co,) folded BN (scale = gamma/rsqrt(var+eps),
            offset = beta - mean*scale).
    Returns:
        (D_out, H_out, Co, W_out) with *_out = ceil(*/stride).
    """
    d, h, ci, w = x.shape
    co = kernel.shape[-1]
    d_out = -(-d // stride)
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    h_out_pad = -(-h_out // th) * th
    wp = -(-w_out // 128) * 128

    if stride == 1:
        sub = 16 if x.dtype == jnp.bfloat16 else 8
        align = 4 if x.dtype == jnp.bfloat16 else 8
        ci_e = -(-ci // align) * align
        if ci_e < sub and sub % ci_e == 0:
            gg, slot = sub // ci_e, sub
        else:
            gg, slot = 1, -(-ci_e // sub) * sub
        nblk = -(-3 // gg)
        wq = wp + 256
        xq = jnp.pad(x, ((1, 1), (1, 1 + h_out_pad - h), (0, ci_e - ci),
                         (128, wq - 128 - w)))
        k9 = jnp.transpose(kernel, (0, 1, 2, 4, 3)).reshape(3, 3, 3, co, ci)
        z = nblk * slot
        k3p = jnp.zeros((3, co, 3 * z), x.dtype)  # (dy, co, dz-major K)
        for dz in range(3):
            for dx in range(3):
                off = dz * z + (dx // gg) * slot + (dx % gg) * ci_e
                k3p = k3p.at[:, :, off:off + ci].set(
                    k9[dz, :, dx].astype(x.dtype))
        scale2 = scale.reshape(1, co).astype(jnp.float32)
        offset2 = offset.reshape(1, co).astype(jnp.float32)
        kern = functools.partial(_conv_kernel_unstacked, th=th, gg=gg,
                                 nblk=nblk)
        out = pl.pallas_call(
            kern,
            grid=(d_out, h_out_pad // th),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((3, co, 3 * nblk * slot),
                             lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, co, wp), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d_out, h_out_pad, co, wp),
                                           x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 3, th + 2, ci_e, wq), x.dtype),
                pltpu.VMEM((th + 2, 3 * nblk * slot, wp), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xq, k3p, scale2, offset2)
        return out[:, :h_out, :, :w_out]

    if True:
        # stride 2: tap columns for output w are x[2w-1], x[2w], x[2w+1] —
        # i.e. the even/odd interleave [eq, oq, shift(eq, -1)] of the padded
        # input (eq[w] = xpad[2w], oq[w] = xpad[2w+1])
        d_pad_back = 2 * d_out + 1 - d - 1
        # slab height is stride*th + 2 (even size); pad H one row beyond the
        # 2*h_out_pad + 1 strictly needed so the last slab fits
        h_rows = 2 * h_out_pad + 2
        w_cols = 2 * wp + 1
        xp = jnp.pad(x, ((1, d_pad_back), (1, h_rows - h - 1), (0, 0),
                         (1, w_cols - w - 1)))
        eq = xp[..., 0::2]              # (.., wp+1)
        oq = xp[..., 1::2]              # (.., wp)
        x3 = jnp.concatenate([eq[..., :wp], oq, eq[..., 1:wp + 1]], axis=2)

    # (9, Co, 3Ci) with the dx taps matching x3's stacking order
    k9 = jnp.transpose(kernel, (0, 1, 2, 4, 3)).reshape(3, 3, 3, co, ci)
    k9 = jnp.concatenate([k9[:, :, dx] for dx in range(3)], axis=-1)  # (3,3,Co,3Ci)
    k9 = k9.reshape(9, co, 3 * ci).astype(x.dtype)
    scale2 = scale.reshape(1, co).astype(jnp.float32)
    offset2 = offset.reshape(1, co).astype(jnp.float32)

    kern = functools.partial(_conv_kernel, th=th, stride=stride)
    out = pl.pallas_call(
        kern,
        grid=(d_out, h_out_pad // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, co, 3 * ci), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, co, wp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_out, h_out_pad, co, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, stride * th + 2, 3 * ci, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x3, k9, scale2, offset2)
    return out[:, :h_out, :, :w_out]


def trconv3d_bn_relu(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                     offset: jnp.ndarray, *, th: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused ConvTranspose3d(3,stride 2,pad 1,out_pad 1) + BN(eval) + ReLU.

    Phase decomposition: output parity phase (a,b,c) in {0,1}^3 only receives
    kernel taps of matching parity, so the transposed conv equals 8 stride-1
    convs ON THE COARSE GRID. All 8 phases run as ONE :func:`conv3d_bn_relu`
    call with the phase kernels concatenated on the output-channel axis
    (phase-major) — one input read, 8x the MXU M-rows per matmul — followed
    by a single interleave reshape into the 2x volume.

    Args:
        x: (D, H, Ci, W) coarse input.
        kernel: (3, 3, 3, Co, Ci) — ConvTransposeND's stored layout.
        scale, offset: (Co,) folded BN.
    Returns:
        (2D, 2H, Co, 2W).
    """
    d, h, ci, w = x.shape
    co = kernel.shape[3]
    # equivalent forward-conv kernel: flip spatial, swap (Co, Ci) -> (Ci, Co)
    wf = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)

    def phase_taps(e):
        # returns [(delta, m)]: coarse-input offset and wf spatial index
        return [(0, 1)] if e == 0 else [(0, 0), (1, 2)]

    kernels = []
    for a in range(2):
        for b in range(2):
            for c in range(2):
                kp = jnp.zeros((3, 3, 3, ci, co), kernel.dtype)
                for dz, mz in phase_taps(a):
                    for dy, my in phase_taps(b):
                        for dx, mx in phase_taps(c):
                            kp = kp.at[1 + dz, 1 + dy, 1 + dx].set(
                                wf[mz, my, mx])
                kernels.append(kp)
    k_all = jnp.concatenate(kernels, axis=-1)        # (3,3,3,Ci,8Co)
    y = conv3d_bn_relu(x, k_all, jnp.tile(scale, 8), jnp.tile(offset, 8),
                       th=th, interpret=interpret)   # (D, H, 8Co, W)
    y = y.reshape(d, h, 2, 2, 2, co, w)
    y = y.transpose(0, 2, 1, 3, 5, 6, 4)             # (D,2,H,2,Co,W,2)
    return y.reshape(2 * d, 2 * h, co, 2 * w)
