"""Fused plane-sweep warp + vector cost aggregation as one Pallas kernel.

Replaces the eval-path chain  warp(S srcs) -> sigmoid -> pair-similarity ->
DepthWeight -> weighted accumulate  (models/aggregate.py, reference
net/unit/homoaggregate.py:8-46) for the C/G == 2 configuration, where the
group softmax collapses to sigmoids of pair-difference features.

Key ideas vs ops/pallas/warp_kernel.py (the per-tile warp kernel):

- One window DMA per (output row, src view), shared across ALL D depth
  planes: the plane-sweep x-spread rides a full-width window (W <= 896 lanes
  at every stage), and the y-spread across planes fits a K-row band for
  MVS-style cameras. This removes the D-fold window re-reads that made the
  old kernel DMA-bound (~30x less window traffic at stage 0).
- y-interpolation FIRST (a K-row tent blend on the VPU), then
  x-interpolation as ONE (C, W) x (W, W) tent matmul per plane — the old
  kernel x-interpolated all K rows, paying K times the MXU work.
- The aggregation epilogue runs in-registers per (row, src, plane):
  p = sigmoid(warped), sim = p*q + (1-p)(1-q), the DepthWeight scalar field
  (1x1x1 convs + folded eval BN, homoaggregate.py:16-20), and the weighted
  accumulation over srcs — the (D, H, G, W) volume is written to HBM once,
  already in the (D, H, C, W) layout the Pallas U-Net consumes.

Border semantics match grid_sample zeros-padding exactly in x (full-width
window + zero-padded lanes). In y they match provided each row's valid
y-coordinates span < K rows (the same coverage contract as the old kernel;
`rowsweep_cover` computes the flag for tests). Eval-only (no autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdfnet_tpu import geometry


def _rowsweep_kernel(ystart_ref,          # scalar prefetch (Hseg, S) i32
                     xblk_ref,            # scalar prefetch (Hseg, S*D*NB) i32
                     q_ref,               # (1, C, Wp) block @ row
                     xs_ref, ys_ref,      # (1, 1, D, Wp) blocks @ (src, row)
                     k0_ref,              # (1, C) f32
                     sc_ref,              # (1, 128) f32 [bn_s, bn_o, k1, b1]
                     diffs_ref,           # (S, H, C, Wp) ANY/HBM
                     out_ref,             # (D, 1, C, Wp) block @ row
                     window, vol, wsum, blend_buf, sems,
                     *, n_src: int, k_win: int, nd: int):
    r = pl.program_id(0)
    s = pl.program_id(1)
    n_rows = pl.num_programs(0)

    def dma(slot, rr, ss):
        return pltpu.make_async_copy(
            diffs_ref.at[ss, pl.ds(ystart_ref[rr, ss], k_win)],
            window.at[slot],
            sems.at[slot],
        )

    i = r * n_src + s

    @pl.when(i == 0)
    def _():
        dma(0, 0, 0).start()

    @pl.when(i + 1 < n_rows * n_src)
    def _():
        dma((i + 1) % 2, (i + 1) // n_src, (i + 1) % n_src).start()

    dma(i % 2, r, s).wait()
    win = window[i % 2].astype(jnp.float32)  # (K, C, Wp)

    @pl.when(s == 0)
    def _():
        vol[...] = jnp.zeros_like(vol)
        wsum[...] = jnp.zeros_like(wsum)

    wp = win.shape[-1]
    q = q_ref[0].astype(jnp.float32)              # (C, Wp)
    y0 = ystart_ref[r, s].astype(jnp.float32)
    k0 = k0_ref[0]                                # (C,) f32
    bn_s = sc_ref[0, 0]
    bn_o = sc_ref[0, 1]
    k1 = sc_ref[0, 2]
    b1 = sc_ref[0, 3]

    kiota = jax.lax.broadcasted_iota(jnp.int32, (k_win, wp), 0) \
        .astype(jnp.float32)
    biota = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) \
        .astype(jnp.float32)
    nb = wp // 128

    for d in range(nd):
        ysd = ys_ref[0, 0, d].astype(jnp.float32)     # (Wp,)
        xsd = xs_ref[0, 0, d].astype(jnp.float32)
        ky = jnp.maximum(0.0, 1.0 - jnp.abs(ysd[None, :] - (kiota + y0)))
        blend_buf[...] = jnp.sum(win * ky[:, None, :], axis=0)  # (C, Wp) f32
        # x-interp per 128-col output block against a 256-col source window
        # at a 128-ALIGNED precomputed offset — the tent matrix is band
        # sparse, so the dense (Wp, Wp) build + matmul wasted O(W^2) VPU and
        # MXU per plane. Aligned dynamic lane slices are Mosaic-legal.
        cols = []
        for b in range(nb):
            start = xblk_ref[r, (s * nd + d) * nb + b] * 128
            startm = pl.multiple_of(start, 128)
            src_win = blend_buf[:, pl.ds(startm, 256)]       # (C, 256)
            xb = xsd[b * 128:(b + 1) * 128]                  # (128,)
            kx = jnp.maximum(
                0.0, 1.0 - jnp.abs(xb[None, :]
                                   - (biota + start.astype(jnp.float32))))
            cols.append(jax.lax.dot_general(
                src_win.astype(jnp.bfloat16), kx.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        warped = jnp.concatenate(cols, axis=1)               # (C, Wp) f32
        p = jax.nn.sigmoid(warped)
        sim = p * q + (1.0 - p) * (1.0 - q)                   # (C, Wp)
        sfield = jnp.sum(sim * k0[:, None], axis=0)           # (Wp,)
        act = jnp.maximum(sfield * bn_s + bn_o, 0.0)
        wgt = jax.nn.sigmoid(act * k1 + b1)                   # (Wp,)
        vol[d] = vol[d] + sim * wgt[None, :]
        wsum[d] = wsum[d] + wgt[None, :]

    @pl.when(s == n_src - 1)
    def _():
        out_ref[:, 0] = (vol[...] / wsum[...]).astype(out_ref.dtype)


def _sweep_coords_hdw(src_projs, ref_proj, depth_hypos, h, w, wp):
    """Effective sample coords per src in (S, H, D, Wp) layout (f32), with
    out-of-range padding (-2: zero tent weight everywhere)."""
    n_src = src_projs.shape[0]
    d = depth_hypos.shape[0]
    xs, ys = [], []
    for s in range(n_src):
        x_src, y_src = geometry.sweep_coordinates(
            src_projs[s:s + 1].astype(jnp.float32),
            ref_proj[None].astype(jnp.float32),
            depth_hypos[None].astype(jnp.float32), h, w)
        x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
        xs.append(x_eff.reshape(d, h, w))
        ys.append(y_eff.reshape(d, h, w))
    xs = jnp.stack(xs).transpose(0, 2, 1, 3)   # (S, H, D, W)
    ys = jnp.stack(ys).transpose(0, 2, 1, 3)
    pad = ((0, 0), (0, 0), (0, 0), (0, wp - w))
    xs = jnp.pad(xs, pad, constant_values=-2.0)
    ys = jnp.pad(ys, pad, constant_values=-2.0)
    return jax.lax.stop_gradient(xs), jax.lax.stop_gradient(ys)


def _window_starts(ys, h, w, k_win):
    """Per (src, row) window top rows from the y coords: cover the valid
    span, clipped into the image. Returns ((S, H) i32 starts, cover flag)."""
    valid = (ys > -1.0) & (ys < h) & (jnp.isfinite(ys))
    big = jnp.float32(1e9)
    y_min = jnp.min(jnp.where(valid, ys, big), axis=(1, 3))   # over (D, Wp)
    y_max = jnp.max(jnp.where(valid, ys, -big), axis=(1, 3))
    y_min = jnp.where(y_min > h, 0.0, y_min)                  # no valid px
    y_max = jnp.where(y_max < -1.0, 0.0, y_max)
    start = jnp.clip(jnp.floor(y_min).astype(jnp.int32), 0, h - k_win)
    # needed rows are floor(y) and floor(y)+1, clipped into the image
    # (out-of-image taps contribute zero under grid_sample zeros padding)
    lo = jnp.maximum(jnp.floor(y_min), 0.0)
    hi = jnp.minimum(jnp.floor(y_max) + 1.0, h - 1.0)
    cover = jnp.all((start.astype(jnp.float32) <= lo)
                    & (hi <= start.astype(jnp.float32) + k_win - 1))
    return jnp.transpose(start), cover  # (H, S)


def _x_block_starts(xs, w):
    """Per (row, src, plane, out-block) 128-aligned source-window start
    block for the banded x-interp, plus the coverage flag (every in-image
    tap of an out block inside its 256-col window). xs: (S, H, D, Wp)."""
    wp = xs.shape[-1]
    nb = wp // 128
    xsb = xs.reshape(xs.shape[:-1] + (nb, 128))
    valid = (xsb > -1.0) & (xsb < w)
    big = jnp.float32(1e9)
    xmin = jnp.min(jnp.where(valid, xsb, big), axis=-1)
    xmax = jnp.max(jnp.where(valid, xsb, -big), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    start = jnp.floor(jnp.maximum(xmin, 0.0) / 128.0).astype(jnp.int32)
    start = jnp.clip(jnp.where(any_valid, start, 0), 0, max(nb - 2, 0))
    hi_tap = jnp.minimum(jnp.floor(xmax) + 1.0, w - 1.0)
    cover = jnp.all(jnp.where(
        any_valid, hi_tap <= start.astype(jnp.float32) * 128.0 + 255.0, True))
    h = start.shape[1]
    flat = jnp.transpose(start, (1, 0, 2, 3)).reshape(h, -1)
    return flat, cover  # (H, S*D*NB) — flat so the SMEM copy isn't lane-padded


@functools.partial(jax.jit, static_argnames=("k_win", "row_seg", "interpret"))
def rowsweep_aggregate(diffs: jnp.ndarray, q: jnp.ndarray,
                       src_projs: jnp.ndarray, ref_proj: jnp.ndarray,
                       depth_hypos: jnp.ndarray, k0: jnp.ndarray,
                       bn_scale, bn_offset, k1, b1, *, k_win: int = 16,
                       row_seg: int = 1024, interpret: bool = False
                       ) -> jnp.ndarray:
    """Fused warp + aggregate for ONE batch item.

    Args:
        diffs: (S, H, C, W) src pair-difference features, (H, C, W) layout.
        q: (H, C, W) sigmoid of the ref view's pair differences.
        src_projs: (S, 4, 4); ref_proj: (4, 4).
        depth_hypos: (D, H, W) or (D, 1, 1).
        k0: (C,) DepthWeight conv0 channel weights (f32).
        bn_scale, bn_offset: folded eval BN scalars of the scalar-field BN.
        k1, b1: DepthWeight conv1 scalar weight/bias.
    Returns:
        (D, H, C, Wp) aggregated cost volume (Wp = W padded to 128; columns
        beyond W hold the zero-feature similarity, slice before use).
    """
    n_src, h, c, w = diffs.shape
    nd = depth_hypos.shape[0]
    wp = -(-w // 128) * 128
    k_win = min(k_win, h)

    if depth_hypos.shape[-1] == 1:
        hypos = jnp.broadcast_to(depth_hypos, (nd, 1, 1))
    else:
        hypos = depth_hypos
    if wp < 256:
        wp = 256  # the banded x-interp needs a 256-col source window
    xs, ys = _sweep_coords_hdw(src_projs, ref_proj, hypos, h, w, wp)
    ystart, _ = _window_starts(ys.transpose(0, 2, 1, 3), h, w, k_win)
    xblk, _ = _x_block_starts(xs, w)

    diffs_p = jnp.pad(diffs, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    q_p = jnp.pad(q, ((0, 0), (0, 0), (0, wp - w)),
                  constant_values=0.5)  # sigma(0): zero-feature ref
    k0_2 = k0.reshape(1, c).astype(jnp.float32)
    scalars = jnp.zeros((1, 128), jnp.float32)
    scalars = scalars.at[0, 0].set(bn_scale).at[0, 1].set(bn_offset)
    scalars = scalars.at[0, 2].set(k1).at[0, 3].set(b1)

    kern = functools.partial(_rowsweep_kernel, n_src=n_src, k_win=k_win,
                             nd=nd)

    def run_rows(r0, r1):
        rows = r1 - r0
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows, n_src),
            in_specs=[
                pl.BlockSpec((1, c, wp), lambda r, s, *_: (r0 + r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nd, wp),
                             lambda r, s, *_: (s, r0 + r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nd, wp),
                             lambda r, s, *_: (s, r0 + r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda r, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128), lambda r, s, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((nd, 1, c, wp),
                                   lambda r, s, *_: (0, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, k_win, c, wp), diffs.dtype),
                pltpu.VMEM((nd, c, wp), jnp.float32),
                pltpu.VMEM((nd, 1, wp), jnp.float32),
                pltpu.VMEM((c, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nd, rows, c, wp), diffs.dtype),
            interpret=interpret,
        )(ystart[r0:r1], xblk[r0:r1], q_p, xs, ys, k0_2, scalars, diffs_p)

    outs = [run_rows(r0, min(r0 + row_seg, h))
            for r0 in range(0, h, row_seg)]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def rowsweep_cover(src_projs, ref_proj, depth_hypos, h, w,
                   k_win: int = 16) -> jnp.ndarray:
    """Coverage flag for the rowsweep kernel's contracts (tests): the y
    span of every row fits the k_win window AND every out block's in-image
    x taps fit its 128-aligned 256-col source window."""
    nd = depth_hypos.shape[0]
    wp = -(-w // 128) * 128
    if wp < 256:
        wp = 256
    hypos = (jnp.broadcast_to(depth_hypos, (nd, 1, 1))
             if depth_hypos.shape[-1] == 1 else depth_hypos)
    xs, ys = _sweep_coords_hdw(src_projs, ref_proj, hypos, h, w, wp)
    _, cover = _window_starts(ys.transpose(0, 2, 1, 3), h, w,
                              min(k_win, h))
    _, cover_x = _x_block_starts(xs, w)
    return cover & cover_x
