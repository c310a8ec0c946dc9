"""Pallas TPU kernel for plane-sweep bilinear warping.

The fused pipeline per output tile of T x-pixels (fixed batch, depth plane,
row):

  1. DMA the (K, C, Wx) source window whose corner was precomputed host-side
     (scalar-prefetched, double-buffered across grid steps);
  2. build tent interpolation kernels kx (T, Wx), ky (T, K) on the VPU;
  3. x-interpolate with one (K*C, Wx) x (Wx, T) MXU matmul;
  4. y-interpolate with a broadcast-multiply-reduce;
  5. write the (C, T) output block (C on sublanes, T on lanes — no padding).

Grid steps process TG=8 tiles each (Mosaic block shapes need the
second-to-last dim divisible by 8); all 8 window DMAs of the next step run
while the current step computes.

Same math and border semantics as ops/sample.py / ops/warp_dense.py (tent
kernel == bilinear with zeros padding); the win over the XLA dense path is
explicit window DMA (no materialised gather) overlapped with compute.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mdfnet_tpu.ops.pallas import runtime as _rt
from jax.experimental.pallas import tpu as pltpu

from mdfnet_tpu import geometry

TG = 8  # tiles per grid step


def _warp_kernel(sidx_ref, xstart_ref, ystart_ref,  # scalar prefetch (steps, TG)
                 xs_ref, ys_ref,                # (1, TG, T) VMEM per step
                 src_ref,                       # (S, H, C, Wpad) in ANY/HBM
                 out_ref,                       # (1, TG, C, T) VMEM block
                 window, sems,                  # (2, TG, K, C, Wx), DMA sems
                 *, k_win: int, wx_win: int, tile: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, step, j):
        # x starts are produced 128-aligned host-side (lane-aligned DMA)
        x0 = pl.multiple_of(xstart_ref[step, j], 128)
        return pltpu.make_async_copy(
            src_ref.at[sidx_ref[step, j],
                       pl.ds(ystart_ref[step, j], k_win), :,
                       pl.ds(x0, wx_win)],
            window.at[slot, j],
            sems.at[slot, j],
        )

    @pl.when(i == 0)
    def _():
        for j in range(TG):
            dma(0, 0, j).start()

    @pl.when(i + 1 < n)
    def _():
        for j in range(TG):
            dma((i + 1) % 2, i + 1, j).start()

    for j in range(TG):
        dma(i % 2, i, j).wait()

    c = window.shape[3]
    # Mosaic iota must be integer-typed; cast after
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wx_win), 1) \
        .astype(jnp.float32)
    y_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, k_win), 1) \
        .astype(jnp.float32)

    for j in range(TG):
        win = window[i % 2, j]  # (K, C, Wx)
        xs = xs_ref[0, j]       # (T,)
        ys = ys_ref[0, j]
        x0 = xstart_ref[i, j].astype(jnp.float32)
        y0 = ystart_ref[i, j].astype(jnp.float32)
        kx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - (x_iota + x0)))
        ky = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - (y_iota + y0)))

        z = jax.lax.dot_general(
            win.reshape(k_win * c, wx_win), kx.astype(win.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(k_win, c, tile)
        out = jnp.sum(z * ky.T[:, None, :], axis=0)  # (C, T)
        out_ref[0, j] = out.astype(out_ref.dtype)


def _tile_geometry(x, y, h, w, k_win, wx_win, w_clamp):
    """Per-tile window corners (x 128-aligned for lane-aligned DMA) +
    coverage flag."""
    x_in = jnp.where((x > -1.0) & (x < w), x, jnp.inf)
    y_in = jnp.where((y > -1.0) & (y < h), y, jnp.inf)
    x_min = jnp.min(x_in, axis=-1)
    y_min = jnp.min(y_in, axis=-1)
    x_max = jnp.max(jnp.where(jnp.isinf(x_in), -jnp.inf, x_in), axis=-1)
    y_max = jnp.max(jnp.where(jnp.isinf(y_in), -jnp.inf, y_in), axis=-1)
    x_min = jnp.where(jnp.isinf(x_min), 0.0, x_min)
    y_min = jnp.where(jnp.isinf(y_min), 0.0, y_min)

    x_start = jnp.floor(x_min).astype(jnp.int32)
    x_start = jnp.clip((x_start // 128) * 128, 0, w_clamp - wx_win)
    y_start = jnp.clip(jnp.floor(y_min).astype(jnp.int32), 0, h - k_win)

    lo_x = jnp.maximum(jnp.floor(x_min), 0.0)
    lo_y = jnp.maximum(jnp.floor(y_min), 0.0)
    cover = jnp.all(
        (x_start.astype(jnp.float32) <= lo_x)
        & (jnp.floor(x_max) + 1 <= x_start.astype(jnp.float32) + wx_win - 1)
        & (y_start.astype(jnp.float32) <= lo_y)
        & (jnp.floor(y_max) + 1 <= y_start.astype(jnp.float32) + k_win - 1))
    return x_start, y_start, cover


@functools.partial(jax.jit, static_argnames=("x_tile", "y_window", "x_margin",
                                             "interpret"))
def pallas_sample_2d(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     *, x_tile: int = 256, y_window: int = 8,
                     x_margin: int = 64, interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas twin of ops.warp_dense.dense_sample_2d.

    Args:
        image: (H, W, C); x, y: (R, T_total) coherent coordinate rows.
    Returns:
        (samples (R, T_total, C), coverage_ok).
    """
    out, cov = pallas_sample_2d_multi(image[None], x[None], y[None],
                                      x_tile=x_tile, y_window=y_window,
                                      x_margin=x_margin, interpret=interpret)
    return out[0], cov


@functools.partial(jax.jit, static_argnames=("x_tile", "y_window", "x_margin",
                                             "interpret"))
def pallas_sample_2d_multi(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                           *, x_tile: int = 256, y_window: int = 8,
                           x_margin: int = 64, interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-source sampling: ONE kernel over all sources' tiles (the source
    index rides the scalar-prefetch stream into the window DMA).

    Args:
        image: (S, H, W, C); x, y: (S, R, T_total) per-source coords.
    Returns:
        (samples (S, R, T_total, C), coverage_ok).
    """
    n_src, h, w, c = image.shape
    _, r, t_total = x.shape
    x = x.reshape(n_src * r, t_total)
    y = y.reshape(n_src * r, t_total)
    r_all = n_src * r
    tile = min(x_tile, -(-t_total // 128) * 128)
    n_tiles_row = -(-t_total // tile)
    pad = n_tiles_row * tile - t_total
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-2.0)
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-2.0)

    # zero-pad width to a lane multiple; padded columns behave exactly like
    # grid_sample zeros-padding. The extra 128 covers the 128-alignment of
    # the window start.
    w_pad = -(-w // 128) * 128
    wx_win = min(-(-(tile + 2 * x_margin) // 128) * 128 + 128, w_pad)
    k_win = min(y_window, h)

    total_tiles = r_all * n_tiles_row
    n_steps = -(-total_tiles // TG)
    step_pad = n_steps * TG - total_tiles

    xt = x.reshape(total_tiles, tile).astype(jnp.float32)
    yt = y.reshape(total_tiles, tile).astype(jnp.float32)
    src_idx = jnp.repeat(jnp.arange(n_src, dtype=jnp.int32), r * n_tiles_row)
    if step_pad:
        xt = jnp.pad(xt, ((0, step_pad), (0, 0)), constant_values=-2.0)
        yt = jnp.pad(yt, ((0, step_pad), (0, 0)), constant_values=-2.0)
        src_idx = jnp.pad(src_idx, (0, step_pad))

    x_start, y_start, cover = _tile_geometry(xt, yt, h, w, k_win, wx_win,
                                             w_clamp=w_pad)

    img_t = jnp.transpose(image, (0, 1, 3, 2))  # (S, H, C, W)
    if w_pad != w:
        img_t = jnp.pad(img_t, ((0, 0), (0, 0), (0, 0), (0, w_pad - w)))

    xs3 = xt.reshape(n_steps, TG, tile)
    ys3 = yt.reshape(n_steps, TG, tile)
    xst = x_start.reshape(n_steps, TG)
    yst = y_start.reshape(n_steps, TG)
    sidx = src_idx.reshape(n_steps, TG)

    kernel = functools.partial(_warp_kernel, k_win=k_win, wx_win=wx_win,
                               tile=tile)

    def run_segment(seg_sidx, seg_xst, seg_yst, seg_xs, seg_ys):
        steps = seg_xst.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, TG, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TG, tile), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, TG, c, tile), lambda i, *_: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TG, k_win, c, wx_win), image.dtype),
                pltpu.SemaphoreType.DMA((2, TG)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((steps, TG, c, tile), image.dtype),
            interpret=interpret or _rt.force_interpret(),
        )(seg_sidx, seg_xst, seg_yst, seg_xs, seg_ys, img_t)

    # the scalar-prefetch arrays live in SMEM for the whole call; segment the
    # grid so they stay small (SMEM overflows somewhere under ~1.7k steps)
    max_steps = 512
    outs = []
    for s0 in range(0, n_steps, max_steps):
        s1 = min(s0 + max_steps, n_steps)
        outs.append(run_segment(sidx[s0:s1], xst[s0:s1], yst[s0:s1],
                                xs3[s0:s1], ys3[s0:s1]))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    out = out.reshape(n_steps * TG, c, tile)[:total_tiles]
    samples = out.transpose(0, 2, 1).reshape(n_src, r, n_tiles_row * tile, c)
    return samples[:, :, :t_total], cover


def _homography_warp_pallas_impl(src_feat, src_proj, ref_proj, depth_hypos,
                                 *, x_tile: int = 512, y_window: int = 8,
                                 x_margin: int = 64,
                                 interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = src_feat.shape
    d = depth_hypos.shape[1]

    x_src, y_src = geometry.sweep_coordinates(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
        depth_hypos.astype(jnp.float32), h, w)
    x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
    x_eff = jax.lax.stop_gradient(x_eff).reshape(b, d * h, w)
    y_eff = jax.lax.stop_gradient(y_eff).reshape(b, d * h, w)

    outs = []
    for bi in range(b):  # eval runs B=1; small static loop otherwise
        samples, _ = pallas_sample_2d(src_feat[bi], x_eff[bi], y_eff[bi],
                                      x_tile=x_tile, y_window=y_window,
                                      x_margin=x_margin, interpret=interpret)
        outs.append(samples.reshape(d, h, w, c))
    return jnp.stack(outs)


@jax.custom_vjp
def homography_warp_pallas(src_feat: jnp.ndarray, src_proj: jnp.ndarray,
                           ref_proj: jnp.ndarray,
                           depth_hypos: jnp.ndarray) -> jnp.ndarray:
    """Drop-in twin of ops.warp.homography_warp on the Pallas path.

    Differentiable: the backward rides homography_warp_dense's custom VJP —
    the scatter-free gradient splat (ops/splat.py, Pallas twin
    ops/pallas/splat_kernel.py) — so ``warp_impl="pallas"`` also accelerates
    the training forward instead of falling back. Coordinates are
    stop_gradient'ed like the reference's no_grad hypotheses, so
    projections/hypotheses carry no gradient.

    Returns (B, D, H, W, C)."""
    return _homography_warp_pallas_impl(src_feat, src_proj, ref_proj,
                                        depth_hypos)


def _hwp_fwd(src_feat, src_proj, ref_proj, depth_hypos):
    out = _homography_warp_pallas_impl(src_feat, src_proj, ref_proj,
                                       depth_hypos)
    return out, (src_feat, src_proj, ref_proj, depth_hypos)


def _hwp_bwd(res, g):
    from mdfnet_tpu.ops.warp_dense import homography_warp_dense
    src_feat, src_proj, ref_proj, depth_hypos = res
    _, vjp_fn = jax.vjp(
        lambda s: homography_warp_dense(s, src_proj, ref_proj, depth_hypos),
        src_feat)
    (d_src,) = vjp_fn(g)
    return (d_src, jnp.zeros_like(src_proj), jnp.zeros_like(ref_proj),
            jnp.zeros_like(depth_hypos))


homography_warp_pallas.defvjp(_hwp_fwd, _hwp_bwd)


def homography_warp_pallas_multi(src_feats: jnp.ndarray, src_projs: jnp.ndarray,
                                 ref_proj: jnp.ndarray, depth_hypos: jnp.ndarray,
                                 *, x_tile: int = 512, y_window: int = 8,
                                 x_margin: int = 64,
                                 interpret: bool = False) -> jnp.ndarray:
    """Warp ALL source views in one kernel launch per batch item.

    Args:
        src_feats: (B, S, H, W, C); src_projs: (B, S, 4, 4);
        ref_proj: (B, 4, 4); depth_hypos: (B, D, H, W) or (B, D, 1, 1).
    Returns:
        (B, S, D, H, W, C).
    """
    b, n_src, h, w, c = src_feats.shape
    d = depth_hypos.shape[1]

    outs = []
    for bi in range(b):  # eval runs B=1
        xs, ys = [], []
        for s in range(n_src):
            x_src, y_src = geometry.sweep_coordinates(
                src_projs[bi:bi + 1, s].astype(jnp.float32),
                ref_proj[bi:bi + 1].astype(jnp.float32),
                depth_hypos[bi:bi + 1].astype(jnp.float32), h, w)
            x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
            xs.append(x_eff.reshape(d * h, w))
            ys.append(y_eff.reshape(d * h, w))
        x_all = jax.lax.stop_gradient(jnp.stack(xs))
        y_all = jax.lax.stop_gradient(jnp.stack(ys))
        samples, _ = pallas_sample_2d_multi(
            src_feats[bi], x_all, y_all, x_tile=x_tile, y_window=y_window,
            x_margin=x_margin, interpret=interpret)
        outs.append(samples.reshape(n_src, d, h, w, c))
    return jnp.stack(outs)
