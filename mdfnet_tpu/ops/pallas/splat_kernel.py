"""Pallas TPU kernel for the scatter-free warp adjoint (gradient splat).

The XLA formulation (ops/splat.py) is exact but slow on TPU: vmapped
dynamic-slices lower to gathers and the per-tile tent tensors round-trip
HBM. This kernel runs the identical math with explicit window DMA, mirroring
ops/pallas/warp_kernel.py with the sampling direction reversed.

Grid = (output tile, depth plane), plane innermost; an output tile is RB
consecutive source rows x a 128-col block of ONE batch item, so the MXU
contraction is (T, Wx) x (RB*C, Wx) — both systolic dims fed (a per-row
variant starves M at C<=32). The tile's output block stays resident in VMEM
across its plane steps (Pallas revisiting) and accumulates:

  1. DMA the (KB, C, Wx) window of the cotangent g plus the matching
     (KB, 2, Wx) coordinate window — corners (row-band start, x-window
     start) precomputed host-side, riding the scalar-prefetch stream,
     double-buffered across grid steps. KB covers the rows of one plane
     touching ALL RB output rows of the tile;
  2. on the VPU build, per band row k, the RB y-tents
     a[j] = tent(y_k - (ys0+j)) and the x-splat tent
     tx[t, xw] = tent(x_k[xw] - (x'0 + t));
  3. contract on the MXU: acc[t, j*C+c] += tx @ (a*g_k)^T.

Every source pixel is written exactly once — no scatters, no accumulation
hazards. Same coverage contract as ops/splat.py (the row band and x window
must cover all contributing samples; flags computed host-side): monotone
plane-sweep coordinates hold it with margin, pathological cameras trip the
returned flag.

Used as the training backward of the plane-sweep warps via
ops/warp_dense._planes_sample's custom VJP; exactness vs autodiff of the
gather warp is pinned by tests/test_splat.py.

Reference behaviour matched: autodiff of grid_sample(bilinear, zeros) as
used in training by reference net/unit/base.py:122-124.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mdfnet_tpu.ops.pallas import runtime as _rt
from jax.experimental.pallas import tpu as pltpu

RB = 8  # output rows per tile


def _splat_kernel(bidx_ref, rb0_ref, xs0_ref, ys_ref, x0_ref,  # prefetch
                  g_ref, xy_ref,                               # ANY/HBM
                  out_ref,                                     # (1,T,RB*C)
                  gwin, xywin, sems,                           # scratch
                  *, n_planes: int, kb: int, wx: int, tile: int):
    i = pl.program_id(0)   # output tile (b, row block, col block)
    p = pl.program_id(1)   # depth plane (innermost; out block revisited)
    n_i = pl.num_programs(0)
    gl = i * n_planes + p

    # the sliced row dim must stay OUT of the tiled last-two memref dims
    # (Mosaic requires 8-aligned sublane slicing otherwise): g is
    # (B, P, R, C, T) and the coords ride one (B, P, R, 2, T) tensor.
    # rb0/xs0 are FLAT 1-D prefetch arrays indexed tile*P + p — 2-D SMEM
    # arrays are lane-padded to 128 columns and blow the 1 MB SMEM budget.
    def dma(slot, step_i, step_p):
        b = bidx_ref[step_i]
        r0 = rb0_ref[step_i * n_planes + step_p]
        x0 = pl.multiple_of(xs0_ref[step_i * n_planes + step_p], 128)
        return (
            pltpu.make_async_copy(
                g_ref.at[b, step_p, pl.ds(r0, kb), :, pl.ds(x0, wx)],
                gwin.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                xy_ref.at[b, step_p, pl.ds(r0, kb), :, pl.ds(x0, wx)],
                xywin.at[slot], sems.at[slot, 1]),
        )

    @pl.when(gl == 0)
    def _():
        for cp in dma(0, 0, 0):
            cp.start()

    @pl.when(gl + 1 < n_i * n_planes)
    def _():
        nxt_i = jnp.where(p + 1 == n_planes, i + 1, i)
        nxt_p = jnp.where(p + 1 == n_planes, 0, p + 1)
        for cp in dma((gl + 1) % 2, nxt_i, nxt_p):
            cp.start()

    slot = gl % 2
    for cp in dma(slot, i, p):
        cp.wait()

    @pl.when(p == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    c_dim = gwin.shape[2]
    ysf = ys_ref[i].astype(jnp.float32)
    x0f = x0_ref[i].astype(jnp.float32)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wx), 0) \
        .astype(jnp.float32)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, wx), 0) \
        .astype(jnp.float32)

    gw = gwin[slot]                        # (KB, C, Wx)
    acc = jnp.zeros_like(out_ref[0])       # (T, RB*C) f32
    for k in range(kb):
        xk = xywin[slot, k, 0]             # (Wx,) absolute pixel coords
        yk = xywin[slot, k, 1]
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(
            xk[None, :] - x0f - t_iota))                    # (T, Wx)
        a = jnp.maximum(0.0, 1.0 - jnp.abs(
            yk[None, :] - ysf - j_iota))                    # (RB, Wx)
        pk = (a[:, None, :] * gw[k][None].astype(jnp.float32)) \
            .reshape(RB * c_dim, wx)                        # (RB*C, Wx)
        acc = acc + jax.lax.dot_general(
            tx.astype(gw.dtype), pk.astype(gw.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (T, RB*C)
    out_ref[0] += acc


@functools.partial(jax.jit, static_argnames=("height", "width", "band",
                                             "x_tile", "x_margin",
                                             "interpret"))
def pallas_splat_2d(g: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    height: int, width: int, *, band: int = 8,
                    x_tile: int = 128, x_margin: int = 32,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas twin of ops.splat.dense_splat_2d (same args, same contract).

    Args:
        g: (B, P, R, T, C) sample cotangents; x, y: (B, P, R, T) sample
            pixel coordinates (P = depth planes).
        height, width: source image extent.
        band: per-output-row band spread; the DMA'd band covers band+RB-1
            rows (RB output rows share one window).
    Returns:
        (d_img (B, height, width, C) float32, coverage_ok).
    """
    bsz, np_, r, t, c = g.shape
    hb = -(-height // RB)           # row blocks (output rows padded to RB)
    kb = min(band + RB - 1, r)
    tile = min(x_tile, -(-width // 128) * 128)
    nb = -(-width // tile)
    f32 = jnp.float32

    x = x.astype(f32)
    y = y.astype(f32)

    # ---- host-side geometry (same contract as ops/splat.py) ----
    valid = (x > -1.0) & (x < width) & (y > -1.0) & (y < height)
    y_row_min = jnp.min(jnp.where(valid, y, jnp.inf), axis=-1)   # (B, P, R)
    y_row_max = jnp.max(jnp.where(valid, y, -jnp.inf), axis=-1)

    ys0_idx = jnp.arange(hb, dtype=f32) * RB    # block start rows
    # rows entirely above the block's support: y_max < ys0 - 1
    rb0 = jnp.sum((y_row_max[..., None] < ys0_idx - 1.0).astype(jnp.int32),
                  axis=2)                                         # (B, P, hb)
    rb0 = jnp.clip(rb0, 0, r - kb)

    # coverage (y): every row touching output rows [ys0, ys0+RB) must lie in
    # [rb0, rb0+kb)
    touch = ((y_row_min[..., None] <= ys0_idx + (RB - 1) + 1.0)
             & (y_row_max[..., None] >= ys0_idx - 1.0))          # (B,P,R,hb)
    r_idx = jnp.arange(r)[:, None]
    inband = ((rb0[:, :, None, :] <= r_idx)
              & (r_idx < rb0[:, :, None, :] + kb))
    cover_y = jnp.all(jnp.logical_or(~touch, inband))

    # pad T to a lane multiple (+128 headroom for aligned window starts)
    wx = min(-(-(tile + 2 * x_margin) // 128) * 128 + 128,
             -(-t // 128) * 128)
    t_pad = max(-(-t // 128) * 128, wx)
    if t_pad != t:
        g = jnp.pad(g, ((0, 0),) * 3 + ((0, t_pad - t), (0, 0)))
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, t_pad - t),),
                    constant_values=-4.0)
        y = jnp.pad(y, ((0, 0),) * 3 + ((0, t_pad - t),),
                    constant_values=-4.0)

    blk0 = jnp.arange(nb, dtype=f32) * tile
    xs_lo = jnp.sum((x[..., None] < (blk0 - 1.0)).astype(jnp.int32),
                    axis=3)                                       # (B,P,R,NB)
    xs_hi = jnp.sum((x[..., None] < (blk0 + tile)).astype(jnp.int32),
                    axis=3)
    # band min/max over each kb-row window starting at r
    big = jnp.int32(t_pad)
    xs_lo_p = jnp.concatenate(
        [xs_lo, jnp.full((bsz, np_, kb - 1, nb), big, jnp.int32)], axis=2)
    xs_lo_band = -jax.lax.reduce_window(
        -xs_lo_p, -big, jax.lax.max, (1, 1, kb, 1), (1, 1, 1, 1), "valid")
    xs_hi_p = jnp.concatenate(
        [xs_hi, jnp.zeros((bsz, np_, kb - 1, nb), jnp.int32)], axis=2)
    xs_hi_band = jax.lax.reduce_window(
        xs_hi_p, jnp.int32(0), jax.lax.max, (1, 1, kb, 1), (1, 1, 1, 1),
        "valid")
    xs0 = jnp.clip((xs_lo_band // 128) * 128, 0, t_pad - wx)      # (B,P,R,NB)
    cover_x = jnp.all(xs_hi_band - xs0 <= wx)
    coverage_ok = jnp.logical_and(cover_y, cover_x)

    # ---- per-tile prefetch streams; tiles packed (b, row block, blk) ----
    rb0_t = jnp.broadcast_to(jnp.transpose(rb0, (0, 2, 1))[:, :, None, :],
                             (bsz, hb, nb, np_))
    # window corner for a tile = xs0 at the tile's band start row
    xs0_sel = jnp.take_along_axis(
        xs0, jnp.broadcast_to(rb0[:, :, :, None], (bsz, np_, hb, nb)),
        axis=2)                                                   # (B,P,hb,NB)
    xs0_t = jnp.transpose(xs0_sel, (0, 2, 3, 1))                  # (B,hb,NB,P)

    n_tiles = bsz * hb * nb
    rb0_flat = rb0_t.reshape(n_tiles * np_).astype(jnp.int32)
    xs0_flat = xs0_t.reshape(n_tiles * np_).astype(jnp.int32)
    bidx = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), hb * nb)
    ys_flat = jnp.tile(jnp.repeat(jnp.arange(hb, dtype=jnp.int32) * RB, nb),
                       bsz)
    x0_flat = jnp.tile(jnp.arange(nb, dtype=jnp.int32) * tile, bsz * hb)

    g_t = jnp.transpose(g, (0, 1, 2, 4, 3))                       # (B,P,R,C,T)
    xy = jnp.stack([x, y], axis=3)                                # (B,P,R,2,T)

    kernel = functools.partial(_splat_kernel, n_planes=np_, kb=kb, wx=wx,
                               tile=tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles, np_),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((1, tile, RB * c), lambda i, p, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kb, c, wx), g.dtype),
            pltpu.VMEM((2, kb, 2, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, RB * c), jnp.float32),
        interpret=interpret or _rt.force_interpret(),
    )(bidx, rb0_flat, xs0_flat, ys_flat, x0_flat, g_t, xy)

    # out[tile, t, j*C+c] = d_img[b, ys0+j, x'0+t, c]
    img = out.reshape(bsz, hb, nb, tile, RB, c)
    img = jnp.transpose(img, (0, 1, 4, 2, 3, 5)).reshape(
        bsz, hb * RB, nb * tile, c)
    return img[:, :height, :width], coverage_ok
