"""Scatter-free adjoint of the plane-sweep warp: gradient "splat" as banded
tent matmuls.

Why this exists: the training backward of any bilinear warp is a *splat* —
each warped sample's gradient lands on the 4 source pixels under its tent
weights. XLA's autodiff derives that splat as the transpose of the forward's
``dynamic_slice`` windows, i.e. thousands of overlapping scatter-adds, and
scatters serialise on TPU: the warp backward alone made the train step ~8x
slower than the sum of its parts (see BENCH.md round 3, train section).

This module computes the identical adjoint *gather-side*. For every source
row ``ys`` and 128-wide column block, the contributing warped samples form a
small (band x window) region of the (plane, row, x) sample grid, because
plane-sweep coordinates are monotone along rows and columns:

    d_img[ys, x'] = sum_{p, r, t}  tent(y[p,r,t] - ys) * tent(x[p,r,t] - x')
                                   * g[p, r, t]

For fixed plane p, the rows r with |y - ys| < 1 are a contiguous band
(y is monotone in r), found with one masked count; within a row, the samples
with |x - x'| < 1 for x' in a 128-block are a contiguous window (x is
monotone in t), found the same way. Each (ys, block) tile is then ONE
dynamic-slice + ONE (C, band*window) x (band*window, 128) matmul — the MXU
pattern of ops/warp_dense.py with sampling and splatting roles swapped. No
scatters anywhere; every output row is written exactly once.

Exactness contract (mirrors the dense warp's): per plane, y must be monotone
in r and x monotone in t, and the band/window extents must cover every
contributing sample. ``coverage_ok`` reports whether that held; the standard
MVS camera geometries hold it with large margins (tested against autodiff of
the gather warp, tests/test_splat.py), matching the trust the training
forward already places in the Pallas warp kernel's window contract.

Reference behaviour being matched: autodiff of grid_sample(bilinear, zeros)
as used in training by reference net/unit/base.py:122-124.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _tent(delta: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(delta))


def _sliding_min(a: jnp.ndarray, win: int) -> jnp.ndarray:
    """min over [r, r+win) along axis 0, same length (end-padded +inf)."""
    pad = jnp.full((win - 1,) + a.shape[1:], jnp.inf, a.dtype)
    ap = jnp.concatenate([a, pad], axis=0)
    return jax.lax.reduce_window(
        ap, jnp.inf, jax.lax.min, (win,) + (1,) * (a.ndim - 1),
        (1,) * a.ndim, "valid")


def _sliding_max(a: jnp.ndarray, win: int) -> jnp.ndarray:
    pad = jnp.full((win - 1,) + a.shape[1:], -jnp.inf, a.dtype)
    ap = jnp.concatenate([a, pad], axis=0)
    return jax.lax.reduce_window(
        ap, -jnp.inf, jax.lax.max, (win,) + (1,) * (a.ndim - 1),
        (1,) * a.ndim, "valid")


def dense_splat_2d(g: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   height: int, width: int, *, band: int = 8,
                   x_tile: int = 128, x_margin: int = 64,
                   chunk_tiles: int = 64
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splat sample gradients back onto the source grid (bilinear adjoint).

    Args:
        g: (B, P, R, T, C) cotangents of warped samples (P independent
            monotone groups — depth planes for the plane-sweep).
        x, y: (B, P, R, T) the forward's sample pixel coordinates.
        height, width: source image extent.
        band: static row-band height per output row (rows of one plane that
            may touch a source row).
        x_tile: output column block width.
        x_margin: extra sample-window columns on each side of a block.
    Returns:
        (d_img (B, height, width, C), coverage_ok scalar bool).
    """
    bsz, p, r, t, c = g.shape
    kb = min(band, r)
    nb = -(-width // x_tile)
    wxb = min(x_tile + 2 * x_margin, t)
    f32 = jnp.float32

    x = x.astype(f32)
    y = y.astype(f32)

    # valid = samples with any tent support inside the image
    valid = (x > -1.0) & (x < width) & (y > -1.0) & (y < height)
    y_val = jnp.where(valid, y, jnp.inf)
    y_row_min = jnp.min(y_val, axis=-1)                       # (B, P, R)
    y_row_max = jnp.max(jnp.where(valid, y, -jnp.inf), axis=-1)

    ys_idx = jnp.arange(height, dtype=f32)
    # rows entirely above ys's support: y_max < ys - 1
    rb0 = jnp.sum((y_row_max[..., None] < ys_idx - 1.0).astype(jnp.int32),
                  axis=2)                                      # (B, P, h)
    rb0 = jnp.clip(rb0, 0, r - kb)

    # coverage (y): every row that touches ys must lie in [rb0, rb0+kb)
    touch = ((y_row_min[..., None] <= ys_idx + 1.0)
             & (y_row_max[..., None] >= ys_idx - 1.0))        # (B, P, R, h)
    r_idx = jnp.arange(r)[:, None]
    inband = ((rb0[:, :, None, :] <= r_idx)
              & (r_idx < rb0[:, :, None, :] + kb))
    cover_y = jnp.all(jnp.logical_or(~touch, inband))

    # per-row x-window starts/ends for each output block (x monotone in t)
    blk0 = (jnp.arange(nb, dtype=f32) * x_tile)               # (NB,)
    # count of samples strictly left of the block's tent support
    xs_lo = jnp.sum((x[..., None] < (blk0 - 1.0)).astype(jnp.int32),
                    axis=3)                                    # (B, P, R, NB)
    xs_hi = jnp.sum((x[..., None] < (blk0 + x_tile)).astype(jnp.int32),
                    axis=3)
    xs_lo = jnp.clip(xs_lo, 0, t - wxb)
    # band-level window corner: min over the kb rows starting at each r
    xs_lo_bands = jax.vmap(jax.vmap(lambda a: _sliding_min(a, kb)))(
        xs_lo.astype(f32))                                     # (B, P, R, NB)
    xs_hi_bands = jax.vmap(jax.vmap(lambda a: _sliding_max(a, kb)))(
        xs_hi.astype(f32))
    cover_x = jnp.all(xs_hi_bands - xs_lo_bands <= wxb)
    coverage_ok = jnp.logical_and(cover_y, cover_x)

    xw_idx = jnp.arange(x_tile, dtype=f32)

    def per_tile(gp, xp, yp, xs_lo_b, rb0_p, ys, blk):
        # gp: (R, T, C); xp, yp: (R, T); xs_lo_b: (R, NB) band window starts
        r0 = rb0_p[ys]
        x0 = jnp.take(xs_lo_b[:, blk], r0).astype(jnp.int32)
        g_win = jax.lax.dynamic_slice(gp, (r0, x0, 0), (kb, wxb, c))
        x_win = jax.lax.dynamic_slice(xp, (r0, x0), (kb, wxb))
        y_win = jax.lax.dynamic_slice(yp, (r0, x0), (kb, wxb))
        a = _tent(y_win - ys.astype(f32))                      # (kb, wxb)
        tx = _tent(x_win[..., None]
                   - (blk.astype(f32) * x_tile + xw_idx))      # (kb, wxb, Tx)
        pmat = (a[..., None] * g_win.astype(f32)).reshape(kb * wxb, c)
        out = jnp.einsum("nc,nt->tc", pmat, tx.reshape(kb * wxb, x_tile),
                         preferred_element_type=f32)
        return out                                             # (Tx, C)

    ys_all, blk_all = jnp.meshgrid(jnp.arange(height), jnp.arange(nb),
                                   indexing="ij")
    ys_all = ys_all.reshape(-1)
    blk_all = blk_all.reshape(-1)
    n_tiles = ys_all.shape[0]
    n_chunks = -(-n_tiles // chunk_tiles)
    pad = n_chunks * chunk_tiles - n_tiles
    if pad:
        # duplicate tile 0; its extra contribution is discarded on reshape
        ys_all = jnp.concatenate([ys_all, jnp.zeros((pad,), ys_all.dtype)])
        blk_all = jnp.concatenate([blk_all, jnp.zeros((pad,), blk_all.dtype)])

    tile_fn = jax.vmap(per_tile, in_axes=(None, None, None, None, None, 0, 0))

    def per_plane(gp, xp, yp, xs_lo_b, rb0_p):
        def chunk_fn(args):
            cys, cblk = args
            return tile_fn(gp, xp, yp, xs_lo_b, rb0_p, cys, cblk)
        tiles = jax.lax.map(chunk_fn,
                            (ys_all.reshape(n_chunks, chunk_tiles),
                             blk_all.reshape(n_chunks, chunk_tiles)))
        tiles = tiles.reshape(n_tiles + pad, x_tile, c)[:n_tiles]
        img = tiles.reshape(height, nb * x_tile, c)[:, :width]
        return img

    def per_batch(gb, xb, yb, xs_lo_b, rb0_b):
        imgs = jax.vmap(per_plane)(gb, xb, yb, xs_lo_b, rb0_b)
        return jnp.sum(imgs, axis=0)

    d_img = jax.vmap(per_batch)(g, x, y, xs_lo_bands, rb0)
    return d_img, coverage_ok
