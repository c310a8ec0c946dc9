"""Gather-free plane-sweep warping: dynamic slices + tent-kernel matmuls.

TPU gathers cost per row touched, which makes the classic gather-based
bilinear warp the pipeline bottleneck (~85% of forward time at DTU eval
resolution). This implementation removes gathers entirely:

For every output tile of T consecutive x-pixels at fixed (batch, depth-plane,
row), the source support is a small (K rows x Wx cols) window whose corner is
found with a min-reduction and fetched with ONE dynamic slice. Bilinear
interpolation is then expressed densely with the tent kernel

    w(dx) = relu(1 - |dx|)

so the x-interpolation becomes a (K*C, Wx) x (Wx, T) matmul on the MXU and
the y-interpolation a cheap per-sample weighted sum. The tent formulation
reproduces ``grid_sample(padding_mode='zeros')`` semantics exactly: taps at
distance >= 1 get weight 0, and out-of-image taps fall outside the clamped
window or under a zero weight.

TPU memory layout: the source is pre-transposed to (H, C, W) so the sliced
windows are (K, C, Wx) with the 256-wide x-window on the 128-lane axis (no
padding blowup), and tiles are processed in scanned chunks so only
``chunk_tiles`` windows are ever live in HBM.

Exactness condition: each tile's true tap span must fit the static window
(span + 2 <= window). For MVS-style cameras (similar intrinsics, moderate
baselines) a 16-row x (T+2*64)-col window covers with huge margin;
``coverage_ok`` reports whether it held so callers can assert or fall back to
the gather path (ops/sample.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mdfnet_tpu import geometry


def _tent(delta: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(delta))


def dense_sample_2d(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    *, x_tile: int = 128, y_window: int = 16,
                    x_margin: int = 64, chunk_tiles: int = 512
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear zeros-padding sampling of rows of coherent coordinates.

    Args:
        image: (B, H, W, C).
        x, y: (B, R, T_total) float pixel coords, organised as rows whose
            coordinates are spatially coherent (plane-sweep rows are).
    Returns:
        (samples (B, R, T_total, C), coverage_ok scalar bool).
    """
    b, h, w, c = image.shape
    _, r, t_total = x.shape
    tile = x_tile
    n_tiles = -(-t_total // tile)
    pad = n_tiles * tile - t_total
    if pad:
        # pad with -2.0: safely out of image -> zero contribution
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), constant_values=-2.0)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad)), constant_values=-2.0)

    wx_win = min(tile + 2 * x_margin, w)
    k_win = min(y_window, h)

    total_tiles = r * n_tiles
    n_chunks = -(-total_tiles // chunk_tiles)
    tile_pad = n_chunks * chunk_tiles - total_tiles

    xt = x.reshape(b, total_tiles, tile)
    yt = y.reshape(b, total_tiles, tile)
    if tile_pad:
        xt = jnp.pad(xt, ((0, 0), (0, tile_pad), (0, 0)), constant_values=-2.0)
        yt = jnp.pad(yt, ((0, 0), (0, tile_pad), (0, 0)), constant_values=-2.0)

    # window corners from in-image coords only
    x_in = jnp.where((xt > -1.0) & (xt < w), xt, jnp.inf)
    y_in = jnp.where((yt > -1.0) & (yt < h), yt, jnp.inf)
    x_min = jnp.min(x_in, axis=-1)
    y_min = jnp.min(y_in, axis=-1)
    x_max = jnp.max(jnp.where(jnp.isinf(x_in), -jnp.inf, x_in), axis=-1)
    y_max = jnp.max(jnp.where(jnp.isinf(y_in), -jnp.inf, y_in), axis=-1)
    x_min = jnp.where(jnp.isinf(x_min), 0.0, x_min)
    y_min = jnp.where(jnp.isinf(y_min), 0.0, y_min)

    x_start = jnp.clip(jnp.floor(x_min).astype(jnp.int32), 0, w - wx_win)
    y_start = jnp.clip(jnp.floor(y_min).astype(jnp.int32), 0, h - k_win)

    # only IN-IMAGE taps need covering: taps at w/h are grid_sample zeros,
    # so the hi tap clips to the last image column/row (otherwise a window
    # that spans the whole image reports a spurious violation)
    hi_x = jnp.minimum(jnp.floor(x_max) + 1, w - 1)
    hi_y = jnp.minimum(jnp.floor(y_max) + 1, h - 1)
    cover_x = (hi_x - jnp.maximum(jnp.floor(x_min), 0)) <= (wx_win - 1)
    cover_y = (hi_y - jnp.maximum(jnp.floor(y_min), 0)) <= (k_win - 1)
    coverage_ok = jnp.all(cover_x & cover_y)

    # (B, H, C, W): x-window lands on the 128-lane axis of the sliced window
    img_t = jnp.transpose(image, (0, 1, 3, 2))  # (B, H, C, W)

    x_idx = jnp.arange(wx_win, dtype=jnp.float32)
    y_idx = jnp.arange(k_win, dtype=jnp.float32)

    def per_tile(img, xs, ys, x0, y0):
        # img: (H, C, W); xs, ys: (tile,)
        window = jax.lax.dynamic_slice(img, (y0, 0, x0), (k_win, c, wx_win))
        kx = _tent(xs[:, None] - (x0.astype(jnp.float32) + x_idx)[None, :]
                   ).astype(img.dtype)                       # (T, Wx)
        ky = _tent(ys[:, None] - (y0.astype(jnp.float32) + y_idx)[None, :])
        # MXU: contract x -> (T, K, C)
        z = jnp.einsum("kcx,tx->tkc", window, kx,
                       preferred_element_type=jnp.float32)
        out = jnp.einsum("tkc,tk->tc", z, ky,
                         preferred_element_type=jnp.float32)
        return out.astype(img.dtype)

    tile_fn = jax.vmap(per_tile, in_axes=(None, 0, 0, 0, 0))

    def per_batch(img, xs, ys, x0s, y0s):
        def chunk_fn(args):
            cx, cy, cx0, cy0 = args
            return tile_fn(img, cx, cy, cx0, cy0)

        chunks = (xs.reshape(n_chunks, chunk_tiles, tile),
                  ys.reshape(n_chunks, chunk_tiles, tile),
                  x0s.reshape(n_chunks, chunk_tiles),
                  y0s.reshape(n_chunks, chunk_tiles))
        return jax.lax.map(chunk_fn, chunks)  # (n_chunks, chunk, T, C)

    samples = jax.vmap(per_batch)(img_t, xt, yt, x_start, y_start)
    samples = samples.reshape(b, n_chunks * chunk_tiles, tile, c)
    samples = samples[:, :total_tiles].reshape(b, r, n_tiles * tile, c)
    return samples[:, :, :t_total], coverage_ok


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _planes_sample(src_feat, x, y, x_tile, y_window, x_margin, chunk_tiles):
    """dense_sample_2d over plane-structured coords, with a scatter-free VJP.

    XLA's autodiff transposes dense_sample_2d's dynamic-slice windows into
    thousands of overlapping scatter-adds, which serialise on TPU (measured
    ~40-90 ms per src view per stage at the reference train config — the
    dominant train-step cost). The custom backward computes the identical
    bilinear adjoint gather-side (ops/splat.py) under the same row/column
    monotonicity contract the forward's windows already rely on.

    Args:
        src_feat: (B, H, W, C); x, y: (B, D, OH, W) sample pixel coords.
    Returns:
        (samples (B, D, OH, W, C), coverage_ok).
    """
    b, d, oh, w_out = x.shape
    samples, cover = dense_sample_2d(
        src_feat, x.reshape(b, d * oh, w_out), y.reshape(b, d * oh, w_out),
        x_tile=x_tile, y_window=y_window, x_margin=x_margin,
        chunk_tiles=chunk_tiles)
    return samples.reshape(b, d, oh, w_out, src_feat.shape[-1]), cover


def _planes_sample_fwd(src_feat, x, y, x_tile, y_window, x_margin,
                       chunk_tiles):
    out = _planes_sample(src_feat, x, y, x_tile, y_window, x_margin,
                         chunk_tiles)
    return out, (src_feat, x, y)


def _planes_sample_bwd(x_tile, y_window, x_margin, chunk_tiles, res, ct):
    src_feat, x, y = res
    g, _ = ct  # cotangent of samples; cover is non-diff
    b, h, w, _ = src_feat.shape
    if jax.default_backend() == "cpu":
        from mdfnet_tpu.ops.splat import dense_splat_2d
        d_src, _ = dense_splat_2d(g, x, y, h, w, band=y_window,
                                  x_tile=x_tile, x_margin=x_margin)
    else:
        from mdfnet_tpu.ops.pallas.splat_kernel import pallas_splat_2d
        d_src, _ = pallas_splat_2d(g, x, y, h, w, band=min(y_window, 8),
                                   x_margin=32)
    return (d_src.astype(src_feat.dtype), jnp.zeros_like(x),
            jnp.zeros_like(y))


_planes_sample.defvjp(_planes_sample_fwd, _planes_sample_bwd)


def homography_warp_dense(src_feat: jnp.ndarray, src_proj: jnp.ndarray,
                          ref_proj: jnp.ndarray, depth_hypos: jnp.ndarray,
                          *, x_tile: int = 128, y_window: int = 16,
                          x_margin: int = 64, chunk_tiles: int = 512,
                          out_h: int | None = None,
                          with_cover: bool = False) -> jnp.ndarray:
    """Drop-in twin of ops.warp.homography_warp on the dense matmul path.

    Returns (B, D, H, W, C); with ``with_cover`` returns
    ((B, D, H, W, C), cover) where cover is the exactness flag of the
    module docstring — callers fall back to homography_warp (gather,
    guaranteed exact) when it is False.

    out_h: reference-grid height when it differs from the source height —
    under spatial sharding the ref band is local while the source rows are
    all-gathered, and ref_proj carries the band's global row offset in its
    (shifted) principal point. The sampling-coordinate convention
    (reference_grid_coords) always uses the source extent, i.e. the GLOBAL
    image height, exactly as the unsharded model does.
    """
    b, h, w, c = src_feat.shape
    d = depth_hypos.shape[1]
    oh = out_h or h

    x_src, y_src = geometry.sweep_coordinates(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
        depth_hypos.astype(jnp.float32), oh, w)
    x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
    x_eff = jax.lax.stop_gradient(x_eff).reshape(b, d, oh, w)
    y_eff = jax.lax.stop_gradient(y_eff).reshape(b, d, oh, w)

    out, cover = _planes_sample(src_feat, x_eff, y_eff, x_tile, y_window,
                                x_margin, chunk_tiles)
    return (out, cover) if with_cover else out
