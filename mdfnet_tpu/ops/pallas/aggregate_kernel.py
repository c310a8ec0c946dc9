"""Fused plane-sweep warp + vector cost aggregation as one Pallas kernel.

Replaces the eval-path chain  warp(S srcs) -> sigmoid -> pair-similarity ->
DepthWeight -> weighted accumulate  (models/aggregate.py, reference
net/unit/homoaggregate.py:8-46) for the C/G == 2 configuration, where the
group softmax collapses to sigmoids of pair-difference features.

v2 design (round 3):

- ONE grid axis over row BLOCKS (R rows per step, R sized so the f32
  accumulator fits VMEM); all S src views are unrolled inside the kernel.
  v1 ran a (rows, srcs) grid — 592/1184/2368 steps per stage at ~5-10 us
  fixed cost each dominated stages 1-2. v2 runs 74 steps per stage.
- Banded y-interpolation: the tent blend has <= 2 non-zero rows per output
  column, so each (row, src, plane) blends a kb-row band at a precomputed
  per-plane offset instead of the full K-row window — 4x less VPU work on
  what was the largest in-kernel cost.
- One window DMA per (row-block, src) shared across the block's rows AND
  all D planes; in-kernel zero padding (no host-side jnp.pad copies of the
  src features).
- x-interpolation as a banded 256-col tent matmul per 128-col output block
  at a 128-aligned prefetched offset (unchanged from v1), with the block
  offset pre-subtracted from the streamed x coordinates (one fewer VPU op
  per tent build).
- The aggregation epilogue (sigmoid similarity, DepthWeight scalar field,
  weighted accumulation — homoaggregate.py:16-46) runs in-registers; the
  (D, H, C, W) volume is written once, in the layout the Pallas U-Net
  consumes.

Border semantics match grid_sample zeros-padding exactly in x (zero-padded
lanes + zero tent weight outside the image). In y they match provided each
(row, plane)'s valid y-taps span <= kb rows and each block's bands fit its
window — the COVERAGE CONTRACT. `rowsweep_aggregate` returns the contract
flag alongside the volume so callers can fall back to the exact dense path
when a pathological camera violates it (the reference's fusibile kernel has
no such contract to break, fusibile.cu:138-277). Eval-only (no autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mdfnet_tpu.ops.pallas import runtime as _rt
from jax.experimental.pallas import tpu as pltpu

from mdfnet_tpu import geometry


def _rowsweep_kernel(wstart_ref,        # scalar prefetch (HB, S) i32
                     yrel_ref,          # scalar prefetch (HB, S*R*D) i32
                     xblk_ref,          # scalar prefetch (HB, S*R*D*NB) i32
                     q_ref,             # (R, C, Wp) block @ row-block
                     coords_ref,        # (2, S, D, Hp, Wp) ANY/HBM: xrel, ys
                     k0_ref,            # (1, C) f32
                     sc_ref,            # (S, 128) f32 [bn_s, bn_o, k1, b1]
                                        # per src (rows identical at eval;
                                        # train-mode BN is per-view)
                     diffs_ref,         # (S, H, C, W) ANY/HBM — unpadded
                     *out_and_scratch,  # out_ref [+ wsum_ref], then scratch
                     n_src: int, kprime: int, nd: int, kb: int,
                     r_rows: int, nb: int, wvalid: int = 0,
                     with_wsum: bool = False):
    if with_wsum:
        # train mode also emits the weight sum (D, R, Wp): the custom VJP
        # needs W = sum_v w_v per pixel and recomputing it would double
        # the backward's warp recompute passes
        (out_ref, wsum_out,
         window, cs, vol, wsum, blend_buf, sems, csems) = out_and_scratch
    else:
        (out_ref,
         window, cs, vol, wsum, blend_buf, sems, csems) = out_and_scratch
    hb = pl.program_id(0)
    nhb = pl.num_programs(0)
    wp = blend_buf.shape[-1]

    def dma(slot, hh, s):
        # diffs is host-padded to Wp: HBM DMA lane extents must be
        # 128-aligned (Mosaic rejects arbitrary widths)
        return pltpu.make_async_copy(
            diffs_ref.at[s, pl.ds(wstart_ref[hh, s], kprime)],
            window.at[slot, s],
            sems.at[slot, s],
        )

    def cdma(hh):
        # single-buffered coord fetch (the HBM array is pre-grouped by
        # row-block so ONE leading-axis DMA per step fetches every source's
        # planes); started AFTER the previous step's last read of cs
        return pltpu.make_async_copy(
            coords_ref.at[hh],
            cs,
            csems,
        )

    @pl.when(hb == 0)
    def _():
        cdma(0).start()
        for s in range(n_src):
            dma(0, 0, s).start()

    @pl.when(hb + 1 < nhb)
    def _():
        for s in range(n_src):
            dma((hb + 1) % 2, hb + 1, s).start()

    cdma(hb).wait()

    vol[...] = jnp.zeros_like(vol)
    wsum[...] = jnp.zeros_like(wsum)

    kiota = jax.lax.broadcasted_iota(jnp.int32, (kb, wp), 0) \
        .astype(jnp.float32)
    biota = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) \
        .astype(jnp.float32)
    k0 = k0_ref[0]                                # (C,) f32
    k1 = sc_ref[0, 2]
    b1 = sc_ref[0, 3]

    for s in range(n_src):
        bn_s = sc_ref[s, 0]
        bn_o = sc_ref[s, 1]
        dma(hb % 2, hb, s).wait()
        w0 = wstart_ref[hb, s].astype(jnp.float32)
        for r in range(r_rows):
            q = q_ref[r].astype(jnp.float32)      # (C, Wp)

            def dbody(d, _, s=s, r=r, q=q, w0=w0):
                rel = yrel_ref[hb, (s * r_rows + r) * nd + d]
                band = window[hb % 2, s, pl.ds(rel, kb)]   # (kb, C, W~)
                ysd = cs[1, s, d, r]                       # (Wp,) f32
                y0 = w0 + rel.astype(jnp.float32)
                ky = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ysd[None, :] - (kiota + y0)))
                blend_buf[...] = jnp.sum(
                    band.astype(jnp.float32) * ky[:, None, :], axis=0)
                cols = []
                for b in range(nb):
                    start = xblk_ref[
                        hb, ((s * r_rows + r) * nd + d) * nb + b] * 128
                    startm = pl.multiple_of(start, 128)
                    src_win = blend_buf[:, pl.ds(startm, 256)]  # (C, 256)
                    xb = cs[0, s, d, r, b * 128:(b + 1) * 128]
                    kx = jnp.maximum(0.0, 1.0 - jnp.abs(xb[None, :] - biota))
                    cols.append(jax.lax.dot_general(
                        src_win.astype(jnp.bfloat16), kx.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                warped = cols[0] if nb == 1 else jnp.concatenate(cols, axis=1)
                p = jax.nn.sigmoid(warped)                    # (C, Wp)
                sim = p * q + (1.0 - p) * (1.0 - q)
                sfield = jnp.sum(sim * k0[:, None], axis=0)   # (Wp,)
                act = jnp.maximum(sfield * bn_s + bn_o, 0.0)
                wgt = jax.nn.sigmoid(act * k1 + b1)           # (Wp,)
                vol[d, r] = vol[d, r] + sim * wgt[None, :]
                wsum[d, r] = wsum[d, r] + wgt
                return 0

            # fully unrolled: Mosaic software-pipelines consecutive planes
            # (VPU tent builds overlapping MXU interps); a fori_loop
            # serialises them (and Pallas only lowers full unrolls anyway)
            for d in range(nd):
                dbody(d, 0)

    @pl.when(hb + 1 < nhb)
    def _():
        cdma(hb + 1).start()

    res = vol[...] / wsum[...][:, :, None, :]
    if 0 < wvalid < wp:
        # zero the junk lane-pad columns: the Pallas U-Net consumes this
        # volume wp-wide and needs grid-conv zero padding there
        mi = jax.lax.broadcasted_iota(jnp.int32, res.shape, 3)
        res = res * (mi < wvalid).astype(res.dtype)
    out_ref[...] = res.astype(out_ref.dtype)
    if with_wsum:
        # (R, D, Wp) block: Mosaic constrains the LAST TWO block dims
        # (divisible by (8, 128) or full-extent) — r_rows can be < 8, so
        # it rides the unconstrained majormost axis
        wsum_out[...] = jnp.transpose(wsum[...], (1, 0, 2))             .astype(wsum_out.dtype)


def _rowsweep_stats_kernel(wstart_ref,  # scalar prefetch (HB, S) i32
                           yrel_ref,    # scalar prefetch (HB, S*R*D) i32
                           xblk_ref,    # scalar prefetch (HB, S*R*D*NB) i32
                           q_ref,       # (R, C, Wp) block @ row-block
                           coords_ref,  # (HB, 2, S, D, R, Wp) ANY/HBM
                           k0_ref,      # (1, C) f32
                           diffs_ref,   # (S, H, C, Wp) ANY/HBM
                           out_ref,     # (S, 128) f32 — [s,0]=sum s,
                                        # [s,1]=sum s^2 (accumulated)
                           window, cs, blend_buf, sems, csems,
                           *, n_src: int, kprime: int, nd: int, kb: int,
                           r_rows: int, nb: int, wvalid: int, h_true: int,
                           row0: int = 0):
    """Per-view batch statistics of the PRE-BN DepthWeight scalar field
    s = k0 . sim over the (D, H, W) volume — pass 1 of the train-mode fused
    aggregate (train BN normalises with batch stats, so the aggregation
    pass needs them first). Same warp/interp/similarity code path as
    _rowsweep_kernel; accumulates two scalars per src instead of the
    volume."""
    hb = pl.program_id(0)
    nhb = pl.num_programs(0)
    wp = blend_buf.shape[-1]

    def dma(slot, hh, s):
        return pltpu.make_async_copy(
            diffs_ref.at[s, pl.ds(wstart_ref[hh, s], kprime)],
            window.at[slot, s],
            sems.at[slot, s],
        )

    def cdma(hh):
        return pltpu.make_async_copy(coords_ref.at[hh], cs, csems)

    @pl.when(hb == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        cdma(0).start()
        for s in range(n_src):
            dma(0, 0, s).start()

    @pl.when(hb + 1 < nhb)
    def _():
        for s in range(n_src):
            dma((hb + 1) % 2, hb + 1, s).start()

    cdma(hb).wait()

    kiota = jax.lax.broadcasted_iota(jnp.int32, (kb, wp), 0) \
        .astype(jnp.float32)
    biota = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) \
        .astype(jnp.float32)
    liota = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    colmask = (liota < wvalid).astype(jnp.float32)          # (1, Wp)
    k0 = k0_ref[0]

    for s in range(n_src):
        dma(hb % 2, hb, s).wait()
        w0 = wstart_ref[hb, s].astype(jnp.float32)
        acc1 = jnp.zeros((1, wp), jnp.float32)
        acc2 = jnp.zeros((1, wp), jnp.float32)
        for r in range(r_rows):
            q = q_ref[r].astype(jnp.float32)
            rowvalid = (row0 + hb * r_rows + r < h_true) \
                .astype(jnp.float32)
            for d in range(nd):
                rel = yrel_ref[hb, (s * r_rows + r) * nd + d]
                band = window[hb % 2, s, pl.ds(rel, kb)]
                ysd = cs[1, s, d, r]
                y0 = w0 + rel.astype(jnp.float32)
                ky = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ysd[None, :] - (kiota + y0)))
                blend_buf[...] = jnp.sum(
                    band.astype(jnp.float32) * ky[:, None, :], axis=0)
                cols = []
                for b in range(nb):
                    start = xblk_ref[
                        hb, ((s * r_rows + r) * nd + d) * nb + b] * 128
                    startm = pl.multiple_of(start, 128)
                    src_win = blend_buf[:, pl.ds(startm, 256)]
                    xb = cs[0, s, d, r, b * 128:(b + 1) * 128]
                    kx = jnp.maximum(0.0,
                                     1.0 - jnp.abs(xb[None, :] - biota))
                    cols.append(jax.lax.dot_general(
                        src_win.astype(jnp.bfloat16),
                        kx.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                warped = (cols[0] if nb == 1
                          else jnp.concatenate(cols, axis=1))
                p = jax.nn.sigmoid(warped)
                sim = p * q + (1.0 - p) * (1.0 - q)
                sfield = jnp.sum(sim * k0[:, None], axis=0)[None, :]
                sf = sfield * (colmask * rowvalid)
                acc1 = acc1 + sf
                acc2 = acc2 + sf * sfield
        s1 = jnp.sum(acc1)
        s2 = jnp.sum(acc2)
        oiota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = (jnp.where(oiota == 0, s1, 0.0)
               + jnp.where(oiota == 1, s2, 0.0)).astype(jnp.float32)
        out_ref[pl.ds(s, 1)] = out_ref[pl.ds(s, 1)] + row

    @pl.when(hb + 1 < nhb)
    def _():
        cdma(hb + 1).start()


def _sweep_coords_hdw(src_projs, ref_proj, depth_hypos, h, w, wp,
                      src_h=None):
    """Effective sample coords per src in (S, H, D, Wp) layout (f32), with
    out-of-range fill (-2: zero tent weight everywhere).

    ``h`` is the REF grid row count; ``src_h`` the source image height
    (differs under spatial sharding, where the ref grid is one band but the
    sources are all-gathered to full height — the band's global offset
    arrives through ref_proj's shifted cy, exactly like
    ops/warp_dense.py's out_h mode).

    Computed directly on a Wp-wide pixel grid with the pad columns MASKED
    (a select that fuses into the coordinate math) — padding the (S, H, D,
    Wp) f32 arrays afterwards cost a full extra copy per array (XLA
    profile at bench size)."""
    n_src = src_projs.shape[0]
    d = depth_hypos.shape[0]
    sh = src_h or h
    hyp = depth_hypos
    if hyp.shape[-1] not in (1, wp):
        # per-pixel hypotheses: edge-pad the lanes (small vs the coords)
        hyp = jnp.pad(hyp, ((0, 0), (0, 0), (0, wp - hyp.shape[-1])),
                      mode="edge")
    xs, ys = [], []
    for s in range(n_src):
        x_src, y_src = geometry.sweep_coordinates(
            src_projs[s:s + 1].astype(jnp.float32),
            ref_proj[None].astype(jnp.float32),
            hyp[None].astype(jnp.float32), h, wp)
        x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, sh, w)
        xs.append(x_eff.reshape(d, h, wp))
        ys.append(y_eff.reshape(d, h, wp))
    xs = jnp.stack(xs).transpose(0, 2, 1, 3)   # (S, H, D, Wp)
    ys = jnp.stack(ys).transpose(0, 2, 1, 3)
    lane = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 3)
    xs = jnp.where(lane < w, xs, -2.0)
    ys = jnp.where(lane < w, ys, -2.0)
    return jax.lax.stop_gradient(xs), jax.lax.stop_gradient(ys)


def _band_starts(ys, h, kb):
    """Per (src, row, plane) kb-row y-band top rows + the per-plane coverage
    flag (every in-image y tap inside its band). ys: (S, H, D, Wp)."""
    valid = (ys > -1.0) & (ys < h) & jnp.isfinite(ys)
    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(valid, ys, big), axis=-1)    # (S, H, D)
    ymax = jnp.max(jnp.where(valid, ys, -big), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    band = jnp.clip(jnp.floor(ymin), 0.0, max(h - kb, 0)).astype(jnp.int32)
    band = jnp.where(any_valid, band, 0)
    # needed rows are floor(y) >= 0 and floor(y)+1 <= h-1 (out-of-image taps
    # contribute zero under grid_sample zeros padding)
    hi = jnp.minimum(jnp.floor(ymax) + 1.0, h - 1.0)
    cover = jnp.all(jnp.where(
        any_valid, hi <= band.astype(jnp.float32) + kb - 1, True))
    return band, cover


def _x_block_starts(xs, w):
    """Per (src, row, plane, out-block) 128-aligned source-window start
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
    return start, cover  # (S, H, D, NB)


def _plan(src_projs, ref_proj, hypos, h, w, wp, kb, r_rows, kprime,
          src_h=None):
    """All prefetch arrays + the coverage flag for the v2 kernel.

    Returns (xs, ys, xrel, wstart, yrel, xblk_flat, cover); row axes are
    padded (edge-replicated) to ceil(h / r_rows) * r_rows. ``src_h``:
    source rows when they differ from the ref grid (spatial sharding).
    """
    sh = src_h or h
    xs, ys = _sweep_coords_hdw(src_projs, ref_proj, hypos, h, w, wp, sh)
    nd = hypos.shape[0]
    nb = wp // 128
    n_src = src_projs.shape[0]

    hb_count = -(-h // r_rows)
    hpad = hb_count * r_rows
    if hpad != h:
        rpad = ((0, 0), (0, hpad - h), (0, 0), (0, 0))
        xs = jnp.pad(xs, rpad, mode="edge")
        ys = jnp.pad(ys, rpad, mode="edge")

    band, cover_y = _band_starts(ys, sh, kb)                # (S, Hp, D)
    xblk, cover_x = _x_block_starts(xs, w)                  # (S, Hp, D, NB)

    band_blk = band.reshape(n_src, hb_count, r_rows, nd)
    bmin = jnp.min(band_blk, axis=(2, 3))                   # (S, HB)
    bmax = jnp.max(band_blk, axis=(2, 3))
    wstart = jnp.clip(bmin, 0, max(sh - kprime, 0))         # (S, HB)
    cover_w = jnp.all(bmax + kb <= wstart + kprime)
    yrel = jnp.clip(band_blk - wstart[:, :, None, None], 0, kprime - kb)
    # (HB, S*R*D) — kernel index (s*R + r)*D + d
    yrel = jnp.transpose(yrel, (1, 0, 2, 3)).reshape(hb_count, -1)
    wstart = jnp.transpose(wstart)                          # (HB, S)

    # pre-subtract each block's 128-aligned window offset from the x coords
    # (one fewer VPU op per in-kernel tent build)
    offs = jnp.broadcast_to((xblk.astype(jnp.float32) * 128.0)[..., None],
                            xblk.shape + (128,))
    xrel = xs - offs.reshape(xblk.shape[:3] + (nb * 128,))
    # rows regrouped into (HB, S, R, D, NB) kernel order
    xblk_flat = jnp.transpose(
        xblk.reshape(n_src, hb_count, r_rows, nd, nb), (1, 0, 2, 3, 4)) \
        .reshape(hb_count, -1)                              # (HB, S*R*D*NB)

    cover = cover_y & cover_w & cover_x
    return xs, ys, xrel, wstart, yrel, xblk_flat, cover


def _pick_r_rows(nd: int, c: int, wp: int, h: int) -> int:
    """Rows per grid step: bounded by a ~3.5 MB f32 accumulator budget."""
    per_row = nd * c * wp * 4
    return max(1, min(8, int(3.5e6) // per_row, h))


@functools.partial(jax.jit, static_argnames=("k_win", "kb", "valid_w",
                                             "interpret", "smem_budget",
                                             "with_wsum"))
def rowsweep_aggregate(diffs: jnp.ndarray, q: jnp.ndarray,
                       src_projs: jnp.ndarray, ref_proj: jnp.ndarray,
                       depth_hypos: jnp.ndarray, k0: jnp.ndarray,
                       bn_scale, bn_offset, k1, b1, *, k_win: int = 16,
                       kb: int = 4, valid_w: int | None = None,
                       interpret: bool = False,
                       smem_budget: int = 400_000,
                       with_wsum: bool = False):
    """Fused warp + aggregate for ONE batch item.

    Args:
        diffs: (S, Hs, C, W) src pair-difference features, (H, C, W)
            layout. Hs == q's H normally; under spatial sharding the srcs
            are all-gathered to FULL height while q stays band-local (the
            band's global offset rides ref_proj's shifted cy).
        q: (H, C, W) sigmoid of the ref view's pair differences.
        src_projs: (S, 4, 4); ref_proj: (4, 4).
        depth_hypos: (D, H, W) or (D, 1, 1).
        k0: (C,) DepthWeight conv0 channel weights (f32).
        bn_scale, bn_offset: folded eval BN scalars of the scalar-field BN.
        k1, b1: DepthWeight conv1 scalar weight/bias.
        k_win: base y-window rows per row-block (grows with the block size).
        kb: y-band rows per (row, plane) — the per-plane coverage contract.
    Returns:
        (volume, cover): volume (D, H, C, Wp) aggregated cost volume
        (Wp = W padded to 128; columns beyond W hold the zero-feature
        similarity, slice before use); cover () bool — True iff the kernel's
        y-band/window/x-window contracts all held, i.e. the volume is exact.
        On False, fall back to the dense/gather path.
    """
    n_src, src_h, c, w_in = diffs.shape
    h = q.shape[0]                      # ref grid rows (band under sharding)
    w = valid_w or w_in
    nd = depth_hypos.shape[0]
    wp = -(-w // 128) * 128
    assert w_in in (w, wp), (w_in, w)
    if wp < 256:
        wp = 256  # the banded x-interp needs a 256-col source window
    kb = min(kb, src_h)

    if depth_hypos.shape[-1] == 1:
        hypos = jnp.broadcast_to(depth_hypos, (nd, 1, 1))
    else:
        hypos = depth_hypos

    r_rows = _pick_r_rows(nd, c, wp, h)
    # VMEM fit: the double-buffered window scratch scales with n_src (10 at
    # the 11-view tanks config) — shrink the row block until everything
    # fits the 16 MB scoped budget (out/in blocks are double-buffered by
    # the pallas pipeline, hence the 2x on them)
    bpe = 2 if diffs.dtype == jnp.bfloat16 else 4

    def vmem_est(r):
        kp = min(k_win + 2 * r, src_h)
        return (2 * n_src * kp * c * wp * bpe          # window
                + 2 * n_src * nd * r * wp * 4          # cs (coords)
                + nd * r * c * wp * 4                  # vol accumulator
                + nd * r * wp * 4 + c * wp * 4         # wsum + blend
                + 2 * nd * r * c * wp * bpe            # out block (dbuf)
                + 2 * r * c * wp * bpe)                # q block (dbuf)

    while r_rows > 1 and vmem_est(r_rows) > 13.5e6:
        r_rows //= 2
    kprime = min(k_win + 2 * r_rows, src_h)
    hb_count = -(-h // r_rows)
    hpad = hb_count * r_rows
    nb = wp // 128

    xs, ys, xrel, wstart, yrel, xblk, cover = _plan(
        src_projs, ref_proj, hypos, h, w, wp, kb, r_rows, kprime,
        src_h=src_h)

    # (S, Hp, D, Wp) -> (HB, 2, S, D, R, Wp): pre-grouped per row-block so
    # the kernel fetches each step's coords with ONE leading-axis DMA
    # (HBM DMA slices on tiled dims must be tile-aligned), and plane d is
    # indexed dynamically in VMEM, which must land on an untiled major axis
    def blkfmt(a):
        a = a.reshape(n_src, hb_count, r_rows, nd, wp)
        return jnp.transpose(a, (1, 0, 3, 2, 4))
    coords = jnp.stack([blkfmt(xrel), blkfmt(ys)], axis=1)

    # lane-pad the src features (HBM DMA extents must be 128-aligned);
    # zero pad == grid_sample zeros semantics for out-of-image x taps.
    # Producers that already keep their 128-aligned extent (backbone
    # keep_wpad) arrive with zeroed pad columns — identical semantics,
    # zero copies.
    q_p = jnp.pad(q, ((0, hpad - h), (0, 0), (0, wp - w_in)),
                  constant_values=0.5)  # sigma(0): zero-feature ref
    if wp != w_in:
        diffs = jnp.pad(diffs, ((0, 0), (0, 0), (0, 0), (0, wp - w_in)))
    k0_2 = k0.reshape(1, c).astype(jnp.float32)
    # per-src BN affine rows (identical at eval — train-mode BN statistics
    # are per view, so rowsweep_aggregate_train passes (S,) vectors)
    bn_scale = jnp.broadcast_to(jnp.asarray(bn_scale, jnp.float32), (n_src,))
    bn_offset = jnp.broadcast_to(jnp.asarray(bn_offset, jnp.float32),
                                 (n_src,))
    scalars = jnp.zeros((n_src, 128), jnp.float32)
    scalars = scalars.at[:, 0].set(bn_scale).at[:, 1].set(bn_offset)
    scalars = scalars.at[:, 2].set(k1).at[:, 3].set(b1)

    kern = functools.partial(_rowsweep_kernel, n_src=n_src, kprime=kprime,
                             nd=nd, kb=kb, r_rows=r_rows, nb=nb, wvalid=w,
                             with_wsum=with_wsum)

    # Scalar-prefetch arrays live in SMEM (1 MB): at the tanks config
    # (S=10 srcs, W up to 2048) the full-H plan overflows it, so the H
    # row-blocks are processed in segments of seg_hb blocks — one
    # pallas_call per segment, the plan rows sliced per segment (the
    # window DMAs index the WHOLE diffs array either way). DTU shapes fit
    # one segment (identical to the unsegmented round-3 kernel).
    bytes_per_hb = 4 * (n_src + n_src * r_rows * nd * (1 + nb))
    seg_hb = max(1, min(hb_count, smem_budget // max(bytes_per_hb, 1)))

    def run_segment(s0, nhb):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nhb,),
            in_specs=[
                pl.BlockSpec((r_rows, c, wp), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_src, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                (pl.BlockSpec((nd, r_rows, c, wp),
                              lambda i, *_: (0, i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((r_rows, nd, wp), lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)) if with_wsum
                else pl.BlockSpec((nd, r_rows, c, wp),
                                  lambda i, *_: (0, i, 0, 0),
                                  memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((2, n_src, kprime, c, wp), diffs.dtype),
                pltpu.VMEM((2, n_src, nd, r_rows, wp), jnp.float32),
                pltpu.VMEM((nd, r_rows, c, wp), jnp.float32),
                pltpu.VMEM((nd, r_rows, wp), jnp.float32),
                pltpu.VMEM((c, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, n_src)),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        shapes = (jax.ShapeDtypeStruct((nd, nhb * r_rows, c, wp),
                                       diffs.dtype),)
        if with_wsum:
            shapes = shapes + (jax.ShapeDtypeStruct(
                (nhb * r_rows, nd, wp), jnp.float32),)
        res = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=shapes if with_wsum else shapes[0],
            interpret=interpret or _rt.force_interpret(),
        )(wstart[s0:s0 + nhb], yrel[s0:s0 + nhb], xblk[s0:s0 + nhb],
          q_p[s0 * r_rows:(s0 + nhb) * r_rows], coords[s0:s0 + nhb],
          k0_2, scalars, diffs)
        return res if with_wsum else (res,)

    if seg_hb >= hb_count:
        parts = [run_segment(0, hb_count)]
    else:
        parts = [run_segment(s0, min(seg_hb, hb_count - s0))
                 for s0 in range(0, hb_count, seg_hb)]
    out = (parts[0][0] if len(parts) == 1
           else jnp.concatenate([pp[0] for pp in parts], axis=1))
    if with_wsum:
        ws = (parts[0][1] if len(parts) == 1
              else jnp.concatenate([pp[1] for pp in parts], axis=0))
        return out[:, :h], jnp.transpose(ws[:h], (1, 0, 2)), cover
    return out[:, :h], cover


@functools.partial(jax.jit, static_argnames=("k_win", "kb", "valid_w",
                                             "interpret", "smem_budget"))
def rowsweep_stats(diffs: jnp.ndarray, q: jnp.ndarray,
                   src_projs: jnp.ndarray, ref_proj: jnp.ndarray,
                   depth_hypos: jnp.ndarray, k0: jnp.ndarray, *,
                   k_win: int = 16, kb: int = 4, valid_w: int | None = None,
                   interpret: bool = False, smem_budget: int = 400_000):
    """Pass-1 of the train-mode fused aggregate for ONE batch item: per-view
    (sum s, sum s^2) of the pre-BN DepthWeight scalar field s = k0 . sim
    over the (D, H, W_valid) volume. Train BN normalises each view's s with
    BATCH statistics (reference net/unit/homoaggregate.py:17-19 BN3d in
    train mode), so the aggregation pass needs them first.

    Args mirror :func:`rowsweep_aggregate` minus the BN/conv1 scalars.
    Returns (sums (S, 2) f32, count, cover): count = D*H*W_valid elements
    per view (python int), cover the same contract flag as the aggregate.
    """
    n_src, h, c, w_in = diffs.shape
    w = valid_w or w_in
    nd = depth_hypos.shape[0]
    wp = -(-w // 128) * 128
    assert w_in in (w, wp), (w_in, w)
    if wp < 256:
        wp = 256
    kb = min(kb, h)

    if depth_hypos.shape[-1] == 1:
        hypos = jnp.broadcast_to(depth_hypos, (nd, 1, 1))
    else:
        hypos = depth_hypos

    r_rows = _pick_r_rows(nd, c, wp, h)
    bpe = 2 if diffs.dtype == jnp.bfloat16 else 4

    def vmem_est(r):
        kp = min(k_win + 2 * r, h)
        return (2 * n_src * kp * c * wp * bpe
                + 2 * n_src * nd * r * wp * 4
                + c * wp * 4
                + 2 * r * c * wp * bpe)

    while r_rows > 1 and vmem_est(r_rows) > 13.5e6:
        r_rows //= 2
    kprime = min(k_win + 2 * r_rows, h)
    hb_count = -(-h // r_rows)
    hpad = hb_count * r_rows
    nb = wp // 128

    xs, ys, xrel, wstart, yrel, xblk, cover = _plan(
        src_projs, ref_proj, hypos, h, w, wp, kb, r_rows, kprime)

    def blkfmt(a):
        a = a.reshape(n_src, hb_count, r_rows, nd, wp)
        return jnp.transpose(a, (1, 0, 3, 2, 4))
    coords = jnp.stack([blkfmt(xrel), blkfmt(ys)], axis=1)

    q_p = jnp.pad(q, ((0, hpad - h), (0, 0), (0, wp - w_in)),
                  constant_values=0.5)
    if wp != w_in:
        diffs = jnp.pad(diffs, ((0, 0), (0, 0), (0, 0), (0, wp - w_in)))
    k0_2 = k0.reshape(1, c).astype(jnp.float32)

    bytes_per_hb = 4 * (n_src + n_src * r_rows * nd * (1 + nb))
    seg_hb = max(1, min(hb_count, smem_budget // max(bytes_per_hb, 1)))

    def run_segment(s0, nhb):
        kern = functools.partial(
            _rowsweep_stats_kernel, n_src=n_src, kprime=kprime, nd=nd,
            kb=kb, r_rows=r_rows, nb=nb, wvalid=w, h_true=h,
            row0=s0 * r_rows)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nhb,),
            in_specs=[
                pl.BlockSpec((r_rows, c, wp), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((n_src, 128), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, n_src, kprime, c, wp), diffs.dtype),
                pltpu.VMEM((2, n_src, nd, r_rows, wp), jnp.float32),
                pltpu.VMEM((c, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, n_src)),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_src, 128), jnp.float32),
            interpret=interpret or _rt.force_interpret(),
        )(wstart[s0:s0 + nhb], yrel[s0:s0 + nhb], xblk[s0:s0 + nhb],
          q_p[s0 * r_rows:(s0 + nhb) * r_rows], coords[s0:s0 + nhb],
          k0_2, diffs)

    if seg_hb >= hb_count:
        out = run_segment(0, hb_count)
    else:
        out = sum(run_segment(s0, min(seg_hb, hb_count - s0))
                  for s0 in range(0, hb_count, seg_hb))
    return out[:, :2], nd * h * w, cover


def rowsweep_cover(src_projs, ref_proj, depth_hypos, h, w,
                   k_win: int = 16, kb: int = 4) -> jnp.ndarray:
    """Coverage flag for the rowsweep kernel's contracts without running it:
    per-(row, plane) y taps fit the kb band, the bands fit the row-block
    window, and every out block's in-image x taps fit its 128-aligned
    256-col source window."""
    nd = depth_hypos.shape[0]
    wp = -(-w // 128) * 128
    if wp < 256:
        wp = 256
    hypos = (jnp.broadcast_to(depth_hypos, (nd, 1, 1))
             if depth_hypos.shape[-1] == 1 else depth_hypos)
    kb = min(kb, h)
    # c is only used for the VMEM budget; assume the smallest (widest R)
    r_rows = _pick_r_rows(nd, 8, wp, h)
    kprime = min(k_win + 2 * r_rows, h)
    *_, cover = _plan(src_projs, ref_proj, hypos, h, w, wp, kb, r_rows,
                      kprime)
    return cover
