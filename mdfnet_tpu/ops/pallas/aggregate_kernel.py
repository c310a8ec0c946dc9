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
  at a 128-aligned prefetched offset (unchanged from v1).
- The aggregation epilogue (sigmoid similarity, DepthWeight scalar field,
  weighted accumulation — homoaggregate.py:16-46) runs in-registers; the
  (D, H, C, W) volume is written once, in the layout the Pallas U-Net
  consumes.

v3 (round 3): IN-KERNEL COORDINATE RECONSTRUCTION. The sample coordinates
are projective functions of (x, y, depth) — 12 scalars per src view
(rel = src_proj @ ref_proj^-1, x/y rows pre-scaled by the reference's
align-corners composition factor). v2 streamed them as precomputed
(2, S, D, Hp, Wp) f32 arrays: ~0.2-0.5 GB of HBM per stage at DTU eval
size, plus the XLA transpose/stack copies to lay them out per row-block
and a 3+ MB VMEM scratch. v3 rebuilds each row's coordinates on the VPU
(3 FMAs + 1 divide per plane on resident registers) from the per-view
matrices and the depth-hypothesis row — the only per-pixel input left is
the (D, H, W) hypothesis map itself (8x smaller than the coords, absent
entirely for stage 0's (D, 1, 1) scalar hypotheses). The host still
evaluates the same coordinates once, fused into the tiny min/max
reductions that plan the DMA windows (yrel/xblk/wstart prefetch arrays).

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
from jax.experimental.pallas import tpu as pltpu

from mdfnet_tpu import geometry


def _rowsweep_kernel(wstart_ref,        # scalar prefetch (HB, S) i32
                     yrel_ref,          # scalar prefetch (HB, S*R*D) i32
                     xblk_ref,          # scalar prefetch (HB, S*R*D*NB) i32
                     q_ref,             # (R, C, Wp) block @ row-block
                     k0_ref,            # (1, C) f32
                     sc_ref,            # (1, 128) f32 [bn_s, bn_o, k1, b1]
                     mats_ref,          # (S, 128) f32 rel-matrix coefficients
                     hyp_ref,           # (R, D, Wp) block | (1, Dp) scalars
                     diffs_ref,         # (S, H, C, Wp) ANY/HBM
                     out_ref,           # (D, R, C, Wp) block @ row-block
                     window, vol, wsum, blend_buf, sems,
                     *, n_src: int, kprime: int, nd: int, kb: int,
                     r_rows: int, nb: int, px_hyp: bool, wvalid: int = 0,
                     hd_major: bool = False):
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

    @pl.when(hb == 0)
    def _():
        for s in range(n_src):
            dma(0, 0, s).start()

    @pl.when(hb + 1 < nhb)
    def _():
        for s in range(n_src):
            dma((hb + 1) % 2, hb + 1, s).start()

    vol[...] = jnp.zeros_like(vol)
    wsum[...] = jnp.zeros_like(wsum)

    kiota = jax.lax.broadcasted_iota(jnp.int32, (kb, wp), 0) \
        .astype(jnp.float32)
    biota = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) \
        .astype(jnp.float32)
    # pixel-x grid / lane mask for the in-kernel coordinate reconstruction
    xiota = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1) \
        .astype(jnp.float32)
    lane_pad = (xiota >= wvalid) if 0 < wvalid < wp else None
    k0 = k0_ref[0]                                # (C,) f32
    bn_s = sc_ref[0, 0]
    bn_o = sc_ref[0, 1]
    k1 = sc_ref[0, 2]
    b1 = sc_ref[0, 3]

    for s in range(n_src):
        dma(hb % 2, hb, s).wait()
        w0 = wstart_ref[hb, s].astype(jnp.float32)
        m = [mats_ref[s, j] for j in range(12)]
        for r in range(r_rows):
            q = q_ref[r].astype(jnp.float32)      # (C, Wp)
            # row coefficients: rel @ [x, y, 1] per lane (y is this row's
            # global grid row; x/y matrix rows arrive pre-scaled by the
            # reference's align-corners composition factor, geometry.py:115)
            yg = (hb * r_rows + r).astype(jnp.float32)
            gu = m[0] * xiota + (m[1] * yg + m[2])       # (1, Wp)
            gv = m[4] * xiota + (m[5] * yg + m[6])
            gz = m[8] * xiota + (m[9] * yg + m[10])

            def dbody(d, _, s=s, r=r, q=q, w0=w0, gu=gu, gv=gv, gz=gz):
                if px_hyp:
                    dep = hyp_ref[r, d][None, :]         # (1, Wp) f32
                else:
                    dep = hyp_ref[0, d]                  # scalar f32
                z = gz * dep + m[11]
                zi = 1.0 / z
                xsd = (gu * dep + m[3]) * zi - 0.5       # (1, Wp)
                ysd = (gv * dep + m[7]) * zi - 0.5
                if lane_pad is not None:
                    # match the host plan's pad-lane fill (-2: zero tent
                    # weight; also keeps z~0 NaN/Inf out of the tents)
                    xsd = jnp.where(lane_pad, -2.0, xsd)
                    ysd = jnp.where(lane_pad, -2.0, ysd)
                rel = yrel_ref[hb, (s * r_rows + r) * nd + d]
                band = window[hb % 2, s, pl.ds(rel, kb)]   # (kb, C, W~)
                y0 = w0 + rel.astype(jnp.float32)
                ky = jnp.maximum(
                    0.0, 1.0 - jnp.abs(ysd - (kiota + y0)))
                blend_buf[...] = jnp.sum(
                    band.astype(jnp.float32) * ky[:, None, :], axis=0)
                cols = []
                for b in range(nb):
                    start = xblk_ref[
                        hb, ((s * r_rows + r) * nd + d) * nb + b] * 128
                    startm = pl.multiple_of(start, 128)
                    src_win = blend_buf[:, pl.ds(startm, 256)]  # (C, 256)
                    xb = (xsd[0, b * 128:(b + 1) * 128]
                          - start.astype(jnp.float32))
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
                if hd_major:
                    vol[r, d] = vol[r, d] + sim * wgt[None, :]
                    wsum[r, d] = wsum[r, d] + wgt
                else:
                    vol[d, r] = vol[d, r] + sim * wgt[None, :]
                    wsum[d, r] = wsum[d, r] + wgt
                return 0

            # fully unrolled: Mosaic software-pipelines consecutive planes
            # (VPU tent builds overlapping MXU interps); a fori_loop
            # serialises them (and Pallas only lowers full unrolls anyway)
            for d in range(nd):
                dbody(d, 0)

    res = vol[...] / wsum[...][:, :, None, :]
    if 0 < wvalid < wp:
        # zero the junk lane-pad columns: the Pallas U-Net consumes this
        # volume wp-wide and needs grid-conv zero padding there
        mi = jax.lax.broadcasted_iota(jnp.int32, res.shape, 3)
        res = res * (mi < wvalid).astype(res.dtype)
    out_ref[...] = res.astype(out_ref.dtype)


def _sweep_coords_hdw(src_projs, ref_proj, depth_hypos, h, w, wp):
    """Effective sample coords per src in (S, H, D, Wp) layout (f32), with
    out-of-range fill (-2: zero tent weight everywhere).

    Computed directly on a Wp-wide pixel grid with the pad columns MASKED
    (a select that fuses into the coordinate math) — padding the (S, H, D,
    Wp) f32 arrays afterwards cost a full extra copy per array (XLA
    profile at bench size)."""
    n_src = src_projs.shape[0]
    d = depth_hypos.shape[0]
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
        x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
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


def _plan(src_projs, ref_proj, hypos, h, w, wp, kb, r_rows, kprime):
    """DMA-window prefetch arrays + the coverage flag for the kernel.

    Returns (wstart, yrel, xblk_flat, cover); row axes are padded
    (edge-replicated) to ceil(h / r_rows) * r_rows. The full coordinate
    arrays exist here only as inputs to min/max reductions — XLA fuses the
    coordinate math into the reduces, so nothing (Hp, Wp)-sized per plane
    has to round-trip HBM; the kernel rebuilds the exact same coordinates
    in-registers from the per-view matrices.
    """
    xs, ys = _sweep_coords_hdw(src_projs, ref_proj, hypos, h, w, wp)
    nd = hypos.shape[0]
    nb = wp // 128
    n_src = src_projs.shape[0]

    hb_count = -(-h // r_rows)
    hpad = hb_count * r_rows
    if hpad != h:
        rpad = ((0, 0), (0, hpad - h), (0, 0), (0, 0))
        xs = jnp.pad(xs, rpad, mode="edge")
        ys = jnp.pad(ys, rpad, mode="edge")

    band, cover_y = _band_starts(ys, h, kb)                 # (S, Hp, D)
    xblk, cover_x = _x_block_starts(xs, w)                  # (S, Hp, D, NB)

    band_blk = band.reshape(n_src, hb_count, r_rows, nd)
    bmin = jnp.min(band_blk, axis=(2, 3))                   # (S, HB)
    bmax = jnp.max(band_blk, axis=(2, 3))
    wstart = jnp.clip(bmin, 0, max(h - kprime, 0))          # (S, HB)
    cover_w = jnp.all(bmax + kb <= wstart + kprime)
    yrel = jnp.clip(band_blk - wstart[:, :, None, None], 0, kprime - kb)
    # (HB, S*R*D) — kernel index (s*R + r)*D + d
    yrel = jnp.transpose(yrel, (1, 0, 2, 3)).reshape(hb_count, -1)
    wstart = jnp.transpose(wstart)                          # (HB, S)

    # rows regrouped into (HB, S, R, D, NB) kernel order
    xblk_flat = jnp.transpose(
        xblk.reshape(n_src, hb_count, r_rows, nd, nb), (1, 0, 2, 3, 4)) \
        .reshape(hb_count, -1)                              # (HB, S*R*D*NB)

    cover = cover_y & cover_w & cover_x
    return wstart, yrel, xblk_flat, cover


def _pick_r_rows(nd: int, c: int, wp: int, h: int) -> int:
    """Rows per grid step: bounded by an f32 accumulator VMEM budget
    (default ~3.5 MB; MDFNET_ROWSWEEP_BUDGET overrides for tuning — read at
    trace time only)."""
    import os
    budget = int(float(os.environ.get("MDFNET_ROWSWEEP_BUDGET", 3.5e6)))
    per_row = nd * c * wp * 4
    return max(1, min(8, budget // per_row, h))


@functools.partial(jax.jit, static_argnames=("k_win", "kb", "valid_w",
                                             "interpret", "out_layout"))
def rowsweep_aggregate(diffs: jnp.ndarray, q: jnp.ndarray,
                       src_projs: jnp.ndarray, ref_proj: jnp.ndarray,
                       depth_hypos: jnp.ndarray, k0: jnp.ndarray,
                       bn_scale, bn_offset, k1, b1, *, k_win: int = 16,
                       kb: int = 4, valid_w: int | None = None,
                       interpret: bool = False, out_layout: str = "dhcw"):
    """Fused warp + aggregate for ONE batch item.

    Args:
        diffs: (S, H, C, W) src pair-difference features, (H, C, W) layout.
        q: (H, C, W) sigmoid of the ref view's pair differences.
        src_projs: (S, 4, 4); ref_proj: (4, 4).
        depth_hypos: (D, H, W) or (D, 1, 1).
        k0: (C,) DepthWeight conv0 channel weights (f32).
        bn_scale, bn_offset: folded eval BN scalars of the scalar-field BN.
        k1, b1: DepthWeight conv1 scalar weight/bias.
        k_win: base y-window rows per row-block (grows with the block size).
        kb: y-band rows per (row, plane) — the per-plane coverage contract.
        out_layout: "dhcw" (default) emits (D, H, C, Wp) for the conv3d
            U-Net; "hdcw" emits (H, D, C, Wp) — reshape-free input to the
            depth-folded conv2d U-Net (kills its (D,H)->(H,D) transpose of
            the full volume). Same cost in-kernel: the accumulator scratch
            is simply laid out in the requested order.
    Returns:
        (volume, cover): volume (D, H, C, Wp) or (H, D, C, Wp) aggregated
        cost volume (Wp = W padded to 128; columns beyond W hold the
        zero-feature similarity, slice before use); cover () bool — True
        iff the kernel's y-band/window/x-window contracts all held, i.e.
        the volume is exact. On False, fall back to the dense/gather path.
    """
    assert out_layout in ("dhcw", "hdcw"), out_layout
    n_src, h, c, w_in = diffs.shape
    w = valid_w or w_in
    nd = depth_hypos.shape[0]
    wp = -(-w // 128) * 128
    assert w_in in (w, wp), (w_in, w)
    if wp < 256:
        wp = 256  # the banded x-interp needs a 256-col source window
    kb = min(kb, h)

    if depth_hypos.shape[-1] == 1:
        hypos = jnp.broadcast_to(depth_hypos, (nd, 1, 1))
    else:
        hypos = depth_hypos

    r_rows = _pick_r_rows(nd, c, wp, h)
    kprime = min(k_win + 2 * r_rows, h)
    hb_count = -(-h // r_rows)
    hpad = hb_count * r_rows
    nb = wp // 128

    wstart, yrel, xblk, cover = _plan(
        src_projs, ref_proj, hypos, h, w, wp, kb, r_rows, kprime)

    # per-view coordinate-reconstruction matrices: rel = src @ ref^-1 with
    # the x/y rows (and translations) pre-scaled by the reference's
    # align-corners composition factor (geometry.reference_grid_coords);
    # the -0.5 shift happens in-kernel after the divide
    rel = jnp.matmul(src_projs.astype(jnp.float32),
                     jnp.linalg.inv(ref_proj.astype(jnp.float32)))
    cwh = jnp.asarray([w / (w - 1.0), h / (h - 1.0), 1.0],
                      jnp.float32)
    mats = (rel[:, :3, :] * cwh[None, :, None]).reshape(n_src, 12)
    mats = jnp.pad(mats, ((0, 0), (0, 116)))                # (S, 128)

    px_hyp = hypos.shape[-1] != 1
    if px_hyp:
        # per-pixel hypotheses stream as (Hp, D, Wp) f32 row blocks — the
        # only per-pixel warp input left (8x smaller than the v2 coords).
        # Row-major layout: the block's sublane dim is the FULL D axis
        # (always legal for Mosaic) while the r_rows block rides the
        # untiled major axis — r_rows is accumulator-sized (often 4) and
        # must not be forced to a multiple of 8.
        hyp_a = hypos.astype(jnp.float32)
        if hyp_a.shape[-1] != wp:
            hyp_a = jnp.pad(hyp_a, ((0, 0), (0, 0),
                                    (0, wp - hyp_a.shape[-1])), mode="edge")
        if hyp_a.shape[1] != hpad:
            hyp_a = jnp.pad(hyp_a, ((0, 0), (0, hpad - hyp_a.shape[1]),
                                    (0, 0)), mode="edge")
        hyp_a = hyp_a.transpose(1, 0, 2)               # (Hp, D, Wp)
        hyp_spec = pl.BlockSpec((r_rows, nd, wp), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        ndp = -(-nd // 128) * 128
        hyp_a = jnp.zeros((1, ndp), jnp.float32) \
            .at[0, :nd].set(hypos[:, 0, 0].astype(jnp.float32))
        hyp_spec = pl.BlockSpec((1, ndp), lambda i, *_: (0, 0),
                                memory_space=pltpu.VMEM)

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
    scalars = jnp.zeros((1, 128), jnp.float32)
    scalars = scalars.at[0, 0].set(bn_scale).at[0, 1].set(bn_offset)
    scalars = scalars.at[0, 2].set(k1).at[0, 3].set(b1)

    hd_major = out_layout == "hdcw"
    kern = functools.partial(_rowsweep_kernel, n_src=n_src, kprime=kprime,
                             nd=nd, kb=kb, r_rows=r_rows, nb=nb,
                             px_hyp=px_hyp, wvalid=w, hd_major=hd_major)
    if hd_major:
        acc_shape = (r_rows, nd, c, wp)
        wsum_shape = (r_rows, nd, wp)
        out_spec = pl.BlockSpec((r_rows, nd, c, wp),
                                lambda i, *_: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (hpad, nd, c, wp)
    else:
        acc_shape = (nd, r_rows, c, wp)
        wsum_shape = (nd, r_rows, wp)
        out_spec = pl.BlockSpec((nd, r_rows, c, wp),
                                lambda i, *_: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (nd, hpad, c, wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(hb_count,),
        in_specs=[
            pl.BlockSpec((r_rows, c, wp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_src, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            hyp_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, n_src, kprime, c, wp), diffs.dtype),
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.VMEM(wsum_shape, jnp.float32),
            pltpu.VMEM((c, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_src)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, diffs.dtype),
        interpret=interpret,
        # the fully-unrolled plane loop software-pipelines hundreds of
        # bodies; its Mosaic stack outgrows the 16 MB default scoped-vmem
        # limit at stage-1 shapes (v5e has 128 MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(wstart, yrel, xblk, q_p, k0_2, scalars, mats, hyp_a, diffs)
    return (out[:h] if hd_major else out[:, :h]), cover


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
