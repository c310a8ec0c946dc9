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

from mdfnet_tpu.ops.pallas import runtime as _rt
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref,            # (Dp, Hp, 3Ci, Wp) ANY/HBM (pre-padded)
                 w_ref,            # (9, Co, 3Ci) VMEM
                 scale_ref,        # (1, Co) VMEM f32
                 offset_ref,       # (1, Co) VMEM f32
                 out_ref,          # (1, Th, Co, Wp) VMEM block
                 slab, sems,       # scratch (2, 3, s*Th+2, 3Ci, Wp), DMA sems
                 *, th: int, stride: int, wvalid: int = 0,
                 relu: bool = True):
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
        y = acc * scale[:, None] + offset[:, None]
        if relu:
            y = jnp.maximum(y, 0.0)
        if 0 < wvalid < wp:
            yi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            y = y * (yi < wvalid).astype(y.dtype)
        out_ref[0, hh] = y.astype(out_ref.dtype)


def _axis_specials(nblk_ax: int, blk: int, size: int, halo: int = 1):
    """Per-block (dst0, src0, length) copy geometry for a halo'd axis; only
    blocks whose [v*blk - halo, v*blk - halo + blk + 2*halo) window leaves
    [0, size) appear (the rest use the generic traced-offset copy)."""
    out = {}
    span = blk + 2 * halo
    for v in range(nblk_ax):
        s0 = v * blk - halo
        dst0 = max(0, -s0)
        s0 = max(0, s0)
        length = min(span - dst0, size - s0)
        if dst0 != 0 or length != span:
            out[v] = (dst0, s0, length)
    return out


def _conv_kernel_unstacked(
        x_ref,            # (D, H, ci_e, Wp) ANY/HBM — UNPADDED rows/planes
        w_ref,            # (3, Co, 3*nblk*sub) VMEM (dz outer; dy in K)
        scale_ref,        # (1, Co) VMEM f32
        offset_ref,       # (1, Co) VMEM f32
        out_ref,          # (Td, Th, Co, Wp) VMEM block
        slab, taps, sems,  # (2, Td+2, Th+2, ci_e, Wq), (Td+2, Th+2, Z, Wp)
        *, th: int, td: int, gg: int, nblk: int, d: int, h: int,
        wvalid: int = 0, relu: bool = True):
    """Stride-1 v2: Td output planes + Th output rows per grid step, with
    BOTH pad axes handled in-kernel (no host-side pad copy of the volume)
    and the (Td+2)-plane slab amortising the D-halo re-reads (v1 re-DMA'd
    every input plane 3x). Taps are stored row-major-by-Z so the dy taps of
    one output row are a CONTIGUOUS (3Z, Wp) sublane slice — 3 matmuls per
    output row, dy riding the contraction."""
    from mdfnet_tpu.ops.pallas.conv2d_kernel import _shift_lanes_left

    db = pl.program_id(0)
    hb = pl.program_id(1)
    n_db = pl.num_programs(0)
    n_hb = pl.num_programs(1)
    n = n_db * n_hb
    rows = th + 2
    planes = td + 2
    ci_e = slab.shape[3]
    wq = slab.shape[-1]
    wp = taps.shape[-1]
    z = taps.shape[2]             # nblk*sub
    sub = z // nblk

    dsp = _axis_specials(n_db, td, d)
    hsp = _axis_specials(n_hb, th, h)

    def issue(what, slot, dd, hh):
        def go(dspec, hspec):
            ddst, ds0, dlen = dspec
            hdst, hs0, hlen = hspec
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(ds0, dlen), pl.ds(hs0, hlen)],
                slab.at[slot, pl.ds(ddst, dlen), pl.ds(hdst, hlen), :,
                        pl.ds(0, wp)],
                sems.at[slot])
            if what == "start":
                cp.start()
            else:
                cp.wait()

        def zero(spec):
            if what != "start":
                return
            ddst, _, dlen = spec[0]
            hdst, _, hlen = spec[1]
            if ddst:
                slab[slot, 0:ddst] = jnp.zeros(
                    (ddst,) + slab.shape[2:], slab.dtype)
            if ddst + dlen < planes:
                slab[slot, ddst + dlen:planes] = jnp.zeros(
                    (planes - ddst - dlen,) + slab.shape[2:], slab.dtype)
            if hdst:
                slab[slot, :, 0:hdst] = jnp.zeros(
                    (planes, hdst) + slab.shape[3:], slab.dtype)
            if hdst + hlen < rows:
                slab[slot, :, hdst + hlen:rows] = jnp.zeros(
                    (planes, rows - hdst - hlen) + slab.shape[3:],
                    slab.dtype)

        dvars = list(dsp.items()) + [(None, None)]
        hvars = list(hsp.items()) + [(None, None)]
        for dv, dspec in dvars:
            for hv, hspec in hvars:
                dcond = (dd >= 0) if dv is None else (dd == dv)
                if dv is None:
                    for u in dsp:
                        dcond = dcond & (dd != u)
                hcond = (hh >= 0) if hv is None else (hh == hv)
                if hv is None:
                    for u in hsp:
                        hcond = hcond & (hh != u)
                ds_ = dspec or (0, dd * td - 1, planes)
                hs_ = hspec or (0, hh * th - 1, rows)
                # skip impossible combos statically
                if dv is None and not (len(dsp) < n_db):
                    continue
                if hv is None and not (len(hsp) < n_hb):
                    continue

                @pl.when(dcond & hcond)
                def _(ds_=ds_, hs_=hs_):
                    zero((ds_, hs_))
                    go(ds_, hs_)

    i = db * n_hb + hb

    @pl.when(i == 0)
    def _():
        if wp != wq:
            slab[:, :, :, :, wp:] = jnp.zeros(
                slab.shape[:4] + (wq - wp,), slab.dtype)
        issue("start", 0, 0, 0)

    @pl.when(i + 1 < n)
    def _():
        issue("start", (i + 1) % 2, (i + 1) // n_hb, (i + 1) % n_hb)

    issue("wait", i % 2, db, hb)

    for j in range(planes):
        plane = slab[i % 2, j]     # (rows, ci_e, Wq)
        for b in range(nblk):
            parts = []
            for t in range(gg):
                dx = b * gg + t
                if dx < 3:
                    parts.append(
                        _shift_lanes_left(plane, dx - 1)[..., :wp])
                else:
                    parts.append(jnp.zeros((rows, ci_e, wp), plane.dtype))
            block = (parts[0] if len(parts) == 1
                     else jnp.concatenate(parts, axis=1))
            if block.shape[1] < sub:
                block = jnp.pad(block,
                                ((0, 0), (0, sub - block.shape[1]), (0, 0)))
            taps[j, :, b * sub:(b + 1) * sub] = block

    scale = scale_ref[0]
    offset = offset_ref[0]
    co = w_ref.shape[1]

    for jo in range(td):
        for hh in range(th):
            acc = jnp.zeros((co, wp), jnp.float32)
            for dz in range(3):
                # (3, Z, Wp) -> (3Z, Wp): rows hh..hh+2's Z-blocks are
                # contiguous sublane tiles, so the merge is a free view
                t3 = taps[jo + dz, hh:hh + 3].reshape(3 * z, wp)
                acc = acc + jax.lax.dot_general(
                    w_ref[dz], t3,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y = acc * scale[:, None] + offset[:, None]
            if relu:
                y = jnp.maximum(y, 0.0)
            if 0 < wvalid < wp:
                yi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                y = y * (yi < wvalid).astype(y.dtype)
            out_ref[jo, hh] = y.astype(out_ref.dtype)


def _chan_geom(c: int, dtype):
    """(c_e, gg, slot, nblk, z): the tap-packing geometry for a channel
    count — dx taps pack gg-per-slot when c_e divides the sublane tile."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    align = 4 if dtype == jnp.bfloat16 else 8
    c_e = -(-c // align) * align
    if c_e < sub and sub % c_e == 0:
        gg, slot = sub // c_e, sub
    else:
        gg, slot = 1, -(-c_e // sub) * sub
    nblk = -(-3 // gg)
    return c_e, gg, slot, nblk, nblk * slot


def _pack_k3(kernel, ci: int, co: int, ci_e: int, gg: int, slot: int,
             z: int, dtype):
    """(3, 3, 3, Ci, Co) conv weights -> (3, Co, 3z) dy-major packed K
    matching the kernel's tap layout (zeros in alignment gaps)."""
    k9 = jnp.transpose(kernel, (0, 1, 2, 4, 3)).reshape(3, 3, 3, co, ci)
    k3p = jnp.zeros((3, co, 3 * z), dtype)
    for dy in range(3):
        for dx in range(3):
            off = dy * z + (dx // gg) * slot + (dx % gg) * ci_e
            k3p = k3p.at[:, :, off:off + ci].set(k9[:, dy, dx].astype(dtype))
    return k3p


def _build_taps(taps, j, plane, wp, gg, nblk, slot, ci_e):
    """Write the 3 dx-shifted copies of one (rows, ci_e, Wq) plane into
    taps[j] as the packed (rows, Z, Wp) contraction layout."""
    from mdfnet_tpu.ops.pallas.conv2d_kernel import _shift_lanes_left
    rows = plane.shape[0]
    for b in range(nblk):
        parts = []
        for t in range(gg):
            dx = b * gg + t
            if dx < 3:
                parts.append(_shift_lanes_left(plane, dx - 1)[..., :wp])
            else:
                parts.append(jnp.zeros((rows, ci_e, wp), plane.dtype))
        block = (parts[0] if len(parts) == 1
                 else jnp.concatenate(parts, axis=1))
        if block.shape[1] < slot:
            block = jnp.pad(block,
                            ((0, 0), (0, slot - block.shape[1]), (0, 0)))
        taps[j, :, b * slot:(b + 1) * slot] = block


def _conv3d_pair_kernel(
        x_ref,             # (D, H, ci_e, Wp) ANY/HBM — UNPADDED rows/planes
        w1_ref,            # (3, Cm, 3*z1) VMEM
        s1_ref, o1_ref,    # (1, Cm) VMEM f32
        w2_ref,            # (3, Co, 3*z2) VMEM
        s2_ref, o2_ref,    # (1, Co) VMEM f32
        out_ref,           # (Td, Th, Co, Wp) VMEM block
        slab, taps1, mid, taps2, sems,
        *, th: int, td: int, gg1: int, nblk1: int, gg2: int, nblk2: int,
        d: int, h: int, vw: int, wvalid_out: int = 0, relu: bool = True):
    """Two chained stride-1 conv3d(3x3x3)+BN+ReLU layers in ONE kernel: the
    intermediate volume lives only in VMEM (never round-trips HBM — these
    layers are DMA-bound, so the saved write+read of the full mid volume is
    the win; the price is recomputing a 2-row/2-plane halo ring of layer-1
    outputs per grid step). Both pad axes are zero-filled in-kernel with a
    2-halo slab."""
    db = pl.program_id(0)
    hb = pl.program_id(1)
    n_db = pl.num_programs(0)
    n_hb = pl.num_programs(1)
    n = n_db * n_hb
    planes = td + 4          # slab D extent (2-halo)
    rows = th + 4            # slab H extent (2-halo)
    mid_planes = td + 2
    mid_rows = th + 2
    ci_e = slab.shape[3]
    wq = slab.shape[-1]
    wp = taps1.shape[-1]
    z1 = taps1.shape[2]
    slot1 = z1 // nblk1
    cm_e = mid.shape[2]
    z2 = taps2.shape[2]
    slot2 = z2 // nblk2

    dsp = _axis_specials(n_db, td, d, halo=2)
    hsp = _axis_specials(n_hb, th, h, halo=2)

    def issue(what, slot, dd, hh):
        def go(dspec, hspec):
            ddst, ds0, dlen = dspec
            hdst, hs0, hlen = hspec
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(ds0, dlen), pl.ds(hs0, hlen)],
                slab.at[slot, pl.ds(ddst, dlen), pl.ds(hdst, hlen), :,
                        pl.ds(0, wp)],
                sems.at[slot])
            if what == "start":
                cp.start()
            else:
                cp.wait()

        def zero(spec):
            if what != "start":
                return
            ddst, _, dlen = spec[0]
            hdst, _, hlen = spec[1]
            if ddst:
                slab[slot, 0:ddst] = jnp.zeros(
                    (ddst,) + slab.shape[2:], slab.dtype)
            if ddst + dlen < planes:
                slab[slot, ddst + dlen:planes] = jnp.zeros(
                    (planes - ddst - dlen,) + slab.shape[2:], slab.dtype)
            if hdst:
                slab[slot, :, 0:hdst] = jnp.zeros(
                    (planes, hdst) + slab.shape[3:], slab.dtype)
            if hdst + hlen < rows:
                slab[slot, :, hdst + hlen:rows] = jnp.zeros(
                    (planes, rows - hdst - hlen) + slab.shape[3:],
                    slab.dtype)

        dvars = list(dsp.items()) + [(None, None)]
        hvars = list(hsp.items()) + [(None, None)]
        for dv, dspec in dvars:
            for hv, hspec in hvars:
                dcond = (dd >= 0) if dv is None else (dd == dv)
                if dv is None:
                    for u in dsp:
                        dcond = dcond & (dd != u)
                hcond = (hh >= 0) if hv is None else (hh == hv)
                if hv is None:
                    for u in hsp:
                        hcond = hcond & (hh != u)
                ds_ = dspec or (0, dd * td - 2, planes)
                hs_ = hspec or (0, hh * th - 2, rows)
                if dv is None and not (len(dsp) < n_db):
                    continue
                if hv is None and not (len(hsp) < n_hb):
                    continue

                @pl.when(dcond & hcond)
                def _(ds_=ds_, hs_=hs_):
                    zero((ds_, hs_))
                    go(ds_, hs_)

    i = db * n_hb + hb

    @pl.when(i == 0)
    def _():
        if wp != wq:
            slab[:, :, :, :, wp:] = jnp.zeros(
                slab.shape[:4] + (wq - wp,), slab.dtype)
            mid[:, :, :, wp:] = jnp.zeros(
                mid.shape[:3] + (wq - wp,), mid.dtype)
        issue("start", 0, 0, 0)

    @pl.when(i + 1 < n)
    def _():
        issue("start", (i + 1) % 2, (i + 1) // n_hb, (i + 1) % n_hb)

    issue("wait", i % 2, db, hb)

    for j in range(planes):
        _build_taps(taps1, j, slab[i % 2, j], wp, gg1, nblk1, slot1, ci_e)

    s1 = s1_ref[0]
    o1 = o1_ref[0]
    cm = w1_ref.shape[1]
    for jm in range(mid_planes):
        for r in range(mid_rows):
            acc = jnp.zeros((cm, wp), jnp.float32)
            for dz in range(3):
                t3 = taps1[jm + dz, r:r + 3].reshape(3 * z1, wp)
                acc = acc + jax.lax.dot_general(
                    w1_ref[dz], t3,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y = acc * s1[:, None] + o1[:, None]
            if relu:
                y = jnp.maximum(y, 0.0)
            # the mid volume MUST be zero beyond the true width: layer 2's
            # lane rolls shift these columns into valid outputs, and BN
            # offset makes pad columns nonzero otherwise
            if vw < wp:
                yi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                y = y * (yi < vw).astype(y.dtype)
            # ... and zero OUTSIDE the global volume: layer 2 must see
            # conv zero padding there, not conv1(0)+offset (= relu(o1))
            pv = db * td + jm - 1
            rv = hb * th + r - 1
            inside = ((pv >= 0) & (pv < d) & (rv >= 0) & (rv < h))
            y = y * inside.astype(y.dtype)
            mid[jm, r, :, :wp] = y.astype(mid.dtype)

    for j in range(mid_planes):
        _build_taps(taps2, j, mid[j], wp, gg2, nblk2, slot2, cm_e)

    s2 = s2_ref[0]
    o2 = o2_ref[0]
    co = w2_ref.shape[1]
    for jo in range(td):
        for hh in range(th):
            acc = jnp.zeros((co, wp), jnp.float32)
            for dz in range(3):
                t3 = taps2[jo + dz, hh:hh + 3].reshape(3 * z2, wp)
                acc = acc + jax.lax.dot_general(
                    w2_ref[dz], t3,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y = acc * s2[:, None] + o2[:, None]
            if relu:
                y = jnp.maximum(y, 0.0)
            if 0 < wvalid_out < wp:
                yi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                y = y * (yi < wvalid_out).astype(y.dtype)
            out_ref[jo, hh] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th", "td", "valid_w",
                                             "keep_wpad", "relu",
                                             "interpret"))
def conv3d_pair_bn_relu(x: jnp.ndarray, k1: jnp.ndarray, s1: jnp.ndarray,
                        o1: jnp.ndarray, k2: jnp.ndarray, s2: jnp.ndarray,
                        o2: jnp.ndarray, *, th: int = 8, td: int = 4,
                        valid_w: int | None = None, keep_wpad: bool = False,
                        relu: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused PAIR of stride-1 conv3d+BN+ReLU layers on (D, H, C, W) layout —
    the structural fusion the U-Net's stride-1 pairs need (the intermediate
    volume never touches HBM). Semantically identical to two
    :func:`conv3d_bn_relu` calls.

    Args:
        x: (D, H, Ci, W) — true width or 128-aligned with ``valid_w``
            (pad columns zeroed by the producer).
        k1: (3, 3, 3, Ci, Cm); k2: (3, 3, 3, Cm, Co).
        s1, o1: (Cm,); s2, o2: (Co,) folded BN.
    Returns:
        (D, H, Co, W_out) (128-aligned zero-padded extent if keep_wpad).
    """
    d, h, ci, w_in = x.shape
    vw = valid_w or w_in
    cm = k1.shape[-1]
    co = k2.shape[-1]
    wp = -(-vw // 128) * 128
    if w_in > wp:
        x = x[..., :wp]
        w_in = wp
    assert w_in in (vw, wp), (w_in, vw)
    if w_in != wp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - w_in)))

    align = 4 if x.dtype == jnp.bfloat16 else 8
    ci_e, gg1, slot1, nblk1, z1 = _chan_geom(ci, x.dtype)
    cm_e, gg2, slot2, nblk2, z2 = _chan_geom(cm, x.dtype)
    assert cm % align == 0, f"pair mid channels {cm} must be DMA-aligned"
    if ci_e != ci:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ci_e - ci), (0, 0)))
    wq = wp + 128
    bpe = 2 if x.dtype == jnp.bfloat16 else 4
    th_ = min(th, h)
    td_ = max(1, min(td, d))

    def vmem_est(tdv, thv):
        return ((2 * (tdv + 4) * (thv + 4) * ci_e * wq
                 + (tdv + 4) * (thv + 4) * z1 * wp
                 + (tdv + 2) * (thv + 2) * (cm_e * wq + z2 * wp)
                 + 2 * tdv * thv * co * wp) * bpe)

    while td_ > 1 and vmem_est(td_, th_) > 11e6:
        td_ -= 1
    while th_ > 4 and vmem_est(td_, th_) > 11e6:
        th_ //= 2
    n_db = -(-d // td_)
    n_hb = -(-h // th_)

    k1p = _pack_k3(k1, ci, cm, ci_e, gg1, slot1, z1, x.dtype)
    k2p = _pack_k3(k2, cm, co, cm_e, gg2, slot2, z2, x.dtype)
    s1r = s1.reshape(1, cm).astype(jnp.float32)
    o1r = o1.reshape(1, cm).astype(jnp.float32)
    s2r = s2.reshape(1, co).astype(jnp.float32)
    o2r = o2.reshape(1, co).astype(jnp.float32)

    kern = functools.partial(_conv3d_pair_kernel, th=th_, td=td_, gg1=gg1,
                             nblk1=nblk1, gg2=gg2, nblk2=nblk2, d=d, h=h,
                             vw=vw, wvalid_out=vw if keep_wpad else 0,
                             relu=relu)
    out = pl.pallas_call(
        kern,
        grid=(n_db, n_hb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, cm, 3 * z1), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, co, 3 * z2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((td_, th_, co, wp),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_db * td_, n_hb * th_, co, wp),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, td_ + 4, th_ + 4, ci_e, wq), x.dtype),
            pltpu.VMEM((td_ + 4, th_ + 4, z1, wp), x.dtype),
            pltpu.VMEM((td_ + 2, th_ + 2, cm_e, wq), x.dtype),
            pltpu.VMEM((td_ + 2, th_ + 2, z2, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret or _rt.force_interpret(),
    )(x, k1p, s1r, o1r, k2p, s2r, o2r)
    out = out[:d, :h]
    return out if keep_wpad else out[:, :, :, :vw]


@functools.partial(jax.jit, static_argnames=("th", "td", "stride", "valid_w",
                                             "keep_wpad", "relu",
                                             "interpret"))
def conv3d_bn_relu(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                   offset: jnp.ndarray, *, th: int = 16, td: int = 4,
                   stride: int = 1, valid_w: int | None = None,
                   keep_wpad: bool = False, relu: bool = True,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused conv3d (stride 1 or isotropic 2) + scale/offset + relu on
    (D, H, C, W) layout.

    Args:
        x: (D, H, Ci, W). W may be the true width OR its 128-aligned
            extent with ``valid_w`` set (junk pad columns allowed only for
            stride 1, which masks its own output; producers created by
            this kernel with ``keep_wpad`` zero theirs).
        kernel: (3, 3, 3, Ci, Co) conv weights (as stored by ConvND).
        scale, offset: (Co,) folded BN (scale = gamma/rsqrt(var+eps),
            offset = beta - mean*scale).
        keep_wpad: return the full 128-aligned lane extent, with the pad
            columns ZEROED, for the next fused consumer.
    Returns:
        (D_out, H_out, Co, W_out) with *_out = ceil(*/stride)
        (W_out -> its 128-aligned extent under ``keep_wpad``).
    """
    d, h, ci, w_in = x.shape
    vw = valid_w or w_in
    co = kernel.shape[-1]
    d_out = -(-d // stride)
    h_out = -(-h // stride)
    w_out = -(-vw // stride)
    wp = -(-w_out // 128) * 128

    if stride == 1:
        # v2: in-kernel D/H zero padding (no host pad copy), Td planes per
        # step (the v1 per-plane grid re-read every plane 3x)
        wpi = -(-vw // 128) * 128
        if w_in > wpi:
            # producer kept a wider lane extent (the rowsweep kernel's
            # 256-col x-window floor exceeds the natural alignment at small
            # scenes); pad columns are zeros, so slicing is exact
            x = x[..., :wpi]
            w_in = wpi
        assert w_in in (vw, wpi), (w_in, vw)
        if w_in != wpi:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wpi - w_in)))
        sub = 16 if x.dtype == jnp.bfloat16 else 8
        align = 4 if x.dtype == jnp.bfloat16 else 8
        ci_e = -(-ci // align) * align
        if ci_e != ci:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ci_e - ci), (0, 0)))
        if ci_e < sub and sub % ci_e == 0:
            gg, slot = sub // ci_e, sub
        else:
            gg, slot = 1, -(-ci_e // sub) * sub
        nblk = -(-3 // gg)
        z = nblk * slot
        wq = wp + 128
        th_ = min(th, h)
        td_ = max(1, min(td, d))
        bpe = 2 if x.dtype == jnp.bfloat16 else 4

        def vmem_est(tdv, thv):
            return (2 * (tdv + 2) * (thv + 2) * ci_e * wq * bpe
                    + (tdv + 2) * (thv + 2) * z * wp * bpe
                    + 2 * tdv * thv * co * wp * bpe)

        while td_ > 1 and vmem_est(td_, th_) > 11e6:
            td_ -= 1
        while th_ > 4 and vmem_est(td_, th_) > 11e6:
            th_ //= 2
        n_db = -(-d // td_)
        n_hb = -(-h // th_)

        k9 = jnp.transpose(kernel, (0, 1, 2, 4, 3)).reshape(3, 3, 3, co, ci)
        k3p = jnp.zeros((3, co, 3 * z), x.dtype)  # (dz, co, dy-major K)
        for dy in range(3):
            for dx in range(3):
                off = dy * z + (dx // gg) * slot + (dx % gg) * ci_e
                k3p = k3p.at[:, :, off:off + ci].set(
                    k9[:, dy, dx].astype(x.dtype))
        scale2 = scale.reshape(1, co).astype(jnp.float32)
        offset2 = offset.reshape(1, co).astype(jnp.float32)
        kern = functools.partial(_conv_kernel_unstacked, th=th_, td=td_,
                                 gg=gg, nblk=nblk, d=d, h=h,
                                 wvalid=vw if keep_wpad else 0, relu=relu)
        out = pl.pallas_call(
            kern,
            grid=(n_db, n_hb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3, co, 3 * z), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((td_, th_, co, wp),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_db * td_, n_hb * th_, co, wp),
                                           x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, td_ + 2, th_ + 2, ci_e, wq), x.dtype),
                pltpu.VMEM((td_ + 2, th_ + 2, z, wp), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret or _rt.force_interpret(),
        )(x, k3p, scale2, offset2)
        out = out[:d_out, :h_out]
        return out if keep_wpad else out[:, :, :, :w_out]

    if w_in != vw:
        x = x[..., :vw]  # fused into the parity-stack copy below
    w = vw
    h_out_pad = -(-h_out // th) * th

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

    kern = functools.partial(_conv_kernel, th=th, stride=stride,
                             wvalid=w_out if keep_wpad else 0, relu=relu)
    out = pl.pallas_call(
        kern,
        grid=(d_out, h_out_pad // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
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
        interpret=interpret or _rt.force_interpret(),
    )(x3, k9, scale2, offset2)
    out = out[:, :h_out]
    return out if keep_wpad else out[:, :, :, :w_out]


def trconv3d_bn_relu(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                     offset: jnp.ndarray, *, th: int = 8,
                     valid_w: int | None = None, keep_wpad: bool = False,
                     relu: bool = True,
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
    d, h, ci, w_in = x.shape
    w = valid_w or w_in
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
                       th=th, valid_w=valid_w, keep_wpad=keep_wpad,
                       relu=relu, interpret=interpret)  # (D, H, 8Co, Wy)
    wy = y.shape[-1]
    y = y.reshape(d, h, 2, 2, 2, co, wy)
    y = y.transpose(0, 2, 1, 3, 5, 6, 4)             # (D,2,H,2,Co,Wy,2)
    # junk cols (zeroed by the conv's wvalid mask) interleave to the tail
    # (NOTE: interior-padded dilated adds looked cheaper but XLA
    # materialises every padded 2x volume — measured 4x worse)
    return y.reshape(2 * d, 2 * h, co, 2 * wy)
