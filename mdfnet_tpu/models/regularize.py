"""3D U-Net cost-volume regularisers.

Behavioural twins of reference net/unit/regular.py:9-133, on channels-last
(B, D, H, W, G) volumes. Stage 0 uses the 3-scale net (in=32ch), stages 1-2
the 4-scale nets (in=16/8ch). Both end in a bias-free 3x3x3 conv to a single
channel followed by a softmax over the depth axis, producing (B, D, H, W).

TPU note: layers run width-folded (ops/wfold.py) wherever the level's W
divides the fold requirements — the folded channel dims fill the 128-lane
axis that these small-C volumes would otherwise pad 8-16x. Folding is an
exact kernel transform; parity tests cover both paths. Levels whose W breaks
the divisibility (e.g. DTU stage-1's deepest level at W=50) fall back to the
plain layout automatically.

The softmax is computed in f32 even when conv compute runs in bf16 — the
probability volume feeds the distribution-fitting stage, which is precision
sensitive (SURVEY.md §7 hard part 4).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import (
    ConvBNReLU3D, ConvND, TrConvBNReLU3D, _torch_conv_init)
from mdfnet_tpu.ops import wfold as wf


class ProbConv(nn.Module):
    """Final 3x3x3 conv to a single channel, emitted as 27 shifted
    channel-contractions producing (B, D, H, W) directly.

    A conv3d with C_out=1 forces a (B,D,H,W,1) tensor whose 1-wide channel
    axis lands on the 128-lane dim (128x physical padding — measured 34 ms on
    its own at DTU eval size). Contracting the channel axis per tap keeps the
    output layout compact. Parameters stay conv-shaped ((3,3,3,C,1), path
    <stage>/prob/kernel) so reference checkpoints import unchanged.
    """
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, dhcw: bool = False, train: bool = False,
                 valid_w: int | None = None):
        if dhcw:
            b, d, h, c, w = x.shape
            w = valid_w or w
        else:
            b, d, h, w, c = x.shape
        kernel = self.param("kernel", _torch_conv_init(c * 27), (3, 3, 3, c, 1))
        dtype = self.dtype or x.dtype
        k = kernel.astype(dtype)
        if train:
            # training: ONE lax conv. Autodiff of the 27-tap contraction
            # loop below schedules many concurrent per-tap gradient fusions
            # whose (B,D,H,W,C) temps are lane-padded up to 16x — measured
            # 12+ GB at the reference batch-4 config. The single conv keeps
            # one transient buffer and XLA's own conv backward.
            assert not dhcw
            from mdfnet_tpu.models.layers import _dimension_numbers
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), k, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=_dimension_numbers(3))
            return y[..., 0].astype(jnp.float32)
        out = jnp.zeros((b, d, h, w), jnp.float32)
        if dhcw:
            # one fused Co=1 conv2d per dz tap over D-shifted views (dim-0
            # slices are cheap): the 27-slice XLA loop re-read the volume 9x
            from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused
            from mdfnet_tpu.parallel import halo
            ctx = halo.current_ctx()
            if ctx is not None:
                # spatial sharding: give each band its true neighbour rows,
                # then drop the rows the conv's own zero padding corrupts
                x = halo.halo_exchange(x, h_axis=2, lo=1, hi=1, edge="zero")
            one = jnp.ones((1,), jnp.float32)
            zero = jnp.zeros((1,), jnp.float32)
            outs = []
            for bi in range(b):
                xp = jnp.pad(x[bi].astype(dtype),
                             ((1, 1), (0, 0), (0, 0), (0, 0)))
                acc = jnp.zeros((d, x.shape[2], w), jnp.float32)
                vwk = w if w != xp.shape[-1] else None
                for dz in range(3):
                    y = conv2d_fused(xp[dz:dz + d], k[dz], one, zero,
                                     relu=False, valid_w=vwk)
                    acc = acc + y[:, :, 0, :].astype(jnp.float32)
                if ctx is not None:
                    acc = jax.lax.slice_in_dim(acc, 1, 1 + h, axis=1)
                outs.append(acc)
            return jnp.stack(outs)
        from mdfnet_tpu.parallel import halo
        ctx = halo.current_ctx()
        if ctx is not None:
            # spatial sharding: the H extension rows come from the mesh
            # neighbours (zeros at global edges = the pad below)
            xh = halo.halo_exchange(x.astype(dtype), h_axis=2, lo=1, hi=1,
                                    edge="zero")
            xp = jnp.pad(xh, ((0, 0), (1, 1), (0, 0), (1, 1), (0, 0)))
        else:
            xp = jnp.pad(x.astype(dtype),
                         ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    tap = jax.lax.dynamic_slice(
                        xp, (0, dz, dy, dx, 0), (b, d, h, w, c))
                    out = out + jnp.einsum(
                        "bdhwc,c->bdhw", tap, k[dz, dy, dx, :, 0],
                        preferred_element_type=jnp.float32)
        return out


def _can_fold(w_true: int, stride: int) -> bool:
    """A folded layer needs W%4 (stride 1) or W%8 (stride 2, so the output
    width stays block-aligned)."""
    return w_true % (4 if stride == 1 else 8) == 0


class _F:
    """Tracks folded/unfolded state of the activation through the net."""

    def __init__(self, x, use_fold: bool, pallas_eval: bool = False):
        self.use_fold = use_fold and _can_fold(x.shape[3], 1)
        self.pallas_eval = pallas_eval
        self.x = wf.fold_w(x) if self.use_fold else x
        self.folded = self.use_fold

    def width(self):
        w = self.x.shape[3]
        return w * wf.F if self.folded else w

    def conv(self, module_cls, feats, stride, name, train, dtype):
        want = self.use_fold and _can_fold(self.width(), stride)
        if want and not self.folded:
            self.x = wf.fold_w(self.x)
            self.folded = True
        elif not want and self.folded:
            self.x = wf.unfold_w(self.x)
            self.folded = False
        self.x = module_cls(feats, 3, stride, 1, dtype=dtype,
                            wfold=self.folded, pallas_eval=self.pallas_eval,
                            name=name)(self.x, train)
        return self

    def trconv(self, feats, name, train, dtype, stride=2, opad=1):
        # the transposed conv consumes unfolded input; wfold folds its output
        if self.folded:
            self.x = wf.unfold_w(self.x)
            self.folded = False
        want_out = self.use_fold and (self.width() * 2) % 4 == 0
        self.x = TrConvBNReLU3D(feats, 3, stride, 1, opad, dtype=dtype,
                                wfold=want_out, pallas_eval=self.pallas_eval,
                                name=name)(self.x, train)
        self.folded = want_out
        return self

    def match(self, other: "_F"):
        """Convert self's foldedness to match other (for residual adds)."""
        if self.folded and not other.folded:
            self.x = wf.unfold_w(self.x)
            self.folded = False
        elif not self.folded and other.folded:
            self.x = wf.fold_w(self.x)
            self.folded = True
        return self

    def value(self):
        return wf.unfold_w(self.x) if self.folded else self.x


class RegularNet3Scales(nn.Module):
    """Stage-0 regulariser. Twin of reference net/unit/regular.py:9-69.

    H and W must be divisible by 4 (two stride-2 levels)."""
    inner_chs: int = 16
    dtype: jnp.dtype | None = None
    # width-folding trades 4x conv FLOPs for full lanes; measured net-neutral
    # on v5e (kept as an option + parity tests for future layer mixes)
    use_fold: bool = False
    # eval-only fused Pallas conv for stride-1 layers (C-on-sublane layout)
    pallas_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dhcw: bool = False,
                 valid_w: int | None = None):
        c0, c1, c2 = self.inner_chs, self.inner_chs * 2, self.inner_chs * 4
        if dhcw:
            if train:
                return self._dhcw_train_path(x, c0, c1, c2)
            return self._dhcw_path(x, c0, c1, c2, valid_w)
        _, d, h, w, _ = x.shape
        assert h % 4 == 0 and w % 4 == 0, f"volume H,W must divide 4, got {x.shape}"
        dt = self.dtype

        s = _F(x, self.use_fold, self.pallas_eval)
        s.conv(ConvBNReLU3D, c0, 1, "conv01_0", train, dt)
        s.conv(ConvBNReLU3D, c0, 1, "conv01_1", train, dt)
        skip0_x, skip0_folded = s.x, s.folded

        s.conv(ConvBNReLU3D, c1, 2, "conv12_0", train, dt)
        s.conv(ConvBNReLU3D, c1, 1, "conv12_1", train, dt)
        s.conv(ConvBNReLU3D, c1, 1, "conv12_2", train, dt)
        skip1_x, skip1_folded = s.x, s.folded

        s.conv(ConvBNReLU3D, c2, 2, "conv232_0", train, dt)
        s.conv(ConvBNReLU3D, c2, 1, "conv232_1", train, dt)
        s.conv(ConvBNReLU3D, c2, 1, "conv232_2", train, dt)
        s.trconv(c1, "conv232_3", train, dt)
        # residual add with skip1 (match foldedness)
        if s.folded != skip1_folded:
            skip1_x = wf.fold_w(skip1_x) if s.folded else wf.unfold_w(skip1_x)
        s.x = s.x + skip1_x

        s.trconv(c0, "conv10", train, dt)
        if s.folded != skip0_folded:
            skip0_x = wf.fold_w(skip0_x) if s.folded else wf.unfold_w(skip0_x)
        s.x = s.x + skip0_x

        out = ProbConv(dtype=dt, name="prob")(s.value(), train=train)
        return nn.softmax(out, axis=1)

    def _dhcw_train_path(self, x, c0, c1, c2):
        """Train: the conv stack rides the custom-VJP Pallas kernels
        (ops/pallas/conv3d_vjp.py) on the compact (B, D, H, C, W) layout,
        with batch-stat BN/ReLU in XLA. Exact-width tensors (the kernels
        pad/slice lanes internally); ProbConv keeps its single-lax-conv
        train form on NDHWC."""
        dt = self.dtype

        def conv(name, feats, stride, inp):
            return ConvBNReLU3D(feats, 3, stride, 1, dtype=dt,
                                pallas_eval=True, name=name)(
                inp, True, dhcw=True)

        def trconv(name, feats, inp):
            return TrConvBNReLU3D(feats, 3, 2, 1, 1, dtype=dt,
                                  pallas_eval=True, name=name)(
                inp, True, dhcw=True)

        v = conv("conv01_0", c0, 1, x)
        skip0 = conv("conv01_1", c0, 1, v)
        v = conv("conv12_0", c1, 2, skip0)
        v = conv("conv12_1", c1, 1, v)
        skip1 = conv("conv12_2", c1, 1, v)
        v = conv("conv232_0", c2, 2, skip1)
        v = conv("conv232_1", c2, 1, v)
        v = conv("conv232_2", c2, 1, v)
        v = trconv("conv232_3", c1, v)[:, :skip1.shape[1]] + skip1
        v = trconv("conv10", c0, v)[:, :skip0.shape[1]] + skip0
        out = ProbConv(dtype=dt, name="prob")(
            jnp.transpose(v, (0, 1, 2, 4, 3)), train=True)
        return nn.softmax(out, axis=1)

    def _dhcw_path(self, x, c0, c1, c2, valid_w=None):
        """Eval: the whole net in the Pallas (B, D, H, C, W) layout — zero
        per-layer transposes; every level flows 128-aligned lane extents
        with the true width as valid_w (zeroed junk columns), so NO layer
        pays a host-side pad copy (input comes straight from the fused
        aggregation kernel, already wp-wide)."""
        assert self.pallas_eval, "dhcw layout requires pallas_eval"
        _, d, h, _, w_in = x.shape
        vw = valid_w or w_in
        assert h % 4 == 0 and vw % 4 == 0, \
            f"volume H,W must divide 4, got {(h, vw)}"
        w1, w2 = vw // 2, vw // 4
        wp = lambda ww: -(-ww // 128) * 128
        dt = self.dtype

        def conv(name, feats, stride, inp, vwl):
            return ConvBNReLU3D(feats, 3, stride, 1, dtype=dt,
                                pallas_eval=True, name=name)(
                inp, False, dhcw=True, valid_w=vwl, keep_wpad=True)

        def trconv(name, feats, inp, vwl):
            return TrConvBNReLU3D(feats, 3, 2, 1, 1, dtype=dt,
                                  pallas_eval=True, name=name)(
                inp, False, dhcw=True, valid_w=vwl, keep_wpad=True)

        # NOTE round 5: the stride-1 pairs were fused into single VMEM-
        # intermediate launches (ops/pallas/conv3d_kernel.py
        # conv3d_pair_bn_relu, parity-pinned in tests/test_pallas_kernels)
        # and measured NEGATIVE on chip: 56.5 -> 57.5 ms/map at the DTU
        # config. The 2-halo tap rebuild (VPU-bound) costs more than the
        # saved mid-volume HBM round-trip (~0.3 ms upper bound across all
        # three pairs). Kernel + tests kept; wiring reverted (BENCH.md).
        v = conv("conv01_0", c0, 1, x, vw)
        skip0 = conv("conv01_1", c0, 1, v, vw)
        v = conv("conv12_0", c1, 2, skip0, vw)
        v = conv("conv12_1", c1, 1, v, w1)
        skip1 = conv("conv12_2", c1, 1, v, w1)
        v = conv("conv232_0", c2, 2, skip1, w1)
        v = conv("conv232_1", c2, 1, v, w2)
        v = conv("conv232_2", c2, 1, v, w2)
        v = trconv("conv232_3", c1, v, w2)[..., :wp(w1)] + skip1
        v = trconv("conv10", c0, v, w1)[..., :wp(vw)] + skip0
        out = ProbConv(dtype=dt, name="prob")(v, dhcw=True, valid_w=vw)
        return nn.softmax(out, axis=1)


class RegularNet4Scales(nn.Module):
    """Stage-1/2 regulariser. Twin of reference net/unit/regular.py:72-133.

    H and W must be divisible by 8 (three stride-2 levels)."""
    base_chs: int = 8
    sample_stride: Tuple[int, int, int] = (2, 2, 2)
    sample_padding: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype | None = None
    use_fold: bool = False
    pallas_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dhcw: bool = False,
                 valid_w: int | None = None):
        c0, c1, c2, c3 = (self.base_chs, self.base_chs * 2,
                          self.base_chs * 4, self.base_chs * 8)
        if dhcw:
            if train:
                return self._dhcw_train_path(x, c0, c1, c2, c3)
            return self._dhcw_path(x, c0, c1, c2, c3, valid_w)
        _, d, h, w, _ = x.shape
        assert h % 8 == 0 and w % 8 == 0, f"volume H,W must divide 8, got {x.shape}"
        assert tuple(self.sample_stride) == (2, 2, 2), \
            "anisotropic strides run unfolded"
        dt = self.dtype

        s = _F(x, self.use_fold, self.pallas_eval)
        s.conv(ConvBNReLU3D, c0, 1, "conv01", train, dt)
        x1_x, x1_f = s.x, s.folded

        s.conv(ConvBNReLU3D, c1, 2, "conv12_0", train, dt)
        s.conv(ConvBNReLU3D, c1, 1, "conv12_1", train, dt)
        x2_x, x2_f = s.x, s.folded

        s.conv(ConvBNReLU3D, c2, 2, "conv23_0", train, dt)
        s.conv(ConvBNReLU3D, c2, 1, "conv23_1", train, dt)
        x3_x, x3_f = s.x, s.folded

        s.conv(ConvBNReLU3D, c3, 2, "conv343_0", train, dt)
        s.conv(ConvBNReLU3D, c3, 1, "conv343_1", train, dt)
        s.trconv(c2, "conv343_2", train, dt)
        if s.folded != x3_f:
            x3_x = wf.fold_w(x3_x) if s.folded else wf.unfold_w(x3_x)
        s.x = s.x + x3_x

        s.trconv(c1, "trconv32", train, dt)
        if s.folded != x2_f:
            x2_x = wf.fold_w(x2_x) if s.folded else wf.unfold_w(x2_x)
        s.x = s.x + x2_x

        s.trconv(c0, "trconv21", train, dt)
        if s.folded != x1_f:
            x1_x = wf.fold_w(x1_x) if s.folded else wf.unfold_w(x1_x)
        s.x = s.x + x1_x

        out = ProbConv(dtype=dt, name="prob")(s.value(), train=train)
        return nn.softmax(out, axis=1)

    def _dhcw_train_path(self, x, c0, c1, c2, c3):
        """Train: custom-VJP Pallas convs on (B, D, H, C, W) with XLA
        batch-stat BN/ReLU (see RegularNet3Scales._dhcw_train_path)."""
        dt = self.dtype
        assert tuple(self.sample_stride) == (2, 2, 2)

        def conv(name, feats, stride, inp):
            return ConvBNReLU3D(feats, 3, stride, 1, dtype=dt,
                                pallas_eval=True, name=name)(
                inp, True, dhcw=True)

        def trconv(name, feats, inp):
            return TrConvBNReLU3D(feats, 3, 2, 1, 1, dtype=dt,
                                  pallas_eval=True, name=name)(
                inp, True, dhcw=True)

        x1 = conv("conv01", c0, 1, x)
        v = conv("conv12_0", c1, 2, x1)
        x2 = conv("conv12_1", c1, 1, v)
        v = conv("conv23_0", c2, 2, x2)
        x3 = conv("conv23_1", c2, 1, v)
        v = conv("conv343_0", c3, 2, x3)
        v = conv("conv343_1", c3, 1, v)
        v = trconv("conv343_2", c2, v)[:, :x3.shape[1]] + x3
        v = trconv("trconv32", c1, v)[:, :x2.shape[1]] + x2
        v = trconv("trconv21", c0, v)[:, :x1.shape[1]] + x1
        out = ProbConv(dtype=dt, name="prob")(
            jnp.transpose(v, (0, 1, 2, 4, 3)), train=True)
        return nn.softmax(out, axis=1)

    def _dhcw_path(self, x, c0, c1, c2, c3, valid_w=None):
        """Eval: the whole net in the Pallas (B, D, H, C, W) layout, every
        level flowing 128-aligned lane extents (see RegularNet3Scales)."""
        assert self.pallas_eval, "dhcw layout requires pallas_eval"
        _, d, h, _, w_in = x.shape
        vw = valid_w or w_in
        assert h % 8 == 0 and vw % 8 == 0, \
            f"volume H,W must divide 8, got {(h, vw)}"
        assert tuple(self.sample_stride) == (2, 2, 2)
        from mdfnet_tpu.parallel import halo as _halo
        if (d % 8 == 0 and d * c0 in (64, 192)
                and _halo.current_ctx() is None):
            # small-D net: every level folds to the same channel count
            # (64 for stage 2, 192 for stage 1) — run the whole U-Net as
            # 11 conv2d launches (ops/fold2d.py). Under spatial sharding
            # fall through to the per-layer dhcw path, whose conv/trconv
            # modules exchange their own halo rows (fold2d has no band
            # mode).
            return self._fold2d_path(x, c0, c1, c2, c3, vw)
        w1, w2, w3 = vw // 2, vw // 4, vw // 8
        wp = lambda ww: -(-ww // 128) * 128
        dt = self.dtype

        def conv(name, feats, stride, inp, vwl):
            return ConvBNReLU3D(feats, 3, stride, 1, dtype=dt,
                                pallas_eval=True, name=name)(
                inp, False, dhcw=True, valid_w=vwl, keep_wpad=True)

        def trconv(name, feats, inp, vwl):
            return TrConvBNReLU3D(feats, 3, 2, 1, 1, dtype=dt,
                                  pallas_eval=True, name=name)(
                inp, False, dhcw=True, valid_w=vwl, keep_wpad=True)

        x1 = conv("conv01", c0, 1, x, vw)
        v = conv("conv12_0", c1, 2, x1, vw)
        x2 = conv("conv12_1", c1, 1, v, w1)
        v = conv("conv23_0", c2, 2, x2, w1)
        x3 = conv("conv23_1", c2, 1, v, w2)
        v = conv("conv343_0", c3, 2, x3, w2)
        v = conv("conv343_1", c3, 1, v, w3)
        v = trconv("conv343_2", c2, v, w3)[..., :wp(w2)] + x3
        v = trconv("trconv32", c1, v, w2)[..., :wp(w1)] + x2
        v = trconv("trconv21", c0, v, w1)[..., :wp(vw)] + x1
        out = ProbConv(dtype=dt, name="prob")(v, dhcw=True, valid_w=vw)
        return nn.softmax(out, axis=1)

    def _fold2d_path(self, x, c0, c1, c2, c3, vw):
        """Eval, D*c0 == 64: the depth axis folded into channels — the whole
        net runs as stride-1/2 conv2d_fused launches on (B, H, D*C, W) with
        the exactly-equivalent block-banded weights (ops/fold2d.py). The
        transposed convs emit 2x2 spatial phase groups interleaved back on
        the fine grid; parameters keep their conv3d shapes/paths."""
        from mdfnet_tpu.models.layers import (_ConvBNParams, _ConvKernelParam)
        from mdfnet_tpu.ops import fold2d
        from mdfnet_tpu.ops.pallas import conv2d_kernel

        b, d, h, cin, w_in = x.shape
        d1, d2, d3 = d // 2, d // 4, d // 8
        w1, w2, w3 = vw // 2, vw // 4, vw // 8
        dt = self.dtype or x.dtype

        xf = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b, h, d * cin, w_in)
        xf = xf.astype(dt)

        def conv(name, ci, co, din, sd, inp, vwl):
            k, s, o = _ConvBNParams((3, 3, 3, ci, co), ci * 27, co,
                                    name=name)()
            kf = fold2d.fold_conv3d(k.astype(dt), din, sd)
            dout = din // sd
            return conv2d_kernel.conv2d_fused(
                inp, kf, jnp.tile(s, dout), jnp.tile(o, dout), stride=sd,
                valid_w=vwl, keep_wpad=True)

        def trconv(name, ci, co, din, inp, vwl):
            k, s, o = _ConvBNParams((3, 3, 3, co, ci), co * 27, co,
                                    name=name)()
            kf = fold2d.fold_trconv3d(k.astype(dt), din)
            dout = 2 * din
            y = conv2d_kernel.conv2d_fused(
                inp, kf, jnp.tile(s, 4 * dout), jnp.tile(o, 4 * dout),
                valid_w=vwl, keep_wpad=True)
            return fold2d.interleave_2x2(y, dout * co, vwl)

        v1 = conv("conv01", cin, c0, d, 1, xf, vw)
        v = conv("conv12_0", c0, c1, d, 2, v1, vw)
        v2 = conv("conv12_1", c1, c1, d1, 1, v, w1)
        v = conv("conv23_0", c1, c2, d1, 2, v2, w1)
        v3 = conv("conv23_1", c2, c2, d2, 1, v, w2)
        v = conv("conv343_0", c2, c3, d2, 2, v3, w2)
        v = conv("conv343_1", c3, c3, d3, 1, v, w3)
        v = trconv("conv343_2", c3, c2, d3, v, w3) + v3[..., :w2]
        v = trconv("trconv32", c2, c1, d2, v, w2) + v2[..., :w1]
        v = trconv("trconv21", c1, c0, d1, v, w1) + v1[..., :vw]
        pk = _ConvKernelParam((3, 3, 3, c0, 1), c0 * 27, name="prob")()
        kp = fold2d.fold_conv3d(pk.astype(dt), d, 1)
        y = conv2d_kernel.conv2d_fused(
            v, kp, jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32),
            relu=False, valid_w=vw)
        out = jnp.transpose(y, (0, 2, 1, 3)).astype(jnp.float32)
        return nn.softmax(out, axis=1)
