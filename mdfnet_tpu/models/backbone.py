"""FPN feature extractor over 4 scales.

Behavioural twin of reference net/unit/backbone.py:9-66 (FPN_4Scales), NHWC:
strided 5x5 downsampling stacks to 1/2, 1/4, 1/8, then a top-down path of
2x bilinear upsamples + 1x1 lateral adds, emitting
(y4: 1/8 x c3, y3: 1/4 x c2, y2: 1/2 x c1) — coarsest first, matching the
stage order of the cascade.

Eval fast path (``pallas_eval``): the whole trunk runs in (N, H, C, W)
layout — C on sublanes, W on lanes — through the fused Pallas conv2d kernel
(ops/pallas/conv2d_kernel.py). XLA's NHWC convs measured 0.4-2.6 TF/s on
these small-C layers on a v5e (128-lane padding); the hcw layout removes the
padding entirely. Outputs are returned in (N, H, C, W) when the fast path is
active — CoreNet consumes them layout-aware.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import (
    ConvBNReLU, ConvND, _ConvKernelBiasParam)
from mdfnet_tpu.ops.sample import resize_bilinear_2x


class _CBRParams(nn.Module):
    """ConvBNReLU-compatible param/stat holder: declares the same
    name/conv/kernel + name/bn/{scale,bias} (+ batch_stats) tree so the
    chain-fused trunk shares checkpoints with the per-layer modules."""
    features: int
    kernel_size: int
    in_ch: int

    @nn.compact
    def __call__(self):
        from mdfnet_tpu.models.layers import _BNParams, _ConvKernelParam
        ks, ci = self.kernel_size, self.in_ch
        kernel = _ConvKernelParam((ks, ks, ci, self.features), ci * ks * ks,
                                  name="conv")()
        scale, bias, mean, var = _BNParams(self.features, name="bn")()
        return kernel, scale, bias, mean, var


class FPN4Scales(nn.Module):
    out_chs: Tuple[int, int, int, int] = (8, 16, 32, 64)
    dtype: jnp.dtype | None = None
    # eval-only (N, H, C, W) Pallas trunk; outputs come back in that layout
    pallas_eval: bool = False
    # emit outputs at their 128-aligned lane extent with ZEROED pad columns
    # (for the fused rowsweep consumer: zero features == grid_sample zeros,
    # so the aggregate kernel skips its host-side pad copies)
    keep_wpad: bool = False
    # emit the G-channel PAIR-DIFFERENCE features (even minus odd output
    # channels) instead of the C-channel features: the fused aggregation
    # consumes only sigma(pair diffs), so differencing the 1x1 out-conv
    # KERNELS emits exactly what is needed — half the output traffic and
    # no strided channel slice downstream (exact: the conv is linear)
    emit_diffs: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, vgroups: int = 1):
        from mdfnet_tpu.parallel import halo
        c0, c1, c2, c3 = self.out_chs
        if self.pallas_eval and not train and halo.current_ctx() is None:
            # spatial sharding falls through to the XLA path (NHWC, halo
            # exchanges via ConvND) — the chain-fused trunk kernels have no
            # band-halo handling; CoreNet detects the layout via the ctx
            return self._hcw_path(x)

        # bottom-up. ``vgroups`` > 1 (train): x stacks that many views
        # view-major along the batch axis and BatchNorm statistics are
        # computed per view — exactly equivalent to the reference's per-view
        # backbone calls (net/core.py:42) but with every conv batched 5x.
        # With pallas_eval in TRAIN mode the trunk rides the custom-VJP
        # Pallas conv2d kernels in (N, H, C, W) layout (ops/pallas/
        # conv2d_vjp.py); the small top-down tail below stays XLA/NHWC.
        use_pallas_train = self.pallas_eval and train

        def cbr(name, feats, ks, stride, inp, in_ch=None):
            return ConvBNReLU(feats, ks, stride, dtype=self.dtype,
                              name=name)(inp, train, hcw=use_pallas_train,
                                         vgroups=vgroups, in_ch=in_ch)

        if use_pallas_train:
            dtype = self.dtype or x.dtype
            align = 4 if dtype == jnp.bfloat16 else 8
            logical_ci = x.shape[-1]
            x = jnp.transpose(x, (0, 1, 3, 2)).astype(dtype)  # (N, H, C, W)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, align - x.shape[2]),
                            (0, 0)))
            first_in = logical_ci
        else:
            first_in = None

        x = cbr("conv01_0", c0, 3, 1, x, in_ch=first_in)
        x = cbr("conv01_1", c0, 3, 1, x)
        x = cbr("conv12_0", c1, 5, 2, x)
        x = cbr("conv12_1", c1, 3, 1, x)
        x2 = cbr("conv12_2", c1, 3, 1, x)
        x = cbr("conv23_0", c2, 5, 2, x2)
        x = cbr("conv23_1", c2, 3, 1, x)
        x3 = cbr("conv23_2", c2, 3, 1, x)
        x = cbr("conv34_0", c3, 5, 2, x3)
        x = cbr("conv34_1", c3, 3, 1, x)
        x4 = cbr("conv34_2", c3, 3, 1, x)

        if use_pallas_train:
            # top-down tail consumes NHWC (lat/out 1x1 convs + bilinear
            # upsamples — small tensors at 1/8..1/2 res)
            x2, x3, x4 = (jnp.transpose(t, (0, 1, 3, 2))
                          for t in (x2, x3, x4))

        # top-down (bilinear 2x is a fixed stencil, see ops/sample.py)
        def up2(v):  # NHWC -> upsample H, W
            return resize_bilinear_2x(v.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)

        y4 = ConvND(c3, (1, 1), use_bias=False, dtype=self.dtype, name="out4")(x4)
        x3 = up2(x4) + ConvND(c3, (1, 1), use_bias=True, dtype=self.dtype, name="lat3")(x3)
        y3 = ConvND(c2, (1, 1), use_bias=False, dtype=self.dtype, name="out3")(x3)
        x2 = up2(x3) + ConvND(c3, (1, 1), use_bias=True, dtype=self.dtype, name="lat2")(x2)
        y2 = ConvND(c1, (1, 1), use_bias=False, dtype=self.dtype, name="out2")(x2)

        return y4, y3, y2

    def _conv1x1_hcw(self, v, features: int, name: str, use_bias: bool,
                     valid_w: int | None = None, keep_wpad: bool = False,
                     diff: bool = False):
        """1x1 conv on (N, H, C, W) with ConvND-compatible param paths.

        ``diff``: convolve with kernel[..., 0::2] - kernel[..., 1::2] —
        emits the features//2 channel-pair differences directly."""
        from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused
        ci = v.shape[2]
        kernel, bias = _ConvKernelBiasParam((1, 1, ci, features), ci,
                                            use_bias, name=name)()
        offset = (bias.astype(jnp.float32) if use_bias
                  else jnp.zeros((features,), jnp.float32))
        if diff:
            assert not use_bias
            kernel = kernel[..., 0::2] - kernel[..., 1::2]
            offset = offset[:features // 2]
            features = features // 2
        dtype = self.dtype or v.dtype
        return conv2d_fused(v, kernel.astype(dtype),
                            jnp.ones((features,), jnp.float32), offset,
                            relu=False, valid_w=valid_w, keep_wpad=keep_wpad)

    def _chain(self, names_feats_ks, inp, logical_ci: int | None = None,
               valid_w: int | None = None, keep_wpad: bool = False,
               final_stride: int = 1):
        """Consecutive stride-1 ConvBNReLUs (optionally ending in a stride-2
        downsampling conv) as ONE fused Pallas pass (ops/pallas/
        conv2d_kernel.py conv2d_chain_fused): intermediates never touch
        HBM. Parameter paths stay identical to the per-layer modules, so
        checkpoints/.pth import are unaffected."""
        from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_chain_fused
        dtype = self.dtype or inp.dtype
        kernels, scales, offsets = [], [], []
        cis = logical_ci or inp.shape[2]
        for name, feats, ks in names_feats_ks:
            kernel, scale, bias, mean, var = _CBRParams(
                feats, ks, cis, name=name)()
            if cis != inp.shape[2] and not kernels:
                # input was channel-padded for DMA alignment; the padded
                # channels are zero, so zero kernel rows match exactly
                kernel = jnp.pad(kernel, ((0, 0), (0, 0),
                                          (0, inp.shape[2] - cis), (0, 0)))
            fs = scale.astype(jnp.float32) * jax.lax.rsqrt(
                var.astype(jnp.float32) + 1e-5)
            fo = bias.astype(jnp.float32) - mean.astype(jnp.float32) * fs
            kernels.append(kernel.astype(dtype))
            scales.append(fs)
            offsets.append(fo)
            cis = feats
        return conv2d_chain_fused(inp.astype(dtype), kernels, scales,
                                  offsets, valid_w=valid_w,
                                  keep_wpad=keep_wpad,
                                  final_stride=final_stride)

    def _hcw_path(self, x):
        c0, c1, c2, c3 = self.out_chs
        dtype = self.dtype or x.dtype
        # channels + lanes padded to the DMA-aligned extents ONCE on the
        # cheap raw image; every downstream tensor then flows through the
        # fused kernels at its 128-aligned lane width (keep_wpad) with the
        # true width tracked as valid_w — no per-layer host pad copies
        align = 4 if dtype == jnp.bfloat16 else 8
        w0 = x.shape[2]
        w1 = -(-w0 // 2)
        w2 = -(-w1 // 2)
        w3 = -(-w2 // 2)
        wps = {w: -(-w // 128) * 128 for w in (w0, w1, w2, w3)}
        v = jnp.transpose(x, (0, 1, 3, 2)).astype(dtype)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, align - v.shape[2]),
                        (0, wps[w0] - w0)))

        def cbr(name, feats, ks, stride, inp, vw):
            return ConvBNReLU(feats, ks, stride, dtype=self.dtype,
                              name=name)(inp, False, hcw=True, valid_w=vw,
                                         keep_wpad=True)

        # the full-res trunk + the 1/2 downsampling conv fuse into ONE
        # launch: the c0-channel FULL-RES feature map (the largest tensor
        # in the whole forward) never reaches HBM
        v = self._chain([("conv01_0", c0, 3), ("conv01_1", c0, 3),
                         ("conv12_0", c1, 5)], v,
                        logical_ci=x.shape[3], valid_w=w0, keep_wpad=True,
                        final_stride=2)
        x2 = self._chain([("conv12_1", c1, 3), ("conv12_2", c1, 3)], v,
                         valid_w=w1, keep_wpad=True)
        v = cbr("conv23_0", c2, 5, 2, x2, w1)
        x3 = self._chain([("conv23_1", c2, 3), ("conv23_2", c2, 3)], v,
                         valid_w=w2, keep_wpad=True)
        v = cbr("conv34_0", c3, 5, 2, x3, w2)
        x4 = self._chain([("conv34_1", c3, 3), ("conv34_2", c3, 3)], v,
                         valid_w=w3, keep_wpad=True)

        def _up2_axis(v, axis, vw=None):
            # 2x bilinear along one axis (0.25/0.75 half-pixel stencil,
            # edge-replicated) without transposing to put it last. With a
            # junk-padded lane extent, the true right edge (col vw-1) must
            # replicate itself instead of reading the junk column.
            n = v.shape[axis]
            sl = lambda a, b: jax.lax.slice_in_dim(v, a, b, axis=axis)
            left = jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis=axis)
            right = jnp.concatenate([sl(1, n), sl(n - 1, n)], axis=axis)
            if vw is not None and vw < n:
                iota = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
                right = jnp.where(iota == vw - 1, v, right)
            even = 0.75 * v + 0.25 * left
            odd = 0.75 * v + 0.25 * right
            out = jnp.stack([even, odd], axis=axis + 1)
            return out.reshape(v.shape[:axis] + (2 * n,)
                               + v.shape[axis + 1:])

        def up2(v, vw):  # (N, H, C, W): upsample axes 1 and 3
            return _up2_axis(_up2_axis(v, 1), 3, vw)

        # --- linearised top-down path ---
        # The reference composition materialises three c3-channel tensors at
        # 1/2 res (up2(x3s), lat2(x2), their sum ~340 MB each at DTU eval
        # size) before out2 reduces to c1 — ~1.3 GB of HBM traffic for the
        # one output that survives. Both up2 (spatial, per-channel) and the
        # 1x1 convs (per-pixel, linear) commute, so the whole path
        # re-associates EXACTLY so that the out-convs apply FIRST, at the
        # coarsest resolution, and only c1/c2-channel (or G-channel under
        # emit_diffs) tensors are ever upsampled:
        #   y3 = out3(up2(x4) + lat3(x3)) = up2(out3 x4) + (out3.lat3) x3
        #   y2 = up2(up2(out2 x4) + (out2.lat3) x3) + (out2.lat2) x2
        # with the lat biases folded into the composed convs' offsets.
        # Reference: net/unit/backbone.py:40-66 (the unfused composition).
        kw = self.keep_wpad
        ed = self.emit_diffs
        dtype = self.dtype or x.dtype
        K4, _ = _ConvKernelBiasParam((1, 1, c3, c3), c3, False, name="out4")()
        K3, _ = _ConvKernelBiasParam((1, 1, c3, c2), c3, False, name="out3")()
        K2, _ = _ConvKernelBiasParam((1, 1, c3, c1), c3, False, name="out2")()
        L3, b3 = _ConvKernelBiasParam((1, 1, c2, c3), c2, True, name="lat3")()
        L2, b2 = _ConvKernelBiasParam((1, 1, c1, c3), c1, True, name="lat2")()

        def diffk(k):
            return k[..., 0::2] - k[..., 1::2] if ed else k

        K4d, K3d, K2d = diffk(K4), diffk(K3), diffk(K2)
        L3f = L3[0, 0].astype(jnp.float32)
        L2f = L2[0, 0].astype(jnp.float32)

        def compose(lat, bias, out_k):
            ko = out_k[0, 0].astype(jnp.float32)
            m = (lat @ ko)[None, None]                # (1, 1, ci, co')
            off = bias.astype(jnp.float32) @ ko       # (co',)
            return m, off

        M3, off3 = compose(L3f, b3, K3d)
        N3, offn3 = compose(L3f, b3, K2d)
        M2, off2 = compose(L2f, b2, K2d)

        from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused

        def run1x1(v, kernel, offset, vw, kwl):
            co = kernel.shape[-1]
            return conv2d_fused(v, kernel.astype(dtype),
                                jnp.ones((co,), jnp.float32), offset,
                                relu=False, valid_w=vw, keep_wpad=kwl)

        def mask_junk(y, vw_true):
            # the up2 stencil leaks 0.25*edge into the first junk column;
            # fused consumers need zeroed junk (zero features = grid_sample
            # zeros), so re-mask after the add
            if y.shape[-1] > vw_true:
                lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 3)
                y = jnp.where(lane < vw_true, y, jnp.zeros((), y.dtype))
            return y

        # same-input convs ride ONE kernel with concatenated out channels
        n4, n3 = K4d.shape[-1], K3d.shape[-1]
        kcat = jnp.concatenate([K4d, K3d, K2d], axis=-1)
        v4 = run1x1(x4, kcat, jnp.zeros((kcat.shape[-1],), jnp.float32),
                    w3, True)
        y4, t3, u2 = v4[:, :, :n4], v4[:, :, n4:n4 + n3], v4[:, :, n4 + n3:]
        m3 = M3.shape[-1]
        acat = jnp.concatenate([M3, N3], axis=-1)
        a = run1x1(x3, acat, jnp.concatenate([off3, offn3]), w2, True)
        a3, an3 = a[:, :, :m3], a[:, :, m3:]
        y3 = mask_junk(up2(t3, w3)[:, :, :, :wps[w2]] + a3, w2)
        s2 = mask_junk(up2(u2, w3)[:, :, :, :wps[w2]] + an3, w2)
        a2 = run1x1(x2, M2, off2, w1, True)
        y2 = mask_junk(up2(s2, w2)[:, :, :, :wps[w1]] + a2, w1)
        if not kw:
            y4 = y4[..., :w3]
            y3 = y3[..., :w2]
            y2 = y2[..., :w1]
        return y4, y3, y2
