"""Depth refinement head: 1/2-res depth -> full-res via PixelShuffle.

Behavioural twin of reference net/unit/refine.py:8-46 (RefineNet2): detach the
input depth, normalise to [0, 1] by the scene depth range, run residual
blocks, PixelShuffle(2) upsample, denormalise.

Eval fast path (``pallas_eval``): runs in (B, H, C, W) layout through the
fused Pallas conv2d kernel — the XLA path costs ~10 ms at DTU eval res
because the C=1 depth channel and C=8 block channels pad onto the 128-lane
axis. The final 8->1 conv is a ProbConv-style channel contraction (no
(B, H, W, 1) tensor is ever materialised).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import (
    ConvBNReLU, ConvND, Res, TrConvBNReLU, _ConvKernelParam, pixel_shuffle_2x)


class _ResParams(nn.Module):
    """Parameter twin of layers.Res (paths <name>/conv0|conv1/kernel)."""
    features: int

    @nn.compact
    def __call__(self):
        k0 = _ConvKernelParam((3, 3, self.features, self.features),
                              self.features * 9, name="conv0")()
        k1 = _ConvKernelParam((3, 3, self.features, self.features),
                              self.features * 9, name="conv1")()
        return k0, k1


class RefineNet2(nn.Module):
    base_chs: int = 8
    nres: int = 3
    dtype: jnp.dtype | None = None
    pallas_eval: bool = False

    @nn.compact
    def __call__(self, depth, depth_range, train: bool = False,
                 valid_w: int | None = None):
        """
        Args:
            depth: (B, H/2, W/2) half-res depth. Under the fully-fused
                eval path the lane extent may exceed the true width —
                pass ``valid_w`` (the columns beyond it hold softmax junk,
                NOT zeros, and must not leak into the convs).
            depth_range: (B, 2).
        Returns:
            (B, H, W) refined full-res depth.
        """
        from mdfnet_tpu.parallel import halo
        if self.pallas_eval and not train and halo.current_ctx() is None:
            # spatial sharding: XLA path (ConvND exchanges halos; the
            # PixelShuffle is row-local so the band boundary is exact)
            return self._hcw_path(depth, depth_range, valid_w)
        if self.pallas_eval and train:
            # train fast path: the full-res conv stack rides the custom-VJP
            # Pallas conv2d kernels (ops/pallas/conv2d_vjp.py) in hcw layout
            return self._hcw_train_path(depth, depth_range)

        depth = jax.lax.stop_gradient(depth)[..., None]  # (B, H/2, W/2, 1)
        b = depth.shape[0]
        dmin = depth_range[:, 0].astype(depth.dtype).reshape(b, 1, 1, 1)
        dmax = depth_range[:, 1].astype(depth.dtype).reshape(b, 1, 1, 1)
        x = (depth - dmin) / (dmax - dmin)

        x = ConvND(self.base_chs, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv0")(x)
        skip = x
        for i in range(self.nres):
            x = Res(self.base_chs, dtype=self.dtype, name=f"res{i}")(x)
        x = ConvND(self.base_chs, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        x = skip + x
        x = ConvND(self.base_chs * 4, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv2_0")(x)
        x = pixel_shuffle_2x(x)
        x = ConvND(1, (3, 3), 1, 1, use_bias=False, dtype=self.dtype, name="conv2_1")(x)

        x = dmin + x * (dmax - dmin)
        return x[..., 0]

    def _hcw_path(self, depth, depth_range, valid_w=None):
        from mdfnet_tpu.ops.pallas.conv2d_kernel import (
            conv2d_chain_fused, conv2d_fused)
        c = self.base_chs
        dtype = self.dtype or depth.dtype
        depth = jax.lax.stop_gradient(depth)
        b = depth.shape[0]
        dmin = depth_range[:, 0].astype(jnp.float32).reshape(b, 1, 1, 1)
        dmax = depth_range[:, 1].astype(jnp.float32).reshape(b, 1, 1, 1)
        x = ((depth.astype(jnp.float32)[:, :, None, :] - dmin)
             / (dmax - dmin)).astype(dtype)          # (B, H/2, 1, W/2)
        w2v = valid_w or depth.shape[-1]
        if depth.shape[-1] != w2v:
            # the fused pipeline keeps the volume's padded lane extent and
            # its junk columns are softmax mass, not zeros: zero them so
            # the chain's boundary taps see torch zero padding, and drop
            # the extent down to this stage's 128-aligned width
            wp2 = min(-(-w2v // 128) * 128, depth.shape[-1])
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, wp2), 3)
            x = x[..., :wp2] * (lane < w2v).astype(x.dtype)

        ones = jnp.ones((c,), jnp.float32)
        zeros = jnp.zeros((c,), jnp.float32)

        # the whole half-res stack (conv0, 3 Res blocks, conv1 + skip,
        # conv2_0) rides ONE chain launch: 10 kernel dispatches -> 2, the
        # 8 intermediate feature maps never touch HBM, and the Res/skip
        # adds run in-kernel via `residuals`
        align = 4 if dtype == jnp.bfloat16 else 8
        xin = jnp.pad(x, ((0, 0), (0, 0), (0, align - 1), (0, 0)))
        k0 = _ConvKernelParam((3, 3, 1, c), 9, name="conv0")()
        # zero kernel rows match the zero-padded input channels exactly
        k0 = jnp.pad(k0, ((0, 0), (0, 0), (0, align - 1), (0, 0)))
        kernels, scales, offsets = [k0], [ones], [zeros]
        relus, resid = [False], [None]
        for i in range(self.nres):
            ka, kb = _ResParams(c, name=f"res{i}")()
            kernels += [ka, kb]
            # fold the 0.1 residual scale into the second conv's epilogue
            scales += [ones, ones * 0.1]
            offsets += [zeros, zeros]
            relus += [True, False]
            resid += [None, 2 * i]     # Res adds its input (layer 0/2/4)
        k = _ConvKernelParam((3, 3, c, c), c * 9, name="conv1")()
        kernels.append(k)
        scales.append(ones)
        offsets.append(zeros)
        relus.append(False)
        resid.append(0)                # + skip (conv0's output)
        k = _ConvKernelParam((3, 3, c, 4 * c), c * 9, name="conv2_0")()
        kernels.append(k)
        scales.append(jnp.ones((4 * c,), jnp.float32))
        offsets.append(jnp.zeros((4 * c,), jnp.float32))
        relus.append(False)
        resid.append(None)
        x = conv2d_chain_fused(xin, [kk.astype(dtype) for kk in kernels],
                               scales, offsets, th=16,
                               relu_flags=tuple(relus), valid_w=w2v,
                               keep_wpad=True, residuals=tuple(resid))

        # PixelShuffle(2) on (B, H/2, 4C, Wp/2): channel index = c*4+dy*2+dx
        # (junk lanes are zeroed in-kernel, so the interleave stays clean)
        b_, h2, _, wp2 = x.shape
        x = x.reshape(b_, h2, c, 2, 2, wp2)
        x = x.transpose(0, 1, 3, 2, 5, 4)            # (B, H/2, dy, C, W/2, dx)
        x = x.reshape(b_, 2 * h2, c, 2 * wp2)        # (B, H, C, 2*Wp/2)
        # 2*wp2 >= the 128-aligned extent of the true full-res width and the
        # extra columns are zero (the chain masks junk lanes); slice so the
        # final conv sees its expected padded width
        wp_full = -(-2 * w2v // 128) * 128
        if 2 * wp2 != wp_full:
            x = x[..., :wp_full]

        # final 3x3 conv C->1 as 9 shifted channel contractions (no C=1
        # tensor; same trick as regularize.ProbConv)
        k = _ConvKernelParam((3, 3, c, 1), c * 9, name="conv2_1")()
        # single fused kernel for the C->1 full-res conv: the 27-slice XLA
        # tap loop re-read the (B, H, C, W) tensor 9x; conv2d_fused with
        # Co=1 folds ~128 output rows into one matmul and emits (H, 1, W)
        out = conv2d_fused(x, k.astype(dtype),
                           jnp.ones((1,), jnp.float32),
                           jnp.zeros((1,), jnp.float32), relu=False,
                           valid_w=2 * w2v)
        out = out[:, :, 0, :].astype(jnp.float32)    # (B, H, W)
        out = dmin[..., 0] + out * (dmax - dmin)[..., 0]
        return out.astype(depth.dtype)

    def _hcw_train_path(self, depth, depth_range):
        """Train: same module graph as the XLA path (identical param paths),
        every conv a custom-VJP Pallas kernel on (B, H, C, W)."""
        from mdfnet_tpu.ops.pallas.conv2d_vjp import conv2d_train
        c = self.base_chs
        dtype = self.dtype or depth.dtype
        align = 4 if dtype == jnp.bfloat16 else 8
        depth = jax.lax.stop_gradient(depth)
        b = depth.shape[0]
        dmin = depth_range[:, 0].astype(jnp.float32).reshape(b, 1, 1)
        dmax = depth_range[:, 1].astype(jnp.float32).reshape(b, 1, 1)
        x = ((depth.astype(jnp.float32) - dmin)
             / (dmax - dmin)).astype(dtype)[:, :, None, :]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, align - 1), (0, 0)))

        k0 = _ConvKernelParam((3, 3, 1, c), 9, name="conv0")()
        k0 = jnp.pad(k0, ((0, 0), (0, 0), (0, align - 1), (0, 0)))
        v = conv2d_train(x, k0.astype(dtype))
        skip = v
        for i in range(self.nres):
            ka, kb = _ResParams(c, name=f"res{i}")()
            y = nn.relu(conv2d_train(v, ka.astype(dtype)))
            v = v + 0.1 * conv2d_train(y, kb.astype(dtype))
        k1 = _ConvKernelParam((3, 3, c, c), c * 9, name="conv1")()
        v = skip + conv2d_train(v, k1.astype(dtype))
        k20 = _ConvKernelParam((3, 3, c, 4 * c), c * 9, name="conv2_0")()
        v = conv2d_train(v, k20.astype(dtype))      # (B, h, 4c, w)

        bb, h2, _, w2 = v.shape
        v = v.reshape(bb, h2, c, 2, 2, w2)
        v = v.transpose(0, 1, 3, 2, 5, 4)           # (B, h, dy, C, w, dx)
        v = v.reshape(bb, 2 * h2, c, 2 * w2)        # (B, H, C, W)

        k21 = _ConvKernelParam((3, 3, c, 1), c * 9, name="conv2_1")()
        out = conv2d_train(v, k21.astype(dtype))[:, :, 0, :]
        out = dmin + out.astype(jnp.float32) * (dmax - dmin)
        return out.astype(depth.dtype)


class RefineNet(nn.Module):
    """Image-guided refinement head — the reference's unused alternative
    (net/unit/refine.py:49-95): the normalised half-res depth runs through a
    conv + 2x TrConvBNReLU branch, the full-res reference IMAGE through a
    conv branch, and their concatenation regresses a residual added to the
    bilinear-upsampled (align_corners=True) depth.

    Kept as an extension point of the pluggable refinement stage
    (ModelConfig.refine_impl = "refine1"); unlike RefineNet2 it consumes the
    reference image, so its signature carries ``ref_img``.
    """
    base_chs: int = 8
    dtype: jnp.dtype | None = None
    pallas_eval: bool = False  # accepted for interface parity; XLA path only

    @nn.compact
    def __call__(self, ref_img, depth, depth_range, train: bool = False):
        """
        Args:
            ref_img: (B, H, W, 3) full-res reference view.
            depth: (B, H/2, W/2) half-res depth.
            depth_range: (B, 2).
        Returns:
            (B, H, W) refined depth.
        """
        from mdfnet_tpu.ops.sample import resize_bilinear_2x_align_corners

        c = self.base_chs
        depth = jax.lax.stop_gradient(depth)[..., None]  # (B, H/2, W/2, 1)
        b = depth.shape[0]
        dmin = depth_range[:, 0].astype(depth.dtype).reshape(b, 1, 1, 1)
        dmax = depth_range[:, 1].astype(depth.dtype).reshape(b, 1, 1, 1)
        x = (depth - dmin) / (dmax - dmin)

        img = ConvBNReLU(c, dtype=self.dtype, name="conv_img")(ref_img, train)
        d = ConvBNReLU(c, dtype=self.dtype, name="conv_depth0")(x, train)
        d = ConvBNReLU(c, dtype=self.dtype, name="conv_depth1")(d, train)
        d = TrConvBNReLU(c, 3, 2, 1, 1, dtype=self.dtype,
                         name="conv_depth2")(d, train)
        res = ConvBNReLU(c, dtype=self.dtype, name="conv_res0")(
            jnp.concatenate([img, d], axis=-1), train)
        res = ConvND(1, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                     name="conv_res1")(res)

        up = resize_bilinear_2x_align_corners(x[..., 0])[..., None]
        out = up + res
        out = dmin + out * (dmax - dmin)
        return out[..., 0]
