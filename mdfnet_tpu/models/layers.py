"""NN building blocks with torch-compatible semantics, channels-last for TPU.

Every module here is designed so that (a) a torch state_dict from the
reference can be imported losslessly (see utils/pth_import.py) and (b) fresh
initialisation draws from the same distributions torch's defaults use, making
retraining comparable. Layout is NHWC / NDHWC throughout — XLA's preferred
TPU layout — with weights stored HWIO / DHWIO.

torch-default init reproduced here: Conv weights ~ kaiming_uniform(a=sqrt(5)),
which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with
fan_in = in_channels * prod(kernel); bias the same bound. BatchNorm scale=1,
bias=0, running stats (0, 1).
"""
from __future__ import annotations

import math

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _dimension_numbers(ndim: int):
    """Channels-last conv dimension numbers for ndim spatial dims (2 or 3)."""
    spatial = "DHW"[-ndim:] if ndim <= 3 else None
    return (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")


def _torch_conv_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvND(nn.Module):
    """N-d convolution (channels-last) matching torch Conv{2,3}d defaults.

    Weight layout (*kernel, in_ch, out_ch); symmetric zero padding.
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ndim = len(self.kernel_size)
        strides = (self.strides,) * ndim if isinstance(self.strides, int) else tuple(self.strides)
        pads = (self.padding,) * ndim if isinstance(self.padding, int) else tuple(self.padding)
        in_ch = x.shape[-1]
        fan_in = in_ch * math.prod(self.kernel_size)

        kernel = self.param("kernel", _torch_conv_init(fan_in),
                            tuple(self.kernel_size) + (in_ch, self.features))
        dtype = self.dtype or x.dtype
        dn = _dimension_numbers(ndim)
        pad_cfg = [(p, p) for p in pads]

        from mdfnet_tpu.parallel import halo
        ctx = halo.current_ctx()
        if ctx is not None:
            # spatial sharding: exchange the H padding rows with mesh
            # neighbours and convolve unpadded on H — zero fill at global
            # edges equals the zero padding the unsharded conv applies
            h_spatial = ndim - 2          # H within the spatial dims
            ph = pads[h_spatial]
            if ph > 0:
                x = halo.halo_exchange(x, h_axis=1 + h_spatial, lo=ph, hi=ph,
                                       edge="zero")
                pad_cfg[h_spatial] = (0, 0)

        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=strides,
            padding=pad_cfg,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTransposeND(nn.Module):
    """N-d transposed convolution exactly matching torch ConvTranspose{2,3}d.

    torch's transposed conv is the gradient of a forward conv: equivalent to a
    forward conv on the input dilated by ``stride`` with spatially-flipped
    kernels and per-side padding (k-1-p, k-1-p+output_padding). Weight stored
    as (*kernel, out_ch, in_ch) so the flip + channel-swap is explicit.

    torch init for ConvTranspose uses fan_in = out_channels * prod(kernel)
    (weight.size(1) * receptive_field in torch's _calculate_fan_in).
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    output_padding: Sequence[int] | int = 0
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ndim = len(self.kernel_size)
        strides = (self.strides,) * ndim if isinstance(self.strides, int) else tuple(self.strides)
        pads = (self.padding,) * ndim if isinstance(self.padding, int) else tuple(self.padding)
        opads = (self.output_padding,) * ndim if isinstance(self.output_padding, int) \
            else tuple(self.output_padding)
        in_ch = x.shape[-1]
        fan_in = self.features * math.prod(self.kernel_size)

        kernel = self.param("kernel", _torch_conv_init(fan_in),
                            tuple(self.kernel_size) + (self.features, in_ch))
        dtype = self.dtype or x.dtype

        # flip spatial dims, swap (out, in) -> HWIO for the forward conv
        k = jnp.flip(kernel, axis=tuple(range(ndim)))
        k = jnp.swapaxes(k, -1, -2)  # (*kernel, in_ch, out_ch)

        pad_cfg = [(ks - 1 - p, ks - 1 - p + op)
                   for ks, p, op in zip(self.kernel_size, pads, opads)]
        dn = _dimension_numbers(ndim)

        from mdfnet_tpu.parallel import halo
        ctx = halo.current_ctx()
        if ctx is not None:
            # spatial sharding on H. For the U-Nets' (k=3, s=2, p=1, op=1)
            # upsampling combo, out[2i] depends on x[i] only and out[2i+1] on
            # x[i], x[i+1]: one below-neighbour row suffices, and the local
            # dilated band then needs exactly one leading zero (the global
            # (1, 2) padding's tail rows belong to the last device, where the
            # ppermute zero fill reproduces them).
            h_sp = ndim - 2
            sh, kh, ph, oph = (strides[h_sp], self.kernel_size[h_sp],
                               pads[h_sp], opads[h_sp])
            if sh == 1:
                lo, hi = kh - 1 - ph, kh - 1 - ph + oph
                if lo or hi:
                    x = halo.halo_exchange(x, 1 + h_sp, lo=lo, hi=hi,
                                           edge="zero")
                pad_cfg[h_sp] = (0, 0)
            else:
                assert (sh, kh, ph, oph) == (2, 3, 1, 1), (
                    "spatial sharding supports the U-Net transposed-conv "
                    "combo only")
                x = halo.halo_exchange(x, 1 + h_sp, lo=0, hi=1, edge="zero")
                pad_cfg[h_sp] = (1, 0)

        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k.astype(dtype),
            window_strides=(1,) * ndim,
            padding=pad_cfg,
            lhs_dilation=strides,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm over the channel (last) axis with torch semantics.

    - normalises with biased batch variance, eps=1e-5;
    - running stats updated with momentum 0.1 and *unbiased* batch variance
      (torch's running_var convention);
    - stats always computed in f32 (bf16-safe), output cast back.

    Under data parallelism the train step is jitted with global-batch
    semantics, so ``jnp.mean``/``jnp.var`` here reduce over the FULL batch —
    BN statistics are effectively synchronised across the mesh (XLA inserts
    the collectives). This deliberately deviates from the reference, whose
    torch.nn.DataParallel computes per-replica stats as an artifact of
    replicate-scatter execution (SURVEY.md §7 hard part 5); synced stats are
    the mathematically cleaner choice and are what tests/test_train.py's
    multi-device BN test pins down. See parallel/mesh.py for the mesh docs.
    """
    momentum: float = 0.1
    epsilon: float = 1e-5
    # fold > 1: x's channel axis holds `fold` width-folded copies of the true
    # channels (ws-major, see ops/wfold.py); params stay true-channel-shaped.
    fold: int = 1

    @nn.compact
    def __call__(self, x, train: bool, vgroups: int = 1,
                 dhcw: bool = False):
        if dhcw:
            # channel axis is -2 ((B, D, H, C, W) Pallas-layout volumes and
            # (N, H, C, W) hcw feature maps): statistics over all other
            # axes, computed in f32 like below
            assert self.fold == 1
            ch = x.shape[-2]
            scale = self.param("scale", nn.initializers.ones, (ch,))
            bias = self.param("bias", nn.initializers.zeros, (ch,))
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((ch,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((ch,), jnp.float32))
            xf = x.astype(jnp.float32)
            if train and vgroups > 1:
                # per-view statistics on a view-major stacked batch — the
                # channel-last branch below, transplanted to axis -2 (see
                # its sequential-EMA derivation)
                assert x.shape[0] % vgroups == 0
                vb = x.shape[0] // vgroups
                xs = xf.reshape((vgroups, vb) + xf.shape[1:])
                axes = tuple(a for a in range(1, xs.ndim) if a != xs.ndim - 2)
                mean_v = jnp.mean(xs, axis=axes)               # (V, ch)
                var_v = jnp.var(xs, axis=axes)
                if not self.is_initializing():
                    m = self.momentum
                    n = x.size // (ch * vgroups)
                    unb_v = var_v * (n / max(n - 1, 1))
                    w = m * (1.0 - m) ** jnp.arange(vgroups - 1, -1, -1,
                                                    dtype=jnp.float32)
                    ra_mean.value = ((1.0 - m) ** vgroups * ra_mean.value
                                     + w @ mean_v)
                    ra_var.value = ((1.0 - m) ** vgroups * ra_var.value
                                    + w @ unb_v)
                bshape = (vgroups,) + (1,) * (xs.ndim - 3) + (ch, 1)
                inv = jax.lax.rsqrt(var_v.reshape(bshape) + self.epsilon)
                y = ((xs - mean_v.reshape(bshape)) * inv
                     * scale.astype(jnp.float32)[:, None]
                     + bias.astype(jnp.float32)[:, None])
                return y.reshape(x.shape).astype(x.dtype)
            axes = tuple(a for a in range(x.ndim) if a != x.ndim - 2)
            if train:
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
                if not self.is_initializing():
                    n = x.size // ch
                    unbiased = var * (n / max(n - 1, 1))
                    ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                     + self.momentum * mean)
                    ra_var.value = ((1 - self.momentum) * ra_var.value
                                    + self.momentum * unbiased)
            else:
                mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon)[:, None]
            y = ((xf - mean[:, None]) * inv
                 * scale.astype(jnp.float32)[:, None]
                 + bias.astype(jnp.float32)[:, None])
            return y.astype(x.dtype)
        ch = x.shape[-1] // self.fold
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((ch,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((ch,), jnp.float32))

        xf = x.astype(jnp.float32)
        if train and vgroups > 1:
            # x stacks `vgroups` independent "calls" along a MAJOR leading
            # axis (e.g. the view axis of the train backbone): statistics are
            # computed per group, exactly as `vgroups` sequential calls
            # would, and the running stats receive the closed form of the
            # sequential EMA: ra <- (1-m)^V ra + m * sum_v (1-m)^(V-1-v) s_v.
            assert self.fold == 1 and x.shape[0] % vgroups == 0
            vb = x.shape[0] // vgroups
            xs = xf.reshape((vgroups, vb) + xf.shape[1:])
            axes = tuple(range(1, xs.ndim - 1))
            mean_v = jnp.mean(xs, axis=axes)                       # (V, ch)
            var_v = jnp.var(xs, axis=axes)
            if not self.is_initializing():
                m = self.momentum
                n = x.size // (ch * vgroups)
                unb_v = var_v * (n / max(n - 1, 1))
                w = m * (1.0 - m) ** jnp.arange(vgroups - 1, -1, -1,
                                                dtype=jnp.float32)
                ra_mean.value = ((1.0 - m) ** vgroups * ra_mean.value
                                 + w @ mean_v)
                ra_var.value = ((1.0 - m) ** vgroups * ra_var.value
                                + w @ unb_v)
            bshape = (vgroups,) + (1,) * (xs.ndim - 2) + (ch,)
            inv = jax.lax.rsqrt(var_v.reshape(bshape) + self.epsilon)
            y = ((xs - mean_v.reshape(bshape)) * inv
                 * scale.astype(jnp.float32) + bias.astype(jnp.float32))
            return y.reshape(x.shape).astype(x.dtype)
        if train:
            if self.fold > 1:
                xs = xf.reshape(xf.shape[:-1] + (self.fold, ch))
                axes = tuple(range(xs.ndim - 1))
                mean = jnp.mean(xs, axis=axes)
                var = jnp.var(xs, axis=axes)
            else:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                n = x.size // ch
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        if self.fold > 1:
            mean = jnp.tile(mean, self.fold)
            var = jnp.tile(var, self.fold)
            scale = jnp.tile(scale, self.fold)
            bias = jnp.tile(bias, self.fold)
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (xf - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class ConvBNReLU(nn.Module):
    """Conv2d (no bias) + BN + ReLU. Twin of reference net/unit/base.py:7-26.

    Note: like the reference, the padding actually applied is
    (kernel_size - 1) // 2 regardless of the ``padding`` argument
    (base.py:18 hardcodes it).

    ``hcw=True`` (eval only): input/output are (N, H, C, W) — C on sublanes,
    W on lanes — and the layer runs as a fused Pallas conv with BN folded
    (ops/pallas/conv2d_kernel.py). Same parameter paths as the XLA path.
    """
    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, hcw: bool = False,
                 valid_w: int | None = None, keep_wpad: bool = False,
                 vgroups: int = 1, in_ch: int | None = None):
        if hcw and train:
            # train fast path (mirrors ConvBNReLU3D's): custom-VJP Pallas
            # conv (ops/pallas/conv2d_vjp.py) + batch-stat BN/ReLU in XLA
            # on the compact (N, H, C, W) layout. ``in_ch``: logical input
            # channels when x carries zero-padded alignment channels (the
            # kernel keeps its true (k, k, in_ch, Co) checkpoint shape and
            # grows zero rows to match).
            from mdfnet_tpu.ops.pallas.conv2d_vjp import conv2d_train
            ci = in_ch or x.shape[2]
            ks = self.kernel_size
            kernel = _ConvKernelParam((ks, ks, ci, self.features),
                                      ci * ks * ks, name="conv")()
            if ci != x.shape[2]:
                kernel = jnp.pad(kernel, ((0, 0), (0, 0),
                                          (0, x.shape[2] - ci), (0, 0)))
            dtype = self.dtype or x.dtype
            y = conv2d_train(x.astype(dtype), kernel.astype(dtype),
                             self.strides)
            y = BatchNorm(name="bn")(y, train, vgroups, dhcw=True)
            return nn.relu(y)
        if hcw:
            return self._hcw_path(x, valid_w, keep_wpad)
        x = ConvND(self.features, (self.kernel_size,) * 2, self.strides,
                   (self.kernel_size - 1) // 2, use_bias=False, dtype=self.dtype,
                   name="conv")(x)
        x = BatchNorm(name="bn")(x, train, vgroups)
        return nn.relu(x)

    def _hcw_path(self, x, valid_w=None, keep_wpad=False):
        from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused
        ci = x.shape[2]
        ks = self.kernel_size
        kernel = _ConvKernelParam((ks, ks, ci, self.features), ci * ks * ks,
                                  name="conv")()
        scale, bias, mean, var = _BNParams(self.features, name="bn")()
        fscale = scale.astype(jnp.float32) * jax.lax.rsqrt(
            var.astype(jnp.float32) + 1e-5)
        foffset = bias.astype(jnp.float32) - mean.astype(jnp.float32) * fscale
        dtype = self.dtype or x.dtype
        return conv2d_fused(x.astype(dtype), kernel.astype(dtype), fscale,
                            foffset, stride=self.strides, relu=True,
                            valid_w=valid_w, keep_wpad=keep_wpad)


class TrConvBNReLU(nn.Module):
    """ConvTranspose2d + BN + ReLU. Twin of reference net/unit/base.py:28-47
    (present-but-unused there; kept as an extension point — RefineNet v1
    uses it for its 2x depth upsampling branch)."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvTransposeND(self.features, (self.kernel_size,) * 2,
                            self.strides, self.padding, self.output_padding,
                            use_bias=self.use_bias, dtype=self.dtype,
                            name="conv")(x)
        x = BatchNorm(name="bn")(x, train)
        return nn.relu(x)


class ConvBNReLU3D(nn.Module):
    """Conv3d (no bias) + BN + ReLU. Twin of reference net/unit/base.py:50-69.

    With ``wfold`` the input/output are width-folded (B, D, H, W/4, 4C) and
    the conv runs with the exactly-equivalent folded kernel (ops/wfold.py) —
    4x-larger channel dims fill the TPU lanes these small-C volumes would
    otherwise waste. Parameters keep their unfolded conv shapes/paths."""
    features: int
    kernel_size: int = 3
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 1
    dtype: jnp.dtype | None = None
    wfold: bool = False
    # eval-only fused Pallas conv (ops/pallas/conv3d_kernel.py): C-on-sublane
    # layout, BN folded in-kernel; falls back to XLA when training or when
    # the layer shape is unsupported (stride != 1 or kernel != 3)
    pallas_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dhcw: bool = False,
                 valid_w: int | None = None, keep_wpad: bool = False):
        if self.pallas_eval and not self.wfold:
            s = ((self.strides,) * 3 if isinstance(self.strides, int)
                 else tuple(self.strides))
            if (not train) and self.kernel_size == 3 and s in ((1, 1, 1),
                                                               (2, 2, 2)):
                return self._pallas_path(x, s[0], dhcw, valid_w, keep_wpad)
            if (train and dhcw and self.kernel_size == 3
                    and s in ((1, 1, 1), (2, 2, 2))):
                # train fast path: Pallas conv with a custom VJP
                # (ops/pallas/conv3d_vjp.py) + batch-stat BN/ReLU in XLA on
                # the compact (B, D, H, C, W) layout
                from mdfnet_tpu.ops.pallas.conv3d_vjp import conv3d_train
                ci = x.shape[3]
                kernel = _ConvKernelParam((3, 3, 3, ci, self.features),
                                          ci * 27, name="conv")()
                dtype = self.dtype or x.dtype
                y = conv3d_train(x.astype(dtype), kernel.astype(dtype), s[0])
                y = BatchNorm(name="bn")(y, train, dhcw=True)
                return nn.relu(y)
        assert not dhcw, "dhcw layout requires the pallas_eval path"

        if not self.wfold:
            x = ConvND(self.features, (self.kernel_size,) * 3, self.strides,
                       self.padding, use_bias=False, dtype=self.dtype,
                       name="conv")(x)
            x = BatchNorm(name="bn")(x, train)
            return nn.relu(x)

        from mdfnet_tpu.ops import wfold as wf
        assert self.kernel_size == 3 and (
            self.padding == 1 or tuple(self.padding) == (1, 1, 1))
        return self._wfold_path(x, train)

    def _pallas_path(self, x, stride: int = 1, dhcw: bool = False,
                     valid_w=None, keep_wpad=False):
        """Eval: fused Pallas conv with folded BN. Declares the exact same
        parameter/stat structure as the ConvND+BatchNorm path.

        ``dhcw``: input/output are (B, D, H, C, W) — no per-layer transposes
        (the whole U-Net runs in the kernel's native layout).

        Spatial sharding (halo ctx active): the H band is extended with
        neighbour rows — 1/1 for stride 1, 2/1 for stride 2 (output row k
        reads global rows 2k-1..2k+1; with the band shifted 2 rows up,
        kernel row k+1 reads exactly them) — the kernel runs band-local,
        and the rows its own zero padding corrupts are sliced off. Edge
        devices' zero fill reproduces the global conv's zero padding."""
        from mdfnet_tpu.ops.pallas.conv3d_kernel import conv3d_bn_relu
        from mdfnet_tpu.parallel import halo
        ci = x.shape[3] if dhcw else x.shape[-1]
        b = x.shape[0]
        co = self.features
        kernel = _ConvKernelParam((3, 3, 3, ci, co), ci * 27, name="conv")()
        scale, bias, mean, var = _BNParams(co, name="bn")()

        fscale = scale.astype(jnp.float32) * jax.lax.rsqrt(
            var.astype(jnp.float32) + 1e-5)
        foffset = bias.astype(jnp.float32) - mean.astype(jnp.float32) * fscale

        ctx = halo.current_ctx()
        band_out = None
        if ctx is not None:
            band_out = x.shape[2] // stride
            x = halo.halo_exchange(x, h_axis=2,
                                   lo=(1 if stride == 1 else 2), hi=1,
                                   edge="zero")

        dtype = self.dtype or x.dtype
        outs = []
        for bi in range(b):  # eval runs B=1
            xi = (x[bi] if dhcw
                  else jnp.transpose(x[bi], (0, 1, 3, 2))).astype(dtype)
            y = conv3d_bn_relu(xi, kernel, fscale, foffset, stride=stride,
                               valid_w=valid_w, keep_wpad=keep_wpad)
            if ctx is not None:
                y = jax.lax.slice_in_dim(y, 1, 1 + band_out, axis=1)
            outs.append(y if dhcw else jnp.transpose(y, (0, 1, 3, 2)))
        return jnp.stack(outs)

    def _wfold_path(self, x, train):
        from mdfnet_tpu.ops import wfold as wf
        s = ((self.strides,) * 3 if isinstance(self.strides, int)
             else tuple(self.strides))
        assert s[0] == s[1] == s[2], "wfold expects isotropic stride"
        ci = x.shape[-1] // wf.F
        kernel_holder = _ConvKernelParam((3, 3, 3, ci, self.features),
                                         ci * 27, name="conv")
        kernel = kernel_holder()
        kf = wf.fold_conv_kernel(kernel, stride_w=s[0])
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kf.astype(dtype), window_strides=s,
            padding=[(1, 1)] * 3, dimension_numbers=_dimension_numbers(3))
        y = BatchNorm(name="bn", fold=wf.F)(y, train)
        return nn.relu(y)


class _ConvKernelParam(nn.Module):
    """Bare conv kernel parameter at path <name>/kernel (ConvND-compatible)."""
    shape: tuple
    fan_in: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", _torch_conv_init(self.fan_in), self.shape)


class _ConvKernelBiasParam(nn.Module):
    """Conv kernel (+ optional bias) at paths <name>/kernel, <name>/bias —
    ConvND-compatible, for fused paths that bypass ConvND."""
    shape: tuple
    fan_in: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _torch_conv_init(self.fan_in), self.shape)
        bias = (self.param("bias", _torch_conv_init(self.fan_in),
                           (self.shape[-1],)) if self.use_bias else None)
        return kernel, bias


class _ConvBNParams(nn.Module):
    """Conv kernel + eval-folded BN scalars at the exact param/stat paths of
    ConvBNReLU3D / TrConvBNReLU3D (<name>/conv/kernel, <name>/bn/*), for
    fused paths that consume raw weights (e.g. the depth-folded 2D U-Net)."""
    shape: tuple     # conv kernel shape
    fan_in: int
    features: int    # BN features (true out channels)

    @nn.compact
    def __call__(self):
        kernel = _ConvKernelParam(self.shape, self.fan_in, name="conv")()
        scale, bias, mean, var = _BNParams(self.features, name="bn")()
        fscale = scale.astype(jnp.float32) * jax.lax.rsqrt(
            var.astype(jnp.float32) + 1e-5)
        foffset = bias.astype(jnp.float32) - mean.astype(jnp.float32) * fscale
        return kernel, fscale, foffset


class _BNParams(nn.Module):
    """BatchNorm parameter/stat holder matching layers.BatchNorm's structure,
    for paths that fold BN into a fused kernel (eval only)."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class TrConvBNReLU3D(nn.Module):
    """ConvTranspose3d (no bias) + BN + ReLU — the upsampling block of the
    3D U-Nets (reference net/unit/regular.py:33-43, 96-109).

    ``wfold`` takes UNFOLDED input and returns a width-folded output (the
    transposed conv itself runs unfolded; its output is folded before BN)."""
    features: int
    kernel_size: int = 3
    strides: Sequence[int] | int = 2
    padding: int = 1
    output_padding: Sequence[int] | int = 1
    dtype: jnp.dtype | None = None
    wfold: bool = False
    pallas_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, dhcw: bool = False,
                 valid_w: int | None = None, keep_wpad: bool = False):
        from mdfnet_tpu.ops import wfold as wf
        if self.pallas_eval and not self.wfold:
            s = ((self.strides,) * 3 if isinstance(self.strides, int)
                 else tuple(self.strides))
            op = ((self.output_padding,) * 3
                  if isinstance(self.output_padding, int)
                  else tuple(self.output_padding))
            ok = (self.kernel_size == 3 and s == (2, 2, 2)
                  and op == (1, 1, 1) and self.padding == 1)
            if ok and not train:
                return self._pallas_path(x, dhcw, valid_w, keep_wpad)
            if ok and train and dhcw:
                # train fast path (see ConvBNReLU3D): Pallas transposed conv
                # with custom VJP + batch-stat BN/ReLU in XLA
                from mdfnet_tpu.ops.pallas.conv3d_vjp import trconv3d_train
                ci = x.shape[3]
                kernel = _ConvKernelParam((3, 3, 3, self.features, ci),
                                          self.features * 27, name="conv")()
                dtype = self.dtype or x.dtype
                y = trconv3d_train(x.astype(dtype), kernel.astype(dtype))
                y = BatchNorm(name="bn")(y, train, dhcw=True)
                return nn.relu(y)
        assert not dhcw, "dhcw layout requires the pallas_eval path"

        x = ConvTransposeND(self.features, (self.kernel_size,) * 3, self.strides,
                            self.padding, self.output_padding, use_bias=False,
                            dtype=self.dtype, name="conv")(x)
        if self.wfold:
            x = wf.fold_w(x)
            x = BatchNorm(name="bn", fold=wf.F)(x, train)
        else:
            x = BatchNorm(name="bn")(x, train)
        return nn.relu(x)

    def _pallas_path(self, x, dhcw: bool = False, valid_w=None,
                     keep_wpad=False):
        """Eval: phase-decomposed fused transposed conv (same param paths).

        Spatial sharding: fine row 2u+1 reads coarse rows u, u+1 (the phase
        decomposition's +1 tap), so ONE below-neighbour halo row suffices;
        the doubled halo rows are sliced off after the interleave. Edge
        devices' zero fill reproduces the transposed conv's tail (missing
        inputs contribute zero)."""
        from mdfnet_tpu.ops.pallas.conv3d_kernel import trconv3d_bn_relu
        from mdfnet_tpu.parallel import halo
        ci = x.shape[3] if dhcw else x.shape[-1]
        b = x.shape[0]
        co = self.features
        kernel = _ConvKernelParam((3, 3, 3, co, ci), co * 27, name="conv")()
        scale, bias, mean, var = _BNParams(co, name="bn")()
        fscale = scale.astype(jnp.float32) * jax.lax.rsqrt(
            var.astype(jnp.float32) + 1e-5)
        foffset = bias.astype(jnp.float32) - mean.astype(jnp.float32) * fscale

        ctx = halo.current_ctx()
        band_out = None
        if ctx is not None:
            band_out = 2 * x.shape[2]
            x = halo.halo_exchange(x, h_axis=2, lo=0, hi=1, edge="zero")

        dtype = self.dtype or x.dtype
        outs = []
        for bi in range(b):
            xi = (x[bi] if dhcw
                  else jnp.transpose(x[bi], (0, 1, 3, 2))).astype(dtype)
            y = trconv3d_bn_relu(xi, kernel, fscale, foffset,
                                 valid_w=valid_w, keep_wpad=keep_wpad)
            if ctx is not None:
                y = jax.lax.slice_in_dim(y, 0, band_out, axis=1)
            outs.append(y if dhcw else jnp.transpose(y, (0, 1, 3, 2)))
        return jnp.stack(outs)


class Res(nn.Module):
    """Residual block x + 0.1 * conv(relu(conv(x))).

    Twin of reference net/unit/base.py:71-82."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = ConvND(self.features, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv0")(x)
        y = nn.relu(y)
        y = ConvND(self.features, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv1")(y)
        return x + y * 0.1


def pixel_shuffle_2x(x: jnp.ndarray) -> jnp.ndarray:
    """PixelShuffle(2) on NHWC: (B, H, W, 4C) -> (B, 2H, 2W, C).

    torch PixelShuffle on NCHW groups channels as (C, r, r); in NHWC terms the
    input channel index is c*4 + dy*2 + dx.
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, dy, w, dx, c
    return x.reshape(b, 2 * h, 2 * w, c)
