"""Differentiable Pallas conv3d for the TRAINING U-Nets.

The train-mode 3D U-Nets are the largest block of the train step (170 ms of
465 at the reference batch-4 config, tools/profile_train_breakdown.py): XLA's
NDHWC convs put the 8-64 wide channel axis on the 128-lane dim, padding the
cost volumes 2-16x physically. The eval path solved this with the fused
(D, H, C, W) Pallas kernels (ops/pallas/conv3d_kernel.py) — eval-only
because they carry no autodiff rule and fold eval BN.

This module wraps those kernels in :func:`jax.custom_vjp` so training rides
them too (reference hot module: net/unit/regular.py):

- forward: the Pallas conv with identity scale/offset and no ReLU (train BN
  needs batch statistics OF the conv output, so BN/ReLU stay outside —
  cheap XLA elementwise/reduce passes on the compact dhcw layout);
- d_input: for stride 1 the transpose is the SAME stride-1 conv with the
  kernel spatially flipped and (Ci, Co) swapped — it rides conv3d_bn_relu;
  for stride 2 it is exactly the phase-decomposed transposed-conv kernel
  (trconv3d_bn_relu); the transposed layers' d_input is in turn a stride-2
  conv. Every input gradient runs as a Pallas kernel.
- d_weight: the (3,3,3,Ci,Co) contraction over (B, D, H, W) via XLA's own
  conv-weight-grad transpose (jax.vjp of the lax conv restricted to the
  kernel operand) — a tiny output, batched over B in one call.

All functions take batched (B, D, H, C, W) activations; the Pallas calls
loop items (the kernels are per-volume) while the weight grad runs batched.
Exactness vs XLA autodiff is pinned by tests/test_conv3d_vjp.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mdfnet_tpu.ops.pallas.conv3d_kernel import (
    conv3d_bn_relu, trconv3d_bn_relu)


def _dn(ndim: int = 3):
    from mdfnet_tpu.models.layers import _dimension_numbers
    return _dimension_numbers(ndim)


def _ones(c, dtype=jnp.float32):
    return jnp.ones((c,), dtype)


def _zeros(c, dtype=jnp.float32):
    return jnp.zeros((c,), dtype)


def _bdhcw_to_n(x):
    return jnp.transpose(x, (0, 1, 2, 4, 3))  # -> (B, D, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_train(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                 interpret: bool = False) -> jnp.ndarray:
    """Conv3d(3x3x3, stride 1|2, pad 1, no bias) on (B, D, H, C, W).

    Args:
        x: (B, D, H, Ci, W); kernel: (3, 3, 3, Ci, Co) (ConvND layout).
    Returns:
        (B, ceil(D/s), ceil(H/s), Co, ceil(W/s)) in x.dtype.
    """
    outs = [conv3d_bn_relu(x[b], kernel, _ones(kernel.shape[-1]),
                           _zeros(kernel.shape[-1]), stride=stride,
                           relu=False, interpret=interpret)
            for b in range(x.shape[0])]
    return jnp.stack(outs)


def _conv3d_train_fwd(x, kernel, stride, interpret):
    return conv3d_train(x, kernel, stride, interpret), (x, kernel)


def _conv3d_train_bwd(stride, interpret, res, g):
    x, kernel = res
    _, d, h, ci, w = x.shape
    co = kernel.shape[-1]
    g = g.astype(x.dtype)
    if stride == 1:
        kt = jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4)   # (3,3,3,Co,Ci)
        dx = jnp.stack([
            conv3d_bn_relu(g[b], kt, _ones(ci), _zeros(ci), relu=False,
                           interpret=interpret)
            for b in range(g.shape[0])])
    else:
        # transpose of a stride-2 conv = the phase-decomposed transposed
        # conv; trconv3d_bn_relu stores kernels (3,3,3,Co_out,Ci_in) — the
        # conv kernel (3,3,3,Ci,Co) IS that layout for Co_out=Ci
        dx = jnp.stack([
            trconv3d_bn_relu(g[b], kernel, _ones(ci), _zeros(ci),
                             relu=False, interpret=interpret)
            for b in range(g.shape[0])])[:, :d, :h, :, :w]
    # weight grad: XLA's conv transpose wrt the kernel operand only
    xn = _bdhcw_to_n(x)
    gn = _bdhcw_to_n(g)
    f = lambda k: jax.lax.conv_general_dilated(
        xn, k.astype(x.dtype), (stride,) * 3, [(1, 1)] * 3,
        dimension_numbers=_dn())
    _, vjp = jax.vjp(f, kernel)
    dk, = vjp(gn)
    return dx.astype(x.dtype), dk


conv3d_train.defvjp(_conv3d_train_fwd, _conv3d_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def trconv3d_train(x: jnp.ndarray, kernel: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """ConvTranspose3d(3, stride 2, pad 1, out_pad 1, no bias) on
    (B, D, H, C, W).

    Args:
        x: (B, D, H, Ci, W); kernel: (3, 3, 3, Co, Ci) (ConvTransposeND
            layout).
    Returns:
        (B, 2D, 2H, Co, 2W) in x.dtype.
    """
    co = kernel.shape[3]
    outs = [trconv3d_bn_relu(x[b], kernel, _ones(co), _zeros(co),
                             relu=False, interpret=interpret)
            for b in range(x.shape[0])]
    return jnp.stack(outs)


def _trconv3d_train_fwd(x, kernel, interpret):
    return trconv3d_train(x, kernel, interpret), (x, kernel)


def _trconv3d_train_bwd(interpret, res, g):
    x, kernel = res
    ci = x.shape[3]
    g = g.astype(x.dtype)
    # transpose of the transposed conv = the ordinary stride-2 conv; the
    # stored (3,3,3,Co,Ci) trconv kernel IS the ConvND-oriented kernel of
    # that conv (the fwd's flip+swap applied twice is the identity)
    kc = kernel                                           # (3,3,3,Ci_c=Co,Co_c=Ci)
    dx = jnp.stack([
        conv3d_bn_relu(g[b], kc, _ones(ci), _zeros(ci), stride=2,
                       relu=False, interpret=interpret)
        for b in range(g.shape[0])])
    # weight grad via the XLA transposed-conv expression (layers.
    # ConvTransposeND: dilated forward conv with flipped/swapped kernel)
    xn = _bdhcw_to_n(x)
    gn = _bdhcw_to_n(g)

    def f(k):
        kf = jnp.swapaxes(jnp.flip(k, (0, 1, 2)), -1, -2).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            xn, kf, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=_dn())

    _, vjp = jax.vjp(f, kernel)
    dk, = vjp(gn)
    return dx.astype(x.dtype), dk


trconv3d_train.defvjp(_trconv3d_train_fwd, _trconv3d_train_bwd)
