"""Differentiable Pallas conv2d for the TRAINING backbone/refine stacks.

The train-mode FPN backbone is the second-largest block of the train step
(~90 ms of 425 at the reference batch-4 config, tools/
profile_train_breakdown.py): XLA's NHWC convs lane-pad the 8-64 wide channel
axes up to 16x. The eval path solved this with the fused (N, H, C, W) Pallas
conv2d kernels (ops/pallas/conv2d_kernel.py) — eval-only because they fold
eval BN and carry no autodiff rule.

This module wraps conv2d_fused in :func:`jax.custom_vjp` so training rides
it too, mirroring ops/pallas/conv3d_vjp.py (reference hot module:
net/unit/backbone.py):

- forward: the Pallas conv with identity scale/offset and no ReLU (train BN
  needs batch statistics OF the conv output — BN/ReLU stay outside, cheap
  XLA passes on the compact hcw layout);
- d_input: for stride 1 the transpose is the SAME stride-1 conv with the
  kernel spatially flipped and (Ci, Co) swapped — it rides conv2d_fused;
  for stride 2 (the three 5x5 downsampling convs, lower-res) it falls back
  to XLA's conv transpose on a transposed view;
- d_weight: XLA's conv-weight-grad transpose (tiny (k, k, Ci, Co) output).

Exactness vs XLA autodiff is pinned by tests/test_conv2d_vjp.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused


def _dn2():
    from mdfnet_tpu.models.layers import _dimension_numbers
    return _dimension_numbers(2)


def _nhwc(x):  # (N, H, C, W) -> (N, H, W, C)
    return jnp.transpose(x, (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_train(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                 interpret: bool = False) -> jnp.ndarray:
    """Conv2d(k x k, stride 1|2, pad (k-1)//2, no bias) on (N, H, C, W).

    Args:
        x: (N, H, Ci, W); kernel: (k, k, Ci, Co) (ConvND layout, k odd).
    Returns:
        (N, ceil(H/s), Co, ceil(W/s)) in x.dtype.
    """
    co = kernel.shape[-1]
    return conv2d_fused(x, kernel, jnp.ones((co,), jnp.float32),
                        jnp.zeros((co,), jnp.float32), stride=stride,
                        relu=False, interpret=interpret)


def _conv2d_train_fwd(x, kernel, stride, interpret):
    return conv2d_train(x, kernel, stride, interpret), (x, kernel)


def _conv2d_train_bwd(stride, interpret, res, g):
    x, kernel = res
    k = kernel.shape[0]
    ci = x.shape[2]
    g = g.astype(x.dtype)
    if stride == 1:
        kt = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)      # (k, k, Co, Ci)
        dx = conv2d_fused(g, kt, jnp.ones((ci,), jnp.float32),
                          jnp.zeros((ci,), jnp.float32), relu=False,
                          interpret=interpret)[:, :x.shape[1], :, :x.shape[3]]
    else:
        # stride 2: XLA conv transpose on the NHWC view (3 smaller layers)
        p = (k - 1) // 2

        def f(xn):
            return jax.lax.conv_general_dilated(
                xn, kernel.astype(x.dtype), (stride, stride), [(p, p)] * 2,
                dimension_numbers=_dn2())

        _, vjp = jax.vjp(f, _nhwc(x))
        dxn, = vjp(_pad_like(f(_nhwc(x)), _nhwc(g)))
        dx = jnp.transpose(dxn, (0, 1, 3, 2))
    # weight grad: XLA's transpose wrt the kernel operand only
    p = (k - 1) // 2

    def fk(kk):
        return jax.lax.conv_general_dilated(
            _nhwc(x), kk.astype(x.dtype), (stride, stride), [(p, p)] * 2,
            dimension_numbers=_dn2())

    _, vjpk = jax.vjp(fk, kernel)
    dk, = vjpk(_pad_like(fk(kernel), _nhwc(g)))
    return dx.astype(x.dtype), dk


def _pad_like(template, g):
    """For this kernel family (odd k, p=(k-1)//2, s in {1,2}) XLA's
    floor-mode output floor((H-1)/s)+1 always equals the Pallas ceil-mode
    ceil(H/s), so template.shape == g.shape and this is an identity; any
    mismatch means an unsupported even-k/padding combination crept in and
    must fail loudly rather than silently slice."""
    if template.shape != g.shape:
        raise ValueError(
            f"conv2d vjp cotangent shape {g.shape} != conv output shape "
            f"{template.shape}: unsupported kernel/stride/padding combo")
    return g


conv2d_train.defvjp(_conv2d_train_fwd, _conv2d_train_bwd)
