"""Width-folding: trade W for channels so small-C 3D convs fill TPU lanes.

The cost-volume U-Nets run at C in {8..64}; XLA's conv layouts put C on the
128-lane axis, so tensors are physically padded 2-16x and the convs run at a
fraction of HBM bandwidth. Folding F=4 width pixels into channels gives
C_f = 4C in {32..256} (full or near-full lanes) at the cost of 4x the conv
FLOPs (the folded kernel is 3/12 sparse) — a large net win for these
memory-bound layers.

Exactness: a stride-s 3x3x3 conv on (D, H, W, C) equals a stride-s conv on
the folded (D, H, W/4, 4C) tensor with the block-structured kernel built by
:func:`fold_conv_kernel`; zero block-padding reproduces the original zero
pixel-padding (the extra padded pixels only multiply kernel zeros).

Folded channel order is ws-major: folded[..., wb, ws*C + c] = x[..., 4*wb+ws, c].
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

F = 4  # fold factor


def fold_w(x: jnp.ndarray) -> jnp.ndarray:
    """(..., W, C) -> (..., W/F, F*C), ws-major channels."""
    *lead, w, c = x.shape
    assert w % F == 0, f"W={w} must divide {F}"
    return x.reshape(*lead, w // F, F * c)


def unfold_w(x: jnp.ndarray) -> jnp.ndarray:
    """(..., W/F, F*C) -> (..., W, C)."""
    *lead, wb, fc = x.shape
    return x.reshape(*lead, wb * F, fc // F)


def fold_conv_kernel(kernel: jnp.ndarray, stride_w: int = 1) -> jnp.ndarray:
    """(kz, ky, 3, Ci, Co) -> (kz, ky, 3, F*Ci, F*Co) folded conv kernel.

    For output sub-position ws_out and W-tap dx, the true input column is
      w' = stride_w * ws_out + dx - pad   (pad = 1)
    which lands in block offset b' = floor(w'/F) in {-1, 0, 1} at sub-position
    ws_in = w' mod F. Works for stride 1 (folded conv stride 1) and stride 2
    (folded conv stride 2: output block wb_out reads input blocks
    2*wb_out + b').
    """
    kz, ky, kx, ci, co = kernel.shape
    assert kx == 3, "only 3-tap W kernels supported"
    out = jnp.zeros((kz, ky, 3, F * ci, F * co), kernel.dtype)
    for ws_out in range(F):
        for dx in range(3):
            w_prime = stride_w * ws_out + dx - 1
            b = w_prime // F  # floor
            ws_in = w_prime % F
            out = out.at[:, :, b + 1,
                         ws_in * ci:(ws_in + 1) * ci,
                         ws_out * co:(ws_out + 1) * co].set(kernel[:, :, dx])
    return out


def fold_channel_param(p: jnp.ndarray) -> jnp.ndarray:
    """(C,) per-channel param -> (F*C,) in ws-major order (tile)."""
    return jnp.tile(p, F)
