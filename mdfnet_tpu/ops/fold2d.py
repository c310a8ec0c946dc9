"""Depth-folded 2D reformulation of small-D 3D convolutions.

A 3x3x3 conv over a (D, H, W) volume with C channels is exactly a 3x3 2D
conv over (H, W) with D*C folded channels whose weight matrix is
block-banded in D: output block d reads input blocks d-1, d, d+1 with the
three dz tap slices (missing neighbours at the D edges reproduce torch's
zero padding). For the MDF-Net stage-2 U-Net (reference net/unit/
regular.py:72-133 at D=8, base 8ch) every level folds to exactly 64
channels — full TPU sublanes, one conv2d kernel launch per layer instead
of a D-looped conv3d (measured ~2x on the heavy levels, see
tools/profile_folded2d.py).

Three weight transforms, all exact:
  - fold_conv3d: forward conv, D-stride 1 or 2 (stride rides the band).
  - fold_trconv3d: ConvTranspose3d (k3 s2 p1 op1) as ONE stride-1 conv on
    the coarse grid producing 2x2 spatial phase groups (the D-doubling
    rides the folded channel band); interleave_2x2 shuffles phases onto
    the fine grid.
All builders run on (3,3,3,·,·) weights at trace time — negligible cost.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _band(din: int, dout: int, sd: int) -> jnp.ndarray:
    """Indicator M[dz, di, do] = 1 where di = sd*do + dz - 1 (torch pad 1)."""
    m = np.zeros((3, din, dout), np.float32)
    for do in range(dout):
        for dz in range(3):
            di = sd * do + dz - 1
            if 0 <= di < din:
                m[dz, di, do] = 1.0
    return jnp.asarray(m)


def fold_conv3d(kernel: jnp.ndarray, din: int, sd: int = 1) -> jnp.ndarray:
    """(3,3,3,Ci,Co) conv3d weight -> (3,3, din*Ci, dout*Co) folded conv2d
    weight; dout = din/sd (torch k3 p1 semantics). The folded channel order
    is D-major (block d holds that depth plane's Ci/Co channels)."""
    ci, co = kernel.shape[3], kernel.shape[4]
    dout = din if sd == 1 else din // 2
    w = jnp.einsum("zyxio,zde->yxdieo", kernel, _band(din, dout, sd))
    return w.reshape(3, 3, din * ci, dout * co)


def fold_trconv3d(kernel: jnp.ndarray, din: int) -> jnp.ndarray:
    """(3,3,3,Co,Ci) ConvTranspose3d weight (k3 s2 p1 op1, torch layout) ->
    (3,3, din*Ci, 4*dout*Co) stride-1 conv2d weight on the coarse grid,
    dout = 2*din. Output channels are (phase, d_out, Co)-major with
    phase = py*2 + px; interleave_2x2 places them on the fine grid.

    Derivation: with kf the spatially-flipped, channel-swapped kernel,
    out[2u] = in[u]*kf[1] and out[2u+1] = in[u]*kf[0] + in[u+1]*kf[2]
    per axis — phase 0 is a 1-tap, phase 1 a 2-tap (offsets 0, +1) conv;
    both embed in one 3-tap pad-1 conv at tap positions 1 and 2 (the +1
    tap's zero pad at the last coarse row/col reproduces the transposed
    conv's edge: contributions from nonexistent inputs are zero)."""
    kf = jnp.swapaxes(jnp.flip(kernel, (0, 1, 2)), -1, -2)  # (z,y,x,Ci,Co)
    ci, co = kf.shape[3], kf.shape[4]
    dout = 2 * din
    mz = np.zeros((3, din, dout), np.float32)
    for do in range(dout):
        u, pz = divmod(do, 2)
        if pz == 0:
            mz[1, u, do] = 1.0
        else:
            mz[0, u, do] = 1.0
            if u + 1 < din:
                mz[2, u + 1, do] = 1.0
    # Mp[k_idx, phase, tap_pos]
    mp = np.zeros((3, 2, 3), np.float32)
    mp[1, 0, 1] = 1.0  # phase 0: centre tap, kf[1]
    mp[0, 1, 1] = 1.0  # phase 1: centre tap, kf[0]
    mp[2, 1, 2] = 1.0  # phase 1: +1 tap,    kf[2]
    w = jnp.einsum("zyxio,zde,ypt,xqs->tsdipqeo", kf,
                   jnp.asarray(mz), jnp.asarray(mp), jnp.asarray(mp))
    return w.reshape(3, 3, din * ci, 4 * dout * co)


def interleave_2x2(y: jnp.ndarray, cf: int, wc: int) -> jnp.ndarray:
    """Phase-grouped trconv output (B, Hc, 4*cf, >=wc) -> fine grid
    (B, 2*Hc, cf, 2*wc): out[2y+py, c, 2x+px] = y[y, (py*2+px)*cf+c, x]."""
    b, hc = y.shape[:2]
    y = y[..., :wc].reshape(b, hc, 2, 2, cf, wc)
    return jnp.transpose(y, (0, 1, 2, 4, 5, 3)).reshape(b, 2 * hc, cf, 2 * wc)
