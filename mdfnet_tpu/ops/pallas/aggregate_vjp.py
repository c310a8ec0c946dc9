"""Train-mode fused warp+aggregate with a custom VJP.

Forward = TWO rowsweep launches per batch item (the fused eval kernel family,
ops/pallas/aggregate_kernel.py):

1. ``rowsweep_stats``: per-view batch statistics of the pre-BN DepthWeight
   scalar field s_v = k0 . sim_v — train-mode BN normalises with the batch
   mean/var over the whole (B, D, H, W) field (reference
   net/unit/homoaggregate.py:17-19, BN3d train), which the single-pass
   kernel cannot know mid-accumulation.
2. ``rowsweep_aggregate(..., with_wsum=True)`` with the PER-VIEW folded
   affine computed from those stats — the exact train-mode normalisation.

Backward rematerialises per view (the standard remat trade: nothing big is
saved): the warp rides ``homography_warp_pallas`` whose custom VJP carries
the scatter-free gradient splat (ops/pallas/splat_kernel.py), and the
similarity / DepthWeight / weighted-average chain — including the
batch-statistics BN backward — is closed-form XLA. Projections/hypotheses
carry no gradient (the reference computes them under no_grad,
net/unit/depthhypos.py).

Layouts: diffs (B, S, H, C, W) hcw pair-difference features, q (B, H, C, W)
sigmoid of the ref diffs; returns the cost volume channels-last
(B, D, H, W, C) — what the train-path U-Nets consume — plus the per-view
(mean, unbiased var) rows the caller feeds to the BN running-stat EMA, and
the coverage flag.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mdfnet_tpu.ops.pallas.aggregate_kernel import (rowsweep_aggregate,
                                                    rowsweep_stats)
from mdfnet_tpu.ops.pallas.warp_kernel import homography_warp_pallas

_EPS = 1e-5  # matches models.aggregate._ScalarFieldBN.epsilon


def _fused_train_impl(diffs, q, src_projs, ref_proj, depth_hypos,
                      k0, gamma, beta, k1, b1):
    b, n_src, h, c, w = diffs.shape
    k0f = k0.astype(jnp.float32)
    sums = 0.0
    for bi in range(b):
        s2, _, cover_b = rowsweep_stats(
            diffs[bi], q[bi], src_projs[bi], ref_proj[bi], depth_hypos[bi],
            k0f, valid_w=w)
        sums = sums + s2
        cover = cover_b if bi == 0 else (cover & cover_b)
    # element count from STATIC shapes (the jitted stats call would return
    # it traced, breaking max() under an outer jit)
    n = b * depth_hypos.shape[1] * h * w
    mu = sums[:, 0] / n                                   # (S,)
    var_b = jnp.maximum(sums[:, 1] / n - mu * mu, 0.0)    # biased
    var_unbiased = var_b * (n / max(n - 1, 1))

    gf = gamma.astype(jnp.float32)
    bn_s = gf * jax.lax.rsqrt(var_b + _EPS)               # (S,)
    bn_o = beta.astype(jnp.float32) - mu * bn_s

    vols, wsums = [], []
    for bi in range(b):
        vol_i, ws_i, cov_i = rowsweep_aggregate(
            diffs[bi], q[bi], src_projs[bi], ref_proj[bi], depth_hypos[bi],
            k0f, bn_s, bn_o, k1.astype(jnp.float32), b1.astype(jnp.float32),
            valid_w=w, with_wsum=True)
        vols.append(vol_i)
        wsums.append(ws_i)
        cover = cover & cov_i
    vol = jnp.stack(vols)[..., :w]                        # (B, D, H, C, W)
    wsum = jnp.stack(wsums)[..., :w]                      # (B, D, H, W)
    vol_cl = jnp.transpose(vol, (0, 1, 2, 4, 3))          # (B, D, H, W, C)
    stats = jnp.stack([mu, var_unbiased], axis=1)         # (S, 2)
    return vol_cl, wsum, stats, mu, var_b, cover


@jax.custom_vjp
def rowsweep_aggregate_train(diffs, q, src_projs, ref_proj, depth_hypos,
                             k0, gamma, beta, k1, b1):
    """Fused train-mode aggregate. Returns (vol (B,D,H,W,C) model-dtype,
    stats (S,2) f32 [mean, unbiased var] per view, cover () bool)."""
    vol_cl, _, stats, _, _, cover = _fused_train_impl(
        diffs, q, src_projs, ref_proj, depth_hypos, k0, gamma, beta, k1, b1)
    return vol_cl.astype(diffs.dtype), stats, cover


def _rat_fwd(diffs, q, src_projs, ref_proj, depth_hypos,
             k0, gamma, beta, k1, b1):
    vol_cl, wsum, stats, mu, var_b, cover = _fused_train_impl(
        diffs, q, src_projs, ref_proj, depth_hypos, k0, gamma, beta, k1, b1)
    res = (diffs, q, src_projs, ref_proj, depth_hypos, k0, gamma, beta,
           k1, b1, vol_cl, wsum, mu, var_b)
    return (vol_cl.astype(diffs.dtype), stats, cover), res


def _rat_bwd(res, cots):
    (diffs, q, src_projs, ref_proj, depth_hypos, k0, gamma, beta, k1, b1,
     vol, wsum, mu, var_b) = res
    d_vol = cots[0].astype(jnp.float32)                   # (B, D, H, W, C)

    k0f = k0.astype(jnp.float32)
    gf = jnp.asarray(gamma, jnp.float32).reshape(())
    k1f = jnp.asarray(k1, jnp.float32).reshape(())
    b1f = jnp.asarray(b1, jnp.float32).reshape(())
    r_v = jax.lax.rsqrt(var_b + _EPS)                     # (S,)

    # q broadcastable over (B, D, H, W, C)
    q_cl = jnp.transpose(q, (0, 1, 3, 2)).astype(jnp.float32)[:, None]
    winv = 1.0 / wsum[..., None]                          # (B, D, H, W, 1)

    d_diffs = []
    d_q = 0.0
    d_k0 = 0.0
    d_gamma = 0.0
    d_beta = 0.0
    d_k1 = 0.0
    d_b1 = 0.0
    n_src = diffs.shape[1]
    for v in range(n_src):
        diff_v = jnp.transpose(diffs[:, v], (0, 1, 3, 2))  # (B, H, W, C)
        warped, pull = jax.vjp(
            lambda f: homography_warp_pallas(f, src_projs[:, v], ref_proj,
                                             depth_hypos), diff_v)
        wf = warped.astype(jnp.float32)
        p = jax.nn.sigmoid(wf)                            # (B, D, H, W, C)
        sim = p * q_cl + (1.0 - p) * (1.0 - q_cl)
        s = jnp.einsum("bdhwc,c->bdhw", sim, k0f,
                       preferred_element_type=jnp.float32)
        s_hat = (s - mu[v]) * r_v[v]
        a = s_hat * gf + jnp.asarray(beta, jnp.float32).reshape(())
        hrelu = jnp.maximum(a, 0.0)
        wgt = jax.nn.sigmoid(hrelu * k1f + b1f)           # (B, D, H, W)

        d_w = jnp.sum(d_vol * (sim - vol), axis=-1) * winv[..., 0]
        d_sim = d_vol * (wgt[..., None] * winv)
        d_lin = d_w * (wgt * (1.0 - wgt))
        d_k1 = d_k1 + jnp.sum(d_lin * hrelu)
        d_b1 = d_b1 + jnp.sum(d_lin)
        d_a = (d_lin * k1f) * (a > 0.0)
        d_gamma = d_gamma + jnp.sum(d_a * s_hat)
        d_beta = d_beta + jnp.sum(d_a)
        d_shat = d_a * gf
        # batch-statistics BN backward (mean over ALL elements of the field)
        d_s = r_v[v] * (d_shat - jnp.mean(d_shat)
                        - s_hat * jnp.mean(d_shat * s_hat))
        d_k0 = d_k0 + jnp.einsum("bdhw,bdhwc->c", d_s, sim,
                                 preferred_element_type=jnp.float32)
        d_sim = d_sim + d_s[..., None] * k0f
        d_q = d_q + jnp.sum((2.0 * p - 1.0) * d_sim, axis=1)  # (B, H, W, C)
        d_warped = (p * (1.0 - p)) * (2.0 * q_cl - 1.0) * d_sim
        (d_diff_v,) = pull(d_warped.astype(warped.dtype))
        d_diffs.append(jnp.transpose(d_diff_v, (0, 1, 3, 2)))

    d_diffs = jnp.stack(d_diffs, axis=1).astype(diffs.dtype)
    d_q_hcw = jnp.transpose(d_q, (0, 1, 3, 2)).astype(q.dtype)
    return (d_diffs, d_q_hcw,
            jnp.zeros_like(src_projs), jnp.zeros_like(ref_proj),
            jnp.zeros_like(depth_hypos),
            d_k0.astype(k0.dtype),
            jnp.asarray(d_gamma).reshape(jnp.shape(gamma)).astype(
                jnp.asarray(gamma).dtype),
            jnp.asarray(d_beta).reshape(jnp.shape(beta)).astype(
                jnp.asarray(beta).dtype),
            jnp.asarray(d_k1).reshape(jnp.shape(k1)).astype(
                jnp.asarray(k1).dtype),
            jnp.asarray(d_b1).reshape(jnp.shape(b1)).astype(
                jnp.asarray(b1).dtype))


rowsweep_aggregate_train.defvjp(_rat_fwd, _rat_bwd)
