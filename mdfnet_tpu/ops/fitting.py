"""Multi-distribution fitting for adaptive depth hypotheses — the "MDF" core.

Closed-form per-pixel curve fits on the softmax probability volume that turn
the previous stage's depth posterior into a per-pixel search radius for the
next stage. Behavioural twin of reference net/unit/depthhypos.py:10-215,
recast as pure functions:

- laplace:  p(x) ~ exp(-|x - d| / b)   ->  b = 1 / |Σxy / Σxx|      (ref :78-125)
- gauss1:   log p = b0 x² + b1 x + b2  ->  s = |-1/b0| via 3x3 normal
            equations solved in closed form (adjugate), no per-pixel
            matrix inverse kernel needed                              (ref :169-215)
- gauss0:   log p = b0 (x-d)² + b1     ->  2x2 normal equations       (ref :127-166)

Everything runs under stop_gradient (the reference wraps fitting in no_grad,
depthhypos.py:40) and in f32: log of probs clamped at 1e-40 and reciprocal
chains are bf16-hostile (SURVEY.md §7 hard part 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_PROB_FLOOR = 1e-40


def uniform_hypotheses(depth_range: jnp.ndarray, ndepths: int) -> jnp.ndarray:
    """Stage-0 hypotheses: D planes evenly spaced across the scene range.

    Twin of reference net/unit/depthhypos.py:31-38.

    Args:
        depth_range: (B, 2) [depth_min, depth_max].
    Returns:
        (B, D, 1, 1) hypotheses.
    """
    dmin = depth_range[:, 0].astype(jnp.float32)
    dmax = depth_range[:, 1].astype(jnp.float32)
    step = (dmax - dmin) / (ndepths - 1)
    hypos = dmin[:, None] + jnp.arange(ndepths, dtype=jnp.float32)[None, :] * step[:, None]
    return hypos[:, :, None, None]


def fit_laplace(depth: jnp.ndarray, prob_volume: jnp.ndarray,
                depth_hypos: jnp.ndarray) -> jnp.ndarray:
    """Laplace scale b per pixel from log-prob regression through the origin.

    x = |hypo - depth|, y = log(max(p, 1e-40));  b = 1 / |Σxy / Σxx|.
    Twin of reference net/unit/depthhypos.py:115-125.

    Args:
        depth: (B, H, W); prob_volume: (B, D, H, W);
        depth_hypos: (B, D, H, W) or (B, D, 1, 1).
    Returns:
        (B, H, W) scale.
    """
    p = jnp.maximum(prob_volume.astype(jnp.float32), _PROB_FLOOR)
    y = jnp.log(p)
    x = jnp.abs(depth_hypos.astype(jnp.float32) - depth.astype(jnp.float32)[:, None])
    sum_xy = jnp.sum(x * y, axis=1)
    sum_xx = jnp.sum(x * x, axis=1)
    b = jnp.abs(sum_xy / sum_xx)
    return 1.0 / b


def fit_gauss1(depth: jnp.ndarray, prob_volume: jnp.ndarray,
               depth_hypos: jnp.ndarray) -> jnp.ndarray:
    """Gaussian width s from a full parabola fit to log-probs.

    Least squares of log p against [x², x, 1] over the D hypotheses; the 3x3
    normal-equation system is solved in closed form via the adjugate instead
    of the reference's per-pixel torch.inverse (net/unit/depthhypos.py:169-215)
    — same math, one fused elementwise expression on the VPU.

    Returns:
        (B, H, W) s = |-1 / b0|.
    """
    p = jnp.maximum(prob_volume.astype(jnp.float32), _PROB_FLOOR)
    z = jnp.log(p)  # (B, D, H, W)
    x = depth_hypos.astype(jnp.float32)
    if x.shape[-1] != z.shape[-1] or x.shape[-2] != z.shape[-2]:
        x = jnp.broadcast_to(x, z.shape)
    x2 = x * x

    # Normal equations A @ beta = v with A = XᵀX (symmetric 3x3), v = XᵀZ,
    # X rows = [x², x, 1].
    d = jnp.float32(z.shape[1])
    s4 = jnp.sum(x2 * x2, axis=1)
    s3 = jnp.sum(x2 * x, axis=1)
    s2 = jnp.sum(x2, axis=1)
    s1 = jnp.sum(x, axis=1)
    v0 = jnp.sum(x2 * z, axis=1)
    v1 = jnp.sum(x * z, axis=1)
    v2 = jnp.sum(z, axis=1)

    # A = [[s4, s3, s2], [s3, s2, s1], [s2, s1, d]]; beta0 by Cramer's rule.
    det = (s4 * (s2 * d - s1 * s1)
           - s3 * (s3 * d - s1 * s2)
           + s2 * (s3 * s1 - s2 * s2))
    det0 = (v0 * (s2 * d - s1 * s1)
            - s3 * (v1 * d - s1 * v2)
            + s2 * (v1 * s1 - s2 * v2))
    b0 = det0 / det
    return jnp.abs(-1.0 / b0)


def fit_gauss0(depth: jnp.ndarray, prob_volume: jnp.ndarray,
               depth_hypos: jnp.ndarray) -> jnp.ndarray:
    """Gaussian width from a centred parabola fit: log p = b0 (x-d)² + b1.

    2x2 normal equations in closed form; twin of reference
    net/unit/depthhypos.py:127-166.
    """
    p = jnp.maximum(prob_volume.astype(jnp.float32), _PROB_FLOOR)
    z = jnp.log(p)
    x = depth_hypos.astype(jnp.float32)
    if x.shape[-1] != z.shape[-1] or x.shape[-2] != z.shape[-2]:
        x = jnp.broadcast_to(x, z.shape)
    q = (x - depth.astype(jnp.float32)[:, None]) ** 2  # x in the design matrix

    d = jnp.float32(z.shape[1])
    s2 = jnp.sum(q * q, axis=1)
    s1 = jnp.sum(q, axis=1)
    v0 = jnp.sum(q * z, axis=1)
    v1 = jnp.sum(z, axis=1)
    det = s2 * d - s1 * s1
    b0 = (v0 * d - s1 * v1) / det
    return jnp.abs(-1.0 / b0)


def atv_hypos(depth: jnp.ndarray | None, exp_variance: jnp.ndarray | None,
              depth_range: jnp.ndarray, ndepths: int,
              eps: float = 1e-12) -> jnp.ndarray:
    """Adaptive-thin-volume hypotheses — the reference's unused alternative
    hypothesis generator (net/unit/depthhypos.py:218-253, UCS-Net style).

    Stage 0 (``depth is None``): uniform planes, identical to
    :func:`uniform_hypotheses`. Later stages: the previous stage's depth
    (already at the NEXT scale) and its expected-variance map (coarse scale,
    2x-bilinear-upsampled here like the reference's F.interpolate) span a
    per-pixel asymmetric band [depth - min(depth, var), depth + var]:

        low = -min(depth, var);  step = (var - low) / (ndepths - 1)
        hypo_i = depth + low + step * i + eps

    Args:
        depth: (B, H, W) fine-scale depth (detached) or None.
        exp_variance: (B, H/2, W/2) coarse-scale expected deviation
            (e.g. sqrt(Σ p (hypo - depth)²)) or None at stage 0.
    Returns:
        (B, D, H, W) hypotheses ((B, D, 1, 1) at stage 0).
    """
    from mdfnet_tpu.ops.sample import resize_bilinear_2x

    if depth is None:
        return uniform_hypotheses(depth_range, ndepths)

    depth = jax.lax.stop_gradient(depth).astype(jnp.float32)
    var = jax.lax.stop_gradient(exp_variance).astype(jnp.float32)
    var = resize_bilinear_2x(var)

    low = -jnp.minimum(depth, var)
    step = (var - low) / (ndepths - 1)
    i = jnp.arange(ndepths, dtype=jnp.float32)[None, :, None, None]
    return depth[:, None] + low[:, None] + step[:, None] * i + eps


_FITTERS = {"gauss0": fit_gauss0, "gauss1": fit_gauss1, "laplace": fit_laplace}


def refined_hypotheses(depth: jnp.ndarray, depth_range: jnp.ndarray,
                       prob_volume: jnp.ndarray, depth_hypos: jnp.ndarray,
                       *, ndepths: int, curve_class: str, prob_thresh: float,
                       upsample: bool = True) -> jnp.ndarray:
    """Next-stage hypotheses from a fitted per-pixel probability curve.

    Pipeline (twin of reference net/unit/depthhypos.py:40-76):
      1. fit curve width s (gauss/laplace) on the previous prob volume;
      2. optionally 2x-bilinear-upsample s and depth to the next scale;
      3. search radius: gauss  res = sqrt(-s ln t); laplace res = |s ln t|;
      4. clamp res to [1e-6, global_range/2] then per-item to 20% of range;
      5. lay ndepths planes evenly over [depth - res/2, depth + res/2];
      6. clamp hypotheses elementwise into [depth_min, depth_max].

    All under stop_gradient (reference runs fitting in no_grad).
    """
    from mdfnet_tpu.ops.sample import resize_bilinear_2x

    depth = jax.lax.stop_gradient(depth)
    prob_volume = jax.lax.stop_gradient(prob_volume)
    depth_hypos = jax.lax.stop_gradient(depth_hypos)

    dmin = depth_range[:, 0].astype(jnp.float32)
    dmax = depth_range[:, 1].astype(jnp.float32)

    s = _FITTERS[curve_class](depth, prob_volume, depth_hypos)

    if upsample:
        s = resize_bilinear_2x(s)
        depth = resize_bilinear_2x(depth)

    log_t = jnp.log(jnp.float32(prob_thresh))
    if curve_class in ("gauss0", "gauss1"):
        res = jnp.sqrt(-1.0 * s * log_t)
    else:
        res = jnp.abs(s * log_t)

    # global clamp (max over batch of dmax minus min over batch of dmin — the
    # reference uses .max()/.min() across the whole batch, depthhypos.py:58)
    global_half_range = (jnp.max(dmax) - jnp.min(dmin)) / 2.0
    res = jnp.clip(res, 1e-6, global_half_range)
    # per-item clamp to 20% of that item's range
    res = jnp.minimum(res, ((dmax - dmin) * 0.2)[:, None, None])

    interval = res / (ndepths - 1)
    steps = jnp.arange(ndepths, dtype=jnp.float32).reshape(1, ndepths, 1, 1)
    hypos = (depth - 0.5 * res)[:, None] + interval[:, None] * steps

    hypos = jnp.clip(hypos, dmin[:, None, None, None], dmax[:, None, None, None])
    return hypos
