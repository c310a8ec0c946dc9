"""Component-level timing of the eval forward at DTU resolution on the TPU.

Times each pipeline piece in isolation (own jit, warmed up) to find the
bottleneck: backbone, per-stage warp+aggregate, per-stage U-Net, fitting,
refine. Not part of the library — a developer tool.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from mdfnet_tpu.models.aggregate import VectorAggregate
    from mdfnet_tpu.models.backbone import FPN4Scales
    from mdfnet_tpu.models.regularize import RegularNet3Scales, RegularNet4Scales
    from mdfnet_tpu.models.refine import RefineNet2
    from mdfnet_tpu.ops.fitting import refined_hypotheses, uniform_hypotheses
    from mdfnet_tpu.ops.warp import homography_warp
    from mdfnet_tpu import geometry

    H, W, V = 1184, 1600, 5
    B = 1
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    # ---- backbone over V views
    backbone = FPN4Scales(dtype=dtype)
    img = jax.random.uniform(rng, (B, H, W, 3), dtype)
    bb_vars = backbone.init(rng, img)
    bb_apply = jax.jit(lambda v, x: backbone.apply(v, x))
    t = timeit(bb_apply, bb_vars, img)
    print(f"backbone 1 view: {t*1000:.1f} ms  (x{V} views = {t*V*1000:.1f})")

    intr = jnp.tile(jnp.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2],
                               [0, 0, 1]], jnp.float32), (B, V, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, V, 1, 1))
    extr = extr.at[:, 1:, 0, 3].set(jnp.arange(1, V) * 10.0)
    drange = jnp.tile(jnp.array([[425.0, 935.0]], jnp.float32), (B, 1))

    stage_cfg = [  # (scale_div, D, C, G)
        (8, 48, 64, 32),
        (4, 24, 32, 16),
        (2, 8, 16, 8),
    ]
    for s, (div, d, c, g) in enumerate(stage_cfg):
        h, w = H // div, W // div
        feats = [jax.random.uniform(rng, (B, h, w, c), dtype) for _ in range(V)]
        ref_proj, src_projs = geometry.projection_matrices(intr, extr, s)
        if s == 0:
            hypos = uniform_hypotheses(drange, d)
        else:
            hypos = jnp.broadcast_to(
                jnp.linspace(500, 700, d)[None, :, None, None],
                (B, d, h, w)).astype(jnp.float32)

        warp1 = jax.jit(lambda f, sp, rp, hy: homography_warp(f, sp, rp, hy))
        t = timeit(warp1, feats[1], src_projs[:, 0], ref_proj, hypos)
        print(f"stage{s} warp 1 src ({d}x{h}x{w}x{c}): {t*1000:.1f} ms "
              f"(x{V-1} = {(V-1)*t*1000:.1f})")

        agg = VectorAggregate(g, dtype=dtype)
        agg_vars = agg.init(rng, feats, ref_proj, src_projs, hypos)
        agg_apply = jax.jit(lambda v, f, rp, sp, hy: agg.apply(v, f, rp, sp, hy))
        t = timeit(agg_apply, agg_vars, feats, ref_proj, src_projs, hypos)
        print(f"stage{s} full aggregate: {t*1000:.1f} ms")

        vol = jax.random.uniform(rng, (B, d, h, w, g), dtype)
        reg = (RegularNet3Scales(16, dtype=dtype) if s == 0
               else RegularNet4Scales(8, dtype=dtype))
        reg_vars = reg.init(rng, vol)
        reg_apply = jax.jit(lambda v, x: reg.apply(v, x))
        t = timeit(reg_apply, reg_vars, vol)
        print(f"stage{s} U-Net ({d}x{h}x{w}x{g}): {t*1000:.1f} ms")

        if s > 0:
            prev_div = stage_cfg[s - 1][0]
            ph, pw = H // prev_div, W // prev_div
            pd = stage_cfg[s - 1][1]
            prob = jax.nn.softmax(jax.random.uniform(rng, (B, pd, ph, pw)), axis=1)
            depth = jnp.full((B, ph, pw), 600.0)
            prev_hypos = jnp.broadcast_to(
                jnp.linspace(425, 935, pd)[None, :, None, None],
                (B, pd, ph, pw)).astype(jnp.float32)
            curve = "gauss1" if s == 1 else "laplace"
            fit = jax.jit(lambda de, dr, pv, hy: refined_hypotheses(
                de, dr, pv, hy, ndepths=d, curve_class=curve,
                prob_thresh=0.95 if s == 1 else 1e-5, upsample=True))
            t = timeit(fit, depth, drange, prob, prev_hypos)
            print(f"stage{s} fitting ({curve}): {t*1000:.1f} ms")

    refine = RefineNet2(dtype=dtype)
    half_depth = jnp.full((B, H // 2, W // 2), 600.0)
    rf_vars = refine.init(rng, half_depth, drange)
    rf_apply = jax.jit(lambda v, d, r: refine.apply(v, d, r))
    t = timeit(rf_apply, rf_vars, half_depth, drange)
    print(f"refine: {t*1000:.1f} ms")


if __name__ == "__main__":
    main()
