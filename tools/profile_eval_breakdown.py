"""Per-component timing of the BENCH configuration on the real TPU chip.

Times the full eval forward and each pipeline piece in its bench.py
configuration (pallas warp multi, pallas U-Net convs, bf16) so the
sum-of-parts vs whole gap exposes boundary/layout overhead. Developer tool.
"""
import time

import jax
import jax.numpy as jnp


def sync(x):
    # axon block_until_ready can return early; force D2H
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=6):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from mdfnet_tpu.config import ModelConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.models import build_model
    from mdfnet_tpu.models.aggregate import VectorAggregate
    from mdfnet_tpu.models.backbone import FPN4Scales
    from mdfnet_tpu.models.refine import RefineNet2
    from mdfnet_tpu.models.regularize import RegularNet3Scales, RegularNet4Scales
    from mdfnet_tpu.ops.fitting import refined_hypotheses, uniform_hypotheses
    from mdfnet_tpu.ops.regress import confidence_regression, depth_regression
    from mdfnet_tpu.ops.sample import resize_nearest_2x
    from mdfnet_tpu import geometry

    H, W, V = 1184, 1600, 5
    B = 1
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    print("=== full forward (bench config) ===", flush=True)
    model = build_model(ModelConfig(compute_dtype="bfloat16",
                                    warp_impl="pallas", pallas_conv=True))
    scene = make_plane_scene(height=H, width=W, nviews=V,
                             plane_depth=650.0, tilt=0.05)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]), jnp.asarray(batch["depth_range"]))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), *args,
                                           train=False))()
    fwd = jax.jit(lambda *a: model.apply(variables, *a, train=False))
    t_full = timeit(fwd, *args)
    print(f"FULL forward: {t_full*1000:.1f} ms = {1/t_full:.2f} maps/s",
          flush=True)

    print("=== backbone (5 views stacked) ===", flush=True)
    backbone = FPN4Scales(dtype=dtype, pallas_eval=True)
    imgs = jax.random.uniform(rng, (B * V, H, W, 3), dtype)
    bb_vars = backbone.init(rng, imgs)
    bb = jax.jit(lambda v, x: backbone.apply(v, x))
    t = timeit(bb, bb_vars, imgs)
    print(f"backbone stacked x{V}: {t*1000:.1f} ms", flush=True)

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
    total_parts = t
    for s, (div, d, c, g) in enumerate(stage_cfg):
        h, w = H // div, W // div
        feats = [jax.random.uniform(jax.random.fold_in(rng, v),
                                    (B, h, w, c), dtype) for v in range(V)]
        ref_proj, src_projs = geometry.projection_matrices(intr, extr, s)
        if s == 0:
            hypos = uniform_hypotheses(drange, d)
        else:
            hypos = jnp.broadcast_to(
                jnp.linspace(500, 700, d)[None, :, None, None],
                (B, d, h, w)).astype(jnp.float32)

        # fused rowsweep warp+aggregate (the bench config): hcw pair diffs
        hcw_diffs = [jnp.transpose(f[..., 0::2] - f[..., 1::2], (0, 2, 3, 1))
                     for f in feats]  # (B, H, G, W)
        agg = VectorAggregate(g, dtype=dtype, warp_impl="fused")
        agg_vars = agg.init(rng, feats, ref_proj, src_projs, hypos,
                            False, hcw_diffs)
        agg_apply = jax.jit(
            lambda v, f, rp, sp, hy, pd: agg.apply(v, f, rp, sp, hy,
                                                   False, pd))
        t = timeit(agg_apply, agg_vars, feats, ref_proj, src_projs, hypos,
                   hcw_diffs)
        print(f"stage{s} aggregate (fused rowsweep): {t*1000:.1f} ms",
              flush=True)
        total_parts += t

        vol = jax.random.uniform(rng, (B, d, h, g, -(-w // 128) * 128), dtype)
        reg = (RegularNet3Scales(16, dtype=dtype, pallas_eval=True) if s == 0
               else RegularNet4Scales(8, dtype=dtype, pallas_eval=True))
        reg_vars = reg.init(rng, vol[..., :w].transpose(0, 1, 2, 4, 3))
        reg_apply = jax.jit(lambda v, x: reg.apply(v, x[..., :w], dhcw=True))
        t = timeit(reg_apply, reg_vars, vol)
        print(f"stage{s} U-Net pallas dhcw ({d}x{h}x{w}x{g}): {t*1000:.1f} ms",
              flush=True)
        total_parts += t

        if s > 0:
            prev_div, pd = stage_cfg[s - 1][0], stage_cfg[s - 1][1]
            ph, pw = H // prev_div, W // prev_div
            prob = jax.nn.softmax(
                jax.random.uniform(rng, (B, pd, ph, pw)), axis=1)
            depth = jnp.full((B, ph, pw), 600.0)
            prev_hypos = jnp.broadcast_to(
                jnp.linspace(425, 935, pd)[None, :, None, None],
                (B, pd, ph, pw)).astype(jnp.float32)
            curve = "gauss1" if s == 1 else "laplace"
            fit = jax.jit(lambda de, dr, pv, hy, _d=d, _c=curve,
                          _p=(0.95 if s == 1 else 1e-5): refined_hypotheses(
                de, dr, pv, hy, ndepths=_d, curve_class=_c,
                prob_thresh=_p, upsample=True))
            t = timeit(fit, depth, drange, prob, prev_hypos)
            print(f"stage{s} fitting ({curve}): {t*1000:.1f} ms", flush=True)
            total_parts += t

    refine = RefineNet2(dtype=dtype, pallas_eval=True)
    half_depth = jnp.full((B, H // 2, W // 2), 600.0)
    rf_vars = refine.init(rng, half_depth, drange)
    rf = jax.jit(lambda v, de, r: refine.apply(v, de, r))
    t = timeit(rf, rf_vars, half_depth, drange)
    print(f"refine: {t*1000:.1f} ms", flush=True)
    total_parts += t

    prob2 = jax.nn.softmax(jax.random.uniform(rng, (B, 8, H // 2, W // 2)),
                           axis=1)
    conf = jax.jit(lambda p: resize_nearest_2x(confidence_regression(p)))
    t = timeit(conf, prob2)
    print(f"confidence+upsample: {t*1000:.1f} ms", flush=True)
    total_parts += t

    print(f"SUM OF PARTS: {total_parts*1000:.1f} ms vs FULL {t_full*1000:.1f} "
          f"(gap = boundary/regression/misc)", flush=True)


if __name__ == "__main__":
    main()
