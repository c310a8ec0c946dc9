"""Per-component timing of the BENCH configuration on the real TPU chip.

Each part is timed IN-JIT (a lax.scan of REPS invocations with an input
perturbation to defeat CSE) — a standalone jit call through the axon tunnel
costs ~6.5 ms of dispatch, which used to inflate every per-part number.
Developer tool.
"""
import time

import jax
import jax.numpy as jnp

REPS = 8


def timeit_injit(fn, perturb_arg, *args, reps=REPS):
    """Time fn(*args) averaged over an in-jit scan; ``perturb_arg`` is the
    index of the array argument to perturb per step (defeats CSE/LICM)."""
    @jax.jit
    def many(*a):
        def body(c, _):
            aa = list(a)
            aa[perturb_arg] = aa[perturb_arg] + c.astype(aa[perturb_arg].dtype)
            out = fn(*aa)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.float32(1e-30) * leaf.astype(jnp.float32).ravel()[0], ()
        y, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return y

    out = many(*args)
    _ = float(out)
    t0 = time.perf_counter()
    out = many(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / reps


def main():
    from mdfnet_tpu.config import ModelConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.models import build_model
    from mdfnet_tpu.models.aggregate import VectorAggregate
    from mdfnet_tpu.models.backbone import FPN4Scales
    from mdfnet_tpu.models.refine import RefineNet2
    from mdfnet_tpu.models.regularize import RegularNet3Scales, RegularNet4Scales
    from mdfnet_tpu.ops.fitting import refined_hypotheses, uniform_hypotheses
    from mdfnet_tpu.ops.regress import confidence_regression
    from mdfnet_tpu.ops.sample import resize_nearest_2x
    from mdfnet_tpu import geometry

    H, W, V = 1184, 1600, 5
    B = 1
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    print("=== full forward (bench config) ===", flush=True)
    model = build_model(ModelConfig(compute_dtype="bfloat16",
                                    warp_impl="fused", pallas_conv=True))
    scene = make_plane_scene(height=H, width=W, nviews=V,
                             plane_depth=650.0, tilt=0.05)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]), jnp.asarray(batch["depth_range"]))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), *args,
                                           train=False))()
    t_full = timeit_injit(
        lambda *a: model.apply(variables, *a, train=False), 0, *args)
    print(f"FULL forward: {t_full*1000:.1f} ms = {1/t_full:.2f} maps/s",
          flush=True)

    print("=== backbone (5 views stacked) ===", flush=True)
    backbone = FPN4Scales(dtype=dtype, pallas_eval=True)
    imgs = jax.random.uniform(rng, (B * V, H, W, 3), dtype)
    bb_vars = backbone.init(rng, imgs)
    t = timeit_injit(lambda x: backbone.apply(bb_vars, x), 0, imgs)
    print(f"backbone stacked x{V}: {t*1000:.1f} ms", flush=True)
    total_parts = t

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
        feats = [jax.random.uniform(jax.random.fold_in(rng, v),
                                    (B, h, w, c), dtype) for v in range(V)]
        ref_proj, src_projs = geometry.projection_matrices(intr, extr, s)
        if s == 0:
            hypos = uniform_hypotheses(drange, d)
        else:
            hypos = jnp.broadcast_to(
                jnp.linspace(500, 700, d)[None, :, None, None],
                (B, d, h, w)).astype(jnp.float32)

        hcw_diffs = [jnp.transpose(f[..., 0::2] - f[..., 1::2], (0, 1, 3, 2))
                     for f in feats]  # (B, H, G, W)
        agg = VectorAggregate(g, dtype=dtype, warp_impl="fused")
        agg_vars = agg.init(rng, feats, ref_proj, src_projs, hypos,
                            False, hcw_diffs)
        t = timeit_injit(
            lambda pd0, *pd: agg.apply(agg_vars, feats, ref_proj, src_projs,
                                       hypos, False, [pd0] + list(pd)),
            0, *hcw_diffs)
        print(f"stage{s} aggregate (fused rowsweep): {t*1000:.1f} ms",
              flush=True)
        total_parts += t

        wpad = -(-w // 128) * 128
        vol = jax.random.uniform(rng, (B, d, h, g, wpad), dtype)
        reg = (RegularNet3Scales(16, dtype=dtype, pallas_eval=True) if s == 0
               else RegularNet4Scales(8, dtype=dtype, pallas_eval=True))
        reg_vars = reg.init(rng, vol[..., :w].transpose(0, 1, 2, 4, 3))
        t = timeit_injit(lambda x: reg.apply(reg_vars, x[..., :w], dhcw=True),
                         0, vol)
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
            t = timeit_injit(
                lambda de, pv: refined_hypotheses(
                    de, drange, pv, prev_hypos, ndepths=d, curve_class=curve,
                    prob_thresh=(0.95 if s == 1 else 1e-5), upsample=True),
                1, depth, prob)
            print(f"stage{s} fitting ({curve}): {t*1000:.1f} ms", flush=True)
            total_parts += t

    refine = RefineNet2(dtype=dtype, pallas_eval=True)
    half_depth = jnp.full((B, H // 2, W // 2), 600.0)
    rf_vars = refine.init(rng, half_depth, drange)
    t = timeit_injit(lambda de: refine.apply(rf_vars, de, drange), 0,
                     half_depth)
    print(f"refine: {t*1000:.1f} ms", flush=True)
    total_parts += t

    prob2 = jax.nn.softmax(jax.random.uniform(rng, (B, 8, H // 2, W // 2)),
                           axis=1)
    t = timeit_injit(lambda p: resize_nearest_2x(confidence_regression(p)),
                     0, prob2)
    print(f"confidence+upsample: {t*1000:.1f} ms", flush=True)
    total_parts += t

    print(f"SUM OF PARTS: {total_parts*1000:.1f} ms vs FULL {t_full*1000:.1f} "
          f"(gap = boundary/regression/misc)", flush=True)


if __name__ == "__main__":
    main()
