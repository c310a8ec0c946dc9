"""Per-component fwd+bwd timing of the TRAIN configuration on the TPU chip.

Times each stage block's value_and_grad (wrt params AND inputs, as the real
backward does) in-jit, plus the full train step, at the reference batch-4
640x512 config. Same methodology/caveats as profile_eval_breakdown.py: the
in-jit scan carries per-invocation overhead for Pallas-heavy parts, so the
numbers rank siblings but do not exactly decompose the full step.
Developer tool.

Usage: python tools/profile_train_breakdown.py [--bf16] [--wfold] [-b B]
"""
import argparse
import time

import jax
import jax.numpy as jnp

REPS = 4


def timeit_injit(fn, perturb_arg, *args, reps=REPS):
    @jax.jit
    def many(*a):
        def body(c, _):
            aa = list(a)
            aa[perturb_arg] = aa[perturb_arg] + c.astype(aa[perturb_arg].dtype)
            out = fn(*aa)
            # keep EVERY output leaf alive: reducing only leaves[0] lets XLA
            # dead-code-eliminate the rest — for value_and_grad outputs that
            # silently dropped the whole backward pass from the measurement
            acc = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return jnp.float32(1e-30) * acc, ()
        y, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return y

    out = many(*args)
    _ = float(out)
    t0 = time.perf_counter()
    out = many(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / reps


def grad_of(apply_fn, variables, *args, wrt_arg=0):
    """scalar-loss value_and_grad wrt params and one input arg."""
    def loss(params, x):
        a = list(args)
        a[wrt_arg] = x
        out = apply_fn({**variables, "params": params}, *a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves
                   if hasattr(l, "astype"))
    return jax.value_and_grad(loss, argnums=(0, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--wfold", action="store_true")
    p.add_argument("-b", "--batch", type=int, default=4)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--skip-full", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="the published --fast train config: bf16 + wfold + "
                        "Pallas train U-Nets (custom-VJP conv3d)")
    a = p.parse_args()
    if a.fast:
        a.bf16 = a.wfold = True

    from mdfnet_tpu.config import ModelConfig, TrainConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.models.aggregate import VectorAggregate
    from mdfnet_tpu.models.backbone import FPN4Scales
    from mdfnet_tpu.models.refine import RefineNet2
    from mdfnet_tpu.models.regularize import RegularNet3Scales, RegularNet4Scales
    from mdfnet_tpu.ops.fitting import refined_hypotheses, uniform_hypotheses
    from mdfnet_tpu.train_lib import create_train_state, make_train_step
    from mdfnet_tpu import geometry

    H, W, V, B = 512, 640, 5, a.batch
    dtype = jnp.bfloat16 if a.bf16 else jnp.float32
    cd = "bfloat16" if a.bf16 else "float32"
    rng = jax.random.PRNGKey(0)

    t_full = 0.0
    if not a.skip_full:
        print(f"=== full train step (B={B}, bf16={a.bf16}, wfold={a.wfold}, "
              f"remat={a.remat}) ===", flush=True)
        scene = make_plane_scene(height=H, width=W, nviews=V,
                                 plane_depth=650.0, tilt=0.05)
        batch_np = make_batch(scene, batch=B)
        batch = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                     if isinstance(v, dict) else jnp.asarray(v))
                 for k, v in batch_np.items()}
        model_cfg = ModelConfig(warp_impl="pallas", remat=a.remat,
                                wfold=a.wfold, compute_dtype=cd,
                                pallas_conv=a.fast)
        model, state = create_train_state(jax.random.PRNGKey(0), model_cfg,
                                          batch)
        step = make_train_step(model, TrainConfig(batch_size=B))
        state, loss = step(state, batch)
        _ = float(loss)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            state, loss = step(state, batch)
        _ = float(loss)
        t_full = (time.perf_counter() - t0) / iters
        print(f"FULL train step: {t_full*1000:.0f} ms ({B/t_full:.2f} "
              f"items/s)", flush=True)

    total = 0.0

    # backbone fwd+bwd (the train path runs ONE view-major stacked pass
    # with per-view BN statistics — models/core.py)
    backbone = FPN4Scales(dtype=dtype)
    imgs = jax.random.uniform(rng, (V * B, H, W, 3), dtype)
    bb_vars = backbone.init(rng, imgs, True, V)
    g = grad_of(lambda v, x: backbone.apply(v, x, True, V,
                                            mutable=["batch_stats"])[0],
                bb_vars, imgs)
    t = timeit_injit(lambda x: g(bb_vars["params"], x), 0, imgs)
    print(f"backbone fwd+bwd (stacked {V} views): {t*1000:.1f} ms",
          flush=True)
    total += t

    intr = jnp.tile(jnp.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2],
                               [0, 0, 1]], jnp.float32), (B, V, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, V, 1, 1))
    extr = extr.at[:, 1:, 0, 3].set(jnp.arange(1, V) * 10.0)
    drange = jnp.tile(jnp.array([[425.0, 935.0]], jnp.float32), (B, 1))

    stage_cfg = [(8, 48, 64, 32), (4, 24, 32, 16), (2, 8, 16, 8)]
    for s, (div, d, c, gch) in enumerate(stage_cfg):
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

        agg = VectorAggregate(gch, dtype=dtype, warp_impl="pallas")
        agg_vars = agg.init(rng, feats, ref_proj, src_projs, hypos, True)

        def agg_loss(params, f0):
            out, _ = agg.apply({**agg_vars, "params": params},
                               [f0] + feats[1:], ref_proj, src_projs, hypos,
                               True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        ag = jax.value_and_grad(agg_loss, argnums=(0, 1))
        t = timeit_injit(lambda f0: ag(agg_vars["params"], f0), 0, feats[0])
        print(f"stage{s} aggregate fwd+bwd: {t*1000:.1f} ms", flush=True)
        total += t

        from mdfnet_tpu.ops import wfold as wf
        vol = jax.random.uniform(rng, (B, d, h, w, gch), dtype)
        reg = (RegularNet3Scales(16, dtype=dtype, use_fold=a.wfold) if s == 0
               else RegularNet4Scales(8, dtype=dtype, use_fold=a.wfold))
        reg_vars = reg.init(rng, vol, True)

        if a.fast:  # custom-VJP Pallas convs want (B, D, H, C, W)
            vol = jnp.transpose(vol, (0, 1, 2, 4, 3))

        def reg_loss(params, x, reg=reg, reg_vars=reg_vars):
            out, _ = reg.apply({**reg_vars, "params": params}, x, True,
                               a.fast, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        rg = jax.value_and_grad(reg_loss, argnums=(0, 1))
        t = timeit_injit(lambda x, rv=reg_vars, r=rg: r(rv["params"], x), 0,
                         vol)
        print(f"stage{s} U-Net fwd+bwd ({d}x{h}x{w}x{gch}): {t*1000:.1f} ms",
              flush=True)
        total += t

        if s > 0:
            prev_d = stage_cfg[s - 1][1]
            ph, pw = H // stage_cfg[s - 1][0], W // stage_cfg[s - 1][0]
            prob = jax.nn.softmax(
                jax.random.uniform(rng, (B, prev_d, ph, pw)), axis=1)
            depth = jnp.full((B, ph, pw), 600.0)
            prev_hypos = jnp.broadcast_to(
                jnp.linspace(425, 935, prev_d)[None, :, None, None],
                (B, prev_d, ph, pw)).astype(jnp.float32)
            curve = "gauss1" if s == 1 else "laplace"
            t = timeit_injit(
                lambda de, pv: refined_hypotheses(
                    de, drange, pv, prev_hypos, ndepths=d, curve_class=curve,
                    prob_thresh=(0.95 if s == 1 else 1e-5), upsample=True),
                1, depth, prob)
            print(f"stage{s} fitting ({curve}): {t*1000:.1f} ms", flush=True)
            total += t

    refine = RefineNet2(dtype=dtype)
    half_depth = jnp.full((B, H // 2, W // 2), 600.0)
    rf_vars = refine.init(rng, half_depth, drange)

    def rf_loss(params, de):
        out, _ = refine.apply({**rf_vars, "params": params}, de, drange,
                              True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)
    rfg = jax.value_and_grad(rf_loss, argnums=(0, 1))
    t = timeit_injit(lambda de: rfg(rf_vars["params"], de), 0, half_depth)
    print(f"refine fwd+bwd: {t*1000:.1f} ms", flush=True)
    total += t

    print(f"SUM OF PARTS: {total*1000:.0f} ms vs FULL {t_full*1000:.0f} "
          f"(full adds remat recompute, optimizer, loss, glue)", flush=True)


if __name__ == "__main__":
    main()
