"""One-off: is the warp backward (dense tent-matmul VJP) the train-step
bottleneck?

profile_train_breakdown measured aggregate fwd+bwd wrt feats[0] — the REF
view, which is never warped, so the warp VJP never ran there. Here we time
the stage aggregates' fwd+bwd wrt a SRC view (exercises the custom VJP ->
homography_warp_dense transpose) vs wrt the ref view, at B=4 640x512 train
shapes, plus the bare warp fwd / fwd+bwd. Developer tool.
"""
import time

import jax
import jax.numpy as jnp

from mdfnet_tpu import geometry
from mdfnet_tpu.config import ModelConfig
from mdfnet_tpu.models.aggregate import VectorAggregate

REPS = 4


def timeit_injit(fn, perturb_arg, *args, reps=REPS):
    @jax.jit
    def many(*a):
        def body(c, _):
            aa = list(a)
            aa[perturb_arg] = aa[perturb_arg] + c.astype(aa[perturb_arg].dtype)
            out = fn(*aa)
            # keep EVERY output leaf alive (see profile_train_breakdown.py:
            # reducing only leaves[0] DCEs the backward out of the timing)
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


def main():
    H, W, V, B = 512, 640, 5, 4
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

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
        hypos = (jnp.broadcast_to(
            jnp.linspace(500, 700, d)[None, :, None, None],
            (B, d, 1, 1) if s == 0 else (B, d, h, w))).astype(jnp.float32)

        # bare warp: fwd only, then fwd+bwd wrt src_feat
        from mdfnet_tpu.ops.pallas.warp_kernel import homography_warp_pallas
        t = timeit_injit(
            lambda f: homography_warp_pallas(f, src_projs[:, 0], ref_proj,
                                             hypos), 0, feats[1])
        print(f"stage{s} warp fwd (1 src): {t*1000:.1f} ms", flush=True)

        def wloss(f):
            y = homography_warp_pallas(f, src_projs[:, 0], ref_proj, hypos)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        t = timeit_injit(lambda f: jax.value_and_grad(wloss)(f), 0, feats[1])
        print(f"stage{s} warp fwd+bwd (1 src): {t*1000:.1f} ms", flush=True)

        agg = VectorAggregate(gch, dtype=dtype, warp_impl="pallas")
        agg_vars = agg.init(rng, feats, ref_proj, src_projs, hypos, True)

        for wrt, label in ((0, "ref"), (1, "src1")):
            def agg_loss(params, fx, wrt=wrt):
                fs = list(feats)
                fs[wrt] = fx
                out, _ = agg.apply({**agg_vars, "params": params}, fs,
                                   ref_proj, src_projs, hypos, True,
                                   mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)
            ag = jax.value_and_grad(agg_loss, argnums=(0, 1))
            t = timeit_injit(lambda fx: ag(agg_vars["params"], fx), 0,
                             feats[wrt])
            print(f"stage{s} aggregate fwd+bwd wrt {label}: {t*1000:.1f} ms",
                  flush=True)

        # all views require grad (the real training situation)
        def agg_loss_all(params, *fs):
            out, _ = agg.apply({**agg_vars, "params": params}, list(fs),
                               ref_proj, src_projs, hypos, True,
                               mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        ag = jax.value_and_grad(agg_loss_all, argnums=tuple(range(V + 1)))
        t = timeit_injit(lambda f0: ag(agg_vars["params"], f0, *feats[1:]),
                         0, feats[0])
        print(f"stage{s} aggregate fwd+bwd wrt ALL views: {t*1000:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
