"""Aggregate-kernel-only timing at the bench configuration (dev tool)."""
import time

import jax
import jax.numpy as jnp

from tools.profile_eval_breakdown import timeit_injit


def main():
    from mdfnet_tpu.models.aggregate import VectorAggregate
    from mdfnet_tpu import geometry
    from mdfnet_tpu.ops.fitting import uniform_hypotheses

    H, W, V, B = 1184, 1600, 5, 1
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    intr = jnp.tile(jnp.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2],
                               [0, 0, 1]], jnp.float32), (B, V, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, V, 1, 1))
    extr = extr.at[:, 1:, 0, 3].set(jnp.arange(1, V) * 10.0)
    drange = jnp.tile(jnp.array([[425.0, 935.0]], jnp.float32), (B, 1))

    stage_cfg = [(8, 48, 64, 32), (4, 24, 8, 4), (2, 8, 16, 8)]
    stage_cfg = [(8, 48, 64, 32), (4, 24, 32, 16), (2, 8, 16, 8)]
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
                     for f in feats]
        agg = VectorAggregate(g, dtype=dtype, warp_impl="fused")
        agg_vars = agg.init(rng, feats, ref_proj, src_projs, hypos,
                            False, hcw_diffs)
        t = timeit_injit(
            lambda pd0, *pd: agg.apply(agg_vars, feats, ref_proj, src_projs,
                                       hypos, False, [pd0] + list(pd)),
            0, *hcw_diffs)
        print(f"stage{s} aggregate: {t*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
