"""Measure the coverage-fallback penalty at bench scale (VERDICT r3 item 9).

A coverage-contract violation makes evaluate.run_eval re-run the item on the
guaranteed-exact gather warp (evaluate.py) — the effective cost of a trip is
fast_forward + gather_forward. This prints both forwards at the DTU bench
config so BENCH.md can record the penalty; the trip RATE on real scenes is
logged by run_eval's returned stats (n_coverage_fallbacks).

Usage:  python tools/bench_fallback.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mdfnet_tpu.config import ModelConfig
from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
from mdfnet_tpu.models import build_model


def bench(model, variables, args, label):
    @jax.jit
    def fwd(*a):
        return model.apply(variables, *a, train=False)

    out = fwd(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fwd(*args)
        jax.block_until_ready(out)
        el = (time.perf_counter() - t0) / 5
        best = el if best is None else min(best, el)
    assert np.isfinite(np.asarray(out["depth"])).all()
    print(f"{label}: {best * 1e3:.1f} ms/map", flush=True)
    return best


def main():
    height, width, nviews = 1184, 1600, 5
    platform = jax.devices()[0].platform
    dtype = "bfloat16" if platform != "cpu" else "float32"

    scene = make_plane_scene(height=height, width=width, nviews=nviews,
                             plane_depth=650.0, tilt=0.05)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["depth_range"]))

    fast = build_model(ModelConfig(compute_dtype=dtype,
                                   warp_impl="fused" if platform != "cpu"
                                   else "dense",
                                   pallas_conv=platform != "cpu"))
    variables = jax.jit(lambda: fast.init(jax.random.PRNGKey(0), *args,
                                          train=False))()
    t_fast = bench(fast, variables, args, "fast path (fused+pallas)")

    gather = build_model(ModelConfig(compute_dtype=dtype,
                                     warp_impl="gather"))
    t_gather = bench(gather, variables, args, "gather fallback path")
    print(f"one coverage trip costs fast+gather = "
          f"{(t_fast + t_gather) * 1e3:.1f} ms "
          f"({(t_fast + t_gather) / t_fast:.2f}x a clean map); a trip rate r "
          f"scales throughput by 1/(1 + r*{t_gather / t_fast:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
