"""Experiments: backbone layer costs + pltpu.roll feasibility. Dev tool."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=6):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def conv_nhwc(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    V, H, W = 5, 1184, 1600

    print("--- XLA per-layer backbone (bf16, NHWC) ---", flush=True)
    layers = [
        # (name, h, w, ci, co, k, stride)
        ("conv01_0", H, W, 3, 8, 3, 1),
        ("conv01_1a", H, W, 8, 8, 3, 1),
        ("conv01_1b", H, W, 8, 8, 3, 1),
        ("conv12_0", H, W, 8, 16, 5, 2),
        ("conv12_1a", H // 2, W // 2, 16, 16, 3, 1),
        ("conv12_1b", H // 2, W // 2, 16, 16, 3, 1),
        ("conv23_0", H // 2, W // 2, 16, 32, 5, 2),
        ("conv23_1a", H // 4, W // 4, 32, 32, 3, 1),
        ("conv23_1b", H // 4, W // 4, 32, 32, 3, 1),
        ("conv34_0", H // 4, W // 4, 32, 64, 5, 2),
        ("conv34_1a", H // 8, W // 8, 64, 64, 3, 1),
        ("conv34_1b", H // 8, W // 8, 64, 64, 3, 1),
        ("lat2_1x1", H // 2, W // 2, 16, 64, 1, 1),
        ("out2_1x1", H // 2, W // 2, 64, 16, 1, 1),
    ]
    total = 0.0
    for name, h, w, ci, co, ks, st in layers:
        x = jax.random.uniform(rng, (V, h, w, ci), dt)
        k = jax.random.uniform(rng, (ks, ks, ci, co), dt) * 0.1
        f = jax.jit(functools.partial(conv_nhwc, stride=st, pad=(ks - 1) // 2))
        t = timeit(f, x, k)
        gf = V * (h // st) * (w // st) * ks * ks * ci * co * 2 / 1e9
        total += t
        print(f"{name}: {t*1000:6.2f} ms  ({gf:.1f} GF, {gf/t/1000:.2f} TF/s)",
              flush=True)
    print(f"XLA conv total: {total*1000:.1f} ms", flush=True)

    print("--- pltpu.roll microtest ---", flush=True)
    try:
        def roll_kernel(x_ref, o_ref):
            x = x_ref[...]
            o_ref[...] = (x + pltpu.roll(x, 1, 1) + pltpu.roll(x, -1, 1)
                          ).astype(o_ref.dtype)

        x = jax.random.uniform(rng, (64, 256), dt)
        out = pl.pallas_call(
            roll_kernel,
            out_shape=jax.ShapeDtypeStruct((64, 256), dt),
        )(x)
        ref = (np.asarray(x, np.float32) + np.roll(np.asarray(x, np.float32), 1, 1)
               + np.roll(np.asarray(x, np.float32), -1, 1))
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        print(f"pltpu.roll works on lanes, max err {err:.5f}", flush=True)
    except Exception as e:
        print(f"pltpu.roll FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    print("--- refine breakdown (C=1 convs at half/full res) ---", flush=True)
    # refine: depth (B, H/2, W/2, 1) -> conv 1->32 -> 3 res blocks 32ch ->
    # conv 32->4 -> pixelshuffle.  Time the 1->32 and a 32->32 at half res.
    x1 = jax.random.uniform(rng, (1, H // 2, W // 2, 1), dt)
    k1 = jax.random.uniform(rng, (3, 3, 1, 32), dt) * 0.1
    f = jax.jit(functools.partial(conv_nhwc, stride=1, pad=1))
    print(f"refine conv 1->32: {timeit(f, x1, k1)*1000:.2f} ms", flush=True)
    x32 = jax.random.uniform(rng, (1, H // 2, W // 2, 32), dt)
    k32 = jax.random.uniform(rng, (3, 3, 32, 32), dt) * 0.1
    print(f"refine conv 32->32: {timeit(f, x32, k32)*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
