"""Dense-warp variant timing on the TPU (developer tool)."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    r = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    from mdfnet_tpu import geometry
    from mdfnet_tpu.ops.warp_dense import homography_warp_dense
    from mdfnet_tpu.ops import warp_dense

    H, W, V = 1184, 1600, 5
    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    intr = jnp.tile(jnp.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2],
                               [0, 0, 1]], jnp.float32), (1, V, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, V, 1, 1))
    extr = extr.at[:, 1:, 0, 3].set(jnp.arange(1, V) * 10.0)

    for s, (div, d, c) in enumerate([(8, 48, 64), (4, 24, 32), (2, 8, 16)]):
        h, w = H // div, W // div
        feat = jax.random.uniform(rng, (1, h, w, c), dtype)
        rp, sp = geometry.projection_matrices(intr, extr, s)
        hyp = jnp.broadcast_to(jnp.linspace(500, 700, d)[None, :, None, None],
                               (1, d, h, w)).astype(jnp.float32)

        # coordinate computation alone
        def coords_only(f, spp, rpp, hy):
            xs, ys = geometry.sweep_coordinates(spp, rpp, hy, h, w)
            return xs + ys
        t = timeit(jax.jit(coords_only), feat, sp[:, 0], rp, hyp)
        print(f"stage{s} coords: {t*1000:.1f} ms")

        for (xt, ck) in [(128, 512), (256, 512), (128, 2048), (256, 2048)]:
            fn = jax.jit(partial(homography_warp_dense, x_tile=xt,
                                 y_window=16, x_margin=64, chunk_tiles=ck))
            try:
                t = timeit(fn, feat, sp[:, 0], rp, hyp)
                print(f"stage{s} dense xt={xt} ck={ck}: {t*1000:.1f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"stage{s} dense xt={xt} ck={ck}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
