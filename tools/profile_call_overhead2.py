"""Marginal cost of ONE real conv3d_bn_relu pallas_call: time K chained
invocations per scan step; the slope vs K is the true per-call cost with
the ~1 ms/step scan-harness floor cancelled. Developer tool."""
import time

import jax
import jax.numpy as jnp


def time_scan(fn, x, reps=32):
    @jax.jit
    def many(a):
        def body(c, _):
            y = fn(a + c.astype(a.dtype))
            leaf = jax.tree_util.tree_leaves(y)[0]
            return jnp.float32(1e-30) * leaf.astype(jnp.float32).ravel()[0], ()
        y, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return y

    out = many(x)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(many(x))
    return (time.perf_counter() - t0) / reps


def main():
    from mdfnet_tpu.ops.pallas.conv3d_kernel import conv3d_bn_relu

    rng = jax.random.PRNGKey(0)

    for shape, ci, co, label in [
        ((1, 74, 64, 128), 64, 64, "conv343_1 tiny"),
        ((2, 148, 32, 256), 32, 32, "conv23_1 small"),
        ((4, 296, 16, 512), 16, 16, "conv12_1 mid"),
    ]:
        x = jax.random.uniform(rng, shape, jnp.bfloat16)
        ks = [jax.random.uniform(jax.random.fold_in(rng, i),
                                 (3, 3, 3, ci, co), jnp.bfloat16) * 0.1
              for i in range(4)]
        one = jnp.ones((co,), jnp.float32)
        zero = jnp.zeros((co,), jnp.float32)

        prev = None
        for k in (1, 2, 4):
            def fnk(a, k=k):
                y = a
                for i in range(k):
                    y = conv3d_bn_relu(y, ks[i], one, zero, stride=1)
                return y
            t = time_scan(fnk, x)
            msg = f"{label} x{k}: {t*1000:.3f} ms/step"
            if prev is not None:
                msg += f"  (marginal {1000*(t - prev):.3f} ms/call)"
            prev = t
            print(msg, flush=True)


if __name__ == "__main__":
    main()
