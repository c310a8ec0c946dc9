"""Sub-part timing of refined_hypotheses at the two bench call sites.
Developer tool (see profile_call_overhead.py: ~1 ms/step harness floor)."""
import time

import jax
import jax.numpy as jnp


def time_scan(fn, *args, reps=32):
    @jax.jit
    def many(*a):
        def body(c, _):
            aa = list(a)
            aa[0] = aa[0] + c.astype(aa[0].dtype) * 1e-6
            y = fn(*aa)
            leaf = jax.tree_util.tree_leaves(y)[0]
            return jnp.float32(1e-30) * leaf.astype(jnp.float32).ravel()[0], ()
        y, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return y

    out = many(*args)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(many(*args))
    return (time.perf_counter() - t0) / reps


def main():
    from mdfnet_tpu.ops.fitting import (fit_gauss1, fit_laplace,
                                        refined_hypotheses)
    from mdfnet_tpu.ops.sample import resize_bilinear_2x

    rng = jax.random.PRNGKey(0)
    B = 1
    drange = jnp.tile(jnp.array([[425.0, 935.0]], jnp.float32), (B, 1))

    for name, (d, h, w), curve, nd_next, hypkind in [
        ("stage1 gauss1", (48, 148, 200), "gauss1", 24, "bcast"),
        ("stage2 laplace", (24, 296, 400), "laplace", 8, "full"),
    ]:
        prob = jax.nn.softmax(jax.random.uniform(rng, (B, d, h, w)), axis=1)
        depth = jnp.full((B, h, w), 600.0) + jax.random.uniform(
            rng, (B, h, w)) * 10
        if hypkind == "bcast":
            hyp = jnp.linspace(425, 935, d).reshape(1, d, 1, 1)
            hyp = jnp.broadcast_to(hyp, (B, d, 1, 1))
        else:
            hyp = jnp.broadcast_to(
                jnp.linspace(500, 700, d)[None, :, None, None],
                (B, d, h, w)).astype(jnp.float32)

        fitter = fit_gauss1 if curve == "gauss1" else fit_laplace
        t = time_scan(lambda de, p, hy: fitter(de, p, hy), depth, prob, hyp)
        print(f"{name}: fit only: {t*1000:.2f} ms", flush=True)

        t = time_scan(lambda de: resize_bilinear_2x(de), depth)
        print(f"{name}: one 2x upsample ({h}x{w}): {t*1000:.2f} ms",
              flush=True)

        t = time_scan(
            lambda de, p, hy: refined_hypotheses(
                de, drange, p, hy, ndepths=nd_next, curve_class=curve,
                prob_thresh=0.95 if curve == "gauss1" else 1e-5,
                upsample=True),
            depth, prob, hyp)
        print(f"{name}: refined_hypotheses FULL: {t*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
