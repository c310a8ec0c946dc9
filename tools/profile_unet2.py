"""Layer-by-layer timing of the stage-2 U-Net (the worst bucket at head:
17 ms inflated for a 63 MB volume whose bandwidth floor is ~3 ms).

Times each conv3d_bn_relu / trconv3d / ProbConv call at its exact stage-2
shape with the in-jit scan harness (see profile_eval_breakdown.py for the
methodology caveats). Developer tool."""
import time

import jax
import jax.numpy as jnp

REPS = 16


def timeit_injit(fn, *args, reps=REPS):
    @jax.jit
    def many(*a):
        def body(c, _):
            aa = list(a)
            aa[0] = aa[0] + c.astype(aa[0].dtype)
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
    from mdfnet_tpu.ops.pallas.conv3d_kernel import (
        conv3d_bn_relu, trconv3d_bn_relu)

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def mk(shape, dtype=dt):
        return jax.random.uniform(rng, shape, dtype)

    total = 0.0
    # (name, fn, x_shape, (kshape, co), stride_or_tr, valid_w)
    cases = [
        ("conv01    (8,592,8,896)->8",  (8, 592, 8, 896), 8, 1, 800),
        ("conv12_0 s2 ->(4,296,16)",    (8, 592, 8, 896), 16, 2, 800),
        ("conv12_1  (4,296,16,512)",    (4, 296, 16, 512), 16, 1, 400),
        ("conv23_0 s2 ->(2,148,32)",    (4, 296, 16, 512), 32, 2, 400),
        ("conv23_1  (2,148,32,256)",    (2, 148, 32, 256), 32, 1, 200),
        ("conv343_0 s2 ->(1,74,64)",    (2, 148, 32, 256), 64, 2, 200),
        ("conv343_1 (1,74,64,128)",     (1, 74, 64, 128), 64, 1, 100),
        ("conv343_2 tr->(2,148,32)",    (1, 74, 64, 128), 32, "tr", 100),
        ("trconv32  tr->(4,296,16)",    (2, 148, 32, 256), 16, "tr", 200),
        ("trconv21  tr->(8,592,8)",     (4, 296, 16, 512), 8, "tr", 400),
    ]
    for name, xs, co, stride, vw in cases:
        ci = xs[2]
        x = mk(xs)
        if stride == "tr":
            k = mk((3, 3, 3, co, ci))
            fn = lambda xx, kk=k, co_=co: trconv3d_bn_relu(
                xx, kk, jnp.ones((co_,), jnp.float32),
                jnp.zeros((co_,), jnp.float32), valid_w=vw, keep_wpad=True)
        else:
            k = mk((3, 3, 3, ci, co))
            fn = lambda xx, kk=k, co_=co, s=stride: conv3d_bn_relu(
                xx, kk, jnp.ones((co_,), jnp.float32),
                jnp.zeros((co_,), jnp.float32), stride=s, valid_w=vw,
                keep_wpad=True)
        t = timeit_injit(fn, x)
        total += t
        print(f"{name}: {t*1000:.2f} ms", flush=True)

    # ProbConv (3 conv2d_fused over D-shifted views) + softmax
    from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused
    x = mk((8, 592, 8, 896))
    k = mk((3, 3, 3, 8, 1))
    one = jnp.ones((1,), jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)

    def prob(xx):
        xp = jnp.pad(xx, ((1, 1), (0, 0), (0, 0), (0, 0)))
        acc = jnp.zeros((8, 592, 896), jnp.float32)
        for dz in range(3):
            y = conv2d_fused(xp[dz:dz + 8], k[dz], one, zero, relu=False,
                             valid_w=800)
            acc = acc + jnp.pad(y[:, :, 0, :], ((0, 0), (0, 0), (0, 96)))
        return jax.nn.softmax(acc[..., :800], axis=0)

    t = timeit_injit(prob, x)
    total += t
    print(f"prob+softmax: {t*1000:.2f} ms", flush=True)
    print(f"SUM: {total*1000:.2f} ms (U-Net standalone measured 17.0)",
          flush=True)


if __name__ == "__main__":
    main()
