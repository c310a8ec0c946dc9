"""Go/no-go for a folded-D (2D, D-in-channels) stage-2 U-Net: time
conv2d_fused at the folded shapes vs the conv3d layers they would replace
(see /tmp/unet2.log: conv01 ~1.3, conv12_0 ~2.7, trconv21 ~2.7, prob ~1.5 ms
real after the ~1.4 ms harness floor). Developer tool."""
import time

import jax
import jax.numpy as jnp


def time_scan(fn, *args, reps=32):
    @jax.jit
    def many(*a):
        def body(c, _):
            aa = list(a)
            aa[0] = aa[0] + c.astype(aa[0].dtype)
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
    from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    cases = [
        # folded stage-2 level-0 stride-1: (H, D*C, W) 64ch
        ("folded conv01  (1,592,64,896) 64->64 s1", (1, 592, 64, 896),
         64, 64, 1, 800),
        # folded stride-2 (D-stride rides the channel band)
        ("folded conv12_0 (1,592,64,896) 64->64 s2", (1, 592, 64, 896),
         64, 64, 2, 800),
        # folded trconv21: coarse-grid conv co=4 phases x 64
        ("folded trconv21 (1,296,64,512) 64->256 s1", (1, 296, 64, 512),
         64, 256, 1, 400),
        # folded prob conv
        ("folded prob    (1,592,64,896) 64->8 s1", (1, 592, 64, 896),
         64, 8, 1, 800),
        # ---- stage-1 candidates (D=24 x c0=8 = 192 folded channels) ----
        ("s1 folded conv01  (1,296,384,512) 384->192 s1", (1, 296, 384, 512),
         384, 192, 1, 400),
        ("s1 folded conv12_0 (1,296,192,512) s2", (1, 296, 192, 512),
         192, 192, 2, 400),
        ("s1 folded conv12_1 (1,148,192,256) s1", (1, 148, 192, 256),
         192, 192, 1, 200),
        ("s1 folded trconv21 (1,148,192,256) ->768 s1", (1, 148, 192, 256),
         192, 768, 1, 200),
        ("s1 folded prob    (1,296,192,512) ->24 s1", (1, 296, 192, 512),
         192, 24, 1, 400),
    ]
    for name, xs, ci, co, stride, vw in cases:
        x = jax.random.uniform(rng, xs, dt)
        k = jax.random.uniform(rng, (3, 3, ci, co), dt) * 0.05
        one = jnp.ones((co,), jnp.float32)
        zero = jnp.zeros((co,), jnp.float32)

        def fn(xx, kk=k, s=stride):
            return conv2d_fused(xx, kk, one, zero, relu=True, stride=s,
                                valid_w=vw, keep_wpad=True)
        t = time_scan(fn, x)
        print(f"{name}: {t*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
