"""True HBM stream bandwidth with the corrected harness: the scanned copy is
the CARRY (XLA cannot DCE it), 32 reps, floor cancelled by the size sweep.
Developer tool."""
import time

import jax
import jax.numpy as jnp


def time_scan(x, reps=32):
    @jax.jit
    def many(a, s):
        def body(arr, _):
            return arr * s, ()
        y, _ = jax.lax.scan(body, a, None, length=reps)
        return y.ravel()[0]

    s = jnp.ones((), x.dtype)
    out = many(x, s)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(many(x, s))
    return (time.perf_counter() - t0) / reps


def main():
    for mb, dtype in [(16, jnp.bfloat16), (64, jnp.bfloat16),
                      (256, jnp.bfloat16), (256, jnp.float32)]:
        n = mb * 1024 * 1024 // (2 if dtype == jnp.bfloat16 else 4)
        x = jnp.ones((n // 128, 128), dtype)
        t = time_scan(x)
        bw = 2 * mb / 1024 / t  # read + write
        print(f"copy {mb} MB {dtype.__name__}: {t*1000:.3f} ms "
              f"-> {bw:.0f} GB/s (r+w)", flush=True)


if __name__ == "__main__":
    main()
