"""Measure the fixed per-pallas_call overhead inside one jit on this chip.

Scans N invocations of (a) a trivial 1-step Pallas copy kernel, (b) the same
kernel invoked K times per scan step, and (c) a pure-XLA elementwise op of
the same size — the slope vs K is the marginal cost of ONE pallas_call.
Developer tool."""
import time
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def tiny_copy(x, salt: int):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.float32(salt * 1e-9).astype(x_ref.dtype)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def time_scan(fn, x, reps=32):
    @jax.jit
    def many(a):
        def body(c, _):
            y = fn(a + c.astype(a.dtype))
            return jnp.float32(1e-30) * y.astype(jnp.float32).ravel()[0], ()
        y, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return y

    out = many(x)
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(many(x))
    return (time.perf_counter() - t0) / reps


def main():
    x = jnp.ones((8, 128), jnp.float32)

    for k in (1, 2, 4, 8):
        def fnk(a, k=k):
            y = a
            for i in range(k):
                y = tiny_copy(y, i + 1)  # distinct salts defeat CSE
            return y
        t = time_scan(fnk, x)
        print(f"pallas tiny copy x{k}/step: {t*1000:.3f} ms/step", flush=True)

    def xla_chain(a):
        y = a
        for i in range(8):
            y = y * (1.0 + i * 1e-9) + 1e-9
        return y
    t = time_scan(xla_chain, x)
    print(f"XLA 8-op chain: {t*1000:.3f} ms/step", flush=True)

    # a mid-size kernel: does overhead scale with grid steps?
    big = jnp.ones((4, 296, 16, 512), jnp.bfloat16)

    def grid_copy(a, nsteps):
        th = -(-296 // nsteps)

        def kern(x_ref, o_ref):
            o_ref[...] = x_ref[...] * jnp.bfloat16(1.0001)

        return pl.pallas_call(
            kern,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((4, th, 16, 512), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((4, th, 16, 512), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        )(a)

    for nsteps in (4, 8, 37, 74):
        if 296 % nsteps:
            continue
        t = time_scan(functools.partial(grid_copy, nsteps=nsteps), big)
        print(f"grid copy (4,296,16,512) {nsteps} steps: {t*1000:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
