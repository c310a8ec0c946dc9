"""Bench + HBM-fit the non-DTU BASELINE.json configs on the real chip
(VERDICT r3 item 4):

  - tanks-1920:  eval 1920x1056, 11 views (reference config.py:114-121,
                 tankseval.py:36 crop; ref-view depth range from cams_1)
  - tanks-2048:  eval 2048x1056, 11 views (the largest T&T intermediate)
  - blended-train: BlendedMVS train step 768x576, batch 6
                 (reference config.py:72-89)

Prints one line per config: ms, maps/s (eval) or ms/step (train), peak HBM.
Usage:  python tools/bench_configs.py [--configs tanks-1920,tanks-2048,blended-train]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def device_mem_mb():
    import jax
    try:
        stats = jax.devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 1e6
    except Exception:
        return float("nan")


def bench_eval(height, width, nviews, label):
    import jax
    import jax.numpy as jnp
    from mdfnet_tpu.config import ModelConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.models import build_model

    platform = jax.devices()[0].platform
    model = build_model(ModelConfig(
        compute_dtype="bfloat16" if platform != "cpu" else "float32",
        warp_impl="fused" if platform != "cpu" else "dense",
        pallas_conv=platform != "cpu"))
    scene = make_plane_scene(height=height, width=width, nviews=nviews,
                             plane_depth=650.0, tilt=0.05)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["depth_range"]))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), *args,
                                           train=False))()

    @jax.jit
    def fwd(*a):
        return model.apply(variables, *a, train=False)

    t0 = time.time()
    out = fwd(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fwd(*args)
        jax.block_until_ready(out)
        el = (time.perf_counter() - t0) / 5
        best = el if best is None else min(best, el)
    import numpy as np
    assert np.isfinite(np.asarray(out["depth"])).all()
    print(f"{label}: {best * 1e3:.1f} ms/map = {1 / best:.2f} maps/s "
          f"(compile {compile_s:.0f}s, peak HBM {device_mem_mb():.0f} MB)",
          flush=True)


def bench_train(height, width, batch_size, nviews, label):
    import jax
    import jax.numpy as jnp
    from mdfnet_tpu.config import ModelConfig, TrainConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.train_lib import create_train_state, make_train_step

    platform = jax.devices()[0].platform
    accel = platform != "cpu"
    cfg = ModelConfig(compute_dtype="bfloat16" if accel else "float32",
                      wfold=accel, warp_impl="pallas" if accel else "dense",
                      pallas_conv=accel)
    scene = make_plane_scene(height=height, width=width, nviews=nviews,
                             plane_depth=650.0, tilt=0.05,
                             depth_range=(425.0, 935.0))
    b = make_batch(scene, batch=batch_size)
    batch = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in b.items()}
    model, state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
    step = make_train_step(model, TrainConfig(batch_size=batch_size))
    t0 = time.time()
    state, loss = step(state, batch)
    loss = float(loss)
    compile_s = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            state, loss = step(state, batch)
        _ = float(loss)
        el = (time.perf_counter() - t0) / 3
        best = el if best is None else min(best, el)
    print(f"{label}: {best * 1e3:.0f} ms/step = "
          f"{batch_size / best:.2f} items/s (compile {compile_s:.0f}s, "
          f"peak HBM {device_mem_mb():.0f} MB, loss {loss:.4f})", flush=True)


CONFIGS = {
    # tanks eval heights are cropped to 1056 (reference tankseval.py:36)
    "tanks-1920": lambda: bench_eval(1056, 1920, 11, "tanks-1920x1056x11v"),
    "tanks-2048": lambda: bench_eval(1056, 2048, 11, "tanks-2048x1056x11v"),
    "blended-train": lambda: bench_train(576, 768, 6, 5,
                                         "blendedmvs-train 768x576 B=6"),
    "dtu-train": lambda: bench_train(512, 640, 4, 5, "dtu-train 640x512 B=4"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="tanks-1920,tanks-2048,blended-train")
    args = ap.parse_args()
    for name in args.configs.split(","):
        CONFIGS[name]()


if __name__ == "__main__":
    main()
