"""Bench + HBM-fit ALL BASELINE.json configs on the real chip and emit a
machine-readable artifact (VERDICT r4 items 5+6):

  - dtu-eval:    eval 1600x1184, 5 views (the bench.py headline config)
  - tanks-1920:  eval 1920x1056, 11 views (reference config.py:114-121,
                 tankseval.py:36 crop; ref-view depth range from cams_1)
  - tanks-2048:  eval 2048x1056, 11 views (the largest T&T intermediate)
  - blended-train: BlendedMVS train step 768x576, batch 6
                 (reference config.py:72-89)
  - dtu-train:   DTU train step 640x512, batch 4 (reference train.py:36-45)

Peak HBM: `device.memory_stats()` is not exposed through the axon tunnel,
so each config also reports the COMPILE-TIME memory analysis of its jitted
step (temp + argument + output bytes) — XLA's own allocation plan, which is
what actually bounds fit. The reference publishes 4,396 MB at DTU eval
(reference README.md:70-72).

Usage:
  python tools/bench_configs.py [--configs dtu-eval,...] [--json OUT.json]

Each config prints one human line and, with --json, appends a JSON object
to the artifact (committed as BENCH_configs_r{N}.json round-over-round).
"""
import argparse
import json
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


def compiled_mem_mb(compiled):
    """XLA's compile-time allocation plan in MB: temp (live intermediate
    buffers at the high-water mark) + argument + output bytes."""
    try:
        ma = compiled.memory_analysis()
        return {
            "hbm_temp_mb": ma.temp_size_in_bytes / 1e6,
            "hbm_args_mb": ma.argument_size_in_bytes / 1e6,
            "hbm_out_mb": ma.output_size_in_bytes / 1e6,
            "hbm_total_mb": (ma.temp_size_in_bytes
                             + ma.argument_size_in_bytes
                             + ma.output_size_in_bytes) / 1e6,
        }
    except Exception as e:  # pragma: no cover - backend without analysis
        return {"hbm_total_mb": float("nan"), "hbm_error": str(e)}


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

    def apply(*a):
        return model.apply(variables, *a, train=False)

    t0 = time.time()
    lowered = jax.jit(apply).lower(*args)
    compiled = lowered.compile()
    fwd = compiled
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
    mem = compiled_mem_mb(compiled)
    rec = {"config": label, "kind": "eval", "height": height, "width": width,
           "nviews": nviews, "ms_per_map": best * 1e3,
           "maps_per_sec": 1 / best, "compile_s": compile_s,
           "runtime_peak_hbm_mb": device_mem_mb(), **mem}
    print(f"{label}: {best * 1e3:.1f} ms/map = {1 / best:.2f} maps/s "
          f"(compile {compile_s:.0f}s, plan HBM "
          f"{mem.get('hbm_total_mb', float('nan')):.0f} MB)", flush=True)
    return rec


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
    lowered = step.lower(state, batch) if hasattr(step, "lower") else None
    compiled = lowered.compile() if lowered is not None else None
    if compiled is not None:
        state, loss = compiled(state, batch)
    else:
        state, loss = step(state, batch)
    loss = float(loss)
    compile_s = time.time() - t0
    runner = compiled if compiled is not None else step
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            state, loss = runner(state, batch)
        _ = float(loss)
        el = (time.perf_counter() - t0) / 3
        best = el if best is None else min(best, el)
    mem = (compiled_mem_mb(compiled) if compiled is not None
           else {"hbm_total_mb": float("nan")})
    rec = {"config": label, "kind": "train", "height": height, "width": width,
           "batch_size": batch_size, "nviews": nviews,
           "ms_per_step": best * 1e3, "items_per_sec": batch_size / best,
           "compile_s": compile_s, "loss": float(loss),
           "runtime_peak_hbm_mb": device_mem_mb(), **mem}
    print(f"{label}: {best * 1e3:.0f} ms/step = "
          f"{batch_size / best:.2f} items/s (compile {compile_s:.0f}s, "
          f"plan HBM {mem.get('hbm_total_mb', float('nan')):.0f} MB, "
          f"loss {loss:.4f})", flush=True)
    return rec


CONFIGS = {
    "dtu-eval": lambda: bench_eval(1184, 1600, 5, "dtu-1600x1184x5v"),
    # tanks eval heights are cropped to 1056 (reference tankseval.py:36)
    "tanks-1920": lambda: bench_eval(1056, 1920, 11, "tanks-1920x1056x11v"),
    "tanks-2048": lambda: bench_eval(1056, 2048, 11, "tanks-2048x1056x11v"),
    "blended-train": lambda: bench_train(576, 768, 6, 5,
                                         "blendedmvs-train 768x576 B=6"),
    "dtu-train": lambda: bench_train(512, 640, 4, 5, "dtu-train 640x512 B=4"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs",
                    default="dtu-eval,tanks-1920,tanks-2048,"
                            "blended-train,dtu-train")
    ap.add_argument("--json", default=None,
                    help="write one JSON object per config to this file")
    args = ap.parse_args()
    records = []
    for name in args.configs.split(","):
        records.append(CONFIGS[name]())
    if args.json:
        with open(args.json, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"wrote {len(records)} records to {args.json}", flush=True)


if __name__ == "__main__":
    main()
