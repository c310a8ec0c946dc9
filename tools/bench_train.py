"""Training-step throughput at the reference's DTU train config
(640x512, 5 views, batch 4) on the current device. Developer tool."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mdfnet_tpu.config import ModelConfig, TrainConfig
from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
from mdfnet_tpu.train_lib import create_train_state, make_train_step


def main(batch_size: int = 1, remat: bool = False, wfold: bool = False,
         fast: bool = False, warp: str | None = None):
    # per-chip batch: the reference splits B=4 over up to 8 GPUs; the
    # scatter-free splat adjoint fits the full reference batch on ONE
    # 16 GB chip without remat (BENCH.md). --fast = the published train
    # config: bf16 conv compute + wfold + Pallas train U-Nets.
    H, W, V, B = 512, 640, 5, batch_size
    scene = make_plane_scene(height=H, width=W, nviews=V, plane_depth=650.0,
                             tilt=0.05)
    batch_np = make_batch(scene, batch=B)
    batch = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in batch_np.items()}

    platform = jax.devices()[0].platform
    if warp is None:
        warp = "pallas" if platform != "cpu" else "dense"
    model_cfg = ModelConfig(warp_impl=warp, remat=remat,
                            wfold=wfold or fast,
                            compute_dtype="bfloat16" if fast else "float32",
                            pallas_conv=fast and platform != "cpu")
    train_cfg = TrainConfig(batch_size=B)

    model, state = create_train_state(jax.random.PRNGKey(0), model_cfg, batch)
    step = make_train_step(model, train_cfg)

    def sync(x):
        # axon block_until_ready can return early; force a D2H readback
        return float(x)

    state, loss = step(state, batch)
    sync(loss)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, loss = step(state, batch)
    sync(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (B={B}, remat={remat}, wfold={wfold}, fast={fast}, "
          f"warp={warp}): {dt*1000:.0f} ms  ({B / dt:.2f} items/s, "
          f"loss {float(loss):.4f})")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--batch-size", type=int, default=1)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--wfold", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="published train config: bf16 + wfold + Pallas "
                        "train U-Nets (custom-VJP conv3d)")
    p.add_argument("--warp", default=None,
                   help="override warp_impl (fused = round-5 custom-VJP "
                        "rowsweep train aggregate)")
    a = p.parse_args()
    main(a.batch_size, a.remat, a.wfold, a.fast, a.warp)
