"""One-off experiment: localize the full-train-step vs sum-of-parts gap.

profile_train_breakdown measured sum-of-parts 207 ms at B=4 while the full
step runs 1724 ms. Sweep (B, remat) at the published bf16+wfold config to
see whether the gap scales with memory pressure (B) or with remat.
Developer tool.
"""
import time

import jax
import jax.numpy as jnp

from mdfnet_tpu.config import ModelConfig, TrainConfig
from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
from mdfnet_tpu.train_lib import create_train_state, make_train_step

H, W, V = 512, 640, 5
scene = make_plane_scene(height=H, width=W, nviews=V, plane_depth=650.0,
                         tilt=0.05)


def run(B, remat, wfold=True, cd="bfloat16", iters=4, pallas_conv=False):
    batch_np = make_batch(scene, batch=B)
    batch = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in batch_np.items()}
    cfg = ModelConfig(warp_impl="pallas", remat=remat, wfold=wfold,
                      compute_dtype=cd, pallas_conv=pallas_conv)
    model, state = create_train_state(jax.random.PRNGKey(0), cfg, batch)
    step = make_train_step(model, TrainConfig(batch_size=B))
    try:
        state, loss = step(state, batch)
        _ = float(loss)
    except Exception as e:
        print(f"B={B} remat={remat}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"B={B} remat={remat} wfold={wfold} {cd} pallas={pallas_conv}: "
          f"{dt*1000:.0f} ms ({B/dt:.2f} items/s)", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    combos = {
        "b1": [(1, False, False)],
        "b1r": [(1, True, False)],
        "b2": [(2, False, False)],
        "b4r": [(4, True, False)],
        "b4": [(4, False, False)],
        "b4p": [(4, False, True)],    # Pallas train U-Nets (conv3d_vjp)
        "all": [(1, False, False), (1, True, False), (2, False, False),
                (4, True, False)],
    }[which]
    for B, remat, pc in combos:
        run(B, remat, pallas_conv=pc)
