"""Evaluation CLI.

Twin of reference eval.py's argparse surface:
    python -m mdfnet_tpu.cli.eval -p CKPT -d dtu|tanks [-s intermediate|advanced]
                                  [--root DIR] [-o OUTPUT]

CKPT may be an orbax checkpoint directory or a reference .pth file.
"""
from __future__ import annotations

import argparse
import logging
import os

import jax

from mdfnet_tpu.config import DataConfig, EvalConfig, ModelConfig
from mdfnet_tpu.evaluate import run_eval
from mdfnet_tpu.models import build_model

log = logging.getLogger("mdfnet_tpu.eval")


def load_variables(path: str, model, sample_args):
    """Load model variables from an orbax dir or a reference .pth."""
    if path.endswith(".pth"):
        from mdfnet_tpu.utils.pth_import import load_reference_checkpoint
        variables, _ = load_reference_checkpoint(path)
        return variables
    import numpy as np
    import orbax.checkpoint as ocp
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *sample_args, train=False))
    zeros = lambda tree: jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), tree)
    ckptr = ocp.StandardCheckpointer()
    try:
        # bare-variables checkpoint
        return ckptr.restore(os.path.abspath(path), zeros(variables))
    except ValueError:
        # training checkpoint: the full TrainState written every epoch by
        # train_lib.save_checkpoint (params + BN stats + optimizer + epoch)
        from mdfnet_tpu.train_lib import TrainState, make_optimizer
        tx = make_optimizer()
        state_shape = jax.eval_shape(
            lambda v: TrainState(params=v["params"],
                                 batch_stats=v.get("batch_stats", {}),
                                 opt_state=tx.init(v["params"]),
                                 epoch=jax.numpy.asarray(1, jax.numpy.int32)),
            variables)
        restored = ckptr.restore(os.path.abspath(path), zeros(state_shape))
        return {"params": restored.params,
                "batch_stats": restored.batch_stats}


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s-%(levelname)s: %(message)s")
    parser = argparse.ArgumentParser(description="mdfnet_tpu evaluation")
    parser.add_argument("-p", "--pre_model", required=True)
    parser.add_argument("-d", "--dataset", default="dtu",
                        choices=["dtu", "tanks"])
    parser.add_argument("-s", "--set", default="intermediate",
                        choices=["intermediate", "advanced"])
    parser.add_argument("--root", default=None)
    parser.add_argument("-o", "--output", default="outputs")
    parser.add_argument("--scans", default=None,
                        help="comma-separated scan ids (dtu) or scene names (tanks)")
    parser.add_argument("--spatial", type=int, default=1, metavar="N",
                        help="shard the image-height axis over N devices "
                             "(exact halo-exchange sharding; 1/N HBM per "
                             "device). Requires H %% (N*32) == 0. On TPU "
                             "the fused rowsweep aggregate runs band-"
                             "locally (round 5); U-Net Pallas convs run "
                             "with halo rows; backbone/refine take their "
                             "halo-aware XLA paths")
    parser.add_argument("--exact", action="store_true",
                        help="force the slow guaranteed-exact f32 gather "
                             "path instead of the platform's fast config")
    args = parser.parse_args(argv)

    data_cfg = DataConfig(root_dir=args.root) if args.root else DataConfig()
    # Fast path by default on TPU: the fused Pallas pipeline (bf16 conv
    # compute, f32 softmax/fitting — the bench.py configuration). The warp
    # coverage contracts are checked per item at runtime and violating
    # items re-run on the exact gather path (run_eval), so the speed is
    # free of silent-corruption risk. CPU and --spatial keep the XLA path.
    on_tpu = jax.devices()[0].platform != "cpu"
    if args.exact:
        model = build_model(ModelConfig(warp_impl="gather"))
    elif on_tpu and args.spatial <= 1:
        model = build_model(ModelConfig(compute_dtype="bfloat16",
                                        warp_impl="fused", pallas_conv=True))
    else:
        model = build_model(ModelConfig())

    def align_crop(h: int) -> int:
        """Spatial sharding needs band starts on the deepest conv grid
        (32 rows): align the eval crop down to a multiple of 32*N — the
        same divisibility workaround the reference's 1200 -> 1184 crop is
        (load/dtueval.py:34). N=1 leaves the reference crop untouched."""
        if args.spatial <= 1:
            return h
        unit = 32 * args.spatial
        aligned = (h // unit) * unit
        if aligned != h:
            log.info("spatial=%d: crop height %d -> %d (32*N alignment)",
                     args.spatial, h, aligned)
        return aligned

    if args.dataset == "dtu":
        from mdfnet_tpu.data.datasets import DTUEvalDataset
        scans = ([int(s) for s in args.scans.split(",")] if args.scans
                 else data_cfg.dtu_eval_scans)
        dataset = DTUEvalDataset(
            os.path.join(data_cfg.root_dir, data_cfg.dtu_eval_subdir),
            scans=scans, nviews=EvalConfig().nviews,
            crop_height=align_crop(data_cfg.dtu_eval_crop_height))
    else:
        from mdfnet_tpu.data.datasets import TanksEvalDataset
        scenes = (args.scans.split(",") if args.scans else
                  (data_cfg.tanks_intermediate if args.set == "intermediate"
                   else data_cfg.tanks_advanced))
        dataset = TanksEvalDataset(
            os.path.join(data_cfg.root_dir, data_cfg.tanks_subdir, args.set),
            scenes=scenes, nviews=11,
            crop_height=align_crop(data_cfg.tanks_crop_height))

    item = dataset[0]
    sample_args = (item["imgs"][None], item["extrinsics"][None],
                   item["intrinsics"][None], item["depth_range"][None])
    variables = load_variables(args.pre_model, model, sample_args)

    stats = run_eval(model, variables, dataset, args.output, log_fn=log.info,
                     spatial=args.spatial)
    log.info("done: %.3f s/view device, %.3f s/view wall (incl. IO) over "
             "%d views", stats["device_sec_per_view"],
             stats["wall_sec_per_view"], stats["n_views"])


if __name__ == "__main__":
    main()
