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
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    return restored


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
    args = parser.parse_args(argv)

    data_cfg = DataConfig(root_dir=args.root) if args.root else DataConfig()
    model = build_model(ModelConfig())

    if args.dataset == "dtu":
        from mdfnet_tpu.data.datasets import DTUEvalDataset
        scans = ([int(s) for s in args.scans.split(",")] if args.scans
                 else data_cfg.dtu_eval_scans)
        dataset = DTUEvalDataset(
            os.path.join(data_cfg.root_dir, data_cfg.dtu_eval_subdir),
            scans=scans, nviews=EvalConfig().nviews,
            crop_height=data_cfg.dtu_eval_crop_height)
    else:
        from mdfnet_tpu.data.datasets import TanksEvalDataset
        scenes = (args.scans.split(",") if args.scans else
                  (data_cfg.tanks_intermediate if args.set == "intermediate"
                   else data_cfg.tanks_advanced))
        dataset = TanksEvalDataset(
            os.path.join(data_cfg.root_dir, data_cfg.tanks_subdir, args.set),
            scenes=scenes, nviews=11,
            crop_height=data_cfg.tanks_crop_height)

    item = dataset[0]
    sample_args = (item["imgs"][None], item["extrinsics"][None],
                   item["intrinsics"][None], item["depth_range"][None])
    variables = load_variables(args.pre_model, model, sample_args)

    stats = run_eval(model, variables, dataset, args.output, log_fn=log.info)
    log.info("done: %.3f s/view over %d views", stats["sec_per_view"],
             stats["n_views"])


if __name__ == "__main__":
    main()
