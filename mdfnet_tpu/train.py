"""Training loop + CLI.

Behavioural twin of reference train.py: per-epoch polynomial LR decay,
epoch-mean loss appended to <ckpt_dir>/epoch_loss.txt, a checkpoint per epoch
named <dataset>_<epoch>; resume via --pre_model (orbax checkpoint dir or
reference .pth file — the latter warm-starts weights only, like the
reference's resume which drops optimizer moments).

Run:  python -m mdfnet_tpu.train -d dtu [-p CKPT] [--root DIR]
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mdfnet_tpu.config import DataConfig, ModelConfig, TrainConfig
from mdfnet_tpu.data.pipeline import BatchLoader, device_prefetch
from mdfnet_tpu.parallel import make_mesh, shard_batch
from mdfnet_tpu.train_lib import (
    create_train_state, import_reference_checkpoint, make_train_step,
    restore_checkpoint, save_checkpoint)

log = logging.getLogger("mdfnet_tpu.train")


def _to_jax_batch(batch):
    return {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                if isinstance(v, dict) else jnp.asarray(v))
            for k, v in batch.items() if not isinstance(v, list)}


def train(dataset, model_config: ModelConfig, train_config: TrainConfig,
          dataset_name: str = "dtu", pre_model: str | None = None,
          mesh=None) -> None:
    os.makedirs(train_config.checkpoint_dir, exist_ok=True)
    if mesh is None:
        # batch shards over the data axis, so its extent must divide the
        # batch: use the largest divisor <= device count (DataParallel
        # likewise idles surplus GPUs when batch < n_gpus, train.py:24-26)
        n = len(jax.devices())
        d = max(k for k in range(1, min(n, train_config.batch_size) + 1)
                if train_config.batch_size % k == 0)
        mesh = make_mesh(data=d, devices=jax.devices()[:d])

    loader = BatchLoader(dataset, train_config.batch_size, shuffle=True,
                         drop_last=True, num_workers=2, seed=train_config.seed)
    sample = _to_jax_batch(next(iter(BatchLoader(dataset, train_config.batch_size,
                                                 drop_last=True, num_workers=0))))

    rng = jax.random.PRNGKey(train_config.seed)
    model, state = create_train_state(rng, model_config, sample)

    start_epoch = train_config.start_epoch
    if pre_model:
        if pre_model.endswith(".pth"):
            # import_reference_checkpoint already advances past the saved
            # epoch (mirroring reference train.py:18-21)
            state = import_reference_checkpoint(pre_model, state)
            start_epoch = int(state.epoch)
        else:
            state = restore_checkpoint(os.path.abspath(pre_model), state)
            # checkpoints are written after an epoch completes
            start_epoch = int(state.epoch) + 1
        log.info("resumed from %s at epoch %d", pre_model, start_epoch)

    # data>1 -> the shard_map DP step (explicit psum collectives; Pallas
    # train kernels ride the mesh). data==1 -> plain jit.
    step_fn = make_train_step(model, train_config, mesh=mesh)

    for epoch in range(start_epoch, train_config.max_epochs + 1):
        state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        if hasattr(dataset, "set_epoch"):
            # per-(epoch, item) deterministic robust-view sampling
            dataset.set_epoch(epoch)
        epoch_loss, n_batches = 0.0, 0
        put = lambda b: shard_batch(mesh, _to_jax_batch(b))
        for i, batch in enumerate(device_prefetch(iter(loader), put)):
            t0 = time.perf_counter()
            state, loss = step_fn(state, batch)
            loss = float(loss)
            if not (loss == loss and abs(loss) != float("inf")):
                # fail fast on divergence — the last good checkpoint is the
                # previous epoch's (the reference has no such guard; crashes
                # there surface as silent NaN checkpoints)
                raise FloatingPointError(
                    f"non-finite loss {loss} at epoch {epoch} batch {i}; "
                    f"resume from the last checkpoint with -p")
            epoch_loss += loss
            n_batches += 1
            if i % train_config.log_every == 0:
                log.info("epoch %d batch %d/%d loss %.5f (%.3fs)",
                         epoch, i + 1, len(loader), loss,
                         time.perf_counter() - t0)

        mean_loss = epoch_loss / max(n_batches, 1)
        log.info("epoch %d mean loss %.5f", epoch, mean_loss)
        with open(os.path.join(train_config.checkpoint_dir, "epoch_loss.txt"),
                  "a") as f:
            f.write(f"{mean_loss}\n")
        save_checkpoint(
            os.path.abspath(os.path.join(train_config.checkpoint_dir,
                                         f"{dataset_name}_{epoch}")), state)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s-%(levelname)s: %(message)s")
    parser = argparse.ArgumentParser(description="mdfnet_tpu training")
    parser.add_argument("-p", "--pre_model", default=None,
                        help="checkpoint to resume (orbax dir or reference .pth)")
    parser.add_argument("-d", "--dataset", default="dtu",
                        choices=["dtu", "blendedmvs"])
    parser.add_argument("--root", default=None, help="dataset root override")
    parser.add_argument("--scans", default=None,
                        help="comma-separated scan ids (default: full split)")
    parser.add_argument("--lightings", type=int, default=None,
                        help="number of DTU lighting conditions (default: 7)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="max epochs (default: reference's 30)")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--nviews", type=int, default=None)
    parser.add_argument("--ckpt-dir", default=None,
                        help="checkpoint directory (default: pth)")
    parser.add_argument("--fast", action="store_true",
                        help="bf16 conv compute + width-folded volumes "
                             "(f32 BN stats/loss/optimizer) — the published "
                             "TPU training configuration, 1.48x the f32 "
                             "step time (BENCH.md)")
    parser.add_argument("--remat", action="store_true",
                        help="per-stage gradient rematerialisation: trades "
                             "~2x step time for activation memory. Off by "
                             "default — the scatter-free warp adjoint fits "
                             "the reference's batch-4 640x512 config on one "
                             "16 GB chip without it (BENCH.md); turn on for "
                             "larger batches/resolutions")
    args = parser.parse_args(argv)

    data_cfg = DataConfig(root_dir=args.root) if args.root else DataConfig()
    # --fast on accelerators additionally routes the plane-sweep warp and
    # the U-Net convs through the Pallas train kernels (splat adjoint +
    # custom-VJP conv3d, BENCH.md "Training (round 3)"). Multi-device runs
    # use the shard_map DP step (train_lib.make_train_step), whose body is a
    # per-device program — the Pallas kernels ride the mesh unchanged; only
    # CPU keeps the XLA paths.
    accel = all(d.platform != "cpu" for d in jax.devices())
    model_cfg = ModelConfig(remat=args.remat,
                            compute_dtype=("bfloat16" if args.fast
                                           else "float32"),
                            wfold=args.fast,
                            warp_impl=("pallas" if args.fast and accel
                                       else "dense"),
                            pallas_conv=args.fast and accel)

    def train_config(default_batch: int) -> TrainConfig:
        overrides = {}
        if args.epochs is not None:
            overrides["max_epochs"] = args.epochs
        if args.nviews is not None:
            overrides["nviews"] = args.nviews
        if args.ckpt_dir is not None:
            overrides["checkpoint_dir"] = args.ckpt_dir
        overrides["batch_size"] = (args.batch_size if args.batch_size
                                   is not None else default_batch)
        return TrainConfig(**overrides)

    if args.dataset == "dtu":
        from mdfnet_tpu.data.datasets import DTUTrainDataset
        train_cfg = train_config(default_batch=4)
        scans = (tuple(int(s) for s in args.scans.split(","))
                 if args.scans else data_cfg.dtu_train_scans)
        lightings = (tuple(range(args.lightings)) if args.lightings
                     else data_cfg.dtu_lightings)
        dataset = DTUTrainDataset(
            os.path.join(data_cfg.root_dir, data_cfg.dtu_train_subdir),
            scans=scans, lightings=lightings,
            nviews=train_cfg.nviews, robust_sampling=train_cfg.robust_views)
    else:
        from mdfnet_tpu.data.datasets import BlendedMVSTrainDataset
        train_cfg = train_config(default_batch=6)
        dataset = BlendedMVSTrainDataset(
            os.path.join(data_cfg.root_dir, data_cfg.blendedmvs_subdir),
            nviews=train_cfg.nviews, robust_sampling=train_cfg.robust_views)

    train(dataset, model_cfg, train_cfg, dataset_name=args.dataset,
          pre_model=args.pre_model)


if __name__ == "__main__":
    main()
