"""CoreNet — the 4-scale coarse-to-fine plane-sweep cascade orchestrator.

Behavioural twin of reference net/core.py:4-78, assembled from injected units
(the reference's pluggability, config.py:186-218, is preserved via
models/registry.py). The stage loop is a static Python loop — three
specialised stages under one jit, letting XLA pipeline the cascade in HBM.

Data layout is channels-last: imgs (B, V, H, W, 3); features (B, H, W, C);
cost volumes (B, D, H, W, G); probability volumes (B, D, H, W).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu import geometry
from mdfnet_tpu.models.aggregate import VectorAggregate
from mdfnet_tpu.models.aggregate_variance import VarianceAggregate
from mdfnet_tpu.models.backbone import FPN4Scales
from mdfnet_tpu.models.refine import RefineNet2
from mdfnet_tpu.models.regularize import RegularNet3Scales, RegularNet4Scales
from mdfnet_tpu.ops.fitting import refined_hypotheses, uniform_hypotheses
from mdfnet_tpu.ops.regress import confidence_regression, depth_regression
from mdfnet_tpu.ops.sample import resize_nearest_2x


class CoreNet(nn.Module):
    """4-stage cascade: FPN features -> per-stage (hypos, warp+aggregate,
    3D U-Net, soft-argmax) -> PixelShuffle refinement.

    Attributes mirror the reference composition root (config.py:192-218):
        chs: FPN channels per scale.
        ndepths: hypothesis counts per cost-volume stage.
        curve_classes: fitting distribution per stage (None = uniform init).
        prob_threshs: curve cut-off probability per stage.
        ngroups: correlation groups per stage.
    """
    chs: Tuple[int, ...] = (8, 16, 32, 64)
    ndepths: Tuple[int, ...] = (48, 24, 8)
    curve_classes: Tuple[str | None, ...] = (None, "gauss1", "laplace")
    prob_threshs: Tuple[float, ...] = (0.0, 0.95, 1e-5)
    ngroups: Tuple[int, ...] = (32, 16, 8)
    warp_impl: str = "dense"
    pallas_conv: bool = False
    # rematerialise per-stage blocks in the backward pass (training only):
    # the (B,D,H,W,G) cost volumes and 3D U-Net activations are recomputed
    # instead of stored, fitting the reference's batch-4 config (reference
    # train.py:105, config.py:54) in 16 GB HBM
    remat: bool = False
    # width-fold the U-Net volumes (ops/wfold.py): XLA lane-pads the small-C
    # f32 activations up to 8x, which dominates training HBM; folding is an
    # exact kernel transform that fills the lanes (4x less padded memory)
    wfold: bool = False
    # pluggable alternatives (the reference's unused-but-present units, kept
    # assemblable): variance cost aggregation (homoaggregate.py:49-69),
    # adaptive-thin-volume hypotheses (depthhypos.py:218-253), image-guided
    # RefineNet v1 (refine.py:49-95). XLA paths only.
    aggregate_impl: str = "vector"
    hypo_impl: str = "fit"
    refine_impl: str = "refine2"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, imgs, extrinsics, intrinsics, depth_range,
                 train: bool = False):
        """
        Args:
            imgs: (B, V, H, W, 3) float images, view 0 = reference.
            extrinsics: (B, V, 4, 4); intrinsics: (B, V, 3, 3).
            depth_range: (B, 2) [min, max].
        Returns:
            train: {"depth": [d_1/8, d_1/4, d_1/2, d_full]}
            eval:  {"depth": (B, H, W), "confidence": (B, H, W)}
        """
        nstages = len(self.ndepths)
        alt_units = (self.aggregate_impl != "vector"
                     or self.hypo_impl != "fit"
                     or self.refine_impl != "refine2")
        assert not (alt_units and (self.pallas_conv
                                   or self.warp_impl == "fused")), (
            "alternative units run on the XLA paths only")
        # Under remat (training), the per-stage blocks are wrapped with
        # nn.remat: the backward pass recomputes the warp/cost-volume/U-Net
        # intermediates instead of storing them. Lifted transforms keep the
        # variable tree identical, so checkpoints/.pth import are unaffected.
        use_remat = train and self.remat
        BackboneCls = (nn.remat(FPN4Scales, static_argnums=(2, 3))
                       if use_remat else FPN4Scales)
        AggBase = (VectorAggregate if self.aggregate_impl == "vector"
                   else VarianceAggregate)
        # static_argnums must match each signature: VectorAggregate takes
        # (self, features, ref_proj, src_projs, depth_hypos, train,
        # pair_diffs, ...) -> statics (5, 6); VarianceAggregate has no
        # pair_diffs arg, so only train (5) is static.
        agg_statics = (5, 6) if self.aggregate_impl == "vector" else (5,)
        AggregateCls = (nn.remat(AggBase, static_argnums=agg_statics)
                        if use_remat else AggBase)
        Reg3Cls = (nn.remat(RegularNet3Scales, static_argnums=(2, 3))
                   if use_remat else RegularNet3Scales)
        Reg4Cls = (nn.remat(RegularNet4Scales, static_argnums=(2, 3))
                   if use_remat else RegularNet4Scales)
        fused_pallas = self.pallas_conv and self.warp_impl == "fused"
        # the fused path consumes ONLY sigma(channel-pair diffs); with the
        # C/G == 2 configuration the backbone emits the differenced
        # features directly (linear conv => exact)
        emit_diffs = fused_pallas and all(
            self.chs[len(self.chs) - 1 - s] == 2 * self.ngroups[s]
            for s in range(nstages))
        backbone = BackboneCls(self.chs, dtype=self.dtype,
                               pallas_eval=self.pallas_conv,
                               keep_wpad=fused_pallas,
                               emit_diffs=emit_diffs, name="backbone")
        aggregates = [AggregateCls(self.ngroups[s], dtype=self.dtype,
                                   warp_impl=self.warp_impl,
                                   name=f"aggregate{s}") for s in range(nstages)]
        regulars = [Reg3Cls(16, dtype=self.dtype,
                            pallas_eval=self.pallas_conv,
                            use_fold=self.wfold,
                            name="regular0")]
        regulars += [Reg4Cls(8, dtype=self.dtype,
                             pallas_eval=self.pallas_conv,
                             use_fold=self.wfold,
                             name=f"regular{s}")
                     for s in range(1, nstages)]
        if self.refine_impl == "refine2":
            refine = RefineNet2(dtype=self.dtype,
                                pallas_eval=self.pallas_conv, name="refine")
        else:
            from mdfnet_tpu.models.refine import RefineNet
            refine = RefineNet(dtype=self.dtype, name="refine")

        b, nviews = imgs.shape[0], imgs.shape[1]
        if train:
            # ONE view-major stacked backbone pass with per-view BatchNorm
            # statistics (layers.BatchNorm vgroups): numerically identical to
            # the reference's per-view loop (net/core.py:42) — including the
            # sequential running-stat EMA — but every conv runs batched 5x
            vstack = jnp.swapaxes(imgs, 0, 1).reshape(
                (nviews * b,) + imgs.shape[2:])
            fs = backbone(vstack, train, nviews)
            features = [
                tuple(f.reshape((nviews, b) + f.shape[1:])[v] for f in fs)
                for v in range(nviews)
            ]
        else:
            # eval: one backbone pass over all views stacked into the batch
            # dim (5x the per-conv batch beats five small conv chains on the
            # MXU); running-stat BN makes this exactly equivalent
            stacked = imgs.reshape((b * nviews,) + imgs.shape[2:])
            fs = backbone(stacked, train)  # (y4, y3, y2) each (B*V, ...)
            fused = self.warp_impl == "fused"
            from mdfnet_tpu.parallel import halo as _halo
            sp_ctx = _halo.current_ctx() is not None
            if sp_ctx:
                # spatial sharding: the backbone fell through to its XLA
                # NHWC path, so no hcw transposes apply (the U-Nets still
                # ride the Pallas convs band-locally via their halo hooks)
                fused = False
            if self.pallas_conv and not fused and not sp_ctx:
                # Pallas backbone returns (N, H, C, W); the non-fused
                # aggregation paths consume NHWC — transpose once on the
                # stacked tensors
                fs = tuple(jnp.transpose(f, (0, 1, 3, 2)) for f in fs)
            features = [
                tuple(f.reshape((b, nviews) + f.shape[1:])[:, v] for f in fs)
                for v in range(nviews)
            ]
            # channel-pair differences for the aggregation (one sliced
            # subtraction on the stacked tensor per stage, V-for-free);
            # with the fused kernel these stay in (B, H, G, W) layout —
            # and with emit_diffs the backbone already produced them
            ch_axis = 2 if (self.pallas_conv and fused) else 3
            stage_diffs = []
            for f in fs:
                if emit_diffs and not sp_ctx:
                    # (under spatial sharding the backbone fell back to its
                    # XLA path, which emits FEATURES, not diffs)
                    dstack = f
                elif ch_axis == 2:
                    dstack = f[:, :, 0::2, :] - f[:, :, 1::2, :]
                else:
                    dstack = f[..., 0::2] - f[..., 1::2]
                dstack = dstack.reshape((b, nviews) + dstack.shape[1:])
                stage_diffs.append([dstack[:, v] for v in range(nviews)])

        depth = None
        depth_hypos = None
        prob_volume = None
        depths = []
        covers = []
        w2 = -(-imgs.shape[3] // 2)
        w4 = -(-w2 // 2)
        w8 = -(-w4 // 2)
        stage_w = [w8, w4, w2]
        for stage in range(nstages):
            stage_feats = [f[stage] for f in features]
            ref_proj, src_projs = geometry.projection_matrices(
                intrinsics.astype(jnp.float32), extrinsics.astype(jnp.float32),
                stage, num_stages=nstages + 1)

            if self.hypo_impl == "atv" and depth is not None:
                # adaptive-thin-volume alternative: band = previous depth
                # +- its posterior's expected deviation (sqrt E[(d-mean)^2])
                from mdfnet_tpu.ops.fitting import atv_hypos
                from mdfnet_tpu.ops.sample import resize_bilinear_2x
                dev = jnp.sqrt(jnp.maximum(depth_regression(
                    prob_volume, (depth_hypos - depth[:, None]) ** 2), 0.0))
                depth_hypos = atv_hypos(resize_bilinear_2x(depth), dev,
                                        depth_range, self.ndepths[stage])
            elif self.curve_classes[stage] is None:
                depth_hypos = uniform_hypotheses(depth_range, self.ndepths[stage])
            else:
                depth_hypos = refined_hypotheses(
                    depth, depth_range, prob_volume, depth_hypos,
                    ndepths=self.ndepths[stage],
                    curve_class=self.curve_classes[stage],
                    prob_thresh=self.prob_threshs[stage],
                    upsample=True)

            diffs = None
            fused = (not train) and self.warp_impl == "fused"
            ch_ax = 2 if (fused and self.pallas_conv) else 3
            if not train and (emit_diffs or self.ngroups[stage] * 2
                              == stage_feats[0].shape[ch_ax]):
                diffs = stage_diffs[stage]
                if fused and (not self.pallas_conv or sp_ctx):
                    # fused kernel wants (B, H, G, W); the XLA backbone
                    # (always used under spatial sharding) gave NHWC
                    diffs = [jnp.transpose(d, (0, 1, 3, 2)) for d in diffs]
            if self.aggregate_impl != "vector":
                cost_volume = aggregates[stage](stage_feats, ref_proj,
                                                src_projs, depth_hypos, train)
                if not train:
                    covers.append(jnp.asarray(True))
                    vw = None
            elif train:
                cost_volume = aggregates[stage](stage_feats, ref_proj,
                                                src_projs, depth_hypos,
                                                train, diffs)
            else:
                # under the fully-fused pallas path the volume stays at its
                # 128-aligned lane extent (junk columns zeroed) end to end —
                # no host-side pad/slice copies between kernels
                vw = stage_w[stage] if (fused and self.pallas_conv) else None
                cost_volume, cover = aggregates[stage](
                    stage_feats, ref_proj, src_projs, depth_hypos, train,
                    diffs, True, vw, fused and self.pallas_conv)
                covers.append(cover)
            # fused aggregation emits (B, D, h, g, w) — with the Pallas
            # U-Nets it runs layout-through with zero transposes; without,
            # convert back to channels-last
            if fused and not self.pallas_conv:
                cost_volume = jnp.transpose(cost_volume, (0, 1, 2, 4, 3))
            if train and self.pallas_conv:
                # train fast path: the U-Net rides the custom-VJP Pallas
                # convs in their native (B, D, H, C, W) layout
                # (ops/pallas/conv3d_vjp.py). Multi-device: use the
                # shard_map DP step (train_lib.make_train_step(mesh=...)) —
                # its body is a per-device program, so these kernels ride
                # the mesh; plain GSPMD jit cannot partition Pallas calls.
                cost_volume = jnp.transpose(cost_volume, (0, 1, 2, 4, 3))
            prob_volume = regulars[stage](
                cost_volume, train, (fused or train) and self.pallas_conv,
                None if train else vw)  # (B, D, h, w) f32
            depth = depth_regression(prob_volume, depth_hypos)
            depths.append(depth)

        # the fused pipeline hands refine a padded-lane depth whose junk
        # columns hold softmax mass — tell it the true stage-2 width
        refine_vw = (stage_w[2] if (not train and self.warp_impl == "fused"
                                    and self.pallas_conv) else None)
        if self.refine_impl == "refine2":
            depth = refine(depth, depth_range, train, refine_vw)
        else:
            depth = refine(imgs[:, 0], depth, depth_range, train)
        depths.append(depth)

        if train:
            return {"depth": depths}

        confidence = confidence_regression(prob_volume)
        confidence = resize_nearest_2x(confidence)
        # True iff every stage's fast-warp window contracts held — i.e. the
        # depth map is exact. On False, re-run the item with
        # warp_impl="gather" (evaluate.run_eval does this automatically);
        # the reference's warp has no such contract to break
        # (net/unit/base.py:85-126 samples unconditionally).
        coverage_ok = jnp.all(jnp.stack(covers))
        return {"depth": depth, "confidence": confidence,
                "coverage_ok": coverage_ok}
