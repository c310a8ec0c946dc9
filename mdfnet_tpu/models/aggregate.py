"""Group-wise vector cost aggregation over source views.

Behavioural twin of reference net/unit/homoaggregate.py:8-46 (VectorAggregate):
features are turned into per-group "unit vectors" by a softmax over the
channels within each group; ref and each warped src volume are correlated by
an inner product per group; a tiny learned 1x1x1 Conv3d+BN+ReLU+Conv3d+sigmoid
stack produces a per-src visibility weight used for a weighted average.

TPU-first differences from the reference:
- volumes are (B, D, H, W, G) channels-last;
- src views are accumulated in a streaming sum (memory O(1) in V), like the
  reference's python loop, but expressed so XLA can pipeline warps;
- the ref softmax volume is computed once on (B, H, W, G, C/G) and broadcast
  over D instead of materialising the repeated (B, C, D, H, W) ref volume.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import BatchNorm, ConvND
from mdfnet_tpu.ops.warp import homography_warp
from mdfnet_tpu.ops.warp_dense import homography_warp_dense
from mdfnet_tpu.ops.pallas.warp_kernel import homography_warp_pallas


class _ConvKernel(nn.Module):
    """Parameter holder matching ConvND's param paths (kernel [+ bias])."""
    shape: tuple
    fan_in: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        from mdfnet_tpu.models.layers import _torch_conv_init
        kernel = self.param("kernel", _torch_conv_init(self.fan_in), self.shape)
        bias = (self.param("bias", _torch_conv_init(self.fan_in),
                           (self.shape[-1],)) if self.use_bias else None)
        return kernel, bias


class _ScalarFieldBN(nn.Module):
    """BatchNorm over a single implicit channel, on (B, D, H, W) arrays.

    Same params/stats layout as layers.BatchNorm with one channel (shapes
    (1,)), same torch semantics (biased normalise, unbiased running update,
    momentum 0.1) — without ever materialising a (B,D,H,W,1) tensor."""
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, fold_params: bool = False,
                 raw_params: bool = False, stats_update=None):
        scale = self.param("scale", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((1,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((1,), jnp.float32))
        if raw_params:
            return scale, bias
        if stats_update is not None:
            # train-mode fused path: the per-view batch statistics were
            # computed by the stats kernel; replay the dense path's V
            # SEQUENTIAL momentum updates in view order (identical EMA)
            means, uvars = stats_update
            m, vv = ra_mean.value, ra_var.value
            for i in range(means.shape[0]):
                m = (1 - self.momentum) * m + self.momentum * means[i]
                vv = (1 - self.momentum) * vv + self.momentum * uvars[i]
            if not self.is_initializing():
                ra_mean.value = m
                ra_var.value = vv
            return None
        if fold_params:
            # eval-only: return the equivalent affine (scale, offset) for
            # fused kernels instead of applying the normalisation
            import jax
            assert not train
            s_eff = scale[0] * jax.lax.rsqrt(ra_var.value[0] + self.epsilon)
            return s_eff, bias[0] - ra_mean.value[0] * s_eff
        xf = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(xf)
            var = jnp.var(xf)
            if not self.is_initializing():
                n = xf.size
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean = ra_mean.value[0]
            var = ra_var.value[0]
        import jax
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale[0] + bias[0]
        return y.astype(x.dtype)


class DepthWeight(nn.Module):
    """sigmoid(Conv3d(G->1,1) -> BN -> ReLU -> Conv3d(1->1,1)) visibility net.

    Twin of reference net/unit/homoaggregate.py:16-20, evaluated as a scalar
    field: a 1x1x1 conv to ONE channel forces a (B,D,H,W,1) tensor whose
    1-wide channel axis rides the 128-lane dim (128x physical padding —
    measured ~6 ms per call at DTU eval size), so the channel contraction,
    BN, and the 1->1 conv are written directly on (B,D,H,W) arrays.
    Parameter shapes/paths stay conv-shaped so reference checkpoints import
    unchanged. Returns (B, D, H, W) (no channel axis).
    """
    dtype: jnp.dtype | None = None
    # static group count, needed only when folding params (volume=None)
    ngroups: int | None = None

    @nn.compact
    def __call__(self, volume, train: bool = False,
                 fold_params: bool = False, raw_params: bool = False,
                 stats_update=None):
        g = self.ngroups if volume is None else volume.shape[-1]
        dtype = self.dtype or (jnp.float32 if volume is None
                               else volume.dtype)
        k0, _ = _ConvKernel((1, 1, 1, g, 1), g, False, name="conv0")()
        k1, b1 = _ConvKernel((1, 1, 1, 1, 1), 1, True, name="conv1")()

        if raw_params:
            # train-mode fused path: the raw learnables for the custom-VJP
            # fused aggregate (BN affine stays UNfolded — train-mode
            # folding needs the batch stats the fused kernels compute)
            gamma, bbeta = _ScalarFieldBN(name="bn0")(None, train,
                                                      raw_params=True)
            return (k0[0, 0, 0, :, 0], gamma[0], bbeta[0],
                    k1[0, 0, 0, 0, 0], b1[0])
        if stats_update is not None:
            _ScalarFieldBN(name="bn0")(None, train,
                                       stats_update=stats_update)
            return None
        if fold_params:
            # eval-only folded parameters for the fused rowsweep kernel:
            # (k0 channel weights, BN affine, conv1 scalar weight/bias)
            bn_s, bn_o = _ScalarFieldBN(name="bn0")(None, train,
                                                    fold_params=True)
            return (k0[0, 0, 0, :, 0].astype(jnp.float32), bn_s, bn_o,
                    k1[0, 0, 0, 0, 0].astype(jnp.float32),
                    b1[0].astype(jnp.float32))

        s = jnp.einsum("bdhwg,g->bdhw", volume.astype(dtype),
                       k0[0, 0, 0, :, 0].astype(dtype),
                       preferred_element_type=jnp.float32).astype(dtype)
        s = _ScalarFieldBN(name="bn0")(s, train)
        s = nn.relu(s)
        s = s * k1[0, 0, 0, 0, 0].astype(s.dtype) + b1[0].astype(s.dtype)
        return nn.sigmoid(s)


class VectorAggregate(nn.Module):
    ngroups: int = 8
    dtype: jnp.dtype | None = None
    # "fused":  ONE Pallas kernel for warp + sigmoid-pair similarity +
    #           DepthWeight + weighted accumulation (eval, C/G == 2 only;
    #           consumes/produces (.., H, C, W) layouts, fastest TPU path);
    # "pallas": fused window-DMA tent-kernel warp kernel;
    # "dense":  gather-free tent-kernel matmul warp in plain XLA;
    # "gather": guaranteed-exact windowed-gather warp.
    # pallas/dense/fused are exact for MVS-style cameras (ops/warp_dense.py).
    warp_impl: str = "dense"

    @nn.compact
    def __call__(self, features, ref_proj, src_projs, depth_hypos,
                 train: bool = False, pair_diffs=None,
                 with_cover: bool = False, valid_w: int | None = None,
                 keep_wpad: bool = False):
        """
        Args:
            features: list of (B, H, W, C) per-view features, ref first.
                For warp_impl="fused": list of (B, H, C, W) hcw features.
            ref_proj: (B, 4, 4); src_projs: (B, V-1, 4, 4).
            depth_hypos: (B, D, H, W) or (B, D, 1, 1).
            pair_diffs: optional list of (B, H, W, G) channel-pair difference
                features per view (ref first) precomputed by the caller on the
                stacked backbone output — one sliced subtraction for all views
                instead of V separate ones. For warp_impl="fused": REQUIRED,
                in (B, H, G, W) layout.
            with_cover: also return the warp coverage flag — True iff the
                fast warp's window contracts held and the volume is exact
                (always True on the gather path). Callers re-run violating
                items on the exact path; see CoreNet / evaluate.run_eval.
        Returns:
            (B, D, H, W, G) aggregated cost volume; for warp_impl="fused":
            (B, D, H, G, W) — the layout the Pallas U-Net consumes directly.
            With ``with_cover``: (volume, cover () bool).
        """
        from mdfnet_tpu.parallel import halo
        spatial_ctx = halo.current_ctx()

        ref_feat, src_feats = features[0], features[1:]
        g = self.ngroups

        weight_net = DepthWeight(dtype=self.dtype, name="depth_weight",
                                 ngroups=g)
        impl = self.warp_impl
        if train and impl == "fused" and spatial_ctx is None \
                and ref_feat.shape[-1] == 2 * g:
            # train-mode fused path (round 5): forward = the rowsweep
            # kernel family (stats pass for the train-BN batch statistics,
            # then the per-view-affine aggregation pass); backward = the
            # custom VJP in ops/pallas/aggregate_vjp.py (splat-adjoint
            # warp + closed-form BN/similarity chain). Matches the dense
            # path's math including the sequential BN running-stat EMA.
            from mdfnet_tpu.ops.pallas.aggregate_vjp import (
                rowsweep_aggregate_train)
            ref_diff = ref_feat[..., 0::2] - ref_feat[..., 1::2]
            qv = nn.sigmoid(ref_diff)                       # (B, H, W, G)
            diffs_hcw = jnp.stack(
                [jnp.transpose(sf[..., 0::2] - sf[..., 1::2], (0, 1, 3, 2))
                 for sf in src_feats], axis=1)              # (B, S, H, G, W)
            q_hcw = jnp.transpose(qv, (0, 1, 3, 2))
            k0v, gam, bet, k1v, b1v = weight_net(None, train=True,
                                                 raw_params=True)
            vol, stats, _cover = rowsweep_aggregate_train(
                diffs_hcw, q_hcw, src_projs, ref_proj, depth_hypos,
                k0v, gam, bet, k1v, b1v)
            weight_net(None, train=True,
                       stats_update=(stats[:, 0], stats[:, 1]))
            return vol
        if train and impl == "fused":
            # non-C/G==2 unit mixes: the dense path computes the identical
            # warp with full differentiability. "pallas" is train-safe:
            # homography_warp_pallas carries a custom VJP (scatter-free
            # splat, ops/splat.py) for d(src_feat).
            impl = "dense"
        if spatial_ctx is not None and impl == "fused" and not train:
            # spatial x fused (round 5): the rowsweep kernel runs
            # band-locally — the ref grid is this device's H band (its
            # global offset rides ref_proj's shifted cy, set by
            # parallel/spatial.py), while the SOURCE pair-diffs are
            # all-gathered to full height (small 2D tensors; the dense
            # path does the same, see below). pair_diffs arrive in the
            # fused path's (B, Hb, G, W) hcw layout (core.py transposes
            # them whenever warp_impl == "fused"), and core transposes the
            # returned hcw volume back to channels-last itself.
            from mdfnet_tpu.ops.pallas.aggregate_kernel import (
                rowsweep_aggregate)
            assert pair_diffs is not None, "fused path needs hcw pair_diffs"
            q = nn.sigmoid(pair_diffs[0])               # (B, Hb, G, W)
            full = [halo.all_gather_rows(dd, h_axis=1)
                    for dd in pair_diffs[1:]]
            diffs_hcw = jnp.stack(full, axis=1)         # (B, S, H, G, W)
            k0, bn_s, bn_o, k1, b1 = weight_net(None, train=False,
                                                fold_params=True)
            b = q.shape[0]
            wv = valid_w or q.shape[-1]
            outs, cvs = zip(*[
                rowsweep_aggregate(diffs_hcw[bi], q[bi], src_projs[bi],
                                   ref_proj[bi], depth_hypos[bi],
                                   k0, bn_s, bn_o, k1, b1, valid_w=wv)
                for bi in range(b)])
            vol = jnp.stack(outs)                       # (B, D, Hb, G, Wp)
            if not keep_wpad:
                vol = vol[..., :wv]
            if with_cover:
                return vol, jnp.all(jnp.stack(cvs))
            return vol
        if spatial_ctx is not None:
            # spatial sharding: warp sources are all-gathered below and the
            # XLA dense path handles the band-height ref grid
            impl = "dense"

        if impl == "fused":
            from mdfnet_tpu.ops.pallas.aggregate_kernel import (
                rowsweep_aggregate)
            assert pair_diffs is not None, "fused path needs hcw pair_diffs"
            b, h, _, w_in = pair_diffs[0].shape
            vw = valid_w or w_in
            k0, bn_s, bn_o, k1, b1 = weight_net(None, train=False,
                                                fold_params=True)
            q = nn.sigmoid(pair_diffs[0])
            diffs = jnp.stack(pair_diffs[1:], axis=1)  # (B, S, H, G, W)
            outs, covers = zip(*[
                rowsweep_aggregate(diffs[bi], q[bi], src_projs[bi],
                                   ref_proj[bi], depth_hypos[bi],
                                   k0, bn_s, bn_o, k1, b1, valid_w=vw)
                for bi in range(b)])
            vol = jnp.stack(outs)  # (B, D, H, G, Wp)
            if not keep_wpad:
                vol = vol[..., :vw]
            if with_cover:
                return vol, jnp.all(jnp.stack(covers))
            return vol

        b, h, w, c = ref_feat.shape
        cg = c // g
        covers = []  # dense-path exactness flags (gather/pallas: exact/unchecked)
        if impl == "dense":
            def warp(f, sp, rp, hy, **kw):
                out, cov = homography_warp_dense(f, sp, rp, hy,
                                                 with_cover=True, **kw)
                covers.append(cov)
                return out
        else:
            warp = {"pallas": homography_warp_pallas,
                    "gather": homography_warp}[impl]
        if spatial_ctx is not None:
            # the warp needs global source rows (epipolar lines cross band
            # boundaries): gather the small 2D features, keep the big 3D
            # volumes sharded. out_h keeps the ref grid band-local; ref_proj
            # carries the band's global offset via its shifted cy.
            warp_ = warp
            warp = lambda f, sp, rp, hy: warp_(
                halo.all_gather_rows(f, h_axis=1), sp, rp, hy, out_h=h)

        if cg == 2:
            # Pair fast path (the reference config has C/G == 2 at every
            # stage): softmax([a, b]) == [sigma(a-b), sigma(b-a)], so the
            # group-softmax + inner product collapses to
            #   sim_g = p*q + (1-p)(1-q),  p = sigma(wa-wb), q = sigma(ra-rb).
            # Warping is linear, so warp(even) - warp(odd) == warp(even-odd):
            # only the G difference channels are warped — half the DMA and
            # compute of warping all C channels, bit-identical result
            # (out-of-image zeros give sigma(0)=0.5 == softmax([0,0])[0]).
            ref_diff = (pair_diffs[0] if pair_diffs is not None
                        else ref_feat[..., 0::2] - ref_feat[..., 1::2])
            q = nn.sigmoid(ref_diff)[:, None]  # (B, 1, H, W, G)
        else:
            ref_unit = _softmax_groups(ref_feat, g, cg)[:, None]

        warped_diffs = None
        if cg == 2 and impl == "pallas" and not train:
            # warp every src's diff features in ONE kernel launch (the
            # multi-src kernel has no VJP; training takes the per-src
            # homography_warp_pallas, whose custom VJP backprops through
            # the scatter-free gradient splat, ops/pallas/splat_kernel.py)
            from mdfnet_tpu.ops.pallas.warp_kernel import (
                homography_warp_pallas_multi)
            diffs = [pair_diffs[v + 1] if pair_diffs is not None
                     else src_feats[v][..., 0::2] - src_feats[v][..., 1::2]
                     for v in range(len(src_feats))]
            warped_diffs = homography_warp_pallas_multi(
                jnp.stack(diffs, axis=1), src_projs, ref_proj, depth_hypos)

        volume_sum = 0.0
        weight_sum = 0.0
        for v in range(len(src_feats)):
            if cg == 2:
                if warped_diffs is not None:
                    p = nn.sigmoid(warped_diffs[:, v])  # (B, D, H, W, G)
                else:
                    diff = (pair_diffs[v + 1] if pair_diffs is not None
                            else src_feats[v][..., 0::2]
                            - src_feats[v][..., 1::2])
                    p = nn.sigmoid(warp(diff, src_projs[:, v], ref_proj,
                                        depth_hypos))
                sim = p * q + (1.0 - p) * (1.0 - q)
            else:
                warped = warp(src_feats[v], src_projs[:, v], ref_proj,
                              depth_hypos)  # (B, D, H, W, C)
                soft = _softmax_groups(warped, g, cg)
                sim = jnp.sum(soft * ref_unit, axis=-1)
            wgt = weight_net(sim, train)  # (B, D, H, W)
            weight_sum = weight_sum + wgt
            volume_sum = volume_sum + wgt[..., None] * sim

        vol = volume_sum / weight_sum[..., None]
        if with_cover:
            cover = (jnp.all(jnp.stack(covers)) if covers
                     else jnp.asarray(True))
            return vol, cover
        return vol


def _softmax_groups(x: jnp.ndarray, groups: int, group_ch: int) -> jnp.ndarray:
    """Softmax over the channels within each group (last axis split G x C/G)."""
    shape = x.shape[:-1] + (groups, group_ch)
    return nn.softmax(x.reshape(shape), axis=-1)
