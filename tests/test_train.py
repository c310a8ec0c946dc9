"""Training machinery tests: loss decreases on a synthetic overfit, the
data-parallel step runs on an 8-device CPU mesh and matches single-device
gradients, and checkpoints roundtrip."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from mdfnet_tpu.config import ModelConfig, TrainConfig
from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
from mdfnet_tpu.parallel import make_mesh, shard_batch
from mdfnet_tpu.train_lib import (
    create_train_state, make_train_step, poly_lr, restore_checkpoint,
    save_checkpoint)

# D must survive three stride-2 levels in the 4-scale U-Nets (min 8)
SMALL = ModelConfig(chs=(4, 8, 8, 8), ndepths=(8, 8, 8), ngroups=(8, 4, 4))


@pytest.fixture(scope="module")
def small_setup():
    scene = make_plane_scene(height=32, width=64, nviews=3, plane_depth=600.0)
    batch = make_batch(scene, batch=2)
    batch = {k: (jnp.asarray(v) if not isinstance(v, dict)
                 else {kk: jnp.asarray(vv) for kk, vv in v.items()})
             for k, v in batch.items()}
    cfg = TrainConfig(max_epochs=4, lr=1e-3)
    model, state = create_train_state(jax.random.PRNGKey(0), SMALL, batch)
    return batch, cfg, model, state


def test_poly_lr_schedule():
    lr = poly_lr(jnp.asarray(1), 1e-3, 30, 0.9)
    np.testing.assert_allclose(float(lr), 1e-3, rtol=1e-6)
    lr16 = poly_lr(jnp.asarray(16), 1e-3, 30, 0.9)
    np.testing.assert_allclose(float(lr16), 1e-3 * (0.5 ** 0.9), rtol=1e-5)


def test_overfit_decreases_loss(small_setup):
    batch, cfg, model, state = small_setup
    step = make_train_step(model, cfg)
    # the step donates its input state; keep the module-scoped fixture alive
    state = jax.tree_util.tree_map(jnp.copy, state)
    losses = []
    for _ in range(8):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses}"
    assert np.isfinite(losses).all()


def test_remat_step_matches_plain(small_setup):
    """nn.remat of the per-stage blocks must not change the computation:
    identical loss and post-step params (VERDICT item 4 — remat lets the
    reference's batch-4 640x512 config train on a 16 GB chip)."""
    import dataclasses

    batch, cfg, _, _ = small_setup
    results = []
    for remat in (False, True):
        mc = dataclasses.replace(SMALL, remat=remat)
        model, state = create_train_state(jax.random.PRNGKey(0), mc, batch)
        step = make_train_step(model, cfg)
        state, loss = step(state, batch)
        results.append((float(loss), state.params))
    (l0, p0), (l1, p1) = results
    assert abs(l0 - l1) < 1e-6, (l0, l1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_data_parallel_matches_single_device(small_setup):
    """Gradients (pre-optimizer) from the sharded batch must equal the
    single-device gradients — comparing post-Adam params would let the
    normalised update amplify reduction-order noise into false failures,
    and conversely mask real scaling bugs."""
    from mdfnet_tpu.models.loss import multi_scale_depth_loss

    batch, cfg, model, _ = small_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    # batch of 8 identical items so per-device shards are identical
    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x[:1]] * 8, axis=0), batch)
    _, state = create_train_state(jax.random.PRNGKey(1), SMALL, batch8)

    def loss_fn(params, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b["imgs"], b["extrinsics"], b["intrinsics"], b["depth_range"],
            train=True, mutable=["batch_stats"])
        return multi_scale_depth_loss(out["depth"], b["ref_depths"],
                                      b["depth_range"])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss_single, grads_single = grad_fn(state.params, batch8)

    mesh = make_mesh(data=8)
    sharded = shard_batch(mesh, batch8)
    loss_dp, grads_dp = grad_fn(state.params, sharded)

    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)
    flat_s = [np.asarray(g).ravel() for g in
              jax.tree_util.tree_leaves(grads_single)]
    flat_d = [np.asarray(g).ravel() for g in
              jax.tree_util.tree_leaves(grads_dp)]
    a = np.concatenate(flat_s)
    b = np.concatenate(flat_d)
    # f32 reduction-order differences between partitionings get amplified to
    # ~0.5% by train-mode BN backprop (cancellation-heavy); the assertions
    # below still catch semantic sharding bugs (a missing/duplicated mean
    # scales grads by 8x, a missing all-reduce zeroes shards):
    gmax = np.abs(a).max()
    np.testing.assert_allclose(a, b, atol=2e-2 * gmax)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9999, f"gradient direction diverged: cos={cos}"
    np.testing.assert_allclose(np.linalg.norm(b), np.linalg.norm(a), rtol=1e-3)

    # and the full optimizer step executes under sharding
    step = make_train_step(model, cfg)
    state_dp, loss = step(jax.tree_util.tree_map(jnp.copy, state), sharded)
    assert np.isfinite(float(loss))


def test_batchnorm_stats_are_globally_synced(small_setup):
    """Pins the documented BN-under-DP semantics (models/layers.py): the
    jit-sharded train-mode forward reduces BN statistics over the FULL global
    batch, not per-replica shards — a deliberate deviation from the
    reference's DataParallel per-replica stats."""
    batch, _, model, state = small_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    # 8 DISTINCT items (scaled copies) so per-replica stats would differ from
    # global stats if BN were per-replica
    def make8(x):
        if x.ndim == 0:
            return x
        reps = [x[:1] * (1.0 + 0.3 * i) if jnp.issubdtype(x.dtype, jnp.floating)
                else x[:1] for i in range(8)]
        return jnp.concatenate(reps, axis=0)

    batch8 = jax.tree_util.tree_map(make8, batch)
    _, st = create_train_state(jax.random.PRNGKey(2), SMALL, batch8)

    def fwd(variables, b):
        _, mutated = model.apply(
            variables, b["imgs"], b["extrinsics"], b["intrinsics"],
            b["depth_range"], train=True, mutable=["batch_stats"])
        return mutated["batch_stats"]

    variables = {"params": st.params, "batch_stats": st.batch_stats}
    stats_single = jax.jit(fwd)(variables, batch8)

    mesh = make_mesh(data=8)
    sharded = shard_batch(mesh, batch8)
    stats_dp = jax.jit(fwd)(variables, sharded)

    for a, b in zip(jax.tree_util.tree_leaves(stats_single),
                    jax.tree_util.tree_leaves(stats_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_checkpoint_roundtrip(small_setup, tmp_path):
    batch, cfg, model, state = small_setup
    step = make_train_step(model, cfg)
    state, _ = step(jax.tree_util.tree_map(jnp.copy, state), batch)

    path = str(tmp_path / "ckpt_1")
    save_checkpoint(path, state)
    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    restored = restore_checkpoint(path, template)

    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state)),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_eval_matches_single_device(small_setup):
    """DP EVAL over the batch axis (VERDICT r2 #6): the jitted eval forward
    on a mesh-sharded batch of 8 must reproduce the single-device outputs —
    proving sharded inference (not just training) compiles and is exact."""
    batch, _, model, state = small_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x[:1]] * 8, axis=0), batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(b):
        return model.apply(variables, b["imgs"], b["extrinsics"],
                           b["intrinsics"], b["depth_range"], train=False)

    out_single = fwd(batch8)

    mesh = make_mesh(data=8)
    sharded = shard_batch(mesh, batch8)
    out_dp = fwd(sharded)

    np.testing.assert_allclose(np.asarray(out_dp["depth"]),
                               np.asarray(out_single["depth"]),
                               rtol=2e-4, atol=2e-4 * 600)
    np.testing.assert_allclose(np.asarray(out_dp["confidence"]),
                               np.asarray(out_single["confidence"]),
                               atol=1e-3)


def test_loss_psum_matches_global_masked_mean(small_setup):
    """The psum'd per-shard loss (axis_name path) must equal the GLOBAL
    masked mean even when shards have different valid-pixel counts — a
    pmean-of-shard-means would mis-weight them."""
    from jax.sharding import PartitionSpec as P
    from mdfnet_tpu.models.loss import multi_scale_depth_loss

    batch, _, _, _ = small_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x[:1]] * 8, axis=0), batch)
    # distinct valid-pixel counts per item: zero out i columns of row 0 at
    # every pyramid level (0 < depth_min -> masked out)
    ref_depths = {}
    for k, v in batch8["ref_depths"].items():
        arr = np.asarray(v).copy()
        for i in range(8):
            arr[i, :1, :i] = 0.0
        ref_depths[k] = jnp.asarray(arr)
    # fake distinct predictions so per-item losses differ too
    depths = [jnp.asarray(np.asarray(ref_depths[k])
                          + np.linspace(0.5, 4.0, 8)[:, None, None])
              for k in ("3", "2", "1", "0")]
    drange = batch8["depth_range"]

    expected = float(multi_scale_depth_loss(depths, ref_depths, drange))

    mesh = make_mesh(data=8)
    fn = jax.shard_map(
        lambda d, g, r: multi_scale_depth_loss(d, g, r, axis_name="data"),
        mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False)
    got = float(jax.jit(fn)(depths, ref_depths, drange))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_shard_map_gradients_match_single_device(small_setup):
    """Raw REDUCED gradients from the shard_map collective pattern must equal
    the single-device gradients (ADVICE r3: the post-Adam comparison below is
    scale-invariant, so only this raw check catches a missing/extra psum
    factor — psum(grads) instead of pmean over-counts by exactly 8x here)."""
    from jax.sharding import PartitionSpec as P
    from mdfnet_tpu.models.loss import multi_scale_depth_loss

    batch, cfg, model, _ = small_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x[:1]] * 8, axis=0), batch)
    _, state = create_train_state(jax.random.PRNGKey(1), SMALL, batch8)

    def loss_fn(params, b, axis_name=None):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b["imgs"], b["extrinsics"], b["intrinsics"], b["depth_range"],
            train=True, mutable=["batch_stats"])
        return multi_scale_depth_loss(out["depth"], b["ref_depths"],
                                      b["depth_range"], axis_name=axis_name)

    grads_single = jax.jit(jax.grad(loss_fn))(state.params, batch8)

    mesh = make_mesh(data=8)

    def shard_grads(params, b):
        g = jax.grad(loss_fn)(params, b, "data")
        return jax.lax.pmean(g, "data")  # the train_lib.shard_step reduction

    fn = jax.shard_map(shard_grads, mesh=mesh, in_specs=(P(), P("data")),
                       out_specs=P(), check_vma=False)
    grads_dp = jax.jit(fn)(state.params, shard_batch(mesh, batch8))

    a = np.concatenate([np.asarray(g).ravel() for g in
                        jax.tree_util.tree_leaves(grads_single)])
    b = np.concatenate([np.asarray(g).ravel() for g in
                        jax.tree_util.tree_leaves(grads_dp)])
    # identical shards -> identical math up to reduction order; in particular
    # any constant-scale error (the 8x psum over-count) fails the norm check
    np.testing.assert_allclose(np.linalg.norm(b), np.linalg.norm(a), rtol=1e-3)
    np.testing.assert_allclose(a, b, atol=2e-2 * np.abs(a).max())


def test_shard_map_step_matches_single_device(small_setup):
    """The shard_map DP train step (the path that carries the Pallas train
    kernels onto a mesh) must reproduce the single-device step: identical
    items per shard -> per-shard BN stats equal global stats, psum'd loss
    and pmean'd grads equal the global ones. (Raw-gradient scale is pinned by
    test_shard_map_gradients_match_single_device — the update-direction
    checks here are scale-invariant.)"""
    batch, cfg, model, _ = small_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"

    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x[:1]] * 8, axis=0), batch)
    _, state = create_train_state(jax.random.PRNGKey(1), SMALL, batch8)

    step_single = make_train_step(model, cfg)
    s_single, loss_single = step_single(
        jax.tree_util.tree_map(jnp.copy, state), batch8)

    mesh = make_mesh(data=8)
    step_dp = make_train_step(model, cfg, mesh=mesh)
    sharded = shard_batch(mesh, batch8)
    s_dp, loss_dp = step_dp(jax.tree_util.tree_map(jnp.copy, state), sharded)

    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-5)
    # batch_stats: XLA compiles the B=1 per-shard and B=8 global programs
    # differently, and low-order-bit activation differences compound
    # through the ~30 BN layers (variance = E[x^2]-E[x]^2 is cancellation-
    # prone), reaching ~1e-2 on deep-layer variances whose batch term is
    # tiny — a coarse bound suffices (the pmean plumbing itself cannot be
    # wrong without the loss/grads checks above failing too)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.batch_stats),
                    jax.tree_util.tree_leaves(s_dp.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)
    # params: post-Adam comparison amplifies f32 reduction-order noise where
    # gradients are near zero (see test_data_parallel_matches_single_device)
    # -> compare the UPDATE direction, which any semantic bug (missing psum,
    # double-counted shard, wrong normalisation) flips or rescales
    upd_s = np.concatenate(
        [np.asarray(n - o).ravel() for n, o in
         zip(jax.tree_util.tree_leaves(s_single.params),
             jax.tree_util.tree_leaves(state.params))])
    upd_d = np.concatenate(
        [np.asarray(n - o).ravel() for n, o in
         zip(jax.tree_util.tree_leaves(s_dp.params),
             jax.tree_util.tree_leaves(state.params))])
    cos = (upd_s @ upd_d) / (np.linalg.norm(upd_s) * np.linalg.norm(upd_d))
    assert cos > 0.999, f"update direction diverged: cos={cos}"
    np.testing.assert_allclose(np.linalg.norm(upd_d), np.linalg.norm(upd_s),
                               rtol=1e-2)
