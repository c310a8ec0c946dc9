"""Checkpoint export round-trip (VERDICT r3 item 8): the flax->pth exporter
must be the exact inverse of the pth->flax importer, proving the name map
bijective, and the exported file must load strictly into the reference
torch model."""
import sys

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/reference")

from mdfnet_tpu.utils.pth_import import (  # noqa: E402
    load_reference_checkpoint, save_reference_checkpoint,
    state_dict_to_variables, variables_to_state_dict)


def _reference_state_dict(seed=11):
    from tests.test_reference_model_parity import _build_reference_model
    tmodel = _build_reference_model(seed)
    g = torch.Generator().manual_seed(seed + 1)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape,
                                               generator=g) + 0.5)
    return tmodel


def test_import_export_identity_on_state_dict():
    """export(import(sd)) == sd on every tensor of a full random reference
    state_dict (num_batches_tracked is regenerated as zero — the reference
    never reads it)."""
    tmodel = _reference_state_dict()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    variables = state_dict_to_variables(sd)
    back = variables_to_state_dict(variables)

    orig_keys = {k for k in sd if not k.endswith("num_batches_tracked")}
    back_keys = {k for k in back if not k.endswith("num_batches_tracked")}
    assert orig_keys == back_keys, (
        f"missing={sorted(orig_keys - back_keys)[:5]} "
        f"extra={sorted(back_keys - orig_keys)[:5]}")
    for k in sorted(orig_keys):
        np.testing.assert_array_equal(back[k], sd[k].astype(np.float32),
                                      err_msg=k)


def test_export_import_identity_on_variables():
    """import(export(variables)) == variables leaf-for-leaf."""
    import jax

    tmodel = _reference_state_dict(seed=13)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = state_dict_to_variables(sd)

    back = state_dict_to_variables(variables_to_state_dict(variables))
    la = jax.tree_util.tree_leaves_with_path(variables)
    lb = jax.tree_util.tree_leaves_with_path(back)
    assert len(la) == len(lb)
    for (pa, a), (pb, b) in zip(la, lb):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_exported_pth_loads_strictly_into_reference(tmp_path):
    """A .pth written by save_reference_checkpoint must satisfy the
    reference's strict load (eval.py:16-17 load_state_dict) and reproduce
    the source weights."""
    tmodel = _reference_state_dict(seed=17)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = state_dict_to_variables(sd)

    path = str(tmp_path / "exported.pth")
    save_reference_checkpoint(path, variables, epoch=29)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 29
    fresh = _reference_state_dict(seed=23)  # different weights
    missing, unexpected = fresh.load_state_dict(ckpt["model"], strict=True), None
    for k, v in fresh.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(v.numpy(), sd[k].astype(np.float32),
                                      err_msg=k)

    # and our own loader reads it back identically
    variables2, epoch = load_reference_checkpoint(path)
    assert epoch == 29
    import jax
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(variables2)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
