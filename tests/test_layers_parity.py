"""Layer-level parity vs torch: conv, transposed conv, batchnorm, resize,
pixel-shuffle. torch (CPU) is the oracle for the semantics the reference
relies on; weights are copied torch -> flax through the same conversions
utils/pth_import.py uses."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mdfnet_tpu.models.layers import (
    BatchNorm, ConvND, ConvTransposeND, pixel_shuffle_2x)
from mdfnet_tpu.ops.sample import (
    bilinear_sample_2d, resize_bilinear_2x, resize_nearest_2x)
from mdfnet_tpu.utils.pth_import import _conv_weight, _trconv_weight


def test_conv2d_matches_torch(rng):
    x = rng.randn(2, 13, 17, 5).astype(np.float32)
    tconv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1, bias=True)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    conv = ConvND(7, (3, 3), strides=2, padding=1, use_bias=True)
    params = {"kernel": jnp.asarray(_conv_weight(tconv.weight.detach().numpy())),
              "bias": jnp.asarray(tconv.bias.detach().numpy())}
    out = conv.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_conv3d_matches_torch(rng):
    x = rng.randn(1, 6, 9, 11, 4).astype(np.float32)
    tconv = torch.nn.Conv3d(4, 8, 3, stride=(2, 2, 2), padding=1, bias=False)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3)) \
            .permute(0, 2, 3, 4, 1).numpy()

    conv = ConvND(8, (3, 3, 3), strides=(2, 2, 2), padding=1, use_bias=False)
    params = {"kernel": jnp.asarray(_conv_weight(tconv.weight.detach().numpy()))}
    out = conv.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("stride,opad", [(2, 1), (2, (1, 1, 1)), (1, 0)])
def test_conv_transpose3d_matches_torch(rng, stride, opad):
    x = rng.randn(1, 4, 5, 6, 3).astype(np.float32)
    op = opad if isinstance(opad, int) else opad[0]
    if stride == 1 and op != 0:
        pytest.skip("torch requires output_padding < stride")
    tconv = torch.nn.ConvTranspose3d(3, 5, 3, stride=stride, padding=1,
                                     output_padding=op, bias=False)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3)) \
            .permute(0, 2, 3, 4, 1).numpy()

    conv = ConvTransposeND(5, (3, 3, 3), strides=stride, padding=1,
                           output_padding=opad, use_bias=False)
    params = {"kernel": jnp.asarray(_trconv_weight(tconv.weight.detach().numpy()))}
    out = conv.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_batchnorm_eval_matches_torch(rng):
    x = rng.randn(2, 7, 9, 6).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.rand(6).astype(np.float32) + 0.5))
        tbn.bias.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(rng.rand(6).astype(np.float32) + 0.5))
    tbn.eval()
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    bn = BatchNorm()
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                        "var": jnp.asarray(tbn.running_var.numpy())},
    }
    out = bn.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_batchnorm_train_matches_torch(rng):
    x = rng.randn(4, 5, 5, 3).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    ref = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()

    bn = BatchNorm()
    variables = {
        "params": {"scale": jnp.ones((3,)), "bias": jnp.zeros((3,))},
        "batch_stats": {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))},
    }
    out, mutated = bn.apply(variables, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    # running stats follow torch's (momentum 0.1, unbiased var) convention
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tbn.running_var.detach().numpy(), atol=1e-5)


def test_batchnorm_vgroups_matches_sequential_torch(rng):
    # the stacked train backbone computes per-view BN statistics in one
    # call (BatchNorm vgroups); it must equal V sequential torch train-mode
    # calls — including the chained running-stat EMA (reference
    # net/core.py:42 calls the FPN per view)
    V, B = 5, 2
    x = rng.randn(V, B, 5, 5, 3).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    refs = [tbn(torch.from_numpy(x[v]).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1).detach().numpy() for v in range(V)]

    bn = BatchNorm()
    variables = {
        "params": {"scale": jnp.ones((3,)), "bias": jnp.zeros((3,))},
        "batch_stats": {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))},
    }
    out, mutated = bn.apply(variables, jnp.asarray(x.reshape(V * B, 5, 5, 3)),
                            train=True, vgroups=V, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out).reshape(V, B, 5, 5, 3),
                               np.stack(refs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tbn.running_var.detach().numpy(), atol=1e-5)


def test_resize_bilinear_2x_matches_torch(rng):
    x = rng.randn(2, 3, 10, 14).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear",
                        align_corners=False).numpy()
    out = resize_bilinear_2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_resize_nearest_2x_matches_torch(rng):
    x = rng.randn(2, 10, 14).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x).unsqueeze(1), scale_factor=2,
                        mode="nearest").squeeze(1).numpy()
    out = resize_nearest_2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=0)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.randn(2, 5, 7, 12).astype(np.float32)
    ref = torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2) \
        .permute(0, 2, 3, 1).numpy()
    out = pixel_shuffle_2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=0)


def test_grid_sample_zeros_matches_torch(rng):
    """Our pixel-space bilinear sampler == torch grid_sample(zeros, ac=False)
    through the inverse coordinate mapping x_pix = ((g+1)*S - 1)/2."""
    b, h, w, c = 2, 9, 12, 4
    img = rng.randn(b, h, w, c).astype(np.float32)
    # sample coordinates straddling borders and outside
    gx = rng.uniform(-1.3, 1.3, (b, 20)).astype(np.float32)
    gy = rng.uniform(-1.3, 1.3, (b, 20)).astype(np.float32)

    grid = torch.from_numpy(np.stack([gx, gy], axis=-1)).view(b, 1, 20, 2)
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2), grid,
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False).numpy()[:, :, 0]  # (B, C, 20)

    x_pix = ((gx + 1) * w - 1) / 2
    y_pix = ((gy + 1) * h - 1) / 2
    out = bilinear_sample_2d(jnp.asarray(img), jnp.asarray(x_pix), jnp.asarray(y_pix))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref, atol=1e-5)
