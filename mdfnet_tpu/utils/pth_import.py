"""One-way converter: reference torch checkpoints -> flax variable trees.

The reference saves ``{'epoch': int, 'model': state_dict}`` per epoch
(reference train.py:59-68). This module maps that state_dict onto this
framework's parameter/batch-stats pytrees so shipped checkpoints
(pth/dtu_29.pth, pth/blendedmvs_29.pth) can run for parity testing.

Layout conversions:
    Conv{2,3}d  torch (O, I, *k)  ->  (*k, I, O)
    ConvTranspose3d torch (I, O, *k) -> (*k, O, I) (this framework stores
        transposed-conv weights output-major; see models/layers.py)
    BatchNorm weight/bias -> scale/bias; running stats -> batch_stats.

torch is only required at call time (CPU build is sufficient).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# name maps: flax module path -> reference state_dict prefix
# ---------------------------------------------------------------------------

_BACKBONE = {}
for _stack, _n in (("conv01", 2), ("conv12", 3), ("conv23", 3), ("conv34", 3)):
    for _i in range(_n):
        _BACKBONE[f"{_stack}_{_i}"] = ("cbr2d", f"Backbone.{_stack}.{_i}")
for _name in ("lat2", "lat3", "out2", "out3", "out4"):
    _BACKBONE[_name] = ("conv", f"Backbone.{_name}")

_REGULAR0 = {}
for _stack, _n in (("conv01", 2), ("conv12", 3), ("conv232", 3)):
    for _i in range(_n):
        _REGULAR0[f"{_stack}_{_i}"] = ("cbr3d", f"Regular.0.{_stack}.{_i}")
_REGULAR0["conv232_3"] = ("trcbr3d", "Regular.0.conv232", 3)
_REGULAR0["conv10"] = ("trcbr3d", "Regular.0.conv10", 0)
_REGULAR0["prob"] = ("conv", "Regular.0.prob")


def _regular4(idx: int) -> Dict:
    m = {"conv01": ("cbr3d", f"Regular.{idx}.conv01")}
    for _stack in ("conv12", "conv23", "conv343"):
        for _i in range(2):
            m[f"{_stack}_{_i}"] = ("cbr3d", f"Regular.{idx}.{_stack}.{_i}")
    m["conv343_2"] = ("trcbr3d", f"Regular.{idx}.conv343", 2)
    m["trconv32"] = ("trcbr3d", f"Regular.{idx}.trconv32", 0)
    m["trconv21"] = ("trcbr3d", f"Regular.{idx}.trconv21", 0)
    m["prob"] = ("conv", f"Regular.{idx}.prob")
    return m


def _aggregate(idx: int) -> Dict:
    p = f"Homoaggre.{idx}.depth_weight"
    return {
        "depth_weight/conv0": ("conv", f"{p}.0.conv"),
        "depth_weight/bn0": ("bn", f"{p}.0.bn"),
        "depth_weight/conv1": ("conv", f"{p}.1"),
    }


_REFINE = {
    "conv0": ("conv", "Refine.conv0"),
    "conv1": ("conv", "Refine.conv1"),
    "conv2_0": ("conv", "Refine.conv2.0"),
    "conv2_1": ("conv", "Refine.conv2.2"),
}
for _i in range(3):
    _REFINE[f"res{_i}/conv0"] = ("conv", f"Refine.ress.{_i}.conv.0")
    _REFINE[f"res{_i}/conv1"] = ("conv", f"Refine.ress.{_i}.conv.2")


def _module_map() -> Dict[str, Tuple]:
    """Full map: 'flax/module/path' -> (kind, reference prefix, ...)."""
    out = {}
    for k, v in _BACKBONE.items():
        out[f"backbone/{k}"] = v
    for s in range(3):
        for k, v in _aggregate(s).items():
            out[f"aggregate{s}/{k}"] = v
    for k, v in _REGULAR0.items():
        out[f"regular0/{k}"] = v
    for s in (1, 2):
        for k, v in _regular4(s).items():
            out[f"regular{s}/{k}"] = v
    for k, v in _REFINE.items():
        out[f"refine/{k}"] = v
    return out


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

def _conv_weight(w: np.ndarray) -> np.ndarray:
    """torch (O, I, *k) -> (*k, I, O)."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _trconv_weight(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose (I, O, *k) -> (*k, O, I)."""
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def state_dict_to_variables(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Convert a reference CoreNet state_dict (torch tensors or numpy arrays)
    to flax variables {'params': ..., 'batch_stats': ...}."""
    sd = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = arr.astype(np.float32)

    params: dict = {}
    stats: dict = {}
    consumed = set()

    def take(name):
        consumed.add(name)
        return sd[name]

    def import_conv(flax_path, ref_prefix):
        w = take(f"{ref_prefix}.weight")
        _set(params, f"{flax_path}/kernel", _conv_weight(w))
        if f"{ref_prefix}.bias" in sd:
            _set(params, f"{flax_path}/bias", take(f"{ref_prefix}.bias"))

    def import_bn(flax_path, ref_prefix):
        _set(params, f"{flax_path}/scale", take(f"{ref_prefix}.weight"))
        _set(params, f"{flax_path}/bias", take(f"{ref_prefix}.bias"))
        _set(stats, f"{flax_path}/mean", take(f"{ref_prefix}.running_mean"))
        _set(stats, f"{flax_path}/var", take(f"{ref_prefix}.running_var"))
        consumed.add(f"{ref_prefix}.num_batches_tracked")

    for flax_path, spec in _module_map().items():
        kind = spec[0]
        if kind == "conv":
            import_conv(flax_path, spec[1])
        elif kind == "bn":
            import_bn(flax_path, spec[1])
        elif kind in ("cbr2d", "cbr3d"):
            import_conv(f"{flax_path}/conv", f"{spec[1]}.conv")
            import_bn(f"{flax_path}/bn", f"{spec[1]}.bn")
        elif kind == "trcbr3d":
            prefix, conv_idx = spec[1], spec[2]
            w = take(f"{prefix}.{conv_idx}.weight")
            _set(params, f"{flax_path}/conv/kernel", _trconv_weight(w))
            import_bn(f"{flax_path}/bn", f"{prefix}.{conv_idx + 1}")
        else:
            raise ValueError(f"unknown kind {kind}")

    leftovers = [k for k in sd if k not in consumed
                 and not k.endswith("num_batches_tracked")
                 and "prob_thresh" not in k]
    if leftovers:
        raise ValueError(f"unmapped reference entries: {leftovers[:10]}")

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# export: flax variables -> reference state_dict (the inverse map)
# ---------------------------------------------------------------------------

def _get(tree: dict, path: str) -> np.ndarray:
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def _conv_weight_inv(w: np.ndarray) -> np.ndarray:
    """(*k, I, O) -> torch (O, I, *k). Inverse of _conv_weight."""
    nd = w.ndim
    return np.transpose(w, (nd - 1, nd - 2) + tuple(range(nd - 2)))


def _trconv_weight_inv(w: np.ndarray) -> np.ndarray:
    """(*k, O, I) -> torch ConvTranspose (I, O, *k). Inverse of _trconv_weight."""
    nd = w.ndim
    return np.transpose(w, (nd - 1, nd - 2) + tuple(range(nd - 2)))


def variables_to_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Convert flax variables back to a reference CoreNet state_dict.

    Exact inverse of :func:`state_dict_to_variables` (round-trip pinned by
    tests/test_pth_roundtrip.py): layout conversions are their own inverses
    (transposes), and every BatchNorm gets the ``num_batches_tracked``
    counter torch includes in its state_dict (int64 zero — the reference
    never consumes it). Lets anyone with the upstream checkpoints verify
    bit-parity in one command, and lets models trained here run in the
    reference (reference train.py:59-68 checkpoint schema).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def to_np(a):
        return np.asarray(a, dtype=np.float32)

    def export_conv(flax_path, ref_prefix):
        sd[f"{ref_prefix}.weight"] = _conv_weight_inv(to_np(_get(params, f"{flax_path}/kernel")))
        try:
            sd[f"{ref_prefix}.bias"] = to_np(_get(params, f"{flax_path}/bias"))
        except KeyError:
            pass

    def export_bn(flax_path, ref_prefix):
        sd[f"{ref_prefix}.weight"] = to_np(_get(params, f"{flax_path}/scale"))
        sd[f"{ref_prefix}.bias"] = to_np(_get(params, f"{flax_path}/bias"))
        sd[f"{ref_prefix}.running_mean"] = to_np(_get(stats, f"{flax_path}/mean"))
        sd[f"{ref_prefix}.running_var"] = to_np(_get(stats, f"{flax_path}/var"))
        sd[f"{ref_prefix}.num_batches_tracked"] = np.zeros((), np.int64)

    for flax_path, spec in _module_map().items():
        kind = spec[0]
        if kind == "conv":
            export_conv(flax_path, spec[1])
        elif kind == "bn":
            export_bn(flax_path, spec[1])
        elif kind in ("cbr2d", "cbr3d"):
            export_conv(f"{flax_path}/conv", f"{spec[1]}.conv")
            export_bn(f"{flax_path}/bn", f"{spec[1]}.bn")
        elif kind == "trcbr3d":
            prefix, conv_idx = spec[1], spec[2]
            w = to_np(_get(params, f"{flax_path}/conv/kernel"))
            sd[f"{prefix}.{conv_idx}.weight"] = _trconv_weight_inv(w)
            export_bn(f"{flax_path}/bn", f"{prefix}.{conv_idx + 1}")
        else:
            raise ValueError(f"unknown kind {kind}")
    return sd


def save_reference_checkpoint(path: str, variables: Dict, epoch: int) -> None:
    """Write a reference-schema .pth ({'epoch', 'model'}, train.py:59-68)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in variables_to_state_dict(variables).items()}
    torch.save({"epoch": int(epoch), "model": sd}, path)


def load_reference_checkpoint(path: str) -> Tuple[Dict, int]:
    """Load a reference .pth file -> (flax variables, epoch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    epoch = ckpt.get("epoch", -1) if isinstance(ckpt, dict) else -1
    return state_dict_to_variables(state_dict), epoch
