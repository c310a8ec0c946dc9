"""TPU-target lowering check for the bench/eval fused path — on a CPU host.

The Pallas TPU kernels run under `interpret=True` in the rest of the suite,
which skips Mosaic's lowering-time legality checks (block-shape tiling
rules, SMEM budgets). `jax.export(platforms=["tpu"])` runs the REAL Mosaic
lowering on any host, so an illegal block spec fails here instead of at
bench time on the real chip (a (D, r_rows, Wp) hypothesis block with
r_rows=4 in the sublane dim once slipped through the whole CPU suite this
way).

Slow tier: the full 1600x1184 trace+lowering takes a few minutes.
"""
import importlib.util
import pathlib
import re

import pytest

pytestmark = pytest.mark.slow


def _load_census():
    # import by path: the torch-oracle tests put /root/reference on
    # sys.path, whose own tools/ package shadows this repo's
    p = pathlib.Path(__file__).resolve().parent.parent / "tools" / \
        "traffic_census.py"
    spec = importlib.util.spec_from_file_location("mdfnet_traffic_census", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_config_forward_lowers_for_tpu():
    text = _load_census().export_forward(height=1184, width=1600, nviews=5)
    # sanity: the fused kernels actually made it into the module
    kernels = re.findall(r"custom_call @tpu_custom_call\(", text)
    assert len(kernels) >= 10, f"only {len(kernels)} tpu_custom_calls"
