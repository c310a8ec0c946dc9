"""Static HBM-traffic census of the eval forward's StableHLO (dev tool).

Exports the bench-config forward for the TPU target (works on a CPU-only
host via jax.export cross-platform lowering) and tallies the bytes written
by every emitted op, grouped by op kind. XLA will fuse most elementwise
chains, so absolute numbers overestimate — but the big layout ops
(transpose / pad / concatenate / gather at multi-MB shapes) survive fusion
as real HBM round-trips, and this census finds them without a TPU.

Usage (CPU host, axon tunnel down is fine):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/traffic_census.py \
        [--height 1184] [--width 1600] [--top 30]
"""
from __future__ import annotations

import argparse
import collections
import re

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "i64": 8, "ui64": 8, "i32": 4, "ui32": 4,
    "i16": 2, "ui16": 2, "i8": 1, "ui8": 1, "i1": 1,
}

# ops whose result is (approximately) a fresh HBM tensor: traffic ~ result
# bytes written (+ roughly the same read). Elementwise ops are listed too
# but reported separately — XLA fuses most of them away.
LAYOUT_OPS = {
    "transpose", "pad", "concatenate", "slice", "dynamic_slice",
    "dynamic_update_slice", "gather", "scatter", "reverse", "reshape",
    "broadcast_in_dim", "iota", "select_and_scatter",
}
COMPUTE_OPS = {"dot_general", "convolution", "custom_call", "reduce",
               "reduce_window", "sort", "while", "call", "composite"}

TENSOR_RE = re.compile(r"tensor<([0-9x]*)x?((?:f|bf|i|ui)[0-9]+)>")
OP_RE = re.compile(r"=\s+(?:\"([a-z_]+\.[a-zA-Z0-9_.]+)\"|([a-z_]+\.[a-zA-Z0-9_.]+))\(?")


def tensor_bytes(shape_str: str, dt: str) -> int:
    n = 1
    if shape_str:
        for d in shape_str.split("x"):
            if d:
                n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def census(module_text: str, top: int):
    by_kind = collections.Counter()
    count_by_kind = collections.Counter()
    biggest = []
    for line in module_text.splitlines():
        m = OP_RE.search(line)
        if not m:
            continue
        full = m.group(1) or m.group(2)
        if not full.startswith("stablehlo."):
            if "tpu_custom_call" in line or "custom_call" in full:
                full = "stablehlo.custom_call"
            else:
                continue
        op = full.split(".", 1)[1]
        # result type = first tensor<> after the '->' if present, else the
        # first tensor<> on the line after the op name
        tail = line[m.end():]
        arrow = tail.rfind("->")
        seg = tail[arrow + 2:] if arrow >= 0 else tail
        tm = TENSOR_RE.search(seg) or TENSOR_RE.search(tail)
        if not tm:
            continue
        nbytes = tensor_bytes(tm.group(1), tm.group(2))
        by_kind[op] += nbytes
        count_by_kind[op] += 1
        if op in LAYOUT_OPS and nbytes >= 1 << 20:
            biggest.append((nbytes, op, tm.group(0), line.strip()[:160]))

    print(f"{'op kind':26s} {'count':>6s} {'result MB':>10s}")
    for op, b in by_kind.most_common():
        tag = ("LAYOUT" if op in LAYOUT_OPS
               else "compute" if op in COMPUTE_OPS else "elemwise")
        print(f"{op:26s} {count_by_kind[op]:6d} {b / 1e6:10.1f}  {tag}")

    lay = sum(b for op, b in by_kind.items() if op in LAYOUT_OPS)
    print(f"\nLAYOUT total: {lay / 1e9:.2f} GB result-bytes "
          f"(traffic ~2x this if none fuse)")

    biggest.sort(reverse=True)
    print(f"\ntop {top} layout ops >=1MB:")
    for nbytes, op, ty, line in biggest[:top]:
        print(f"  {nbytes / 1e6:8.1f} MB  {op:18s} {ty}")
        print(f"            {line}")


def attribute(module_text: str, top: int = 25):
    """Aggregate layout-op bytes by (op kind, python source chain) using
    the module's #loc table — answers 'WHERE do the big copies come from'.
    Pre-fusion numbers: XLA fuses most elementwise/broadcast chains, but
    transposes/pads feeding pallas_call custom-calls are real copies."""
    locdef = {}
    for m in re.finditer(r"^#loc(\d*) = loc\((.*)\)$", module_text, re.M):
        locdef[m.group(1) or "0"] = m.group(2)

    def resolve(lid, depth=0):
        if depth > 12:
            return "..."
        d = locdef.get(lid, "?")
        out = []
        for fm in re.finditer(r'"([^"]+\.py)":(\d+)', d):
            out.append(f"{fm.group(1).split('/')[-1]}:{fm.group(2)}")
        for rm in re.finditer(r"#loc(\d+)", d):
            sub = resolve(rm.group(1), depth + 1)
            if sub:
                out.append(sub)
        return " <- ".join(o for o in out if o)

    agg = collections.Counter()
    pat = re.compile(
        r"= stablehlo\.(transpose|pad|concatenate|gather|iota|reverse|slice)"
        r"\b[^\n]*?tensor<([0-9x]*)x((?:f|bf|i|ui)\d+)>\s*loc\(#loc(\d+)\)")
    for m in pat.finditer(module_text):
        op, sh, dt, lid = m.groups()
        agg[(op, resolve(lid))] += tensor_bytes(sh, dt)
    print("\n== layout bytes by (op, source chain) ==")
    for (op, src), b in agg.most_common(top):
        print(f"{b / 1e6:9.1f} MB  {op:12s} {src[:140]}")


def export_forward(height: int = 1184, width: int = 1600,
                   nviews: int = 5) -> str:
    """TPU-target StableHLO of the bench-config forward, lowered on any
    host via jax.export. Raises if any Pallas kernel fails Mosaic lowering
    at these shapes — the compile check bench.py would otherwise only hit
    on the real chip (tests/test_tpu_lowering.py pins this)."""
    import jax
    import jax.numpy as jnp
    from jax import export

    from mdfnet_tpu.config import ModelConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.models import build_model

    model = build_model(ModelConfig(compute_dtype="bfloat16",
                                    warp_impl="fused", pallas_conv=True))
    scene = make_plane_scene(height=height, width=width,
                             nviews=nviews, plane_depth=650.0, tilt=0.05)
    batch = make_batch(scene, batch=1)
    call_args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
                 jnp.asarray(batch["intrinsics"]),
                 jnp.asarray(batch["depth_range"]))
    # shape-only init: the Pallas TPU kernels can't execute on this host
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *call_args, train=False))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)

    def forward(imgs, extr, intr, drange):
        return model.apply(variables, imgs, extr, intr, drange, train=False)

    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in call_args]
    exp = export.export(jax.jit(forward), platforms=["tpu"])(*shapes)
    return exp.mlir_module()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1184)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--nviews", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump", type=str, default="",
                    help="also write the module text here")
    args = ap.parse_args()

    text = export_forward(args.height, args.width, args.nviews)
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
        print(f"module dumped to {args.dump} ({len(text) / 1e6:.1f} MB)")
    census(text, args.top)
    attribute(text, args.top)


if __name__ == "__main__":
    main()
