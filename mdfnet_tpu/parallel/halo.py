"""Per-layer halo exchange for exact spatial (image-height) sharding.

The workload's analog of sequence/context parallelism (SURVEY.md §5): the
plane-sweep cost volumes dominate HBM and shard naturally over the image
H axis. Instead of overlap-tiling (whose redundant overlap must cover the
FULL network receptive field — hundreds of rows for the stacked 3D U-Nets,
destroying the memory saving), every H-stencil op exchanges exactly the rows
it needs with its mesh neighbours via ``jax.lax.ppermute``:

- convolutions exchange ``padding`` rows per side and then run unpadded on H
  (layers.ConvND / ConvTransposeND consult the context);
- 2x bilinear upsampling exchanges one row per side (ops/sample.py);
- plane-sweep warps all-gather the (small, 2D) source feature rows and keep
  the (large, 3D) cost volumes sharded (models/aggregate.py).

Exactness at global image borders: the unsharded model's out-of-image
behaviour is zeros everywhere — convs zero-pad (reference net/unit/base.py:18)
and the warp samples with grid_sample(padding_mode='zeros')
(base.py:122-124). ``ppermute`` leaves non-addressed edge devices with zeros,
which therefore reproduces the global border semantics with no masking at
all. The only op with replicate-edge border semantics is the fixed-stencil
2x bilinear upsample (torch F.interpolate clamps its half-pixel taps), which
``halo_exchange(edge="replicate")`` handles explicitly.

The context is trace-time state (a contextvar set around ``model.apply``
inside ``shard_map`` — see parallel/spatial.py), so the model code itself
stays shape-polymorphic and unaware of the mesh except through these hooks.
"""
from __future__ import annotations

import contextvars
import dataclasses
from contextlib import contextmanager

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpatialCtx:
    """Active spatial sharding: mesh axis name + number of shards."""
    axis: str
    n: int


_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "mdfnet_spatial_ctx", default=None)


def current_ctx() -> SpatialCtx | None:
    return _CTX.get()


@contextmanager
def spatial_sharding(axis: str, n: int):
    """Enable halo-exchange mode for ops traced inside this scope (must be
    entered inside a shard_map over ``axis``)."""
    token = _CTX.set(SpatialCtx(axis, n) if n > 1 else None)
    try:
        yield
    finally:
        _CTX.reset(token)


def halo_exchange(x: jnp.ndarray, h_axis: int, lo: int, hi: int,
                  edge: str = "zero") -> jnp.ndarray:
    """Extend the local H-band with ``lo`` rows from the device above and
    ``hi`` rows from the device below.

    edge="zero": global-boundary devices see zero rows (conv zero-padding /
    grid_sample zeros semantics) — this is ppermute's natural fill.
    edge="replicate": global-boundary devices see their own edge row
    repeated (torch F.interpolate border clamping).
    """
    ctx = current_ctx()
    assert ctx is not None, "halo_exchange outside spatial_sharding scope"
    n, ax = ctx.n, ctx.axis
    if lo == 0 and hi == 0:
        return x
    band = x.shape[h_axis]
    parts = []
    if lo:
        bot = jax.lax.slice_in_dim(x, band - lo, band, axis=h_axis)
        # device i sends its bottom rows to i+1; device 0 receives zeros
        from_above = jax.lax.ppermute(bot, ax,
                                      [(i, i + 1) for i in range(n - 1)])
        if edge == "replicate":
            top_row = jax.lax.slice_in_dim(x, 0, 1, axis=h_axis)
            rep = jnp.concatenate([top_row] * lo, axis=h_axis)
            idx = jax.lax.axis_index(ax)
            from_above = jnp.where(idx == 0, rep, from_above)
        parts.append(from_above)
    parts.append(x)
    if hi:
        top = jax.lax.slice_in_dim(x, 0, hi, axis=h_axis)
        from_below = jax.lax.ppermute(top, ax,
                                      [(i + 1, i) for i in range(n - 1)])
        if edge == "replicate":
            bot_row = jax.lax.slice_in_dim(x, band - 1, band, axis=h_axis)
            rep = jnp.concatenate([bot_row] * hi, axis=h_axis)
            idx = jax.lax.axis_index(ax)
            from_below = jnp.where(idx == n - 1, rep, from_below)
        parts.append(from_below)
    return jnp.concatenate(parts, axis=h_axis)


def all_gather_rows(x: jnp.ndarray, h_axis: int) -> jnp.ndarray:
    """Gather the full global H extent of a sharded array (for warp sources:
    the 2D feature maps are small next to the sharded 3D cost volumes)."""
    ctx = current_ctx()
    assert ctx is not None
    return jax.lax.all_gather(x, ctx.axis, axis=h_axis, tiled=True)
