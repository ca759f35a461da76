"""Pallas TPU scatter-add for the ROIAlign region-gather backward.

The train step's single most expensive HLO op (round-4 xprof: 14.05 ms of a
157 ms step) was XLA's scatter-add emitting the region-gather VJP — it runs
at 18.5 GiB/s on this libtpu, ~40× under HBM bandwidth, because a scatter
with data-dependent indices is lowered as serialized row updates. This
kernel replaces it with a TILE-ACCUMULATOR design that turns the scatter
into dense, sequential VMEM arithmetic:

1. ROIs are sorted by the first flat row of their region window (one small
   XLA argsort). Each ROI is processed by exactly the output tile that
   contains its BASE row — no overlap tests, no masks.
2. The grid walks output tiles IN ORDER (TPU grids are sequential on a
   core). Each step owns a float32 VMEM accumulator of ``tile + halo``
   rows: a window starting inside the tile extends at most ``halo`` rows
   past it (halo = the largest window extent over all pyramid levels, a
   trace-time constant), so every add lands in the accumulator.
3. Per ROI: ONE contiguous DMA fetches its (t·txn, 128) cotangent block
   (double-buffered, hidden behind the adds), then ``t`` vector adds place
   the rows at ``base + j·stride`` — dense VPU work instead of scatter
   descriptors.
4. At step end the owned ``tile`` rows are written out once, and the halo
   is carried into the next step's accumulator (the shift is a VMEM copy).

Exactness: the region fetch clamps out-of-range row indices, but clamped
positions always carry ZERO interpolation weight (``region_params`` zeroes
the weights of rows/columns outside the level extent), so their cotangent
is zero and dropping the out-of-array writes is exact — asserted against
the XLA scatter path in tests/test_kernels.py.

Accumulation is float32 (the XLA path accumulated in bf16); the output is
cast back to the feature dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(ranges_ref, base_ref, stride_ref, order_ref, dreg_ref,
            out_ref, acc, dreg_sc, sems, *, tile8: int, halo8: int,
            t: int, txn8: int):
    """All row dimensions travel in 8-row CHUNKS as a LEADING (untiled)
    axis — acc is ((tile8+halo8), 8, 128) — so the per-window dynamic
    offsets are pure address arithmetic on dim 0. (With rows as the
    sublane axis, Mosaic lowers a dynamic-offset store as a full-buffer
    select: measured 17 s/call on the v1 kernel. This form is ~2 ms.)"""
    i = pl.program_id(0)
    tile0 = i * tile8

    # ---- carry the halo, zero the rest -------------------------------
    @pl.when(i == 0)
    def _():
        acc[pl.ds(0, halo8)] = jnp.zeros((halo8, 8, _LANES), jnp.float32)

    @pl.when(i > 0)
    def _():
        acc[pl.ds(0, halo8)] = acc[pl.ds(tile8, halo8)]
    acc[pl.ds(halo8, tile8)] = jnp.zeros((tile8, 8, _LANES), jnp.float32)

    lo = ranges_ref[i, 0]
    hi = ranges_ref[i, 1]
    n_cand = hi - lo

    def start(k, slot):
        src = order_ref[lo + k]
        pltpu.make_async_copy(
            dreg_ref.at[src], dreg_sc.at[slot], sems.at[slot]
        ).start()

    @pl.when(n_cand > 0)
    def _():
        start(0, 0)

    def body(k, carry):
        slot = jax.lax.rem(k, 2)
        pltpu.make_async_copy(
            dreg_ref.at[0], dreg_sc.at[slot], sems.at[slot]
        ).wait()

        @pl.when(k + 1 < n_cand)
        def _():
            start(k + 1, jax.lax.rem(k + 1, 2))

        # acc[h] covers flat2 chunk (tile0 + h): owned range [0, tile8),
        # halo [tile8, tile8+halo8). Windows start inside the owned range
        # and extend at most halo8 chunks past it.
        obase = base_ref[lo + k] - tile0 * 8
        stride = stride_ref[lo + k]
        blk = dreg_sc[slot].astype(jnp.float32)  # (t·txn8, 8, 128)
        for j in range(t):
            off8 = (obase + j * stride) // 8
            acc[pl.ds(off8, txn8)] = (
                acc[pl.ds(off8, txn8)] + blk[j * txn8:(j + 1) * txn8]
            )
        return carry

    jax.lax.fori_loop(0, n_cand, body, 0)
    out_ref[0] = acc[pl.ds(0, tile8)].astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("s2_rows", "t", "txn", "halo", "out_dtype", "interpret"),
)
def scatter_add_regions(
    d_regs: jnp.ndarray,
    base2: jnp.ndarray,
    stride2: jnp.ndarray,
    s2_rows: int,
    t: int,
    txn: int,
    halo: int,          # static bound: (t-1)·max(stride2) + txn ≤ halo
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """d_flat2 (s2_rows, 128) = Σ_r place(d_regs[r]) — the region gather's
    VJP. Window row j of ROI r lands at ``base2[r] + j·stride2[r]``; writes
    at or past ``s2_rows`` are dropped (zero-weight clamp tails — see the
    module docstring for why that is exact)."""
    r = d_regs.shape[0]
    assert d_regs.shape[1] == t * txn and d_regs.shape[2] == _LANES, (
        d_regs.shape, t, txn)
    assert txn % 8 == 0, txn  # windows move in whole 8-row chunks

    halo8 = _round_up(max(halo, 8), 8) // 8
    tile8 = _round_up(max(8192 // 8, halo8), 1)  # carry needs tile ≥ halo
    n_tiles = -(-s2_rows // (tile8 * 8)) + 1  # +1: last halo lands in-range
    txn8 = txn // 8

    order = jnp.argsort(base2).astype(jnp.int32)
    base_s = base2[order].astype(jnp.int32)
    stride_s = stride2[order].astype(jnp.int32)
    starts = jnp.arange(n_tiles + 1, dtype=jnp.int32) * (tile8 * 8)
    cuts = jnp.searchsorted(base_s, starts, side="left").astype(jnp.int32)
    ranges = jnp.stack([cuts[:-1], cuts[1:]], axis=1)  # (n_tiles, 2)

    kernel = functools.partial(
        _kernel, tile8=tile8, halo8=halo8, t=t, txn8=txn8)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, tile8, 8, _LANES), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tile8 + halo8, 8, _LANES), jnp.float32),
                pltpu.VMEM((2, t * txn8, 8, _LANES), d_regs.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile8, 8, _LANES),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: halo carry
        ),
        interpret=interpret,
    )(ranges, base_s, stride_s, order,
      d_regs.reshape(r, t * txn8, 8, _LANES))
    return out.reshape(n_tiles * tile8 * 8, _LANES)[:s2_rows]
