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

Accumulation is float32 by default (BETTER than the XLA path, which
accumulated in bf16); ``acc_dtype="bfloat16"`` trades that margin back for
halved accumulator traffic. Output is cast to the feature dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(ranges_ref, base_ref, stride_ref, order_ref, dreg_ref,
            out_ref, acc, dreg_sc, sems, *, tilec: int, haloc: int,
            t: int, txnc: int, ch: int, acc_dtype):
    """All row dimensions travel in ``ch``-row CHUNKS as a LEADING
    (untiled) axis — acc is ((tilec+haloc), ch, 128) — so the per-window
    dynamic offsets are pure address arithmetic on dim 0. (With rows as
    the sublane axis, Mosaic lowers a dynamic-offset store as a
    full-buffer select: measured ~1000× slow on the v1 kernel.) ``ch`` is
    8 for a float32 accumulator and 16 for bfloat16 (the native sublane
    tile heights), so chunk slices stay tile-aligned either way."""
    i = pl.program_id(0)
    tile0 = i * tilec

    # ---- carry the halo, zero the rest -------------------------------
    @pl.when(i == 0)
    def _():
        acc[pl.ds(0, haloc)] = jnp.zeros((haloc, ch, _LANES), acc_dtype)

    @pl.when(i > 0)
    def _():
        acc[pl.ds(0, haloc)] = acc[pl.ds(tilec, haloc)]
    acc[pl.ds(haloc, tilec)] = jnp.zeros((tilec, ch, _LANES), acc_dtype)

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

        # acc[h] covers flat2 chunk (tile0 + h): owned range [0, tilec),
        # halo [tilec, tilec+haloc). Windows start inside the owned range
        # and extend at most haloc chunks past it.
        obase = base_ref[lo + k] - tile0 * ch
        stride = stride_ref[lo + k]
        blk = dreg_sc[slot].astype(acc_dtype)  # (t·txnc, ch, 128)
        for j in range(t):
            offc = (obase + j * stride) // ch
            acc[pl.ds(offc, txnc)] = (
                acc[pl.ds(offc, txnc)] + blk[j * txnc:(j + 1) * txnc]
            )
        return carry

    jax.lax.fori_loop(0, n_cand, body, 0)
    out_ref[0] = acc[pl.ds(0, tilec)].astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("s2_rows", "t", "txn", "halo", "out_dtype",
                     "acc_dtype", "interpret"),
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
    acc_dtype: str = "float32",
    interpret: bool = False,
) -> jnp.ndarray:
    """d_flat2 (s2_rows, 128) = Σ_r place(d_regs[r]) — the region gather's
    VJP. Window row j of ROI r lands at ``base2[r] + j·stride2[r]``; writes
    at or past ``s2_rows`` are dropped (zero-weight clamp tails — see the
    module docstring for why that is exact).

    ``acc_dtype="bfloat16"`` halves the accumulator traffic (the kernel is
    zero/shift-bound) at the XLA scatter path's own precision; it moves
    rows in 16-row chunks (the bf16 sublane tile), so the CALLER must
    guarantee base2/stride2/txn are multiples of 16 — true whenever the
    feature width is a multiple of 256 (n_half even). float32 (default)
    needs only 8-row alignment.
    """
    r = d_regs.shape[0]
    assert d_regs.shape[1] == t * txn and d_regs.shape[2] == _LANES, (
        d_regs.shape, t, txn)
    adt = jnp.dtype(acc_dtype)
    ch = 16 if adt == jnp.bfloat16 else 8
    assert txn % ch == 0, (txn, ch)  # windows move in whole chunks

    haloc = _round_up(max(halo, ch), ch) // ch
    tilec = max(8192 // ch, haloc)  # carry needs tile ≥ halo
    n_tiles = -(-s2_rows // (tilec * ch)) + 1  # +1: last halo in-range
    txnc = txn // ch

    order = jnp.argsort(base2).astype(jnp.int32)
    base_s = base2[order].astype(jnp.int32)
    stride_s = stride2[order].astype(jnp.int32)
    starts = jnp.arange(n_tiles + 1, dtype=jnp.int32) * (tilec * ch)
    cuts = jnp.searchsorted(base_s, starts, side="left").astype(jnp.int32)
    ranges = jnp.stack([cuts[:-1], cuts[1:]], axis=1)  # (n_tiles, 2)

    kernel = functools.partial(
        _kernel, tilec=tilec, haloc=haloc, t=t, txnc=txnc, ch=ch,
        acc_dtype=adt)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, tilec, ch, _LANES), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tilec + haloc, ch, _LANES), adt),
                pltpu.VMEM((2, t * txnc, ch, _LANES), d_regs.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, tilec, ch, _LANES),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: halo carry
        ),
        interpret=interpret,
    )(ranges, base_s, stride_s, order,
      d_regs.reshape(r, t * txnc, ch, _LANES))
    return out.reshape(n_tiles * tilec * ch, _LANES)[:s2_rows]
