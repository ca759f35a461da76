"""Pallas TPU ROIAlign — double-buffered region DMA + MXU interpolation.

The TPU-native replacement for the reference's ROIAlign CUDA kernel
(git submodule ``chainer_maskrcnn/functions/roi_align``, SURVEY §2b N1),
built on the region-matrix formulation shared with the XLA path
(:func:`maskrcnn_tpu.ops.roi_align.region_params`):

    out[r] = By[r] @ F[region(r)] @ Bx[r]ᵀ      (sub-sample mean folded in)

Kernel design (v2 — the round-1 version lost to XLA's gather; this one is
built around the three causes):

1. **No channel slabs.** v5e rejects HBM→VMEM DMA destinations wider than
   128 lanes, and the round-1 kernel worked around it by slicing the flat
   pyramid into 128-channel slabs at the XLA level — each slice a full
   273 MB copy. Here the (S, C) pyramid is viewed as (S·n, 128) with
   n = C/128 — a free row-major reshape — so one contiguous DMA of
   ``n·t`` reshaped rows delivers a full region row with every channel,
   and the lane extent stays 128. The x-interpolation matrix becomes
   ``kron(Bx, I_n)`` so the channel interleave folds into the same matmul.
2. **Multi-ROI grid blocks.** ``R_BLK`` ROIs per grid step amortize
   control overhead and give the MXU larger back-to-back work.
3. **Double buffering.** TPU Pallas grid steps run sequentially on the
   core, so step i issues block i+1's region DMAs into the alternate
   scratch buffer before computing on block i — DMA latency hides behind
   the interpolation matmuls.

Backward: d_flat = scatter-add over the SAME region rows of
``Byᵀ @ g @ Bx`` — expressed in XLA (scatter-add races across overlapping
ROIs are XLA's problem to serialize). Gradients w.r.t. box coordinates are
not defined (matches the reference kernel: differentiable w.r.t. features
only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskrcnn_tpu.ops.roi_align import region_params

R_BLK = 8  # ROIs per grid step
_LANES = 128


def _kernel(geom_cur_ref, geom_next_ref, by_ref, bx2_ref, flat2_ref,
            out_ref, regions, sems, *, t: int, oh: int, ow2: int,
            n_half: int, n_blocks: int, s2_max8: int):
    i = pl.program_id(0)
    rows = n_half * t  # reshaped rows per region row (multiple of 8)

    def issue(geom_ref, slot):
        for rr in range(R_BLK):
            # geom holds (base, stride) in PRE-ALIGNED 8-row units; region
            # row ty starts at (base + ty·stride)·8. Two design constraints
            # from Mosaic: (a) the explicit ×8 proves the HBM slice offset
            # is sublane-aligned (a raw dynamic offset fails its
            # divisibility check), (b) the geometry arrives as two small
            # per-block SMEM windows (current + next, for the double
            # buffer) rather than one scalar-prefetch table — a prefetched
            # s32[2048,24] operand is scoped to the FULL 1.00 MB SMEM and
            # kills compilation at train-step ROI counts.
            base = geom_ref[0, rr, 0]
            stride = geom_ref[0, rr, 1]
            for ty in range(t):
                idx8 = jnp.minimum(base + ty * stride, s2_max8)
                pltpu.make_async_copy(
                    flat2_ref.at[pl.ds(idx8 * 8, rows)],
                    regions.at[slot, rr, ty],
                    sems.at[slot, rr, ty],
                ).start()

    @pl.when(i == 0)
    def _():
        issue(geom_cur_ref, 0)

    @pl.when(i + 1 < n_blocks)
    def _():
        issue(geom_next_ref, (i + 1) % 2)

    slot = i % 2
    for rr in range(R_BLK):
        for ty in range(t):
            pltpu.make_async_copy(
                flat2_ref.at[pl.ds(0, rows)],  # shape-only descriptor
                regions.at[slot, rr, ty],
                sems.at[slot, rr, ty],
            ).wait()

    for rr in range(R_BLK):
        reg = regions[slot, rr].astype(jnp.float32)  # (t, n·t, 128)
        by = by_ref[0, rr]  # (oh, t)
        bx2 = bx2_ref[0, rr]  # (n·ow, n·t) = kron(Bx, I_n)
        # contract region dim 0 (y rows) — 3-D dot_general avoids reshapes
        tmp = jax.lax.dot_general(
            by, reg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (oh, n·t, 128)
        out = jax.lax.dot_general(
            tmp, bx2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (oh, 128, n·ow)
        out_ref[0, rr] = jnp.transpose(out, (0, 2, 1))  # (oh, n·ow, 128)


@functools.partial(
    jax.jit, static_argnames=("out_size", "sampling_ratio", "t_span")
)
def _pallas_forward(flat, row_ids, by, bx, out_size, sampling_ratio, t_span):
    oh, ow = out_size
    t = t_span
    r = row_ids.shape[0]
    s, c = flat.shape

    # channel fold: (S, C) -> (S·n, 128), a free row-major reshape; one
    # extra window of zero rows (8-padded) so edge-row DMAs stay in bounds
    if c % _LANES:
        flat = jnp.pad(flat, ((0, 0), (0, _LANES - c % _LANES)))
    n_half = flat.shape[1] // _LANES
    rows = n_half * t
    if rows % 8:
        raise ValueError(
            f"n_half*t_span = {rows} must be a multiple of 8 (sublane "
            "tiling); the multilevel wrapper picks t_span accordingly"
        )
    flat2 = jnp.pad(
        flat.reshape(s * n_half, _LANES), ((0, rows + 8), (0, 0))
    )
    # Region rows form an arithmetic sequence (base + ty·stride): pass only
    # (base, stride) per ROI, in 8-row units. Exact division — the wrapper
    # aligns row_ids·n_half to multiples of 8 by construction (quantized x
    # starts, padded row strides).
    base8 = (row_ids[:, 0] * n_half // 8).astype(jnp.int32)
    stride8 = ((row_ids[:, 1] - row_ids[:, 0]) * n_half // 8).astype(
        jnp.int32)
    geom8 = jnp.stack([jnp.maximum(base8, 0), jnp.maximum(stride8, 0)],
                      axis=1)  # (R, 2)

    # pad the ROI axis to a whole number of blocks
    r_pad = -r % R_BLK
    if r_pad:
        geom8 = jnp.pad(geom8, ((0, r_pad), (0, 0)))
        by = jnp.pad(by, ((0, r_pad), (0, 0), (0, 0)))
        bx = jnp.pad(bx, ((0, r_pad), (0, 0), (0, 0)))
    rp = r + r_pad
    n_blocks = rp // R_BLK

    # fold the channel interleave into the x matrix: kron(Bx, I_n)
    eye = jnp.eye(n_half, dtype=bx.dtype)
    bx2 = jax.vmap(lambda m: jnp.kron(m, eye))(bx)  # (R, n·ow, n·t)

    kernel = functools.partial(
        _kernel, t=t, oh=oh, ow2=n_half * ow, n_half=n_half,
        n_blocks=n_blocks, s2_max8=(s * n_half) // 8,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            # (base, stride) geometry: the CURRENT block and the NEXT one
            # (the double buffer issues block i+1's DMAs during step i)
            pl.BlockSpec((1, R_BLK, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            # next-block view of the same geometry (padded by one block so
            # the index map stays the plain affine i+1)
            pl.BlockSpec((1, R_BLK, 2), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R_BLK, oh, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R_BLK, n_half * ow, n_half * t),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # flat2 pyramid in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, R_BLK, oh, n_half * ow, _LANES),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R_BLK, t, n_half * t, _LANES), flat.dtype),
            pltpu.SemaphoreType.DMA((2, R_BLK, t)),
        ],
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, R_BLK, oh, n_half * ow, _LANES), jnp.float32
        ),
    )(geom8.reshape(n_blocks, R_BLK, 2),
      jnp.pad(geom8.reshape(n_blocks, R_BLK, 2), ((0, 1), (0, 0), (0, 0))),
      by.reshape(n_blocks, R_BLK, oh, t),
      bx2.reshape(n_blocks, R_BLK, n_half * ow, n_half * t), flat2)
    # (blocks, R_BLK, oh, n·ow, 128): dim 3 index is x·n + h — undo the
    # interleave into channels
    out = out.reshape(rp, oh, ow, n_half * _LANES)[:r, :, :, :c]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _roi_align_core(flat, row_ids_f, by, bx, out_size, sampling_ratio,
                    t_span, interpret, s_total, flat_dtype):
    # row_ids travel as float32 so custom_vjp can hand back a plain zero
    # cotangent (int primals would demand float0 bookkeeping).
    row_ids = row_ids_f.astype(jnp.int32)
    if interpret:
        return _interpret_forward(flat, row_ids, by, bx, out_size,
                                  sampling_ratio, t_span)
    return _pallas_forward(flat, row_ids, by, bx, out_size, sampling_ratio,
                           t_span)


def _interpret_forward(flat, row_ids, by, bx, out_size, sampling_ratio, t):
    """XLA equivalent of the kernel, for CPU tests and as the VJP spec."""
    oh, ow = out_size
    sr = sampling_ratio
    c = flat.shape[-1]
    r = row_ids.shape[0]

    def per_roi(row_ids_i, by_i, bx_i):
        start = jnp.clip(row_ids_i, 0, flat.shape[0] - t)
        idx = start[:, None] + jnp.arange(t)[None, :]
        region = flat[idx]  # (t, t, C)
        tmp = jnp.einsum("yt,twc->ywc", by_i, region.astype(jnp.float32))
        return jnp.einsum("xw,ywc->yxc", bx_i, tmp)

    # pooled matrices → (R, oh, ow, C) directly
    return jax.vmap(per_roi)(row_ids, by, bx)


def _fwd(flat, row_ids, by, bx, out_size, sampling_ratio, t_span,
         interpret, s_total, flat_dtype):
    out = _roi_align_core(flat, row_ids, by, bx, out_size, sampling_ratio,
                          t_span, interpret, s_total, flat_dtype)
    return out, (row_ids, by, bx)


def _bwd(out_size, sampling_ratio, t_span, interpret, s_total, flat_dtype,
         res, g):
    row_ids_f, by, bx = res
    row_ids = row_ids_f.astype(jnp.int32)
    oh, ow = out_size
    sr = sampling_ratio
    t = t_span
    c = g.shape[-1]

    # By/Bx already carry the sub-sample averaging; g is (R, oh, ow, C).
    gs = g

    def per_roi(by_i, bx_i, g_i):
        # d_region = Byᵀ @ g @ Bx : (t, t, C)
        tmp = jnp.einsum("yt,yxc->txc", by_i, g_i)
        return jnp.einsum("xw,txc->twc", bx_i, tmp)

    d_region = jax.vmap(per_roi)(by, bx, gs)  # (R, t, t, C)
    # Window-form scatter-add: one contiguous t·C element update per region
    # row (the per-C-row form was 14.6+4.2 ms/step in the profiled train
    # step; coarse windows give the scatter emitter 20 KB contiguous runs).
    # The operand carries one window of zero padding so edge rows keep
    # their alignment (matching the forward's padded read).
    start = (jnp.clip(row_ids, 0, s_total) * c).reshape(-1, 1)  # (R·t, 1)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    d_flat = jax.lax.scatter_add(
        jnp.zeros(((s_total + t) * c,), jnp.float32),
        start,
        d_region.reshape(-1, t * c),
        dnums,
    )[: s_total * c].reshape(s_total, c).astype(flat_dtype)
    # Box geometry (row_ids/by/bx derive from rois) gets no gradient —
    # matches the reference kernel (differentiable w.r.t. features only).
    return (d_flat, jnp.zeros_like(row_ids_f),
            jnp.zeros_like(by), jnp.zeros_like(bx))


_roi_align_core.defvjp(_fwd, _bwd)


def multilevel_roi_align_pallas(
    features: list[jnp.ndarray],
    rois: jnp.ndarray,
    roi_batch_idx: jnp.ndarray,
    roi_levels: jnp.ndarray,
    out_size: tuple[int, int],
    spatial_scales: tuple[float, ...],
    sampling_ratio: int = 2,
    t_span: int = 20,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`maskrcnn_tpu.ops.multilevel_roi_align` using the
    Pallas kernel (``interpret=True`` runs the XLA-equivalent path for CPU
    tests).

    ALIGNMENT: Mosaic requires dynamic HBM slice offsets provably divisible
    by the 8-row sublane tiling. Every region start is
    ``(block + row·W + rx0) · n_half`` reshaped rows, so all three terms
    are made multiples of ``a = 8 / gcd(n_half, 8)`` spatial columns:
    level widths are padded to multiples of ``a`` (making ``row·W_pad`` and
    all block offsets aligned) and each region's x start is quantized down
    to a multiple of ``a`` with the window widened by ``a`` columns (the
    extra columns carry zero interpolation weight — exactness preserved).
    """
    import math

    b, _, _, c = features[0].shape
    n_half = -(-c // _LANES)
    a = 8 // math.gcd(n_half, 8)
    # widen for the quantized x start, then round so n_half·t is a multiple
    # of 8 (the DMA length must stay sublane-aligned too)
    t_eff = -(-(t_span + a - 1) // a) * a

    shapes = np.array([[f.shape[1], f.shape[2]] for f in features], np.int32)
    w_pads = np.array([-(-int(w) // a) * a for w in shapes[:, 1]], np.int32)
    sizes_p = shapes[:, 0].astype(np.int64) * w_pads
    offsets = np.concatenate([[0], np.cumsum(sizes_p * b)[:-1]])
    flat = jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, 0), (0, int(wp) - f.shape[2]), (0, 0))
                    ).reshape(b * f.shape[1] * int(wp), c)
            for f, wp in zip(features, w_pads)
        ],
        axis=0,
    )
    row_ids, by, bx = region_params(
        shapes, offsets, rois, roi_batch_idx, roi_levels, out_size,
        spatial_scales, sampling_ratio, t_eff, x_align=a,
        row_strides=w_pads,
    )
    return _roi_align_core(
        flat, row_ids.astype(jnp.float32), by, bx, out_size,
        sampling_ratio, t_eff, interpret, int(flat.shape[0]),
        str(flat.dtype),
    )
