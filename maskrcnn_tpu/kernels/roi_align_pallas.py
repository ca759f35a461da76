"""Pallas TPU ROIAlign — region DMA + MXU interpolation, custom VJP.

The TPU-native replacement for the reference's ROIAlign CUDA kernel
(git submodule ``chainer_maskrcnn/functions/roi_align``, SURVEY §2b N1),
built on the region-matrix formulation shared with the XLA path
(:func:`maskrcnn_tpu.ops.roi_align.region_params`):

    out[r] = mean_pool( By[r] @ F[region(r)] @ Bx[r]ᵀ )

Kernel structure (one grid step per ROI):
- the flattened feature pyramid stays in HBM (``memory_space=ANY``),
- per-ROI flat row offsets arrive via scalar prefetch (SMEM), so the kernel
  can issue its region DMAs immediately,
- ``t`` async copies pull the (t, t, C) region into a VMEM scratch
  (t=20, C=256 → 410 KB — double-buffer-able later),
- the two interpolation matmuls run on the MXU; sub-sample averaging on the
  VPU; one (oh, ow, C) block written per ROI.

Backward: d_flat = scatter-add over the SAME region rows of
``Byᵀ @ g @ Bx`` — expressed in XLA (scatter-add races across overlapping
ROIs are XLA's problem to serialize, not worth a semaphore protocol here).
Gradients w.r.t. box coordinates are not defined (matches the reference
kernel, which is differentiable w.r.t. features only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maskrcnn_tpu.ops.roi_align import region_params


def _kernel(row_ids_ref, by_ref, bx_ref, flat_ref, out_ref, region, sems,
            *, t: int, oh: int, ow: int, sr: int):
    r = pl.program_id(0)
    s_max = flat_ref.shape[0]

    # Issue all region-row DMAs, then wait — the scalar prefetch makes the
    # offsets available before the body runs.
    for ty in range(t):
        start = jnp.clip(row_ids_ref[r, ty], 0, s_max - t)
        pltpu.make_async_copy(
            flat_ref.at[pl.ds(start, t)],
            region.at[ty],
            sems.at[ty],
        ).start()
    for ty in range(t):
        pltpu.make_async_copy(
            flat_ref.at[pl.ds(0, t)],  # shape-only descriptor for wait
            region.at[ty],
            sems.at[ty],
        ).wait()

    by = by_ref[0]  # (oh, t) — sub-sample mean folded in (region_params)
    bx = bx_ref[0]  # (ow, t)

    reg = region[:].astype(jnp.float32)  # (t, t, C)
    # 3-D dot_general: contracting reg's dim 0 — avoids a (t, t·C) reshape,
    # which Mosaic would have to materialize as a cross-tile relayout
    # (compile failure at C=256).
    tmp = jax.lax.dot_general(
        by, reg,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (oh, t, C)
    out = jax.lax.dot_general(
        tmp, bx,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (oh, C, ow)
    out = jnp.transpose(out, (0, 2, 1))  # (oh, ow, C)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_size", "sampling_ratio", "t_span")
)
def _pallas_forward(flat, row_ids, by, bx, out_size, sampling_ratio, t_span):
    # HBM→VMEM DMAs with a destination lane extent > 128 crash the v5e
    # compile helper in this environment — run the kernel per 128-channel
    # slab and concatenate (slabs are sliced by XLA outside the kernel).
    c = flat.shape[-1]
    if c > 128:
        outs = []
        for i in range(0, c, 128):
            slab = flat[:, i : i + 128]
            if slab.shape[-1] < 128:
                slab = jnp.pad(slab, ((0, 0), (0, 128 - slab.shape[-1])))
            outs.append(
                _pallas_forward_128(slab, row_ids, by, bx, out_size,
                                    sampling_ratio, t_span)
            )
        return jnp.concatenate(outs, axis=-1)[..., :c]
    return _pallas_forward_128(flat, row_ids, by, bx, out_size,
                               sampling_ratio, t_span)


def _pallas_forward_128(flat, row_ids, by, bx, out_size, sampling_ratio,
                        t_span):
    oh, ow = out_size
    sr = sampling_ratio
    t = t_span
    r = row_ids.shape[0]
    c = flat.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, oh, t), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow, t), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # flat pyramid in HBM
        ],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t, t, c), flat.dtype),
            pltpu.SemaphoreType.DMA((t,)),
        ],
    )
    kernel = functools.partial(_kernel, t=t, oh=oh, ow=ow, sr=sr)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, oh, ow, c), jnp.float32),
    )(row_ids, by, bx, flat)


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
    start = jnp.clip(row_ids, 0, s_total - t)  # (R, t)
    idx = start[:, :, None] + jnp.arange(t)[None, None, :]  # (R, t, t)
    d_flat = jnp.zeros((s_total, c), jnp.float32)
    d_flat = d_flat.at[idx.reshape(-1)].add(
        d_region.reshape(-1, c), mode="drop"
    ).astype(flat_dtype)
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
    tests)."""
    b, _, _, c = features[0].shape
    shapes = np.array([[f.shape[1], f.shape[2]] for f in features], np.int32)
    sizes = shapes[:, 0].astype(np.int64) * shapes[:, 1]
    offsets = np.concatenate([[0], np.cumsum(sizes * b)[:-1]])
    flat = jnp.concatenate(
        [f.reshape(b * f.shape[1] * f.shape[2], c) for f in features], axis=0
    )
    row_ids, by, bx = region_params(
        shapes, offsets, rois, roi_batch_idx, roi_levels, out_size,
        spatial_scales, sampling_ratio, t_span,
    )
    return _roi_align_core(
        flat, row_ids.astype(jnp.float32), by, bx, out_size,
        sampling_ratio, t_span, interpret, int(flat.shape[0]),
        str(flat.dtype),
    )
