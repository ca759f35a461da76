"""Batched, multilevel ROIAlign as one fused gather — no per-ROI loops.

Reference behavior: the chainer ROIAlign CUDA kernel (git submodule
``chainer_maskrcnn/functions/roi_align``, shimmed by
``functions/roi_align_2d_yx.py:1-7``) implementing RoIAlign from
Mask R-CNN (He et al. §3): bin the ROI into ``out_size`` cells, take
``sampling_ratio²`` bilinear samples per cell, average. The reference calls
it once per ROI per level in a Python loop (e.g.
``model/head/fpn_roi_mask_head.py:59-63`` — 256 kernel launches per step);
here every ROI of every level is handled by ONE gather over a flattened
feature pyramid, which XLA lowers to a single fused kernel — and is
drop-in replaceable by the Pallas kernel in
``maskrcnn_tpu/kernels/roi_align_pallas.py``.

Coordinates follow the original (non-"aligned") RoIAlign convention, matching
the Caffe2/chainer kernel: scaled by ``spatial_scale``, no −0.5 half-pixel
offset. Gradients w.r.t. features come from JAX's gather VJP (scatter-add).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

# Trace-time marker: set while tracing a per-device-local (shard_map) train
# step. Inside shard_map every op sees its LOCAL shard, so a pallas_call is
# legal even on a multi-device mesh — GSPMD jit, by contrast, has no
# partitioning rule for pallas_call and the "auto" roi_align must stay on
# the XLA scatter there. parallel/mesh.py enters this context around the
# shard_map body; models/maskrcnn.py consults it when resolving "auto".
# THREAD-local (not process-global): an unrelated trace on another thread
# (a concurrent eval jit, say) must not see this trace's marker.
import threading

_SPMD_LOCAL = threading.local()


@contextlib.contextmanager
def spmd_local_trace(axis_name: str | None = None):
    """Mark the enclosed TRACE (on this thread) as per-device local.

    ``axis_name`` optionally names the mapped mesh axis; modules that need
    cross-device reductions at trace time consult it via
    :func:`current_spmd_axis` (e.g. sync-BN: trainable BatchNorm inside a
    shard_map body must pmean its batch statistics over the axis to match
    the global-batch statistics GSPMD/single-device compute)."""
    stack = getattr(_SPMD_LOCAL, "stack", None)
    if stack is None:
        stack = _SPMD_LOCAL.stack = []
    stack.append(axis_name)
    try:
        yield
    finally:
        stack.pop()


def in_spmd_local_trace() -> bool:
    return bool(getattr(_SPMD_LOCAL, "stack", ()))


def current_spmd_axis() -> str | None:
    """The mapped axis name of the innermost spmd_local_trace, or None."""
    stack = getattr(_SPMD_LOCAL, "stack", ())
    return stack[-1] if stack else None


def _bilinear_sample_flat(
    flat_feats: jnp.ndarray,  # (S, C) flattened spatial positions
    y: jnp.ndarray,  # (P,) sample y coords, in the local level frame
    x: jnp.ndarray,  # (P,)
    row_offset: jnp.ndarray,  # (P,) int32 flat offset of (level, batch) block
    height: jnp.ndarray,  # (P,) level height (for clamping)
    width: jnp.ndarray,  # (P,)
) -> jnp.ndarray:
    """Bilinear interpolation of P points from a flat (S, C) buffer → (P, C).

    Out-of-range samples are clamped to the border (Caffe2 semantics: samples
    with y < -1 or y > H are zeroed; within [-1, H] they clamp to [0, H-1]).
    """
    zero_mask = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)

    y = jnp.clip(y, 0.0, height - 1.0)
    x = jnp.clip(x, 0.0, width - 1.0)

    y_lo = jnp.floor(y)
    x_lo = jnp.floor(x)
    y_hi = jnp.minimum(y_lo + 1.0, height - 1.0)
    x_hi = jnp.minimum(x_lo + 1.0, width - 1.0)

    ly = y - y_lo
    lx = x - x_lo
    hy = 1.0 - ly
    hx = 1.0 - lx

    y_lo_i = y_lo.astype(jnp.int32)
    x_lo_i = x_lo.astype(jnp.int32)
    y_hi_i = y_hi.astype(jnp.int32)
    x_hi_i = x_hi.astype(jnp.int32)

    w = width.astype(jnp.int32)

    def fetch(yy, xx):
        idx = row_offset + yy * w + xx
        return flat_feats[idx]  # (P, C) gather

    val = (
        fetch(y_lo_i, x_lo_i) * (hy * hx)[:, None]
        + fetch(y_lo_i, x_hi_i) * (hy * lx)[:, None]
        + fetch(y_hi_i, x_lo_i) * (ly * hx)[:, None]
        + fetch(y_hi_i, x_hi_i) * (ly * lx)[:, None]
    )
    return jnp.where(zero_mask[:, None], 0.0, val)


@functools.partial(jax.jit, static_argnames=("out_size", "spatial_scale", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,  # (H, W, C)
    rois: jnp.ndarray,  # (R, 4) yxyx in image coords
    out_size: tuple[int, int],
    spatial_scale: float,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Single-level ROIAlign → (R, oh, ow, C)."""
    h, w, c = features.shape
    r = rois.shape[0]
    flat = features.reshape(h * w, c)
    levels = jnp.zeros((r,), jnp.int32)
    batch = jnp.zeros((r,), jnp.int32)
    return _mlra_impl(
        flat[None],  # (1, S, C) with one level
        np.array([[h, w]], np.int32),
        np.array([0], np.int64),
        rois,
        batch,
        levels,
        out_size,
        (spatial_scale,),
        sampling_ratio,
        n_batch=1,
    )


def multilevel_roi_align(
    features: list[jnp.ndarray],  # per level: (B, Hl, Wl, C)
    rois: jnp.ndarray,  # (R, 4) yxyx image coords
    roi_batch_idx: jnp.ndarray,  # (R,) int32
    roi_levels: jnp.ndarray,  # (R,) int32 in [0, L)
    out_size: tuple[int, int],
    spatial_scales: tuple[float, ...],
    sampling_ratio: int = 2,
    impl: str | None = None,
    t_span: int | None = None,
) -> jnp.ndarray:
    """Multilevel batched ROIAlign → (R, oh, ow, C).

    Each ROI samples the single pyramid level given by ``roi_levels``
    (assigned by :func:`maskrcnn_tpu.ops.levels.map_rois_to_fpn_levels`),
    exactly like the reference's per-level Python dispatch
    (``fpn_roi_mask_head.py:58-63``) — but as one fixed-shape op.

    Two implementations, same semantics:
    - ``impl="gather"``: pointwise bilinear gather (4 corner gathers per
      sample) — robust for any ROI size.
    - ``impl="region"`` (default): per-ROI region-matrix form. Slice a
      (T, T) window of the ROI's level and compute the whole bilinear
      interpolation as two small matmuls ``By @ region @ Bxᵀ`` — MXU work
      instead of scattered 1-row gathers. Exact while the ROI spans ≤ T−3
      feature pixels, which the FPN level mapping guarantees (a level-k ROI
      spans ≲17 px in its own level's frame; pass a larger ``t_span`` for
      single-level backbones). Oversized spans clamp — degrading gracefully
      to a cropped-window interpolation rather than failing.
    """
    assert len(features) == len(spatial_scales)
    b, _, _, c = features[0].shape
    shapes = np.array([[f.shape[1], f.shape[2]] for f in features], np.int32)
    sizes = shapes[:, 0].astype(np.int64) * shapes[:, 1]
    offsets = np.concatenate([[0], np.cumsum(sizes * b)[:-1]])
    flat = jnp.concatenate(
        [f.reshape(b * f.shape[1] * f.shape[2], c) for f in features], axis=0
    )
    if impl is None:
        # auto: region wins when the level mapping bounds ROI spans (FPN);
        # a single-level backbone can have ROIs spanning the whole map, where
        # the (R, T, T, C) region tensor would dwarf the pointwise gather.
        impl = "region" if len(features) > 1 else "gather"
    if impl == "region":
        if t_span is None:
            # FPN mapping bounds ROI spans at ~17 feature px for aspect
            # ratio ≤ ~6 (long side = sqrt(area·ar)/stride). t=20 covers
            # that; rarer thinner boxes (≲0.6% of random proposals) get a
            # window-clamped interpolation on their edge bins — a measured
            # no-op for AP, while the region gather/scatter (the dominant
            # head cost) shrinks by (28/20)² ≈ 2×. Pass t_span explicitly
            # for exactness sweeps.
            t_span = 20 if len(features) > 1 else int(shapes[0].max()) + 3
        # x-folded gather: valid whenever every level's row width divides the
        # fold (true for the FPN buckets — widths are multiples of 64/stride).
        fold = 8 if all(int(wl) % 8 == 0 for wl in shapes[:, 1]) else 1
        return _mlra_region(
            flat, shapes, offsets, rois, roi_batch_idx, roi_levels,
            out_size, spatial_scales, sampling_ratio, b, t_span, fold,
        )
    return _mlra_impl(
        flat[None] if flat.ndim == 2 else flat,
        shapes,
        offsets,
        rois,
        roi_batch_idx,
        roi_levels,
        out_size,
        spatial_scales,
        sampling_ratio,
        n_batch=b,
    )


def _kron_pool(
    regions: jnp.ndarray,  # (R, t, tx, C)
    by: jnp.ndarray,  # (R, oh, t)
    bx: jnp.ndarray,  # (R, ow, tx)
) -> jnp.ndarray:
    """Pool gathered regions with ONE batched matmul per ROI.

    ``out[r] = (By[r] ⊗ Bx[r]) @ region[r]`` — the Kronecker interpolation
    matrix collapses the two-stage ``By @ region @ Bxᵀ`` einsum pair into a
    single (oh·ow, t·tx) × (t·tx, C) contraction. ~5× the FLOPs of the
    two-stage form, but those FLOPs are pure MXU work with no intermediate
    layout copies; measured on chip at 2048 ROIs (t=20, tx=32, C=256, bf16)
    it is 3.4× faster fwd (50.6 → 14.7 ms) and 3.7× fwd+bwd (88.7 → 23.7 ms)
    than the vmapped einsum pair, gather included. The B2 build is
    differentiation-dead (ROIs are stop-gradient), so the VJP is one more
    batched matmul ``B2ᵀ @ g``.
    """
    r, t, tx, c = regions.shape
    oh = by.shape[1]
    ow = bx.shape[1]
    b2 = jnp.einsum("ryt,rxw->ryxtw", by, bx).reshape(r, oh * ow, t * tx)
    if regions.dtype == jnp.bfloat16:
        # the MXU consumes bf16 operands either way; rounding B2 (entries
        # ≤ 1) costs ~4e-3 rel — below the bf16 noise of the regions
        b2 = b2.astype(jnp.bfloat16)
    out = jnp.einsum(
        "rpk,rkc->rpc", b2, regions.reshape(r, t * tx, c),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(r, oh, ow, c)


def region_params(
    shapes: np.ndarray,  # (L, 2) static level shapes
    offsets: np.ndarray,  # (L,) static flat offsets
    rois: jnp.ndarray,  # (R, 4)
    roi_batch_idx: jnp.ndarray,
    roi_levels: jnp.ndarray,
    out_size: tuple[int, int],
    spatial_scales: tuple[float, ...],
    sampling_ratio: int,
    t_span: int,
    x_align: int = 1,
    row_strides: np.ndarray | None = None,
    t_span_x: int | None = None,
    origin: str = "sample",
):
    """Per-ROI interpolation data for the region-matrix formulation.

    Returns (row_ids (R, t) int32 — flat start row of each region row;
    by (R, oh, t); bx (R, ow, t)) such that
    ``out = By @ flat[region] @ Bxᵀ`` IS the final pooled output: the
    sr×sr sub-sample averaging is folded into the matrices (mean pooling
    commutes with the linear interpolation), so no (R, oh·sr, ow·sr, C)
    intermediate ever materializes — at batch 32 that intermediate was a
    6 GB HBM allocation. Shared by the XLA implementation and the Pallas
    kernel (kernels/roi_align_pallas.py), and reused by the VJP:
    d_flat = scatter-add of Byᵀ @ g @ Bx over the same rows.

    ``x_align`` quantizes each region's x start DOWN to a multiple (the
    Pallas kernel needs provably sublane-aligned DMA offsets); pass a
    correspondingly larger ``t_span`` so the window still covers the ROI.
    ``row_strides`` (per level) overrides the level width as the flat row
    stride, for buffers whose rows are padded (again for alignment).
    ``t_span_x`` widens the x window independently of the y window (bx gets
    ``t_span_x`` columns) — used by the folded-gather path, whose x start is
    quantized to the fold width and therefore needs up to ``fold-1`` extra
    columns of (zero-weighted) coverage.
    ``origin="box"`` anchors the window at the ROI box origin instead of the
    first sample coordinate; windows then depend only on the ROI box, so two
    out_sizes (box 7×7 and mask 14×14) share one gathered region. Costs ≤1
    row/col of far-edge coverage (exact-span bound t−3 instead of t−2).
    """
    oh, ow = out_size
    sr = sampling_ratio
    ny, nx = oh * sr, ow * sr
    t = t_span
    tx = t_span if t_span_x is None else t_span_x

    scales = jnp.asarray(spatial_scales, jnp.float32)[roi_levels]
    lvl_h = jnp.asarray(shapes[:, 0], jnp.float32)[roi_levels]
    lvl_w = jnp.asarray(shapes[:, 1], jnp.float32)[roi_levels]
    lvl_off = jnp.asarray(offsets, jnp.int32)[roi_levels]
    if row_strides is None:
        stride = lvl_w.astype(jnp.int32)
    else:
        stride = jnp.asarray(row_strides, jnp.int32)[roi_levels]
    block = lvl_off + roi_batch_idx.astype(jnp.int32) * (
        lvl_h.astype(jnp.int32) * stride
    )

    y0 = rois[:, 0] * scales
    x0 = rois[:, 1] * scales
    roi_h = jnp.maximum(rois[:, 2] * scales - y0, 1.0)
    roi_w = jnp.maximum(rois[:, 3] * scales - x0, 1.0)
    bin_h = roi_h / oh
    bin_w = roi_w / ow

    iy = (jnp.arange(ny, dtype=jnp.float32) + 0.5) / sr
    ix = (jnp.arange(nx, dtype=jnp.float32) + 0.5) / sr

    def per_roi(y0_i, x0_i, bh_i, bw_i, h_i, w_i, block_i, stride_i):
        ys = y0_i + bh_i * iy  # (ny,) global feature coords
        xs = x0_i + bw_i * ix
        y_ok = (ys >= -1.0) & (ys <= h_i)
        x_ok = (xs >= -1.0) & (xs <= w_i)

        yc = jnp.clip(ys, 0.0, h_i - 1.0)
        xc = jnp.clip(xs, 0.0, w_i - 1.0)
        if origin == "box":
            ry0 = jnp.floor(jnp.clip(y0_i, 0.0, h_i - 1.0)).astype(jnp.int32)
            rx0 = jnp.floor(jnp.clip(x0_i, 0.0, w_i - 1.0)).astype(jnp.int32)
        else:
            ry0 = jnp.floor(yc[0]).astype(jnp.int32)  # samples ascend
            rx0 = jnp.floor(xc[0]).astype(jnp.int32)
        if x_align > 1:
            rx0 = (rx0 // x_align) * x_align

        def axis_weights(coords, ok, r0, n_axis, axis_len, span):
            lo = jnp.floor(coords)
            hi = jnp.minimum(lo + 1.0, axis_len - 1.0)
            l_w = coords - lo  # weight of hi
            lo_i = jnp.clip(lo.astype(jnp.int32) - r0, 0, span - 1)
            hi_i = jnp.clip(hi.astype(jnp.int32) - r0, 0, span - 1)
            rows = jnp.arange(n_axis)
            m = jnp.zeros((n_axis, span), jnp.float32)
            m = m.at[rows, lo_i].add((1.0 - l_w) * ok)
            m = m.at[rows, hi_i].add(l_w * ok)
            return m

        by = axis_weights(yc, y_ok.astype(jnp.float32), ry0, ny, h_i, t)
        bx = axis_weights(xc, x_ok.astype(jnp.float32), rx0, nx, w_i, tx)
        # fold the sub-sample mean into the matrices
        by = by.reshape(oh, sr, t).mean(axis=1)
        bx = bx.reshape(ow, sr, tx).mean(axis=1)

        row_ids = block_i + (ry0 + jnp.arange(t)) * stride_i + rx0  # (t,)
        return row_ids, by, bx

    return jax.vmap(per_roi)(y0, x0, bin_h, bin_w, lvl_h, lvl_w, block,
                             stride)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "spatial_scales", "sampling_ratio",
                     "n_batch", "t_span", "fold"),
)
def _mlra_region(
    flat: jnp.ndarray,  # (S_total, C)
    shapes: np.ndarray,  # (L, 2) static
    offsets: np.ndarray,  # (L,) static
    rois: jnp.ndarray,
    roi_batch_idx: jnp.ndarray,
    roi_levels: jnp.ndarray,
    out_size: tuple[int, int],
    spatial_scales: tuple[float, ...],
    sampling_ratio: int,
    n_batch: int,
    t_span: int,
    fold: int = 1,
):
    oh, ow = out_size
    sr = sampling_ratio
    t = t_span
    c = flat.shape[-1]
    r = rois.shape[0]

    # Row-gather form: each region row is one C-row gather. A round-2
    # rewrite pulled each row as a contiguous t·C dynamic_slice instead
    # ("window form"); measured head-to-head on this libtpu it is 6.5x
    # SLOWER (110 ms vs 17 ms fwd, 159 vs 24 fwd+bwd at 2048 ROIs — the
    # vmapped dynamic_slice lowers to a per-element gather and its VJP to a
    # serialized scatter), and was the root cause of the round-2 16 img/s
    # headline regression. Keep the simple gather: XLA's gather emitter
    # handles (R·t, C) row fetches near bandwidth.
    #
    # When ``fold > 1`` (every level width divides it), the flat buffer is
    # viewed as (S/fold, fold·C): each gathered row is a fold·C contiguous
    # chunk (4 KB at fold=8, C=256, bf16) instead of a C one, cutting
    # gather/scatter descriptor count by ~fold·t/tx. Region x-starts are
    # quantized down to the fold and bx widened to ``tx`` zero-weighted
    # columns, so the result is numerically identical (A/B on chip:
    # 82 → 25.5 ms fwd+bwd at 2048 ROIs, max grad diff 0.0).
    if fold > 1:
        tx = -(-(t + fold - 1) // fold) * fold  # cover alignment shift
        row_ids, by, bx = region_params(
            shapes, offsets, rois, roi_batch_idx, roi_levels, out_size,
            spatial_scales, sampling_ratio, t_span,
            x_align=fold, t_span_x=tx,
        )
        ff = flat.reshape(flat.shape[0] // fold, fold * c)
        txf = tx // fold

        def fetch_folded(row_ids_i):
            idx = row_ids_i[:, None] // fold + jnp.arange(txf)[None, :]
            region = ff[jnp.clip(idx, 0, ff.shape[0] - 1)]  # (t, txf, fold·C)
            return region.reshape(t, tx, c)

        regions = jax.vmap(fetch_folded)(row_ids)
        return _kron_pool(regions, by, bx)

    row_ids, by, bx = region_params(
        shapes, offsets, rois, roi_batch_idx, roi_levels, out_size,
        spatial_scales, sampling_ratio, t_span,
    )

    def fetch_rows(row_ids_i):
        idx = row_ids_i[:, None] + jnp.arange(t)[None, :]  # (t, t)
        return flat[jnp.clip(idx, 0, flat.shape[0] - 1)]  # (t, t, C)

    # By/Bx already include the sr×sr sub-sample averaging: this is the
    # final (R, oh, ow, C) output.
    return _kron_pool(jax.vmap(fetch_rows)(row_ids), by, bx)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "spatial_scales", "sampling_ratio", "n_batch"),
)
def _mlra_impl(
    flat: jnp.ndarray,  # (1, S, C) or (S, C)-like flattened pyramid
    shapes: np.ndarray,  # (L, 2) static level H, W
    offsets: np.ndarray,  # (L,) static flat offsets (already × batch)
    rois: jnp.ndarray,
    roi_batch_idx: jnp.ndarray,
    roi_levels: jnp.ndarray,
    out_size: tuple[int, int],
    spatial_scales: tuple[float, ...],
    sampling_ratio: int,
    n_batch: int,
):
    flat = flat.reshape(-1, flat.shape[-1])  # (S_total, C)
    oh, ow = out_size
    sr = sampling_ratio
    r = rois.shape[0]

    scales = jnp.asarray(spatial_scales, jnp.float32)[roi_levels]  # (R,)
    lvl_h = jnp.asarray(shapes[:, 0], jnp.float32)[roi_levels]
    lvl_w = jnp.asarray(shapes[:, 1], jnp.float32)[roi_levels]
    lvl_off = jnp.asarray(offsets, jnp.int32)[roi_levels]
    # Per-(level, batch) block offset into the flat buffer.
    block = lvl_off + roi_batch_idx.astype(jnp.int32) * (
        lvl_h * lvl_w
    ).astype(jnp.int32)

    # ROI box in the level's feature frame (Caffe2: no half-pixel offset).
    y0 = rois[:, 0] * scales
    x0 = rois[:, 1] * scales
    y1 = rois[:, 2] * scales
    x1 = rois[:, 3] * scales
    roi_h = jnp.maximum(y1 - y0, 1.0)
    roi_w = jnp.maximum(x1 - x0, 1.0)
    bin_h = roi_h / oh  # (R,)
    bin_w = roi_w / ow

    # Sample grid: (oh, sr) y-offsets × (ow, sr) x-offsets per ROI.
    iy = (jnp.arange(oh * sr, dtype=jnp.float32) + 0.5) / sr  # in bin units
    ix = (jnp.arange(ow * sr, dtype=jnp.float32) + 0.5) / sr
    ys = y0[:, None] + bin_h[:, None] * iy[None, :]  # (R, oh*sr)
    xs = x0[:, None] + bin_w[:, None] * ix[None, :]  # (R, ow*sr)

    # Full sample lattice (R, oh*sr, ow*sr).
    yy = jnp.broadcast_to(ys[:, :, None], (r, oh * sr, ow * sr))
    xx = jnp.broadcast_to(xs[:, None, :], (r, oh * sr, ow * sr))

    p = r * oh * sr * ow * sr
    vals = _bilinear_sample_flat(
        flat,
        yy.reshape(p),
        xx.reshape(p),
        jnp.broadcast_to(block[:, None, None], yy.shape).reshape(p),
        jnp.broadcast_to(lvl_h[:, None, None], yy.shape).reshape(p),
        jnp.broadcast_to(lvl_w[:, None, None], yy.shape).reshape(p),
    )  # (P, C)

    c = flat.shape[-1]
    vals = vals.reshape(r, oh, sr, ow, sr, c)
    return jnp.mean(vals, axis=(2, 4))  # (R, oh, ow, C)


def multilevel_roi_align_train(
    features: list[jnp.ndarray],  # per level: (B, Hl, Wl, C)
    rois_bn: jnp.ndarray,  # (B, n, 4) yxyx image coords, positives FIRST
    levels_bn: jnp.ndarray,  # (B, n) int32
    n_pos: int,  # positive-slot prefix length per image
    out_size_box: tuple[int, int],
    out_size_mask: tuple[int, int],
    spatial_scales: tuple[float, ...],
    sampling_ratio: int = 2,
    t_span: int | None = None,
    bwd_scatter: str = "xla",  # "xla" | "pallas" (fused custom-VJP path)
    acc_dtype: str = "float32",  # pallas scatter accumulator (or bfloat16)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Box pooling for ALL (B·n) ROI slots + mask pooling for the (B·n_pos)
    positive prefix, sharing ONE region gather (and therefore one backward
    scatter) over the pyramid.

    The region window of a ROI is out-size independent (it covers the ROI's
    extent in its level's frame), so the box 7×7 and mask 14×14 pools differ
    only in their interpolation matrices. The reference pools twice
    (fpn_roi_mask_head.py:59-63 box, :75-78 mask — 512 separate kernel
    launches); pooling both from one gathered region tensor halves the
    gather/scatter traffic, the dominant head cost on TPU. The mask branch's
    regions are a contiguous (B, :n_pos) slice whose VJP is a pad — no
    second scatter.
    """
    assert len(features) == len(spatial_scales)
    b, _, _, c = features[0].shape
    shapes = np.array([[f.shape[1], f.shape[2]] for f in features], np.int32)
    sizes = shapes[:, 0].astype(np.int64) * shapes[:, 1]
    offsets = np.concatenate([[0], np.cumsum(sizes * b)[:-1]])
    flat = jnp.concatenate(
        [f.reshape(b * f.shape[1] * f.shape[2], c) for f in features], axis=0
    )
    if t_span is None:
        t_span = 20
    fold = 8 if all(int(wl) % 8 == 0 for wl in shapes[:, 1]) else 1
    if bwd_scatter == "pallas" and fold == 8 and c % 128 == 0:
        import jax as _jax

        return _mlra_region_pair_fused(
            flat, shapes, offsets, rois_bn, levels_bn, n_pos,
            out_size_box, out_size_mask, spatial_scales, sampling_ratio,
            t_span, fold,
            interpret=_jax.default_backend() != "tpu",
            acc_dtype=acc_dtype if c % 256 == 0 else "float32",
        )
    return _mlra_region_pair(
        flat, shapes, offsets, rois_bn, levels_bn, n_pos,
        out_size_box, out_size_mask, spatial_scales, sampling_ratio,
        t_span, fold,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_pos", "out_size_box", "out_size_mask",
                     "spatial_scales", "sampling_ratio", "t_span", "fold"),
)
def _mlra_region_pair(
    flat: jnp.ndarray,  # (S_total, C)
    shapes: np.ndarray,
    offsets: np.ndarray,
    rois_bn: jnp.ndarray,  # (B, n, 4)
    levels_bn: jnp.ndarray,  # (B, n)
    n_pos: int,
    out_size_box: tuple[int, int],
    out_size_mask: tuple[int, int],
    spatial_scales: tuple[float, ...],
    sampling_ratio: int,
    t_span: int,
    fold: int,
):
    b, n = rois_bn.shape[:2]
    c = flat.shape[-1]
    t = t_span
    tx = -(-(t + fold - 1) // fold) * fold if fold > 1 else t

    rois = rois_bn.reshape(b * n, 4)
    levels = levels_bn.reshape(b * n)
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    row_ids, by_b, bx_b = region_params(
        shapes, offsets, rois, batch_idx, levels, out_size_box,
        spatial_scales, sampling_ratio, t_span,
        x_align=fold, t_span_x=tx, origin="box",
    )
    pos_rois = rois_bn[:, :n_pos].reshape(b * n_pos, 4)
    pos_lv = levels_bn[:, :n_pos].reshape(b * n_pos)
    pos_bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_pos)
    _, by_m, bx_m = region_params(
        shapes, offsets, pos_rois, pos_bi, pos_lv, out_size_mask,
        spatial_scales, sampling_ratio, t_span,
        x_align=fold, t_span_x=tx, origin="box",
    )

    if fold > 1:
        ff = flat.reshape(flat.shape[0] // fold, fold * c)
        txf = tx // fold

        def fetch(row_ids_i):
            idx = row_ids_i[:, None] // fold + jnp.arange(txf)[None, :]
            return ff[jnp.clip(idx, 0, ff.shape[0] - 1)].reshape(t, tx, c)
    else:

        def fetch(row_ids_i):
            idx = row_ids_i[:, None] + jnp.arange(t)[None, :]
            return flat[jnp.clip(idx, 0, flat.shape[0] - 1)]

    regions = jax.vmap(fetch)(row_ids)  # (B·n, t, tx, C) — the ONE gather

    pooled_box = _kron_pool(regions, by_b, bx_b)
    reg_pos = regions.reshape(b, n, t, tx, c)[:, :n_pos]
    reg_pos = reg_pos.reshape(b * n_pos, t, tx, c)
    pooled_mask = _kron_pool(reg_pos, by_m, bx_m)
    return pooled_box, pooled_mask


# ---------------------------------------------------------------------------
# Fused region pair with a custom VJP (bwd_scatter="pallas").
#
# Round-4 xprof of the default train step (BASELINE.md): XLA emits the
# region-gather VJP as a scatter-add running at 18.5 GiB/s — 14 ms of a
# 157 ms step — plus ~9 ms of autodiff plumbing around it (the cotangent
# add of the box/mask fan-out, the mask prefix-slice pad). Wrapping the
# WHOLE pair (gather + both Kronecker pools) in one jax.custom_vjp lets the
# backward (a) compute both cotangent-region einsums directly, (b) merge the
# mask stream into the box stream with one in-place prefix add, and (c) hand
# the result to the tile-accumulator Pallas kernel
# (kernels/region_scatter_pallas.py) instead of XLA's scatter.
#
# Numerics: the forward is IDENTICAL HLO to _mlra_region_pair. The backward
# is the same math with f32 scatter accumulation (the XLA path accumulated
# in bf16), asserted equal within bf16 tolerance in tests/test_kernels.py.
# ---------------------------------------------------------------------------


def _pair_geometry(shapes, offsets, rois_bn, levels_bn, n_pos,
                   out_size_box, out_size_mask, spatial_scales,
                   sampling_ratio, t_span, fold):
    b, n = rois_bn.shape[:2]
    t = t_span
    tx = -(-(t + fold - 1) // fold) * fold if fold > 1 else t
    rois = rois_bn.reshape(b * n, 4)
    levels = levels_bn.reshape(b * n)
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    row_ids, by_b, bx_b = region_params(
        shapes, offsets, rois, batch_idx, levels, out_size_box,
        spatial_scales, sampling_ratio, t_span,
        x_align=fold, t_span_x=tx, origin="box",
    )
    pos_rois = rois_bn[:, :n_pos].reshape(b * n_pos, 4)
    pos_lv = levels_bn[:, :n_pos].reshape(b * n_pos)
    pos_bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_pos)
    _, by_m, bx_m = region_params(
        shapes, offsets, pos_rois, pos_bi, pos_lv, out_size_mask,
        spatial_scales, sampling_ratio, t_span,
        x_align=fold, t_span_x=tx, origin="box",
    )
    return row_ids, by_b, bx_b, by_m, bx_m, tx


def _mlra_region_pair_fused(
    flat, shapes, offsets, rois_bn, levels_bn, n_pos,
    out_size_box, out_size_mask, spatial_scales, sampling_ratio,
    t_span, fold, interpret=False, acc_dtype="float32",
):
    b, n = rois_bn.shape[:2]
    row_ids, by_b, bx_b, by_m, bx_m, tx = _pair_geometry(
        shapes, offsets, rois_bn, levels_bn, n_pos, out_size_box,
        out_size_mask, spatial_scales, sampling_ratio, t_span, fold)
    base = row_ids[:, 0]
    stride = row_ids[:, 1] - row_ids[:, 0]
    # static halo bound for the scatter kernel: widest level stride wins
    n_half = flat.shape[-1] // 128
    max_stride = int(shapes[:, 1].max())
    halo = (t_span - 1) * max_stride * n_half + tx * n_half
    # base/stride travel as float32 so custom_vjp can return plain zero
    # cotangents (int primals would demand float0 bookkeeping)
    return _fused_pair_core(
        flat, by_b, bx_b, by_m, bx_m,
        base.astype(jnp.float32), stride.astype(jnp.float32),
        b, n, n_pos, t_span, tx, fold, halo, interpret,
        int(flat.shape[0]), str(flat.dtype), acc_dtype,
    )


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17))
def _fused_pair_core(flat, by_b, bx_b, by_m, bx_m, base_f, stride_f,
                     b, n, n_pos, t, tx, fold, halo, interpret,
                     s_total, flat_dtype, acc_dtype):
    out, _ = _fused_pair_fwd(flat, by_b, bx_b, by_m, bx_m, base_f, stride_f,
                             b, n, n_pos, t, tx, fold, halo, interpret,
                             s_total, flat_dtype, acc_dtype)
    return out


def _fused_pair_fwd(flat, by_b, bx_b, by_m, bx_m, base_f, stride_f,
                    b, n, n_pos, t, tx, fold, halo, interpret,
                    s_total, flat_dtype, acc_dtype):
    c = flat.shape[-1]
    base = base_f.astype(jnp.int32)
    stride = stride_f.astype(jnp.int32)
    ff = flat.reshape(flat.shape[0] // fold, fold * c)
    txf = tx // fold

    def fetch(base_i, stride_i):
        idx = ((base_i + jnp.arange(t, dtype=jnp.int32) * stride_i)[:, None]
               // fold + jnp.arange(txf, dtype=jnp.int32)[None, :])
        return ff[jnp.clip(idx, 0, ff.shape[0] - 1)].reshape(t, tx, c)

    regions = jax.vmap(fetch)(base, stride)  # (B·n, t, tx, C)
    pooled_box = _kron_pool(regions, by_b, bx_b)
    reg_pos = regions.reshape(b, n, t, tx, c)[:, :n_pos]
    pooled_mask = _kron_pool(reg_pos.reshape(b * n_pos, t, tx, c), by_m, bx_m)
    res = (by_b, bx_b, by_m, bx_m, base, stride)
    return (pooled_box, pooled_mask), res


def _fused_pair_bwd(b, n, n_pos, t, tx, fold, halo, interpret,
                    s_total, flat_dtype, acc_dtype, res, g):
    from maskrcnn_tpu.kernels.region_scatter_pallas import scatter_add_regions

    by_b, bx_b, by_m, bx_m, base, stride = res
    flat_dtype = jnp.dtype(flat_dtype)
    g_box, g_mask = g
    r, ohb, owb, c = g_box.shape
    ohm, owm = g_mask.shape[1:3]
    cd = jnp.bfloat16 if flat_dtype == jnp.bfloat16 else jnp.float32

    def d_regions(by, bx, gg, oh, ow):
        rr = gg.shape[0]
        b2 = jnp.einsum("ryt,rxw->ryxtw", by, bx).reshape(
            rr, oh * ow, t * tx).astype(cd)
        return jnp.einsum(
            "rpk,rpc->rkc", b2, gg.reshape(rr, oh * ow, c).astype(cd),
            preferred_element_type=jnp.float32,
        ).astype(cd)  # (rr, t·tx, C)

    d_reg = d_regions(by_b, bx_b, g_box, ohb, owb)
    d_reg_m = d_regions(by_m, bx_m, g_mask, ohm, owm)
    # the mask branch read the (B, :n_pos) prefix of the SAME regions:
    # merge its cotangent with one in-place prefix add (replaces the pad +
    # cotangent-add pair XLA autodiff emits)
    d_reg = (
        d_reg.reshape(b, n, t * tx, c)
        .at[:, :n_pos]
        .add(d_reg_m.reshape(b, n_pos, t * tx, c))
        .reshape(r, t * tx, c)
    )

    n_half = c // 128
    d_flat2 = scatter_add_regions(
        d_reg.reshape(r, t * tx * n_half, 128),
        base * n_half, stride * n_half,
        s2_rows=s_total * n_half, t=t, txn=tx * n_half, halo=halo,
        out_dtype=flat_dtype, acc_dtype=acc_dtype, interpret=interpret,
    )
    d_flat = d_flat2.reshape(s_total, c)
    zeros = (jnp.zeros_like(by_b), jnp.zeros_like(bx_b),
             jnp.zeros_like(by_m), jnp.zeros_like(bx_m),
             jnp.zeros(base.shape, jnp.float32),
             jnp.zeros(stride.shape, jnp.float32))
    return (d_flat,) + zeros


_fused_pair_core.defvjp(_fused_pair_fwd, _fused_pair_bwd)
