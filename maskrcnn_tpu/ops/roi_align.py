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

import functools

import jax
import jax.numpy as jnp
import numpy as np


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
) -> jnp.ndarray:
    """Multilevel batched ROIAlign → (R, oh, ow, C).

    Each ROI samples the single pyramid level given by ``roi_levels``
    (assigned by :func:`maskrcnn_tpu.ops.levels.map_rois_to_fpn_levels`),
    exactly like the reference's per-level Python dispatch
    (``fpn_roi_mask_head.py:58-63``) — but as one fixed-shape gather.
    """
    assert len(features) == len(spatial_scales)
    b, _, _, c = features[0].shape
    shapes = np.array([[f.shape[1], f.shape[2]] for f in features], np.int32)
    sizes = shapes[:, 0].astype(np.int64) * shapes[:, 1]
    offsets = np.concatenate([[0], np.cumsum(sizes * b)[:-1]])
    flat = jnp.concatenate(
        [f.reshape(b * f.shape[1] * f.shape[2], c) for f in features], axis=0
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
