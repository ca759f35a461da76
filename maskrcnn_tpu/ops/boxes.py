"""Pure-JAX box ops in (y0, x0, y1, x1) order.

Behavioral spec: chainercv's ``bbox2loc`` / ``loc2bbox`` / ``bbox_iou`` as used
by the reference (imports at reference chainer_maskrcnn/model/maskrcnn.py:9 and
chainer_maskrcnn/utils/proposal_target_creator.py:3-4). Everything here is
elementwise / broadcast math — XLA fuses it; no kernels needed.

All functions are fixed-shape and jit/vmap-safe: padded (invalid) boxes flow
through as ordinary numbers and are masked out by the caller.
"""

from __future__ import annotations

import jax.numpy as jnp

# Matches chainercv's clamp on dh/dw decode to avoid exp overflow on garbage
# padded inputs (numpy reference clips via finfo max; we use a tame bound).
_MAX_DLOG = 4.135166556742356  # log(1000 / 16), the Detectron bound


def box_hw(boxes: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Heights and widths of (..., 4) yxyx boxes."""
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    return h, w


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    h, w = box_hw(boxes)
    return h * w


def bbox2loc(src_bbox: jnp.ndarray, dst_bbox: jnp.ndarray) -> jnp.ndarray:
    """Encode ``dst`` boxes relative to ``src`` boxes as (ty, tx, th, tw).

    Standard R-CNN parameterization (Girshick et al.), y/x order, matching
    chainercv ``bbox2loc`` (used at reference utils/proposal_target_creator.py:88).
    """
    height, width = box_hw(src_bbox)
    ctr_y = src_bbox[..., 0] + 0.5 * height
    ctr_x = src_bbox[..., 1] + 0.5 * width

    base_height, base_width = box_hw(dst_bbox)
    base_ctr_y = dst_bbox[..., 0] + 0.5 * base_height
    base_ctr_x = dst_bbox[..., 1] + 0.5 * base_width

    eps = jnp.finfo(src_bbox.dtype).eps
    height = jnp.maximum(height, eps)
    width = jnp.maximum(width, eps)
    base_height = jnp.maximum(base_height, eps)
    base_width = jnp.maximum(base_width, eps)

    dy = (base_ctr_y - ctr_y) / height
    dx = (base_ctr_x - ctr_x) / width
    dh = jnp.log(base_height / height)
    dw = jnp.log(base_width / width)
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def loc2bbox(src_bbox: jnp.ndarray, loc: jnp.ndarray) -> jnp.ndarray:
    """Decode (ty, tx, th, tw) offsets on top of ``src`` boxes → yxyx boxes.

    Inverse of :func:`bbox2loc`; matches chainercv ``loc2bbox`` (used at
    reference model/maskrcnn.py:196 and inside ProposalCreator — readable spec
    copy at reference utils/proposal_creator.py:108).
    """
    src_height, src_width = box_hw(src_bbox)
    src_ctr_y = src_bbox[..., 0] + 0.5 * src_height
    src_ctr_x = src_bbox[..., 1] + 0.5 * src_width

    dy = loc[..., 0]
    dx = loc[..., 1]
    dh = jnp.clip(loc[..., 2], -_MAX_DLOG, _MAX_DLOG)
    dw = jnp.clip(loc[..., 3], -_MAX_DLOG, _MAX_DLOG)

    ctr_y = dy * src_height + src_ctr_y
    ctr_x = dx * src_width + src_ctr_x
    h = jnp.exp(dh) * src_height
    w = jnp.exp(dw) * src_width

    y0 = ctr_y - 0.5 * h
    x0 = ctr_x - 0.5 * w
    y1 = ctr_y + 0.5 * h
    x1 = ctr_x + 0.5 * w
    return jnp.stack([y0, x0, y1, x1], axis=-1)


def box_iou(bbox_a: jnp.ndarray, bbox_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (N, 4) × (M, 4) yxyx boxes → (N, M).

    Spec: chainercv ``bbox_iou`` (used at reference
    utils/proposal_target_creator.py:55). Degenerate / padded boxes produce
    zero area and hence zero IoU.
    """
    # TPU layout note: keep every intermediate 2-D (N, M). A fused
    # (N, M, 2) intermediate gets its trailing dim padded 2→128 by TPU
    # tiling — at N=M=6000 that is a 36 GB allocation.
    ty = jnp.maximum(bbox_a[:, None, 0], bbox_b[None, :, 0])
    tx = jnp.maximum(bbox_a[:, None, 1], bbox_b[None, :, 1])
    by = jnp.minimum(bbox_a[:, None, 2], bbox_b[None, :, 2])
    bx = jnp.minimum(bbox_a[:, None, 3], bbox_b[None, :, 3])
    inter = jnp.clip(by - ty, 0.0, None) * jnp.clip(bx - tx, 0.0, None)

    area_a = jnp.clip(box_area(bbox_a), 0.0, None)
    area_b = jnp.clip(box_area(bbox_b), 0.0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def clip_boxes(boxes: jnp.ndarray, img_size: tuple[int, int] | jnp.ndarray) -> jnp.ndarray:
    """Clip yxyx boxes to [0, H] × [0, W].

    Spec: the slice-clips inside chainercv's ProposalCreator (readable copy at
    reference utils/proposal_creator.py:110-113) and model/maskrcnn.py:199-203.
    ``img_size`` = (H, W); may be traced values for bucketed image sizes.
    """
    h = jnp.asarray(img_size[0], boxes.dtype)
    w = jnp.asarray(img_size[1], boxes.dtype)
    y0 = jnp.clip(boxes[..., 0], 0.0, h)
    x0 = jnp.clip(boxes[..., 1], 0.0, w)
    y1 = jnp.clip(boxes[..., 2], 0.0, h)
    x1 = jnp.clip(boxes[..., 3], 0.0, w)
    return jnp.stack([y0, x0, y1, x1], axis=-1)
