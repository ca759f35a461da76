"""FPN level assignment for ROIs.

Spec: ``map_rois_to_fpn_levels`` in the reference
(chainer_maskrcnn/model/rpn/multilevel_region_proposal_network.py:16-31) —
the Detectron equation ``floor(4 + log2(sqrt(area) / 224))`` clipped to
[k_min, k_max] and shifted to 0-based level indices.
"""

from __future__ import annotations

import jax.numpy as jnp

from maskrcnn_tpu.ops.boxes import box_area


def map_rois_to_fpn_levels(
    rois: jnp.ndarray,
    k_min: int = 0,
    k_max: int = 4,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """(..., 4) yxyx ROIs → (...,) int32 pyramid level in [k_min, k_max].

    Defaults reproduce the reference exactly (including its quirk of NOT
    shifting by −2 like Detectron does — a 224-px ROI maps to index 4, i.e.
    P6): ``clip(floor(4 + log2(sqrt(area)/224 + 1e-6)), 0, 4)``.
    Degenerate/padded ROIs (area ≤ 0) land on k_min.
    """
    area = jnp.clip(box_area(rois), 0.0, None)
    s = jnp.sqrt(area)
    target = jnp.floor(
        canonical_level + jnp.log2(s / canonical_scale + 1e-6)
    ).astype(jnp.int32)
    return jnp.clip(target, k_min, k_max)
