from maskrcnn_tpu.targets.anchor_targets import anchor_targets, AnchorTargets
from maskrcnn_tpu.targets.proposal_targets import (
    proposal_targets,
    ProposalTargets,
    mask_targets,
    keypoint_targets,
)

__all__ = [
    "anchor_targets",
    "AnchorTargets",
    "proposal_targets",
    "ProposalTargets",
    "mask_targets",
    "keypoint_targets",
]
