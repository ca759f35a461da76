"""maskrcnn_tpu — TPU-native Mask R-CNN / Keypoint R-CNN / Light-Head R-CNN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
katotetsuro/chainer-maskrcnn (reference at /root/reference), designed
TPU-first:

- every stage of the detection pipeline is fixed-shape and padded with
  validity masks so one ``jax.jit`` covers the whole train step
  (the reference ping-pongs host<->device per step,
  reference: chainer_maskrcnn/utils/proposal_target_creator.py:40-44),
- ROIAlign is a batched multilevel gather (Pallas kernel on TPU) instead of
  a per-ROI Python loop (reference: model/head/fpn_roi_mask_head.py:59-63),
- batch size > 1 from day 1 (the reference asserts batch==1,
  reference: model/fpn_maskrcnn_train_chain.py:38-40),
- data parallelism is ``jax.sharding`` + ``jit`` over a device Mesh with
  compiler-emitted collectives instead of process-fork + NCCL
  (reference: train.py:117-121).
"""

__version__ = "0.1.0"
