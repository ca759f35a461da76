"""Stage-by-stage probe of a trained checkpoint — where do detections die?

Round-5 diagnostic for the flagship 0.0-AP failure. Loads a checkpoint at
the flagship config and reports, per pipeline stage, whether signal exists:

  1. train-path loss with the loaded weights (sanity: matches the logged
     final loss on the training stream);
  2. RPN proposal recall against GT (test budgets) — is stage 1 blind?
  3. head_box softmax: max foreground probability per image — is the
     classifier collapsed to background?
  4. full predict: detections above score_thresh, their IoU vs GT.

Usage:
  python tools/diag_checkpoint.py --weight runs/flagship_q/checkpoints/step_00006000
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weight", required=True)
    p.add_argument("--preset", default="fpn_mask")
    p.add_argument("--image-size", default="512x512")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0, help="data stream seed")
    p.add_argument("--batch-index", type=int, default=0)
    args = p.parse_args()

    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.data import SyntheticDetectionData
    from maskrcnn_tpu.eval.predict import make_predict_fn
    from maskrcnn_tpu.models import MaskRCNN, anchors_for, generate_proposals
    from maskrcnn_tpu.models.maskrcnn import backbone_geometry, pyramid_shapes
    from maskrcnn_tpu.ops.boxes import box_iou
    from maskrcnn_tpu.train.checkpoint import load_params_only
    from maskrcnn_tpu.train.state import create_train_state
    from maskrcnn_tpu.train.step import init_model, make_train_step

    h, w = (int(x) for x in args.image_size.split("x"))
    cfg = cfg_lib.PRESETS[args.preset]()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, image_size=(h, w), image_buckets=None,
            batch_size=args.batch,
        ),
    )
    model, variables = init_model(cfg, jax.random.key(0))
    state = create_train_state(cfg, variables, jax.random.key(1))
    state = load_params_only(args.weight, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"loaded {args.weight}")

    data = SyntheticDetectionData(cfg, seed=args.seed)
    batch = data.batch(args.batch_index)

    # ---- 1. train-path loss with loaded weights --------------------------
    step = make_train_step(cfg, model)
    state2 = create_train_state(cfg, {
        "params": jax.tree.map(jnp.copy, variables["params"]),
        "batch_stats": jax.tree.map(jnp.copy, variables["batch_stats"]),
    }, jax.random.key(1))
    _, metrics = step(state2, batch)
    print("\n[1] train loss with loaded weights:",
          {k: round(float(v), 4) for k, v in metrics.items()})

    # ---- 2. proposals at test budgets ------------------------------------
    feat_strides, _ = backbone_geometry(cfg)
    feat_shapes = pyramid_shapes(cfg, (h, w))
    anchors = jnp.asarray(anchors_for(cfg, feat_shapes, feat_strides))

    @jax.jit
    def rpn_stage(images, img_hw, scale):
        features, rpn_locs, rpn_scores = model.apply(variables, images, False)
        props = generate_proposals(
            rpn_locs, rpn_scores, anchors, scale, img_hw,
            n_pre=cfg.proposals.n_test_pre_nms,
            n_post=cfg.proposals.n_test_post_nms,
            nms_thresh=cfg.proposals.nms_thresh,
            min_size=cfg.proposals.min_size,
            n_levels=len(feat_shapes),
        )
        return features, props

    features, props = rpn_stage(
        jnp.asarray(batch.images), jnp.asarray(batch.img_hw),
        jnp.asarray(batch.scale))
    rois = np.asarray(props.rois)
    rvalid = np.asarray(props.valid)
    for i in range(args.batch):
        gt = np.asarray(batch.gt_boxes[i][batch.gt_valid[i]])
        iou = np.asarray(box_iou(jnp.asarray(gt), jnp.asarray(rois[i])))
        iou = iou * rvalid[i][None, :]
        print(f"\n[2] img {i}: {rvalid[i].sum()} valid proposals / "
              f"{rois.shape[1]} slots; {len(gt)} GT")
        print(f"    per-GT best proposal IoU: "
              f"{np.round(iou.max(axis=1), 3).tolist()}")

    # ---- 3. head_box scores ----------------------------------------------
    b = args.batch
    r = rois.shape[1]

    @jax.jit
    def box_stage(features, props_rois, props_levels):
        rr = props_rois.reshape(b * r, 4)
        lv = props_levels.reshape(b * r)
        bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
        roi_cls_locs, roi_scores = model.apply(
            variables, features, rr, bi, lv, method=MaskRCNN.head_box)
        return jax.nn.softmax(roi_scores, axis=-1).reshape(b, r, -1)

    probs = np.asarray(box_stage(features, props.rois, props.levels))
    for i in range(args.batch):
        fg = probs[i][rvalid[i]][:, 1:]
        if fg.size == 0:
            print(f"[3] img {i}: NO valid proposals")
            continue
        print(f"[3] img {i}: max fg prob {fg.max():.4f}; "
              f"#rois with max-fg>0.05: {(fg.max(axis=1) > 0.05).sum()}; "
              f"mean bg prob {probs[i][rvalid[i]][:, 0].mean():.4f}")
        top = np.argsort(-fg.max(axis=1))[:5]
        for t in top:
            cls = int(fg[t].argmax())
            print(f"      roi{t}: fg_cls={cls} p={fg[t].max():.4f}")

    # ---- 4. full predict ---------------------------------------------------
    predict = make_predict_fn(cfg, model, image_size=(h, w))
    det = predict(variables, jnp.asarray(batch.images),
                  jnp.asarray(batch.img_hw), jnp.asarray(batch.scale))
    det = jax.device_get(det)
    for i in range(args.batch):
        v = det.valid[i]
        gt = np.asarray(batch.gt_boxes[i][batch.gt_valid[i]])
        gl = np.asarray(batch.gt_labels[i][batch.gt_valid[i]])
        print(f"\n[4] img {i}: {v.sum()} detections; GT labels {gl.tolist()}")
        order = np.argsort(-det.scores[i] * v)[:8]
        for k in order:
            if not v[k]:
                continue
            iou = np.asarray(box_iou(
                jnp.asarray(gt), jnp.asarray(det.boxes[i][k][None]))).max()
            print(f"      det: label={int(det.labels[i][k])} "
                  f"score={det.scores[i][k]:.4f} bestIoU={iou:.3f} "
                  f"box={np.round(det.boxes[i][k], 1).tolist()}")


if __name__ == "__main__":
    main()
