"""Score a COCO results dump offline with the in-repo COCO evaluator.

Closes the round-5 full-dress loop (VERDICT r4 #6): ``cli/evaluate.py
--dump-results`` writes a pycocotools-loadRes-compatible segm results
JSON; this tool re-loads that dump plus the annotation file and scores it
with the repo's own COCO-API implementation (``eval/coco_eval.py``, RLE
codec from ``eval/export.py`` / ``data/coco.py``) — no pycocotools
anywhere, yet the dump itself stays interchangeable with anyone who has
the real library (reference relied on pycocotools for all of this,
dataset/coco_dataset.py:6).

  python tools/score_dump.py --ann /tmp/cocosynth/annotations/instances_val.json \
      --results /tmp/rehearsal/results_val.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True, help="COCO annotations json")
    p.add_argument("--results", required=True, help="segm results json")
    p.add_argument("--out", default=None, help="write the report here")
    args = p.parse_args()

    from maskrcnn_tpu.data.coco import polygons_to_mask, rle_decode
    from maskrcnn_tpu.eval.coco_eval import evaluate_coco

    with open(args.ann) as f:
        ann = json.load(f)
    with open(args.results) as f:
        results = json.load(f)

    cat_ids = sorted(c["id"] for c in ann["categories"])
    cat_to_contig = {c: i for i, c in enumerate(cat_ids)}
    n_class = len(cat_ids)
    img_info = {im["id"]: im for im in ann["images"]}
    img_ids = sorted(img_info)

    gt_by_img = {i: [] for i in img_ids}
    for a in ann["annotations"]:
        gt_by_img[a["image_id"]].append(a)
    dt_by_img = {i: [] for i in img_ids}
    for d in results:
        if d["image_id"] in dt_by_img:
            dt_by_img[d["image_id"]].append(d)

    pred_masks, pred_labels, pred_scores = [], [], []
    gt_masks, gt_labels, gt_crowd = [], [], []
    for iid in img_ids:
        h, w = img_info[iid]["height"], img_info[iid]["width"]
        gm, gl, gc = [], [], []
        for a in gt_by_img[iid]:
            seg = a["segmentation"]
            if isinstance(seg, dict):
                m = rle_decode(seg).astype(bool)
            else:
                m = polygons_to_mask(seg, h, w).astype(bool)
            gm.append(m)
            gl.append(cat_to_contig[a["category_id"]])
            gc.append(bool(a.get("iscrowd", 0)))
        dm, dl, ds = [], [], []
        for d in dt_by_img[iid]:
            dm.append(rle_decode(d["segmentation"]).astype(bool))
            dl.append(cat_to_contig[d["category_id"]])
            ds.append(float(d["score"]))
        shape = (h, w)
        gt_masks.append(np.array(gm, bool) if gm
                        else np.zeros((0, *shape), bool))
        gt_labels.append(np.array(gl, np.int32))
        gt_crowd.append(np.array(gc, bool))
        pred_masks.append(np.array(dm, bool) if dm
                          else np.zeros((0, *shape), bool))
        pred_labels.append(np.array(dl, np.int32))
        pred_scores.append(np.array(ds, np.float32))

    rep = evaluate_coco(pred_masks, pred_labels, pred_scores,
                        gt_masks, gt_labels, n_class, gt_crowd=gt_crowd)
    rep = {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
           for k, v in rep.items() if not isinstance(v, np.ndarray)}
    print(json.dumps(rep, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
