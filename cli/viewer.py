"""Live depth-camera keypoint viewer — reference viewer.py surface.

Spec: reference viewer.py:15-126 — RealSense D435 depth stream (or a bag-file
playback) → 16:9→4:3 crop → depth normalized to [0,255] 3-channel →
darknet+keypoint-head inference → per-keypoint heatmap argmax → skeleton
overlay with an EMA FPS readout. pyrealsense2 is optional (host demo only,
SURVEY §2b N8); --image lets the same pipeline run on a file or synthetic
input without a camera.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weight", required=False, default=None,
                   help="checkpoint to load (reference: strict load)")
    p.add_argument("--file", default=None,
                   help="RealSense .bag playback file (reference --file)")
    p.add_argument("--image", default=None,
                   help="run on a single image/npz instead of a camera")
    p.add_argument("--n-keypoints", type=int, default=20)
    p.add_argument("--thresh", type=float, default=0.2)
    p.add_argument("--no-display", action="store_true")
    p.add_argument("--benchmark", type=int, default=0, metavar="N",
                   help="with --image: loop inference N times and print the "
                        "EMA FPS the camera loop would show (reference "
                        "viewer.py:117-118 prints the same running figure)")
    return p.parse_args(argv)


def normalize_depth(depth: np.ndarray) -> np.ndarray:
    """(H, W) depth in mm → (H, W, 3) float in [0,1]
    (reference viewer.py:78-87 and depth_dataset.py:56-59: (d-1000)/3000)."""
    d = (depth.astype(np.float32) - 1000.0) / 3000.0
    d = np.clip(d, 0.0, 1.0)
    return np.stack([d, d, d], axis=-1)


def crop_16_9_to_4_3(img: np.ndarray) -> np.ndarray:
    """Center-crop width so a 16:9 frame becomes 4:3 (viewer.py:78-80)."""
    h, w = img.shape[:2]
    target_w = h * 4 // 3
    off = max((w - target_w) // 2, 0)
    return img[:, off : off + target_w]


class Viewer:
    def __init__(self, args):
        import jax

        from maskrcnn_tpu import config as cfg_lib
        from maskrcnn_tpu.eval import make_predict_fn
        from maskrcnn_tpu.eval.postprocess import decode_keypoints
        from maskrcnn_tpu.train import create_train_state, init_model
        from maskrcnn_tpu.train.checkpoint import load_params_only

        # visualize preset: score 0.7 (reference use_preset('visualize'))
        self.cfg = cfg_lib.use_preset(
            cfg_lib.darknet_keypoint(n_keypoints=args.n_keypoints),
            "visualize",
        )
        self.model, variables = init_model(self.cfg, jax.random.key(0))
        state = create_train_state(self.cfg, variables, jax.random.key(1))
        if args.weight:
            state = load_params_only(args.weight, state)
        self.variables = {"params": state.params,
                          "batch_stats": state.batch_stats}
        self.predict = make_predict_fn(self.cfg, self.model)
        self.decode_keypoints = decode_keypoints
        self.args = args
        self.fps_ema = None

    def infer_frame(self, rgbish: np.ndarray):
        """(H, W, 3) float [0,1] → (keypoints (N, K, 3), boxes, scores)."""
        import cv2
        import jax.numpy as jnp

        bh, bw = self.cfg.train.image_size
        h0, w0 = rgbish.shape[:2]
        scale = min(bh / h0, bw / w0)
        nh, nw = int(h0 * scale), int(w0 * scale)
        canvas = np.zeros((bh, bw, 3), np.float32)
        canvas[:nh, :nw] = cv2.resize(rgbish, (nw, nh))

        det = self.predict(
            self.variables,
            jnp.asarray(canvas[None]),
            jnp.asarray([[nh, nw]], np.float32),
            jnp.asarray([scale], np.float32),
        )
        boxes = np.asarray(det.boxes[0]) / scale  # back to input coords
        valid = np.asarray(det.valid[0])
        kps = self.decode_keypoints(
            boxes, np.asarray(det.heatmaps[0]), valid
        )
        return kps, boxes[valid], np.asarray(det.scores[0])[valid]

    def run_image(self, path: str):
        import cv2

        from maskrcnn_tpu.utils.vis import vis_keypoints

        if path.endswith(".npz"):
            depth = np.load(path)["depth"]
            img = normalize_depth(depth)
        else:
            img = cv2.imread(path).astype(np.float32) / 255.0
        kps, boxes, scores = self.infer_frame(img)
        canvas = (img * 255).astype(np.uint8)
        for person in kps:
            canvas = vis_keypoints(canvas, person, thresh=self.args.thresh)
        out = os.path.splitext(path)[0] + "_keypoints.png"
        cv2.imwrite(out, canvas)
        print(f"detections: {len(boxes)}; wrote {out}")
        if self.args.benchmark:
            # the camera loop's per-frame work (preprocess + predict +
            # keypoint decode), minus the camera itself
            for _ in range(self.args.benchmark):
                t0 = time.time()
                self.infer_frame(img)
                fps = 1.0 / max(time.time() - t0, 1e-6)
                self.fps_ema = fps if self.fps_ema is None else (
                    0.1 * fps + 0.9 * self.fps_ema)
            print(f"fps(EMA) over {self.args.benchmark} frames: "
                  f"{self.fps_ema:.2f}")

    def run_camera(self):
        try:
            import pyrealsense2 as rs
        except ImportError:
            raise SystemExit(
                "pyrealsense2 not installed — camera mode unavailable; "
                "use --image for file inference"
            )
        import cv2

        from maskrcnn_tpu.utils.vis import vis_keypoints

        pipeline = rs.pipeline()
        rs_cfg = rs.config()
        if self.args.file:
            rs_cfg.enable_device_from_file(self.args.file)
        rs_cfg.enable_stream(rs.stream.depth, 640, 360, rs.format.z16, 30)
        pipeline.start(rs_cfg)
        try:
            while True:
                t0 = time.time()
                frames = pipeline.wait_for_frames()
                depth = np.asanyarray(frames.get_depth_frame().get_data())
                img = normalize_depth(crop_16_9_to_4_3(depth))
                kps, boxes, scores = self.infer_frame(img)
                canvas = (img * 255).astype(np.uint8)
                for person in kps:
                    canvas = vis_keypoints(canvas, person,
                                           thresh=self.args.thresh)
                dt = time.time() - t0
                fps = 1.0 / max(dt, 1e-6)
                self.fps_ema = fps if self.fps_ema is None else (
                    0.1 * fps + 0.9 * self.fps_ema
                )
                print(f"fps(EMA): {self.fps_ema:.1f}", end="\r")
                if not self.args.no_display:
                    cv2.imshow("keypoints", canvas)
                    if cv2.waitKey(1) == 27:
                        break
        finally:
            pipeline.stop()


def main(argv=None):
    args = parse_args(argv)
    viewer = Viewer(args)
    if args.image:
        viewer.run_image(args.image)
    else:
        viewer.run_camera()


if __name__ == "__main__":
    main()
