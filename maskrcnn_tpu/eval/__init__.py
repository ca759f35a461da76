from maskrcnn_tpu.eval.predict import Detections, make_predict_fn
from maskrcnn_tpu.eval.postprocess import paste_masks, decode_keypoints

__all__ = ["Detections", "make_predict_fn", "paste_masks", "decode_keypoints"]
