from maskrcnn_tpu.data.synthetic import SyntheticDetectionData

__all__ = ["SyntheticDetectionData"]
