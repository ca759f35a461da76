from maskrcnn_tpu.kernels.roi_align_pallas import multilevel_roi_align_pallas

__all__ = ["multilevel_roi_align_pallas"]
