from semi_tpu.ops.stft import StftConfig, hamming_window, istft, stft
from semi_tpu.ops.segment import over_add, pad_for_segmentation, segment_gap, segmentation
from semi_tpu.ops.mask import (
    apply_mask,
    build_complex_ideal_ratio_mask,
    complex_mul,
    compress_cirm,
    decompress_cirm,
)

__all__ = [
    "StftConfig",
    "hamming_window",
    "istft",
    "stft",
    "over_add",
    "pad_for_segmentation",
    "segment_gap",
    "segmentation",
    "apply_mask",
    "build_complex_ideal_ratio_mask",
    "complex_mul",
    "compress_cirm",
    "decompress_cirm",
]
