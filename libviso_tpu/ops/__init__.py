"""Device kernels: detection, description, matching, circular consistency."""

from libviso_tpu.ops.features import (
    sobel_derivatives,
    harris_response,
    detect_harris_binned,
    extract_descriptors,
    detect_and_describe,
)
from libviso_tpu.ops.matching import match_descriptors
from libviso_tpu.ops.circle import circle_filter

__all__ = [
    "sobel_derivatives",
    "harris_response",
    "detect_harris_binned",
    "extract_descriptors",
    "detect_and_describe",
    "match_descriptors",
    "circle_filter",
]
