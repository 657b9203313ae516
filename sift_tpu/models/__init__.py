from sift_tpu.models.sift import detect_and_describe
from sift_tpu.models.match import match_descriptors

__all__ = ["detect_and_describe", "match_descriptors"]
