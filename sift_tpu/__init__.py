"""sift_tpu — a TPU-native feature-based vision / SfM engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
C++ SIFT + stitching reference (ahmedhassayoune/sift-project), designed
TPU-first: batched fixed-shape array programs, MXU-friendly contractions,
mesh-sharded multi-device execution.
"""

from sift_tpu.config import SiftConfig
from sift_tpu.models.match import match_descriptors, pairwise_sq_dists
from sift_tpu.models.sift import detect_and_describe
from sift_tpu.utils.io import load_image, save_image
from sift_tpu.utils.keypoints import Keypoints

__version__ = "0.1.0"

__all__ = [
    "SiftConfig",
    "Keypoints",
    "detect_and_describe",
    "match_descriptors",
    "pairwise_sq_dists",
    "load_image",
    "save_image",
]
