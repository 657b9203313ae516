from sift_tpu.utils.numerics import round_half_away
from sift_tpu.utils.keypoints import Keypoints

__all__ = ["round_half_away", "Keypoints"]
