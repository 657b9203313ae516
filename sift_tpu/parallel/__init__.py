from sift_tpu.parallel.mesh import make_mesh
from sift_tpu.parallel.dist import sharded_match, batched_detect
from sift_tpu.parallel.spatial import spatial_detect_and_describe

__all__ = [
    "make_mesh",
    "sharded_match",
    "batched_detect",
    "spatial_detect_and_describe",
]
