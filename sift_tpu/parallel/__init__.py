from sift_tpu.parallel.mesh import make_mesh
from sift_tpu.parallel.dist import sharded_match, batched_detect

__all__ = ["make_mesh", "sharded_match", "batched_detect"]
