from deepsir_tpu.ops.gather import (  # noqa: F401
    gather_neighbour, gather_points, max_pool_neighbours, nearest_interpolate,
)
from deepsir_tpu.ops.distance import (  # noqa: F401
    square_distance, match_features, nearest_neighbour_index, pairwise_dist_chunked,
)
from deepsir_tpu.ops.knn import knn  # noqa: F401
from deepsir_tpu.ops.pyramid import build_pyramid, Pyramid  # noqa: F401
from deepsir_tpu.ops.svd3 import weighted_kabsch, svd3x3  # noqa: F401
from deepsir_tpu.ops.voxel import voxel_downsample_np, voxel_downsample  # noqa: F401
from deepsir_tpu.ops.sinkhorn import sinkhorn, compute_affinity  # noqa: F401
