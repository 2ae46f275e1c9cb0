from iltpu.ops.pairwise import (
    gaussian_kernel,
    squared_distance,
    weighted_median,
    weighted_similarity,
)

__all__ = [
    "squared_distance",
    "gaussian_kernel",
    "weighted_similarity",
    "weighted_median",
]
