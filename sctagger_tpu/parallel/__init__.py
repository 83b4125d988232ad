from .mesh import (  # noqa: F401
    make_mesh,
    dist_match_min,
    dist_count_merge,
    dist_histogram,
)
