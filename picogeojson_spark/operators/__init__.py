from .features import (  # noqa: F401
    filter_by_props,
    filter_by_type,
    mine_features,
    with_reextracted_text,
)
from .knn import knn_join  # noqa: F401
from .pip_join import pip_join  # noqa: F401
from .ann_index import ann_ivf_query, build_ivf_index  # noqa: F401
from .sampling import hash_sample, stratified_sample  # noqa: F401
from .tiling import assign_tiles_points, tile_cover_features  # noqa: F401
