"""Pure-Python/numpy geometry kernel (no Spark imports).

Semantics contract: observable behavior matches fortyninemaps/picogeojson
v0.8.0 (see per-module docstrings for file:line anchors). These functions run
inside Arrow-batched pandas UDFs on executors and in the pytest oracles.
"""

from .algebra import (  # noqa: F401
    burst,
    concat,
    make_feature,
    make_feature_collection,
    make_geometry_collection,
    make_linestring,
    make_multilinestring,
    make_multipoint,
    make_multipolygon,
    make_point,
    make_polygon,
    merge,
    transform,
    after,
)
from .bounds import (  # noqa: F401
    coords_bbox,
    feature_bbox,
    feature_collection_bbox,
    geometry_bbox,
    geometry_collection_bbox,
    object_bbox,
)
from .codec import (  # noqa: F401
    DEFAULT_CRS,
    SerializeOptions,
    dumps,
    loads,
    parse_object,
    to_dict,
)
from .dateline import cut_dateline, winding_number  # noqa: F401
from .query import extract, extract_features, map_features, map_type, propmatch  # noqa: F401
from .winding import ring_is_ccw  # noqa: F401
