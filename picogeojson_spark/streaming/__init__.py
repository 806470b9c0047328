from .pages_stream import stream_feature_counts, stream_mine_features  # noqa: F401
