from .segment import build_segment_rows, INDEX_ROW_SCHEMA  # noqa: F401

try:  # build needs pyspark; keep segment kernel importable without it
    from .build import build_index, IndexPaths  # noqa: F401
    from .merge import merge_segments  # noqa: F401
except ImportError:  # pragma: no cover
    pass
