try:
    from .live_index import LiveIndexWriter, refresh_stats  # noqa: F401
except ImportError:  # pragma: no cover
    pass
