from .parser import parse_query, Clause, ParsedQuery  # noqa: F401

try:  # executor needs pyspark; keep parser importable without it
    from .executor import Count, IndexReader  # noqa: F401
except ImportError:  # pragma: no cover
    pass
