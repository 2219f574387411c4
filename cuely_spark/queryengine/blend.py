"""Linear signal blending — the scoped analog of the reference's score
tweaker (crates/core/src/ranking/initial.rs:79-93: per doc, sum of
coefficient(signal) * signal_score; coefficient table
ranking/signals/core/text.rs). The optics DSL that feeds extra boosts
is out of scope; this is the blend plumbing it would multiply into.

Pure JVM column expressions — codegen-friendly, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blend_signals(results: DataFrame, signals: DataFrame,
                  coeffs: dict[str, float], id_col: str = "doc_id",
                  score_col: str = "score", bm25_coeff: float = 1.0,
                  round_to: int = 4) -> DataFrame:
    """(id, score) with score = bm25_coeff * results.score +
    sum(coeffs[c] * signals.c); docs missing a signal contribute 0.
    The incoming score is rounded to `round_to` first so blended output
    is reproducible from reported scores."""
    keep = [id_col] + list(coeffs)
    out = results.select(id_col, F.round(F.col(score_col), round_to)
                         .alias("__bm25"))
    out = out.join(signals.select(*keep), id_col, "left")
    expr = F.col("__bm25") * F.lit(float(bm25_coeff))
    for c, w in coeffs.items():
        expr = expr + F.coalesce(F.col(c), F.lit(0.0)) * F.lit(float(w))
    return (out.select(F.col(id_col),
                       F.round(expr, round_to).alias(score_col))
            .orderBy(F.desc(score_col), F.asc(id_col)))
