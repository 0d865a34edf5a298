"""Corpus search scoring: exact BM25 over a small query-term set.

The training-data-pipeline use case is targeted retrieval over the corpus
("find every document about X" for audit, curation, or contamination
triage) without an external index. BM25 is the standard lexical ranking
function; computed exactly here because the query side is tiny (a handful
of terms) while the corpus side is the 10^9-document relation.

Scale shape:

* The query terms are a literal ``IN`` set applied to each document's
  token ARRAY **before** any explode (``F.filter`` on the array — a
  narrow, codegen'd map), so the exploded relation is proportional to the
  number of *query-term hits*, not corpus tokens. At 10^10 tokens with a
  3-term query this is the difference between shuffling terabytes and
  shuffling megabytes.
* The whole query costs exactly TWO column-pruned corpus scans: one for
  the (N, avgdl) length statistics over ALL documents, one for the hit
  relation. Persisting the token arrays to share a single scan would
  cache O(corpus tokens) — far more expensive than re-reading one pruned
  parquet column. The hit relation ``tf`` IS materialized (it is tiny —
  ≤ |terms| rows per hit document) so the df/idf broadcast and the final
  score join reuse it instead of re-scanning text a third time.
* ``df``/``idf`` are computed from the hit relation grouped by term — at
  most ``|terms|`` rows — and broadcast back; the corpus-level constants
  (N, avgdl) are a single-row broadcast crossJoin. The only wide exchange
  is the hash-aggregate of hits by (doc, term), partial-combined map-side.

Reference analog: the reference's query matching gates on attribute
predicates per study (``Query.java``) — this generalises the "find the
matching subset" step to ranked full-text retrieval over transcript text.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["bm25_search"]


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing at least one of ``query_terms``
    with exact Okapi BM25 (case-folded whitespace tokens):

    ``score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl/avgdl))``

    with the standard smoothed ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.
    N and avgdl are computed over the WHOLE corpus (documents with zero
    query hits still count toward the length normalisation, as in every
    BM25 reference implementation).

    Returns ``(id, n_terms_hit, score)`` for hit documents only, score
    rounded to 4 dp for cross-engine comparability. Deterministic: a pure
    function of the corpus and the term set.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    lit_terms = F.array(*[F.lit(t) for t in terms])

    toks: Column = tokens(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        # array-level filter BEFORE explode: hit tokens only leave the map
        F.filter(toks, lambda t: F.array_contains(lit_terms, t)).alias("_hits"),
    )

    stats = base.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    tf = (
        base.select("id", "dl", F.explode("_hits").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # branch point: both the df/idf aggregate and the score join read
        # this relation — eager checkpoint so the corpus is scanned ONCE
        # for hits (the relation is ≤ |terms| rows per hit document)
        .localCheckpoint(eager=True)
    )
    # document frequency per term: ≤ |terms| rows after the aggregate
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("_s"), 4).alias("score"),
    )
