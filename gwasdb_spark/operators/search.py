"""Ranked full-text search over the documents table: TF-IDF / BM25.

The inverted-index shape, expressed declaratively so Catalyst plans it:

  tokens  = explode(lowercased word tokens)          -- one narrow pass
  tf      = count per (doc, term)                    -- shuffle on (doc, term)
  df      = countDistinct doc per term               -- partial-agg'd shuffle
  score   = Σ over query terms of idf(term) · tf-sat -- semi-join on terms

Only postings for the QUERY'S terms ever leave the aggregation (semi-join
prune before the scoring join), so a k-term query touches k postings
lists, not the corpus — the inverted-index access path without building
an index structure.

Determinism: scores are fixed-order arithmetic over exact integer tf/df
counts; ties broken by doc id. BM25 constants k1=1.2, b=0.75 (the
standard Robertson defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K1 = 1.2
B = 0.75


def _term_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) postings + per-doc length, from one explode pass."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """BM25 top-k documents for a bag-of-words query.

    Returns (doc_id, score, rank). Postings are pruned to the query's
    terms BEFORE any join fan-out; doc lengths and df come from the same
    postings aggregate (no second scan of the text)."""
    spark = df.sparkSession
    postings = _term_postings(df, id_col, text_col)
    doclen = postings.groupBy("doc").agg(F.sum("tf").alias("dl"))
    n_docs = df.count()  # scalar: drives idf constants
    # explicit sum/count (not avg()): exact integer sum then one division,
    # so the oracle engine computes the identical double
    srow = doclen.agg(
        F.sum("dl").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    avgdl = (srow.s / srow.c) if srow.c else 1.0

    terms = spark.createDataFrame([(t.lower(),) for t in query_terms], "term string")
    hit = postings.join(F.broadcast(terms), "term")  # postings prune
    df_counts = hit.groupBy("term").agg(F.count_distinct("doc").alias("df_t"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    scored = (
        hit.join(F.broadcast(df_counts), "term")
        .join(doclen, "doc")
        .select(
            "doc",
            (
                idf
                * (F.col("tf") * (K1 + 1))
                / (
                    F.col("tf")
                    + K1
                    * (1 - B + B * F.col("dl").cast("double") / F.lit(float(avgdl)))
                )
            ).alias("term_score"),
        )
        .groupBy("doc")
        .agg(F.sum("term_score").alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias(id_col), F.round("score", 6).alias("score"), "rank")
    )
