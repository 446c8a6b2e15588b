"""Full-text retrieval over the corpus: BM25 (Okapi) top-k scoring of
a query set against the documents table — the "find me training docs
like these" / retrieval-augmented-filtering stage of a corpus build.

Cross-engine determinism: per-term contributions are computed in
doubles (both engines execute the identical expression tree on the
identical inputs) but are scaled to int64 micro-units BEFORE the
per-document sum, so the reduction is order-independent — a raw
double sum would depend on aggregation order and could flip a
rounded 6-decimal score across engines.  Ranking ties break on
``doc_id`` ascending.

Plan (100-TB posture): one explode to slim ``(doc_id, term)`` rows
feeds the tf and doc-length aggregates (both partial-aggregated
map-side; tf shuffles on ``(doc_id, term)``, dl on ``doc_id``);
document frequency is a per-term aggregate joined onto the QUERY
terms (a few hundred rows — broadcast), so the corpus-side probe is a
broadcast hash join that prunes tf to query terms BEFORE the dl join;
the per-(query, doc) sum partial-aggregates map-side; only the final
per-query top-k window touches a single-query partition.  No document
text ever leaves the scan projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_col


def bm25_topk_df(docs: DataFrame, queries: DataFrame, k: int = 5,
                 k1: float = 1.2, b: float = 0.75,
                 text_col: str = "text", id_col: str = "doc_id",
                 query_id_col: str = "query_id",
                 query_text_col: str = "qtext") -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the Lucene variant).
    Returns ``(query_id, doc_id, score, rank)`` with ``score`` in
    6-decimal units reconstructed from the exact integer sum."""
    n_docs = docs.count()   # one lightweight job; the N in idf

    terms = (docs.select(id_col, F.explode(tokens_col(F.col(text_col)))
                         .alias("term"))
             .where(F.col("term") != ""))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))   # 1-row, cross-joined

    qterms = (queries.select(
        query_id_col, F.explode(tokens_col(F.col(query_text_col)))
        .alias("term"))
        .where(F.col("term") != "").distinct())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q_idf = (qterms.join(dfreq, "term", "left").na.fill({"df": 0})
             .withColumn("idf", F.log(
                 1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) /
                 (F.col("df") + 0.5))))

    contrib = (tf.join(F.broadcast(q_idf), "term")
               .join(dl, id_col).crossJoin(F.broadcast(avgdl))
               .withColumn("_c", F.round(
                   F.col("idf") * (F.col("tf") * (k1 + 1.0)) /
                   (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") /
                                        F.col("avgdl"))) * 1e6)
                   .cast("long")))
    scored = contrib.groupBy(query_id_col, id_col).agg(
        F.sum("_c").alias("_s"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_s").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col,
                    F.round(F.col("_s") / 1e6, 6).alias("score"),
                    F.col("rank").cast("long").alias("rank")))
