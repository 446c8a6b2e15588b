"""Link-graph analytics over the crawl: PageRank on the host graph.

Web-corpus curation weighs documents by the authority of their host
(OpenWebText's karma filter, CCNet's head/middle/tail buckets, Common
Crawl's own harmonic-centrality ranking).  ``pagerank_df`` computes
the standard damped PageRank over a (src_host, dst_host) edge table as
an iterative DataFrame job.

Cross-engine determinism (same discipline as ``bm25_topk_df``): ranks
live in int64 micro-units end to end.  Each round every node sends
``rank div outdeg`` (integer division) along its out-edges and the new
rank is ``base + (damping_pct * inflow) div 100`` — every reduction is
an int64 SUM, order-independent, so the DuckDB oracle (the same
recurrence unrolled as one CTE per round) matches hash-exact.  A raw
double PageRank would depend on aggregation order in the tail bits.

Plan (100-TB posture): the host graph is many orders of magnitude
smaller than the page table (10^12 pages → ~10^8 hosts), and every
shuffled row here is fixed-width (two int64s).  Out-degrees are
computed once and stay joined to the edge table across rounds; the
per-round inflow is a hash aggregate with map-side partial combine;
each round ends in an eager ``localCheckpoint`` so lineage stays O(1)
instead of growing by two joins per round (the ``near_dup_clusters``
pattern, dedup.py).  A mega-host (a dst with 10^6 in-links) is a hot
key on the inflow aggregate only — partial aggregation absorbs it
map-side; the rank join's build side is unique per node so AQE can
split any residual probe skew.  Dangling nodes (no out-edges) keep
receiving the base term and simply don't forward mass — the classic
"sink drops mass" simplification, stated here because the oracle must
replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_edges_from_docs(docs: DataFrame, n_hosts: int = 50,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic host-link edges from a document table:
    each doc links its home host ``doc_id % n_hosts`` to two targets
    ``(doc_id*31+7) % n_hosts`` and ``(doc_id*97+3) % n_hosts``.
    Pure integer Column math so the DuckDB oracle rebuilds the exact
    same graph; a real crawl would extract <a href> hosts instead."""
    i = F.col(id_col).cast("long")
    src = (i % n_hosts).alias("src")
    return (docs.select(src, ((i * 31 + 7) % n_hosts).alias("dst"))
            .unionAll(docs.select(src, ((i * 97 + 3) % n_hosts)
                                  .alias("dst"))))


def pagerank_df(edges: DataFrame, iters: int = 5, damping_pct: int = 85,
                base_rank: int = 1_000_000, src_col: str = "src",
                dst_col: str = "dst") -> DataFrame:
    """Damped PageRank in int64 micro-units; see module docstring.

    Self-loops are removed and parallel edges collapsed (DISTINCT) so
    the recurrence is over the simple directed graph.  Returns
    ``(node, rank_micros)`` for every node that appears as a source or
    a target; ``sum(rank_micros)`` ≤ nodes × base_rank (sink mass is
    dropped, floor division truncates)."""
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg): built once, reused every round
    ew = e.join(outdeg, "src").localCheckpoint(eager=True)

    base = (base_rank * (100 - damping_pct)) // 100
    ranks = nodes.select("node",
                         F.lit(int(base_rank)).cast("long").alias("rank"))
    for _ in range(iters):
        inflow = (ew.join(ranks.withColumnRenamed("node", "src"), "src")
                  .select("dst", F.expr("rank div outdeg").alias("c"))
                  .groupBy("dst").agg(F.sum("c").alias("m")))
        ranks = (nodes.join(inflow.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .select("node", (F.lit(int(base)) +
                                  F.expr(f"({int(damping_pct)} * "
                                         f"coalesce(m, 0L)) div 100"))
                         .cast("long").alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", F.col("rank").alias("rank_micros"))
