"""Real <a href> link extraction over the crawl's html bytes, and the
host link graph built from it.

This closes the loop the synthetic edge generator left open
(``graph.host_edges_from_docs``: "a real crawl would extract <a href>
hosts instead"): the operators here parse the actual ``html: binary``
column of the input table (BASELINE.json input_hint shape) with
JVM-side regexp functions, then aggregate the edges into the
(src_host, dst_host) table that ``graph.pagerank_df`` consumes.

Plan (100-TB posture):
- ``extract_links_df`` / ``extract_title_df`` are pure Column
  expressions (decode → regexp_extract_all → arrays_zip → posexplode):
  whole-stage codegen, zero shuffle, zero Python.  The html bytes are
  read once and never cross an exchange — the explode multiplies rows
  AFTER the scan, inside the same stage.
- ``host_link_graph_df`` projects the two host strings (≤ ~30 bytes
  each) before its single groupBy exchange, so the shuffle carries
  slim keys + a count, with map-side partial aggregation absorbing
  hot hosts (a mega-host is exactly the inflow hot key the pagerank
  docstring discusses).  At 10^12 pages the edge table shrinks to the
  distinct (src,dst) host pairs (~10^8-10^9 rows) in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HREF_RE = r'<a href="([^"]+)">'
_ANCHOR_RE = r'<a href="[^"]+">([^<]*)</a>'
_TITLE_RE = r"<title>([^<]*)</title>"
_HOST_RE = r"^https?://([^/]+)"


def extract_links_df(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """One row per <a href> anchor in each page's html bytes:
    ``(url, title, link_ord, href, anchor)``.

    link_ord is the anchor's 0-based position in the document — the
    per-row invariant (output a pure function of the html bytes) the
    input_hint demands, independent of partitioning."""
    h = F.decode(F.col(html_col), "UTF-8")
    pairs = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(_HREF_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(h, F.lit(_ANCHOR_RE), F.lit(1)).alias("anchor"))
    return (pages
            .select(F.col(url_col).alias("url"),
                    F.regexp_extract(h, _TITLE_RE, 1).alias("title"),
                    F.posexplode(pairs).alias("link_ord", "_l"))
            .select("url", "title",
                    F.col("link_ord").cast("long").alias("link_ord"),
                    F.col("_l.href").alias("href"),
                    F.col("_l.anchor").alias("anchor")))


def extract_title_df(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """``(url, title)`` from the html bytes; pure codegen."""
    h = F.decode(F.col(html_col), "UTF-8")
    return pages.select(F.col(url_col).alias("url"),
                        F.regexp_extract(h, _TITLE_RE, 1).alias("title"))


def host_link_graph_df(links: DataFrame, url_col: str = "url",
                       href_col: str = "href") -> DataFrame:
    """Aggregate extracted links into the directed host graph:
    ``(src_host, dst_host, n_links)`` — the edge table
    ``graph.pagerank_df`` runs on.  Self-loops are kept here (the
    pagerank operator drops them itself); one slim-key exchange."""
    return (links
            .select(F.regexp_extract(F.col(url_col), _HOST_RE, 1)
                    .alias("src_host"),
                    F.regexp_extract(F.col(href_col), _HOST_RE, 1)
                    .alias("dst_host"))
            .groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).alias("n_links")))


def host_pagerank_df(graph: DataFrame, iters: int = 5,
                     damping_pct: int = 85) -> DataFrame:
    """PageRank over the extracted host graph: ``(host, rank_micros)``.

    ``graph.pagerank_df`` keeps every per-round shuffle row fixed-width
    int64, so hosts are first mapped to int64 node ids with xxhash64
    (collision odds at 10^8 hosts ~ 3e-4 — acceptable for a ranking
    signal; a dense-rank id assignment would force a global sort for
    no accuracy a curation filter can use).  Host names re-join only
    once, after the last round."""
    from .graph import pagerank_df
    e = graph.select(F.xxhash64("src_host").alias("src"),
                     F.xxhash64("dst_host").alias("dst"))
    names = (graph.select(F.col("src_host").alias("host"))
             .unionAll(graph.select(F.col("dst_host").alias("host")))
             .distinct()
             .select(F.xxhash64("host").alias("node"), "host"))
    return (pagerank_df(e, iters=iters, damping_pct=damping_pct)
            .join(names, "node").select("host", "rank_micros"))
