"""Property-based invariants for the curation/ingest operators:
hypothesis drives randomized corpora through the LOCAL (driver-side)
equivalents of each operator's defining algebra, then one Spark pass
per property checks the distributed result agrees.  Spark sessions are
expensive, so each property generates MANY random documents per
example and keeps example counts small."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

WORDS = st.lists(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "tok", "x", "yy", "zzz"]),
    min_size=0, max_size=40)


@st.composite
def corpora(draw, n_min=3, n_max=12):
    n = draw(st.integers(n_min, n_max))
    return [(i, " ".join(draw(WORDS))) for i in range(n)]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpora(), chunk=st.integers(4, 12), overlap=st.integers(0, 3))
def test_chunker_covers_every_token_once_per_stride(spark, docs, chunk,
                                                    overlap):
    """For ANY corpus and window config: concatenating each chunk's
    first `stride` tokens plus the final chunk reproduces the token
    stream exactly, and chunk sizes never exceed chunk_tokens."""
    from geojson_vt_spark.operators.webtext import chunk_documents_df
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents_df(df, chunk_tokens=chunk, overlap=overlap)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    stride = chunk - overlap
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, text in docs:
        # Spark split('\\s+') on empty/whitespace text yields one ''
        toks = [t for t in text.split(" ") if t != ""] or [""]
        cs = by_doc[i]
        assert cs[0].chunk_idx == 0
        assert all(r.n_tokens <= chunk for r in cs)
        rebuilt = []
        for r in cs[:-1]:
            rebuilt += r.chunk_text.split(" ")[:stride]
        rebuilt += cs[-1].chunk_text.split(" ")
        assert rebuilt == toks


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpora(n_min=4))
def test_incremental_dedup_partition_invariants(spark, docs):
    """For ANY corpus split into base/incoming: every incoming doc is
    flagged in_base iff its full-text md5 appears in base; keep=1 rows
    are exactly one per NEW fingerprint (the minimum id); keep implies
    not in_base."""
    import hashlib
    from geojson_vt_spark.operators.webtext import incremental_dedup_df
    base = [(i, t) for i, t in docs if i % 2 == 0]
    inc = [(i, t) for i, t in docs if i % 2 == 1]
    if not base or not inc:
        return
    bdf = spark.createDataFrame(base, "doc_id long, text string")
    idf = spark.createDataFrame(inc, "doc_id long, text string")
    rows = incremental_dedup_df(idf, bdf, fp=F.md5("text")).collect()
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()  # noqa: E731
    base_fps = {md5(t) for _, t in base}
    first = {}
    for i, t in inc:
        first.setdefault(md5(t), min(first.get(md5(t), i), i))
    assert len(rows) == len(inc)
    for r in rows:
        assert r.in_base == int(r.fp in base_fps)
        want_keep = int(r.fp not in base_fps and first[r.fp] == r.doc_id)
        assert r.keep == want_keep
        assert not (r.keep and r.in_base)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=corpora(n_min=4), labels=st.lists(
    st.sampled_from(["en", "de"]), min_size=4, max_size=12))
def test_nb_scores_match_local_model(spark, docs, labels):
    """The distributed NB argmax equals a from-scratch local
    implementation of the same smoothed model on ANY random corpus."""
    import math
    from collections import Counter, defaultdict
    from geojson_vt_spark.operators.webtext import nb_classify_df
    rows = [(i, t, labels[i % len(labels)]) for i, t in docs]
    train = [r for r in rows if r[0] % 2 == 0]
    test = [r for r in rows if r[0] % 2 == 1]
    if len({r[2] for r in train}) < 2 or not test:
        return
    tdf = spark.createDataFrame(train, "doc_id long, text string, lang string")
    sdf = spark.createDataFrame(test, "doc_id long, text string, lang string")
    got = {r.doc_id: r.pred for r in nb_classify_df(sdf, tdf).collect()}

    ct, tot, nd = defaultdict(Counter), Counter(), Counter()
    for _, t, lab in train:
        nd[lab] += 1
        for w in [w for w in t.split(" ") if w]:
            ct[lab][w] += 1
            tot[lab] += 1
    vocab = {w for c in ct.values() for w in c}
    v, n = len(vocab), len(train)
    for i, t, _ in test:
        toks = [w for w in t.split(" ") if w]
        if not toks:
            assert i not in got
            continue
        best = None
        for lab in sorted(nd):
            s = round(math.log(nd[lab] / n) * 1e6)
            for w in toks:
                # token-less model (n_c + V = 0): prior-only, the
                # same guard nb_class_df applies
                if tot[lab] + v > 0:
                    s += round(math.log(
                        (ct[lab][w] + 1.0) / (tot[lab] + v)) * 1e6)
            if best is None or s > best[0]:
                best = (s, lab)
        assert got[i] == best[1], (i, t)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(caps=st.lists(
    st.tuples(st.integers(0, 6),      # url group
              st.integers(0, 4),      # timestamp (small → forced ties)
              st.booleans()),         # messy-url variant
    min_size=1, max_size=40))
def test_latest_capture_algebra(spark, caps):
    """For ANY capture log: (1) the winner per canonical URL is the
    local max-by-(ts, id); (2) re-ingesting the whole log doubles
    n_captures but never changes a winner (idempotence under replay);
    (3) the keys_only form picks identical (keep_id, n_captures)
    multisets; (4) splitting the log in two and recombining equals one
    pass (the aggregate is associative — what makes map-side combine
    legal)."""
    from geojson_vt_spark.operators.webtext import latest_capture_df
    rows = []
    for i, (g, ts, messy) in enumerate(caps):
        url = (f"https://WWW.h{g}.Example.COM/p?utm_x=1" if messy
               else f"https://h{g}.example.com/p")
        rows.append((i, url, 100 + ts))
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    got = {r.canon_url: r
           for r in latest_capture_df(df, keys_only=False).collect()}

    local = {}
    for i, (g, ts, _) in enumerate(caps):
        canon = f"https://h{g}.example.com/p"
        cur = local.get(canon)
        if cur is None or (100 + ts, i) > cur[:2]:
            local[canon] = (100 + ts, i, 0)
    counts = {}
    for g, _, _ in caps:
        canon = f"https://h{g}.example.com/p"
        counts[canon] = counts.get(canon, 0) + 1
    assert set(got) == set(local)
    for canon, (_, wid, _) in local.items():
        assert got[canon].keep_id == wid, canon
        assert got[canon].n_captures == counts[canon]

    doubled = {r.canon_url: r
               for r in latest_capture_df(df.unionAll(df),
                                          keys_only=False).collect()}
    for canon in got:
        assert doubled[canon].keep_id == got[canon].keep_id
        assert doubled[canon].n_captures == 2 * got[canon].n_captures

    slim = sorted((r.keep_id, r.n_captures) for r in
                  latest_capture_df(df, keys_only=True).collect())
    assert slim == sorted((r.keep_id, r.n_captures) for r in got.values())
