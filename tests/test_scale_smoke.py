"""Scale-inflation smoke: replicate the sf0.01 fixtures 10× in-memory
(explode over a replica index, ids re-keyed) and run the heavy
operators end-to-end. This does not prove 100 TB, but it does prove
the plans survive an order-of-magnitude volume step on the SAME
executor budget — no broadcast of a grown side, no collected
intermediate, no quadratic blowup — and the replication itself gives
exact semantic oracles (a fully replicated corpus must report
dup_share 1.0; a 10×-replicated stream multiplies every count by 10).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _inflate(df, id_cols, copies=10):
    """copies× the rows; each id column re-keyed per replica so the
    copies are distinct entities."""
    out = df.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))))
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("_rep") * 10_000_000)
    return out.drop("_rep")


def test_substring_dedup_on_replicated_corpus(spark):
    from cs744_big_data_system_spark.operators.dedup import substring_dup_coverage
    from cs744_big_data_system_spark.sources.readers import load_table

    docs = _inflate(load_table(spark, SF, "documents"), ["doc_id"], copies=10)
    out = substring_dup_coverage(docs, n=8)
    rows = out.collect()
    assert len(rows) == 5000
    # every doc with >= 8 tokens exists 10x verbatim -> fully covered
    longs = [r for r in rows if r.n_tokens >= 8]
    assert longs and all(r.dup_share == 1.0 for r in longs)


def test_cms_and_ewma_on_replicated_events(spark):
    from cs744_big_data_system_spark.operators.sketches import cms_heavy_hitters
    from cs744_big_data_system_spark.operators.timeseries import ewma
    from cs744_big_data_system_spark.sources.readers import load_table

    ev = _inflate(load_table(spark, SF, "events"), ["event_id", "user_id"], copies=10)
    assert ev.count() == 100_000
    top = cms_heavy_hitters(ev, "user_id", k=5).collect()
    assert len(top) == 5 and all(r.est >= r.true_cnt for r in top)
    # EWMA still one window pass per (now 1500) keys
    sm = ewma(ev, "user_id", "ts", "value", alpha=0.3, order_tiebreak="event_id")
    assert sm.count() == 100_000


def test_pq_ann_on_replicated_embeddings(spark):
    from cs744_big_data_system_spark.operators.similarity import cosine_topk_pq
    from cs744_big_data_system_spark.sources.readers import load_table

    emb = _inflate(load_table(spark, SF, "embeddings"), ["vec_id"], copies=4)
    queries = emb.filter(F.col("vec_id") < 20)
    out = cosine_topk_pq(queries, emb, dim=64, m=8, kc=16, n_candidates=32, k=5)
    rows = out.collect()
    assert len(rows) == 100  # 20 queries x top-5
    # each query vector exists 4x: its exact duplicates (cosine 1.0)
    # must dominate the top ranks
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.cosine)
    assert all(max(c) == 1.0 for c in by_q.values())


def test_peak_concurrency_on_replicated_events_scales_exactly(spark):
    """k-fold replication at IDENTICAL timestamps multiplies every
    +1/-1 delta by k, so each day's peak is pinned to the tight band
    [k*base, k*base + k - 1] — the upper slack only on days whose peak
    lands mid-way through a replicated END group (concurrency is
    measured after each delta, and the first of k co-timed ends leaves
    k*before - 1 active). A replication-derived oracle for the sweep."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.pipeline_ext import q_peak_concurrency

    base = {r.day: r.peak_concurrency for r in q_peak_concurrency(spark, SF).collect()}

    ev = _inflate(load_table(spark, SF, "events"), ["event_id"], copies=5)
    # patched loader view: run the same query body over the inflated frame
    from cs744_big_data_system_spark.workloads import pipeline_ext as pe

    orig = pe.load_table
    try:
        pe.load_table = lambda s, d, t: ev if t == "events" else orig(s, d, t)
        got = {r.day: r.peak_concurrency for r in pe.q_peak_concurrency(spark, SF).collect()}
    finally:
        pe.load_table = orig
    assert set(got) == set(base)
    assert all(5 * base[d] <= got[d] <= 5 * base[d] + 4 for d in got), (got, base)


def test_dq_checks_catches_planted_pk_violations(spark):
    """Replicating orders WITHOUT re-keying plants (k-1)*n exact
    duplicate primary keys; the audit must count precisely that, and
    the untouched checks must stay clean."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads import pipeline_ext as pe

    od = load_table(spark, SF, "orders")
    n = od.count()
    dup = od.withColumn("_rep", F.explode(F.sequence(F.lit(0), F.lit(2)))).drop("_rep")

    orig = pe.load_table
    try:
        pe.load_table = lambda s, d, t: dup if t == "orders" else orig(s, d, t)
        rows = {r.check_name: r.violations for r in pe.q_dq_checks(spark, SF).collect()}
    finally:
        pe.load_table = orig
    assert rows["orders_pk_unique"] == 2 * n, rows
    assert rows["lineitem_fk_orders"] == 0
    assert rows["l_quantity_range"] == 0


def test_semantic_dedup_on_replicated_embeddings(spark):
    """10×-replicated embeddings: every replica is an EXACT vector
    duplicate of its base, so it must land in the base's kmeans cell
    and be pruned against a lower id at any threshold ≤ 1.0 — an exact
    semantic oracle for the whole SemDeDup pipeline at 10× volume."""
    from cs744_big_data_system_spark.operators.dedup import semantic_dedup
    from cs744_big_data_system_spark.sources.readers import load_table

    emb = _inflate(load_table(spark, SF, "embeddings"), ["vec_id"], copies=10)
    removed = {r.vec_id: r for r in
               semantic_dedup(emb, k=16, iterations=1, threshold=0.99).collect()}
    replicas = {r.vec_id for r in emb.collect() if r.vec_id >= 10_000_000}
    assert replicas <= set(removed)           # every replica pruned
    assert len(removed) - len(replicas) < 20  # only genuine near-dups beyond
    # each replica's best mate is an identical vector
    assert all(removed[v].cosine == 1.0 for v in replicas)
