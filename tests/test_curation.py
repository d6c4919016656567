"""Semantic invariants for the curation batch (workloads/curation.py).

The DuckDB oracle (tools/selfcheck.py) pins exact values; these tests
pin the *laws* each operator must satisfy so refactors can't silently
bend semantics while still hashing consistently on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_keep_best_exactly_one_survivor_per_cluster(spark):
    from cs744_big_data_system_spark.workloads.curation import q_dedup_keep_best

    rows = q_dedup_keep_best(spark, SF_SMALL).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert by_cluster, "simhash fixture must produce at least one cluster"
    for cid, members in by_cluster.items():
        kept = [m for m in members if m.is_kept == 1]
        assert len(kept) == 1, (cid, members)
        assert all(m.canonical_id == kept[0].doc_id for m in members)
        assert len(members) == members[0].cluster_size


def test_keep_best_canonical_is_longest_then_smallest_id(spark):
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import q_dedup_keep_best

    out = q_dedup_keep_best(spark, SF_SMALL)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "n_chars")
    j = out.join(docs, "doc_id").collect()
    chars = {r.doc_id: r.n_chars for r in j}
    by_cluster: dict = {}
    for r in j:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, ids in by_cluster.items():
        canon = next(r.canonical_id for r in j if r.cluster_id == cid)
        best = sorted(ids, key=lambda d: (-chars[d], d))[0]
        assert canon == best, (cid, canon, best)


def test_bloom_has_no_false_negatives(spark):
    """A Bloom filter may over-flag (false positives) but must never
    under-flag: every corpus shingle that literally appears in the
    benchmark set must count as a bloom hit."""
    from cs744_big_data_system_spark.operators.dedup import shingles
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import (
        BLOOM_BENCH_SOURCES,
        q_bloom_decontaminate,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    sh = shingles(docs, n=3).join(docs.select("doc_id", "source"), "doc_id")
    is_bench = F.col("source").isin(*BLOOM_BENCH_SOURCES)
    bench_sh = sh.filter(is_bench).select("shingle").distinct()
    exact = (
        sh.filter(~is_bench)
        .join(bench_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    out = q_bloom_decontaminate(spark, SF_SMALL)
    merged = {
        r.doc_id: r
        for r in out.join(exact, "doc_id", "left").fillna({"n_exact": 0}).collect()
    }
    assert merged
    for r in merged.values():
        assert r.n_bloom_hits >= r.n_exact, r  # superset, never a miss
        assert r.n_bloom_hits <= r.n_shingles, r
        assert r.flagged == (1 if r.n_bloom_hits > 0 else 0), r


def test_entity_pairs_obey_window_and_threshold(spark):
    from cs744_big_data_system_spark.workloads.curation import (
        SNM_MAX_EDIT,
        q_entity_match_pairs,
    )

    rows = q_entity_match_pairs(spark, SF_SMALL).collect()
    assert rows, "sorted-neighborhood fixture must match some pairs"
    seen = set()
    for r in rows:
        assert r.custkey_a != r.custkey_b
        assert r.edit_distance <= SNM_MAX_EDIT
        key = frozenset((r.custkey_a, r.custkey_b))
        assert key not in seen, f"duplicate unordered pair {key}"
        seen.add(key)


def test_inverted_index_conserves_token_mass(spark):
    from cs744_big_data_system_spark.functions.text import tokens
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import q_inverted_index

    docs = load_table(spark, SF_SMALL, "documents")
    total_tokens = docs.select(
        F.explode(tokens("text")).alias("t")
    ).count()
    rows = q_inverted_index(spark, SF_SMALL).collect()
    assert sum(r.tf_total for r in rows) == total_tokens
    for r in rows:
        # postings is a comma-joined string (scalar-only output schema —
        # the driver canon can't sort Array cells; see q_inverted_index)
        assert isinstance(r.postings, str), r
        posting_ids = [int(d) for d in r.postings.split(",")]
        assert r.df == len(posting_ids), r
        assert posting_ids == sorted(posting_ids), r
        assert len(set(posting_ids)) == len(posting_ids), r
        assert r.tf_total >= r.df, r


def test_bitext_margin_sides_and_uniqueness(spark):
    from cs744_big_data_system_spark.workloads.curation import (
        BITEXT_MARGIN_MIN,
        q_bitext_margin_mining,
    )

    rows = q_bitext_margin_mining(spark, SF_SMALL).collect()
    assert rows, "margin fixture must keep some pairs"
    src_seen = set()
    for r in rows:
        assert r.src_id % 2 == 0 and r.tgt_id % 2 == 1, r
        assert r.margin >= BITEXT_MARGIN_MIN, r
        assert r.src_id not in src_seen, "top-1 per src must be unique"
        src_seen.add(r.src_id)


def test_dedup_recall_counts_are_consistent(spark):
    from cs744_big_data_system_spark.workloads.curation import q_dedup_recall_eval

    row = q_dedup_recall_eval(spark, SF_SMALL).collect()[0]
    assert row.n_hit <= row.n_truth
    assert row.n_hit <= row.n_cand
    assert 0 <= row.recall_ppm <= 1_000_000
    if row.n_truth:
        assert row.recall_ppm == row.n_hit * 1_000_000 // row.n_truth


def test_cdc_apply_matches_replay(spark):
    """The max-of-struct pick must equal an explicit driver-side replay
    of the change log ordered by (ts, event_id)."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import q_cdc_apply

    ev = load_table(spark, SF_SMALL, "events").collect()
    state: dict = {}
    counts: dict = {}
    deletes: dict = {}
    for e in sorted(ev, key=lambda e: (e.user_id, e.ts, e.event_id)):
        op = {"signup": "I", "error": "D"}.get(e.event_type, "U")
        state[e.user_id] = (e.ts, op, e.value)
        counts[e.user_id] = counts.get(e.user_id, 0) + 1
        deletes[e.user_id] = deletes.get(e.user_id, 0) + (op == "D")
    out = {r.user_id: r for r in q_cdc_apply(spark, SF_SMALL).collect()}
    assert set(out) == set(state)
    for uid, (ts, op, value) in state.items():
        r = out[uid]
        assert r.last_op == op, (uid, r)
        assert r.n_ops == counts[uid] and r.n_deletes == deletes[uid]
        if op == "D":
            assert r.final_value is None
        else:
            assert abs(r.final_value - round(value, 6)) < 1e-9


def test_curation_plan_posture(spark):
    """Scale pins: the bloom membership join broadcasts the bounded
    bit table; cdc_apply is pure hash aggregation (no window); the
    entity window is block-keyed, never partition-less."""
    from cs744_big_data_system_spark.plans.explain import formatted_plan
    from cs744_big_data_system_spark.workloads.curation import (
        q_bloom_decontaminate,
        q_cdc_apply,
        q_entity_match_pairs,
    )

    plan = formatted_plan(q_bloom_decontaminate(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan

    plan = formatted_plan(q_cdc_apply(spark, SF_SMALL))
    assert "WindowExec" not in plan, plan

    plan = formatted_plan(q_entity_match_pairs(spark, SF_SMALL))
    assert "windowspecdefinition(c_nationkey" in plan, plan


def test_personalized_pagerank_matches_numpy_power_iteration(spark):
    """PPR ranks must equal an explicit dense power iteration with the
    same recurrence, seed vector, and damping."""
    import numpy as np

    from cs744_big_data_system_spark.sources.readers import (
        edges_from_events,
        load_table,
    )
    from cs744_big_data_system_spark.workloads.curation import (
        PPR_DAMPING,
        PPR_ITER,
        PPR_SEEDS,
        q_graph_personalized_pagerank,
    )

    edges = edges_from_events(load_table(spark, SF_SMALL, "events")).collect()
    nodes = sorted({e.src for e in edges} | {e.dst for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    w = np.zeros((len(nodes), len(nodes)))
    for e in edges:
        w[idx[e.src], idx[e.dst]] += 1.0
    deg = w.sum(axis=1)
    s = np.array([1.0 if n in PPR_SEEDS else 0.0 for n in nodes])
    r = s.copy()
    for _ in range(PPR_ITER):
        contrib = np.zeros(len(nodes))
        for u in range(len(nodes)):
            if deg[u] > 0:
                contrib += r[u] * w[u] / deg[u]
        r = (1 - PPR_DAMPING) * s + PPR_DAMPING * contrib
    got = {row.node: row.rank for row in q_graph_personalized_pagerank(spark, SF_SMALL).collect()}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - round(r[idx[n]], 6)) < 2e-6, (n, got[n], r[idx[n]])


def test_stream_cdc_replay_equals_batch_apply(spark):
    from cs744_big_data_system_spark.workloads.curation import (
        q_cdc_apply,
        q_stream_cdc_replay,
    )

    batch = {r.user_id: r for r in q_cdc_apply(spark, SF_SMALL).collect()}
    stream = {r.user_id: r for r in q_stream_cdc_replay(spark, SF_SMALL).collect()}
    assert set(batch) == set(stream)
    for uid, b in batch.items():
        s = stream[uid]
        assert (b.last_ts, b.last_op, b.final_value, b.n_ops, b.n_deletes) == (
            s.last_ts, s.last_op, s.final_value, s.n_ops, s.n_deletes
        ), (uid, b, s)


def test_temperature_resample_is_deterministic_and_bounded(spark):
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import q_temperature_resample

    a = sorted(r.doc_id for r in q_temperature_resample(spark, SF_SMALL).collect())
    b = sorted(r.doc_id for r in q_temperature_resample(spark, SF_SMALL).collect())
    assert a == b, "resample must be a pure function of the data"
    rows = q_temperature_resample(spark, SF_SMALL).collect()
    n_by_src: dict = {}
    for r in rows:
        assert 0 < r.p_keep <= 1.0
        n_by_src[r.source] = n_by_src.get(r.source, 0) + 1
    docs = load_table(spark, SF_SMALL, "documents").groupBy("source").count().collect()
    for d in docs:
        assert n_by_src.get(d.source, 0) <= d["count"]


def test_quality_classifier_sign_and_label_consistency(spark):
    from cs744_big_data_system_spark.functions.text import normalized_text, tokens
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import (
        QUALITY_MIN_WORDS,
        q_quality_classifier_nb,
    )
    from pyspark.sql import functions as FF

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", FF.size(tokens(normalized_text("text"))).alias("n_tok")
    )
    n_tok = {r.doc_id: r.n_tok for r in docs.collect()}
    rows = q_quality_classifier_nb(spark, SF_SMALL).collect()
    assert len(rows) == len(n_tok)
    assert {r.y_weak for r in rows} == {0, 1}, "weak label must not be degenerate"
    for r in rows:
        assert r.pred_good == (r.log_odds_unats > 0), r
        assert r.y_weak == (1 if n_tok[r.doc_id] >= QUALITY_MIN_WORDS else 0), r
