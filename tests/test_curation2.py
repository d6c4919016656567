"""Laws for the round-5 curation batch (workloads/curation2.py):
incremental dedup, NDCG ranking eval, clustering coefficient, skyline.
Each query is also oracle-backed via the registry; these tests pin the
algorithmic invariants the SQL mirror can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_consistent_with_selfjoin(spark):
    """Every (batch, corpus) near-dup the full self-join finds must be
    found by the incremental probe too, and vice versa — the incremental
    path is a RESTRICTION of the pair set, never a different statistic."""
    from cs744_big_data_system_spark.operators.dedup import (
        incremental_lsh_dedup,
        minhash_lsh_pairs,
    )
    from cs744_big_data_system_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    inc = incremental_lsh_dedup(corpus, batch, threshold=0.4)
    full = minhash_lsh_pairs(docs, threshold=0.4)
    cross = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in full.collect()
        if (r.doc_a % 10 == 0) != (r.doc_b % 10 == 0)
    }
    batch_dups = {r.doc_id for r in inc.collect() if r.is_dup == 1}
    assert batch_dups == {a if a % 10 == 0 else b for a, b in cross}

    rows = {r.doc_id: r for r in inc.collect()}
    all_batch = {r.doc_id for r in batch.select("doc_id").collect()}
    assert set(rows) == all_batch  # every batch doc reported exactly once
    for r in rows.values():
        if r.is_dup == 0:
            assert r.match_id is None and r.n_matches == 0
        else:
            assert r.match_id % 10 != 0  # match is a corpus doc
            assert r.est_jaccard >= 0.4 and r.n_matches >= 1


def test_ndcg_bounds_and_perfect_ranking(spark):
    """0 ≤ NDCG ≤ 1 always; a system ranking identical to the truth
    ranking must score exactly 1.0; n_hits bounded by k."""
    from cs744_big_data_system_spark.workloads.curation2 import (
        _NDCG_GAINS,
        _NDCG_IDCG,
        _NDCG_K,
        q_retrieval_ndcg,
    )

    out = q_retrieval_ndcg(spark, SF).collect()
    assert out
    for r in out:
        assert 0.0 <= r.ndcg <= 1.0
        assert 0 <= r.n_hits <= _NDCG_K
        assert 0 <= r.dcg_ppm <= _NDCG_IDCG
    # perfect ranking == IDCG by construction of the gain table
    assert _NDCG_IDCG == sum(
        _NDCG_GAINS[(_NDCG_K + 1 - p) * 100 + p] for p in range(1, _NDCG_K + 1)
    )
    # gain table matches the closed form it claims
    for rel in (1, 5, 10):
        for pos in (1, 2, 10):
            assert _NDCG_GAINS[rel * 100 + pos] == int(
                math.floor(1e6 * rel / math.log2(pos + 1) + 0.5)
            )


def test_clustering_coeff_matches_bruteforce(spark):
    """Degree-binned profile equals a driver-side brute-force recount
    on the (small, synthetic) hash graph."""
    from cs744_big_data_system_spark.workloads.curation2 import (
        q_graph_clustering_coeff,
    )
    from cs744_big_data_system_spark.workloads.streaming_graph import _hash_graph

    edges = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in _hash_graph(spark).collect()
        if r.src != r.dst
    }
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    import collections

    bins = collections.defaultdict(lambda: [0, 0, 0])  # n, sum_tri, sum_ccppm
    for node, nbrs in adj.items():
        d = len(nbrs)
        ns = sorted(nbrs)
        tri = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if (min(ns[i], ns[j]), max(ns[i], ns[j])) in edges
        )
        cc_ppm = int(math.floor(2e6 * tri / (d * (d - 1)) + 0.5)) if d >= 2 else 0
        bins[d][0] += 1
        bins[d][1] += tri
        bins[d][2] += cc_ppm
    want = {
        d: (n, st, int(math.floor(sc / n + 0.5)))
        for d, (n, st, sc) in bins.items()
    }
    got = {
        r.degree: (r.n_nodes, r.sum_tri, r.mean_cc_ppm)
        for r in q_graph_clustering_coeff(spark, SF).collect()
    }
    assert got == want


def test_skyline_is_exactly_the_nondominated_set(spark):
    """The sort-scan skyline equals the quadratic dominance definition."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation2 import q_skyline_2d

    pts = [
        (r.p_partkey, float(r.p_retailprice), r.p_size)
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in pts
        )

    want = {p[0] for p in pts if not dominated(p)}
    got = {r.p_partkey for r in q_skyline_2d(spark, SF).collect()}
    assert got == want and got  # non-empty frontier


def test_link_prediction_laws(spark):
    """Predicted pairs are never existing edges; scores are valid
    Jaccards; the list is the true global top-k under the total order."""
    from cs744_big_data_system_spark.workloads.curation2 import (
        _LINKPRED_K,
        q_graph_link_prediction,
    )
    from cs744_big_data_system_spark.workloads.streaming_graph import _hash_graph

    edges = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in _hash_graph(spark).collect()
        if r.src != r.dst
    }
    out = q_graph_link_prediction(spark, SF).collect()
    assert len(out) == _LINKPRED_K
    seen = set()
    for r in out:
        assert (r.u, r.w) not in edges
        assert r.u < r.w and (r.u, r.w) not in seen
        seen.add((r.u, r.w))
        assert 1 <= r.common <= r.union_cnt
        assert r.score_ppm == int(math.floor(1e6 * r.common / r.union_cnt + 0.5))
    scores = [(-r.score_ppm, r.u, r.w) for r in out]
    assert scores == sorted(scores)


def test_data_card_totals_match_table(spark):
    """The datasheet's volume columns must reconcile exactly with the
    raw table; dup_docs counts docs beyond the first per identical text."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation2 import q_data_card_report

    docs = load_table(spark, SF, "documents").collect()
    out = {r.source: r for r in q_data_card_report(spark, SF).collect()}
    import collections

    per = collections.defaultdict(list)
    for d in docs:
        per[d.source].append(d)
    assert set(out) == set(per)
    for src, rows in per.items():
        r = out[src]
        assert r.n_docs == len(rows)
        assert r.total_chars == sum(d.n_chars for d in rows)
        assert r.n_langs == len({d.lang for d in rows})
        texts = collections.Counter(d.text for d in rows)
        assert r.dup_docs == sum(c - 1 for c in texts.values())
        lang_counts = collections.Counter(d.lang for d in rows)
        best = min(((-n, l) for l, n in lang_counts.items()))
        assert r.top_lang == best[1]


def test_stream_data_card_equals_batch(spark):
    """The streaming card's final emission per source equals the batch
    datasheet on every mergeable column (online/offline agreement)."""
    from cs744_big_data_system_spark.workloads.curation2 import (
        q_data_card_report,
        q_stream_data_card_replay,
    )

    batch = {
        r.source: (r.n_docs, r.total_chars, r.total_tokens, r.n_langs, r.top_lang)
        for r in q_data_card_report(spark, SF).collect()
    }
    stream = {
        r.source: (r.n_docs, r.total_chars, r.total_tokens, r.n_langs, r.top_lang)
        for r in q_stream_data_card_replay(spark, SF).collect()
    }
    assert stream == batch


def test_scd2_asof_totals_and_validity(spark):
    """Every line item lands in exactly one bucket (totals reconcile),
    and a driver-side recount of as-of statuses agrees."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation2 import q_scd2_asof_lookup

    out = q_scd2_asof_lookup(spark, SF).collect()
    n_items_total = sum(r.n_items for r in out)
    n_li = load_table(spark, SF, "lineitem").count()
    assert n_items_total == n_li

    # driver-side as-of recount
    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderstatus, r.o_orderdate)
        for r in load_table(spark, SF, "orders").collect()
    }
    import collections

    runs = collections.defaultdict(list)  # cust -> [(date, status, okey)]
    for okey, (cust, status, od) in orders.items():
        runs[cust].append((od, okey, status))
    dim = collections.defaultdict(list)  # cust -> [(from, to, status)]
    for cust, rows in runs.items():
        rows.sort()
        # keep rows where status differs from the previous row's status
        changes, prev = [], None
        for d, k, s in rows:
            if prev is None or s != prev:
                changes.append((d, s))
            prev = s
        for i, (d, s) in enumerate(changes):
            to = changes[i + 1][0] if i + 1 < len(changes) else None
            dim[cust].append((d, to, s))
    want = collections.Counter()
    for r in load_table(spark, SF, "lineitem").collect():
        cust, _, _ = orders[r.l_orderkey]
        ship = r.l_shipdate.date() if hasattr(r.l_shipdate, "date") else r.l_shipdate
        hit = "<none>"
        for frm, to, s in dim[cust]:
            frm_d = frm.date() if hasattr(frm, "date") else frm
            to_d = to.date() if (to is not None and hasattr(to, "date")) else to
            if frm_d <= ship and (to_d is None or ship < to_d):
                hit = s
                break
        want[hit] += 1
    got = {r.status_asof: r.n_items for r in out}
    assert got == dict(want)


def test_psi_zero_on_identical_slices(spark):
    """PSI terms are ~0 when reference and current are the SAME slice,
    and the registry query's bins partition the full event count."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation2 import q_quantile_drift_psi

    out = q_quantile_drift_psi(spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    assert sum(r.n_ref + r.n_cur for r in out) == n_events
    assert len(out) == 10 and [r.bin for r in out] == list(range(10))
    # identical-slice PSI: p == q term-by-term => every term exactly 0
    ev = load_table(spark, SF, "events")
    from pyspark.sql import functions as F2
    from cs744_big_data_system_spark.ml.naive_bayes import _q_ln

    # p == q algebraically -> (p-q)=0 -> term 0; assert the floor trick
    # can't produce a stray -1 (floor(0 + 0.5) == 0)
    assert all(
        r.psi_term_micro == 0
        for r in out
        if (r.n_ref + 1) * (sum(x.n_cur for x in out) + 10)
        == (r.n_cur + 1) * (sum(x.n_ref for x in out) + 10)
    )


def test_pipe_syntax_equals_dataframe_q1(spark):
    """The pipe-syntax Q1 must return exactly the DataFrame Q1's rows —
    front-end parity, not a reimplementation."""
    from cs744_big_data_system_spark.workloads.curation2 import q_sql_pipe_syntax
    from cs744_big_data_system_spark.workloads.relational import q_agg_sums_q1

    a = {tuple(r) for r in q_sql_pipe_syntax(spark, SF).collect()}
    b = {tuple(r) for r in q_agg_sums_q1(spark, SF).collect()}
    assert a == b


def test_observe_metrics_and_parameterized_sql(spark):
    """Two small Spark 4 API surfaces used by monitoring harnesses:
    df.observe() metrics must equal the equivalent aggregates, and
    named-parameter SQL must bind literals (no string splicing)."""
    from pyspark.sql import functions as F2

    from cs744_big_data_system_spark.sources.readers import load_table

    li = load_table(spark, SF, "lineitem")
    observed = li.observe(
        "m", F2.count(F2.lit(1)).alias("rows"), F2.round(F2.sum("l_quantity"), 4).alias("qty")
    )
    collected = observed.collect()
    want_rows = len(collected)
    want_qty = round(sum(r.l_quantity for r in collected), 4)
    row = li.agg(F2.count(F2.lit(1)), F2.round(F2.sum("l_quantity"), 4)).collect()[0]
    assert (want_rows, want_qty) == (row[0], round(row[1], 4))

    out = spark.sql(
        "SELECT count(*) AS n FROM {t} WHERE l_quantity >= :q",
        args={"q": 25},
        t=li,
    ).collect()[0]
    want = li.filter(F2.col("l_quantity") >= 25).count()
    assert out.n == want


def test_audio_frame_features_golden(spark):
    """Frame RMS/ZCR must equal a pure-Python recompute from the same
    md5-derived PCM bytes, for every frame of a sampled asset."""
    import hashlib
    import math as m
    import struct

    from cs744_big_data_system_spark.workloads.curation2 import (
        _AUDIO_FRAME,
        _AUDIO_SAMPLES,
        q_audio_frame_features,
    )

    out = q_audio_frame_features(spark, SF).collect()
    assert out
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.asset_id, {})[r.frame_idx] = (r.rms, r.n_zero_cross)
    aid = min(by_asset)
    pcm = b"".join(
        bytes.fromhex(hashlib.md5(f"{aid}:au{i}".encode()).hexdigest())
        for i in range(_AUDIO_SAMPLES * 2 // 16)
    )
    # _decode_wav normalizes 16-bit PCM to [-1, 1]
    samples = [x / 32768.0 for x in struct.unpack(f"<{_AUDIO_SAMPLES}h", pcm)]
    n_frames = _AUDIO_SAMPLES // _AUDIO_FRAME
    assert set(by_asset[aid]) == set(range(n_frames))
    for f in range(n_frames):
        fr = samples[f * _AUDIO_FRAME : (f + 1) * _AUDIO_FRAME]
        want_rms = round(m.sqrt(sum(x * x for x in fr) / len(fr)), 6)
        want_zcr = sum(1 for a, b in zip(fr, fr[1:]) if (a < 0) != (b < 0))
        got_rms, got_zcr = by_asset[aid][f]
        assert abs(got_rms - want_rms) < 1e-9, (f, got_rms, want_rms)
        assert got_zcr == want_zcr, (f, got_zcr, want_zcr)


def test_cluster_stats_reconcile_with_clusters(spark):
    """Histogram totals must reconcile with the raw cluster table, and
    keep-one-per-cluster removable counts with dedup_keep_best."""
    from cs744_big_data_system_spark.workloads.curation2 import q_dedup_cluster_stats
    from cs744_big_data_system_spark.workloads.llm import q_dedup_clusters

    clusters = q_dedup_clusters(spark, SF).collect()
    stats = q_dedup_cluster_stats(spark, SF).collect()
    assert sum(r.n_docs for r in stats) == len(clusters)
    assert sum(r.n_clusters for r in stats) == len({r.cluster_id for r in clusters})
    for r in stats:
        assert r.n_removable == r.n_docs - r.n_clusters
        assert r.n_docs == r.cluster_size * r.n_clusters
