"""Property-based tests (hypothesis), operator-vs-brute-force module:
operators must agree with plain
Python brute force on arbitrary small inputs — the cases a fixed
fixture never covers (ties, empties, single-element groups, extreme
gaps)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user_id
            st.integers(min_value=0, max_value=7200),   # seconds offset
        ),
        min_size=1,
        max_size=25,
    ),
    gap_minutes=st.sampled_from([1, 5, 30]),
)
@settings(**_SETTINGS)
def test_sessionize_matches_bruteforce(spark, events, gap_minutes):
    from cs744_big_data_system_spark.operators.relational import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = {
        (r.event_id): r.session_id
        for r in sessionize(df, gap_minutes=gap_minutes).collect()
    }

    # brute force: per user, sorted by (ts, event_id), new session when
    # gap strictly exceeds gap_minutes
    expected = {}
    by_user: dict[int, list] = {}
    for i, u, ts in rows:
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > gap_minutes * 60:
                sid += 1
            expected[i] = sid
            prev = ts
    assert got == expected


@given(
    vals=st.lists(
        st.tuples(st.sampled_from(["a", "b", "hot"]), st.integers(-100, 100)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_salted_sum_property(spark, vals):
    from cs744_big_data_system_spark.operators.skew import salted_sum

    df = spark.createDataFrame([(k, float(v)) for k, v in vals], ["k", "v"])
    got = {r.k: r.s for r in salted_sum(df, ["k"], "v", buckets=4, out_col="s").collect()}
    expected: dict[str, float] = {}
    for k, v in vals:
        expected[k] = expected.get(k, 0.0) + v
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_connected_components_property(spark, edges):
    from cs744_big_data_system_spark.graph.connected_components import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.component for r in connected_components(df, max_iterations=25).collect()}

    # brute force union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}
    # canonicalize union-find roots to component minimum
    comp_min: dict[int, int] = {}
    for n, r in expected.items():
        comp_min[find(r)] = min(comp_min.get(find(r), n), n)
    expected = {n: comp_min[find(n)] for n in expected}
    assert got == expected


@given(
    docs=st.lists(
        st.integers(min_value=0, max_value=40),  # token count per doc
        min_size=1,
        max_size=20,
    ),
    budget=st.sampled_from([4, 16, 64]),
)
@settings(**_SETTINGS)
def test_pack_sequences_conserves_tokens(spark, docs, budget):
    """Packing is a bijection onto the token stream: per (lang, shard)
    offsets are the prefix sums of token counts in doc_id order, and
    chunk spans cover exactly [offset, offset + n_tokens)."""
    from cs744_big_data_system_spark.operators.text_analysis import pack_sequences

    rows = [(i, " ".join(["w"] * n), "en", "s", 1) for i, n in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = sorted(pack_sequences(df, budget=budget, n_shards=3).collect(),
                 key=lambda r: r.doc_id)
    pos = {}
    for r in out:
        key = (r.lang, r.shard)
        assert r.tok_offset == pos.get(key, 0)
        lo, hi = r.tok_offset, r.tok_offset + max(r.n_tokens, 1) - 1
        assert r.chunk_first == lo // budget
        assert r.n_chunks == hi // budget - lo // budget + 1
        pos[key] = r.tok_offset + r.n_tokens
    assert sum(docs) == sum(pos.values())


@given(
    texts=st.lists(
        st.text(alphabet="abc @.-+0123456789\n", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_pii_redact_idempotent(spark, texts):
    """Redaction is idempotent on arbitrary near-PII soup: a second
    pass over redacted text finds nothing and changes nothing."""
    from cs744_big_data_system_spark.operators.text_analysis import (
        PII_EMAIL,
        PII_IP,
        PII_PHONE,
    )
    from cs744_big_data_system_spark.operators.text_analysis import pii_redact

    rows = [(i, t, "en", "s", 1) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    first = {r.doc_id: r for r in pii_redact(df).collect()}
    scrubbed = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
                PII_PHONE,
                "<PHONE>",
            ),
            PII_IP,
            "<IP>",
        ).alias("text"),
    )
    second = {r.doc_id: r for r in pii_redact(scrubbed).collect()}
    for d in first:
        assert second[d].n_emails == second[d].n_phones == second[d].n_ips == 0
        assert second[d].redacted_fp == first[d].redacted_fp


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=14),
        min_size=1,
        max_size=8,
    ),
    n=st.sampled_from([2, 3]),
)
@settings(**_SETTINGS)
def test_substring_coverage_matches_bruteforce(spark, docs, n):
    """dup_share/dup_tokens agree with a plain-Python positional-window
    scan + interval union, on arbitrary tiny corpora (within-doc
    repeats, empty docs, all-identical docs)."""
    from cs744_big_data_system_spark.operators.dedup import substring_dup_coverage

    rows = [(i, " ".join(f"t{w}" for w in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in substring_dup_coverage(df, n=n).collect()}

    # brute force
    from collections import Counter

    grams: Counter = Counter()
    per_doc: dict[int, list] = {}
    for i, toks in enumerate(docs):
        gs = [tuple(toks[p : p + n]) for p in range(len(toks) - n + 1)]
        per_doc[i] = gs
        grams.update(gs)
    for i, toks in enumerate(docs):
        dup_pos = [p for p, g in enumerate(per_doc[i]) if grams[g] >= 2]
        covered: set[int] = set()
        for p in dup_pos:
            covered.update(range(p, p + n))
        assert got[i].n_tokens == len(toks)
        assert got[i].n_dup_grams == len(dup_pos)
        assert got[i].dup_tokens == len(covered)
        if len(toks):
            assert abs(got[i].dup_share - round(len(covered) / len(toks), 6)) < 1e-9


@given(
    batches=st.lists(
        st.lists(st.integers(min_value=0, max_value=99), min_size=1, max_size=6),
        min_size=1,
        max_size=4,
    ),
)
@settings(**_SETTINGS)
def test_txlog_append_read_roundtrip_law(spark, batches):
    """Reading version k returns exactly the concatenation (as a
    multiset) of appends 0..k — for any append sequence."""
    import shutil
    import tempfile

    from cs744_big_data_system_spark.sources.txlog import txlog_append, txlog_read

    path = tempfile.mkdtemp(prefix="txlog_prop_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        for b in batches:
            txlog_append(
                spark.createDataFrame([(x,) for x in b], ["v"]), path
            )
        for k in range(len(batches)):
            got = sorted(r.v for r in txlog_read(spark, path, k).collect())
            want = sorted(x for b in batches[: k + 1] for x in b)
            assert got == want
    finally:
        shutil.rmtree(path, ignore_errors=True)


@given(
    series=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=30,
    ),
    alpha=st.sampled_from([0.1, 0.3, 0.5, 0.9]),
)
@settings(**_SETTINGS)
def test_ewma_prefix_identity_matches_recursion(spark, series, alpha):
    """The windowed prefix-sum EWMA equals the textbook sequential
    recursion for arbitrary series and alphas (quantized at 4 dp with
    the operator's own floor convention)."""
    import math

    from cs744_big_data_system_spark.operators.timeseries import ewma

    rows = [(1, i, float(x)) for i, x in enumerate(series)]
    df = spark.createDataFrame(rows, ["k", "seq", "x"])
    got = {r.seq: r.ewma for r in ewma(df, "k", "seq", "x", alpha=alpha).collect()}
    y = None
    for i, x in enumerate(series):
        y = float(x) if y is None else (1 - alpha) * y + alpha * float(x)
        want = math.floor(y * 10000 + 0.5 + 1e-9) / 10000
        assert abs(got[i] - want) < 5e-4, (i, got[i], want)


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", "cc"]),  # lang
            st.lists(
                st.sampled_from(["t0", "t1", "t2", "t3", "t4", "t5"]),
                min_size=0,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=15,
    ),
)
@settings(**_SETTINGS)
def test_naive_bayes_matches_quantized_bruteforce(spark, docs):
    """The NB confusion matrix must equal a pure-Python reimplementation
    of the SAME quantized math on arbitrary corpora — vocab-count ties,
    empty docs, single-class corpora, out-of-vocab-only docs."""
    import math

    from cs744_big_data_system_spark.ml.naive_bayes import naive_bayes_confusion

    V = 4  # small vocab to force cutoffs and ties
    rows = [
        (i, " ".join(toks), lang, "s", 1) for i, (lang, toks) in enumerate(docs)
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {
        (r.actual_lang, r.pred_lang): r.n_docs
        for r in naive_bayes_confusion(sdf, vocab_size=V).collect()
    }

    def qln(x):
        return math.floor(math.log(x) * 1_000_000 + 0.5 + 1e-9)

    corpus = [(lang, toks) for lang, toks in docs]
    counts: dict[str, int] = {}
    for _, toks in corpus:
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    vocab = [t for t in sorted(counts, key=lambda t: (-counts[t], t))[:V]]
    langs = sorted({lang for lang, _ in corpus})
    n_docs = {l: sum(1 for lg, _ in corpus if lg == l) for l in langs}
    total = len(corpus)
    prior = {l: qln(n_docs[l] * 1.0 / total) for l in langs}
    tc = {
        (l, t): sum(tk.count(t) for lg, tk in corpus if lg == l)
        for l in langs
        for t in vocab
    }
    tot_c = {l: sum(tc[(l, t)] for t in vocab) for l in langs}
    lp = {(l, t): qln((tc[(l, t)] + 1.0) / (tot_c[l] + V)) for l in langs for t in vocab}
    want: dict[tuple[str, str], int] = {}
    for lang, toks in corpus:
        scores = {
            l: prior[l] + sum(lp[(l, t)] for t in toks if t in vocab) for l in langs
        }
        pred = min(langs, key=lambda l: (-scores[l], l))
        want[(lang, pred)] = want.get((lang, pred), 0) + 1
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),            # user_id
            st.integers(min_value=0, max_value=20),           # seconds offset (forces ties)
            st.sampled_from(["click", "view", "purchase"]),
        ),
        min_size=1,
        max_size=20,
    ),
)
@settings(**_SETTINGS)
def test_attribution_matches_bruteforce_under_ties(spark, events):
    """Co-timed touches and purchases must resolve identically to the
    brute force's (ts, event_id) ordering — the case fixtures with
    microsecond timestamps never exercise."""
    from cs744_big_data_system_spark.workloads import pipeline_ext as pe

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=off), uid, et, 0.0, "{}")
        for i, (uid, off, et) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = pe.load_table
    try:
        pe.load_table = lambda s, d, t: ev
        got = {
            r.purchase_event_id: (r.touch_event_id, r.touch_type, r.latency_s)
            for r in pe.q_attribution_last_touch(spark, "unused").collect()
        }
    finally:
        pe.load_table = orig

    want = {}
    for uid in {u for u, _, _ in events}:
        seq = sorted(
            (off, i, et)
            for i, (u, off, et) in enumerate(events)
            if u == uid
        )
        last = None
        for off, i, et in seq:
            if et == "purchase":
                if last is not None:
                    want[i] = (last[1], last[2], off - last[0])
            else:
                last = (off, i, et)
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),   # user_id
            st.integers(min_value=0, max_value=5),   # seconds offset (ties!)
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=12,
    ),
)
@settings(**_SETTINGS)
def test_session_paths_match_bruteforce_under_ties(spark, events):
    """array_sort(struct(ts, event_id, type)) must linearize co-timed
    events exactly like the brute force's (ts, event_id) sort."""
    import collections

    from cs744_big_data_system_spark.workloads import pipeline_ext as pe

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=off), uid, et, 0.0, "{}")
        for i, (uid, off, et) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = pe.load_table
    try:
        pe.load_table = lambda s, d, t: ev
        got = [
            (r.path, r.n_sessions)
            for r in pe.q_session_path_topk(spark, "unused").collect()
        ]
    finally:
        pe.load_table = orig

    per_user = collections.defaultdict(list)
    for i, (uid, off, et) in enumerate(events):
        per_user[uid].append((off, i, et))
    counts = collections.Counter(
        ">".join(et for _, _, et in sorted(seq)) for seq in per_user.values()
    )
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


@given(
    baskets=st.lists(
        st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=4),
        min_size=1,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_item_cf_matches_bruteforce(spark, baskets):
    """Item-CF neighbors on arbitrary baskets — duplicate items within
    a basket, cosine ties, and sub-threshold pairs."""
    import itertools
    import math
    from collections import Counter, defaultdict

    from cs744_big_data_system_spark.workloads import pipeline_ext as pe

    rows = [(o, p) for o, ps in enumerate(baskets) for p in ps]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    orig = pe.load_table
    try:
        pe.load_table = lambda s, d, t: li
        got = [
            (r.p1, r.rn, r.p2, r.n_co, r.sim)
            for r in pe.q_item_cf_topk(spark, "unused").collect()
        ]
    finally:
        pe.load_table = orig

    dedup = [sorted(set(ps)) for ps in baskets]
    cnt = Counter(p for ps in dedup for p in ps)
    co = defaultdict(int)
    for ps in dedup:
        for x, y in itertools.permutations(ps, 2):
            co[(x, y)] += 1
    want = []
    for p1 in sorted(cnt):
        nbrs = [
            (p2, co[(p1, p2)], round(co[(p1, p2)] / math.sqrt(cnt[p1] * cnt[p2]), 6))
            for p2 in cnt
            if p2 != p1 and co[(p1, p2)] >= 2
        ]
        nbrs.sort(key=lambda t: (-t[2], t[0]))
        for rn, (p2, n_co, sim) in enumerate(nbrs[:5], 1):
            want.append((p1, rn, p2, n_co, sim))
    assert got == want


@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=48),            # signup hour
            st.one_of(st.none(), st.integers(min_value=0, max_value=72)),  # purchase delay
        ),
        min_size=1,
        max_size=12,
    ),
)
@settings(**_SETTINGS)
def test_survival_km_matches_bruteforce(spark, users):
    """KM curve on arbitrary cohorts — tied durations, all-censored,
    zero-hour conversions, and the everyone-converts-at-t day."""
    from collections import Counter

    from cs744_big_data_system_spark.workloads import pipeline_ext as pe

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    horizon = base + dt.timedelta(hours=200)
    for uid, (s_h, p_delay) in enumerate(users):
        eid += 1
        rows.append((eid, base + dt.timedelta(hours=s_h), uid, "signup", 0.0, "{}"))
        if p_delay is not None:
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=s_h + p_delay), uid, "purchase", 0.0, "{}")
            )
    eid += 1
    rows.append((eid, horizon, 9999, "view", 0.0, "{}"))  # pin the stream end
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = pe.load_table
    try:
        pe.load_table = lambda s, d, t: events
        got = [
            (r.duration_h, r.deaths, r.at_risk, r.survival)
            for r in pe.q_survival_km(spark, "unused").collect()
        ]
    finally:
        pe.load_table = orig

    # brute-force KM (user 9999 has no signup -> excluded)
    lifetimes = []
    for uid, (s_h, p_delay) in enumerate(users):
        if p_delay is not None:
            lifetimes.append((p_delay, 0))
        else:
            lifetimes.append((200 - s_h, 1))
    per_t = Counter()
    deaths = Counter()
    for d, cens in lifetimes:
        per_t[d] += 1
        if not cens:
            deaths[d] += 1
    n = len(lifetimes)
    s_val, want = 1.0, []
    hit_zero = False
    for t in sorted(per_t):
        at_risk = n
        d = deaths.get(t, 0)
        if d:
            if d == at_risk:
                hit_zero = True
            if not hit_zero:
                s_val *= 1 - d / at_risk
            want.append((t, d, at_risk, 0.0 if hit_zero else round(s_val, 6)))
        n -= per_t[t]
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-5, (g, w)


@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=7200),  # seconds; forces minute ties
        min_size=1,
        max_size=18,
    ),
)
@settings(**_SETTINGS)
def test_peak_concurrency_two_level_equals_flat_sweep(spark, offsets):
    """The bucketed two-level sweep must equal the flat event-level
    sweep on arbitrary inputs — co-timed starts/ends, endpoints landing
    exactly on minute boundaries, and TTL intervals spanning buckets."""
    from cs744_big_data_system_spark.workloads import pipeline_ext as pe

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=off), 1, "click", 0.0, "{}")
        for i, off in enumerate(offsets)
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = pe.load_table
    try:
        pe.load_table = lambda s, d, t: events
        got = {
            r.day: r.peak_concurrency
            for r in pe.q_peak_concurrency(spark, "unused").collect()
        }
    finally:
        pe.load_table = orig

    ttl = pe._CONC_TTL_S
    endpoints = sorted(
        [(off, 1, i) for i, off in enumerate(offsets)]
        + [(off + ttl, -1, i) for i, off in enumerate(offsets)]
    )
    cur, peak = 0, 0
    for _, d, _i in endpoints:
        cur += d
        peak = max(peak, cur)
    # all events fall on 2024-01-01 (offsets < 2h + 5min TTL)
    assert got["2024-01-01"] == peak, (got, endpoints)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=30).map(
            lambda toks: " ".join(toks)
        ),
        min_size=1,
        max_size=4,
    ),
    window=st.sampled_from([2, 4]),
)
@settings(**_SETTINGS)
def test_winnowing_matches_pure_python_reference(spark, docs, window):
    """Winnowing over arbitrary small-alphabet docs (heavy hash ties —
    the tie-break stress case) must equal the rightmost-min reference."""
    import hashlib

    from cs744_big_data_system_spark.operators.text_analysis import (
        winnowing_fingerprints,
    )

    k = 2

    def py_winnow(text):
        toks = text.lower().split()
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        out = set()
        for e in range(window - 1, len(hs)):
            win = hs[e - window + 1 : e + 1]
            m = min(win)
            pos = e - window + 1 + max(i for i, v in enumerate(win) if v == m)
            out.add((pos, m))
        return out

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {}
    for r in winnowing_fingerprints(df, k=k, window=window).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    for i, text in enumerate(docs):
        assert got.get(i, set()) == py_winnow(text), (i, text)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("wxyz")), min_size=3, max_size=12).map(
            lambda toks: " ".join(toks)
        ),
        min_size=1,
        max_size=5,
    ),
)
@settings(**_SETTINGS)
def test_ngram_novelty_conservation(spark, docs):
    """Σ n_novel over all docs == |distinct shingles in the corpus|
    (every shingle is first-seen exactly once), and per-doc novelty is
    n_novel / n_shingles."""
    from cs744_big_data_system_spark.operators.text_analysis import ngram_novelty

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    rows = ngram_novelty(df, n=3).collect()
    corpus_shingles = set()
    for text in docs:
        toks = text.lower().split()
        corpus_shingles |= {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    assert sum(r.n_novel for r in rows) == len(corpus_shingles)
    for r in rows:
        assert abs(r.novelty - round(r.n_novel / r.n_shingles, 6)) < 1e-9


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=10),
        min_size=2,
        max_size=6,
    ),
    n_clones=st.integers(min_value=0, max_value=2),
    max_hamming=st.sampled_from([1, 3]),
)
@settings(**_SETTINGS)
def test_simhash_pairs_match_bruteforce_hamming(spark, docs, n_clones, max_hamming):
    """Pigeonhole banding must have recall 1.0 BY THEOREM: any pair
    within the hamming budget agrees exactly on at least one of the
    (max_hamming + 1) bands, so simhash_hamming_pairs must equal the
    brute-force pairwise-hamming filter over the production simhash
    signatures — a band shift/mask bug would silently drop pairs
    (precision is already enforced by the verify step; this pins
    completeness). Clones of doc 0 plant hamming-0 pairs so the
    non-trivial direction is always exercised."""
    from cs744_big_data_system_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    rows = [(i, " ".join(f"t{w}" for w in toks)) for i, toks in enumerate(docs)]
    rows += [
        (len(docs) + j, rows[0][1])  # exact clones: hamming 0 by construction
        for j in range(n_clones)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    sigs = {r.doc_id: r.simhash for r in simhash(df, bits=60).collect()}
    want = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= max_hamming
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_hamming_pairs(df, bits=60, max_hamming=max_hamming).collect()
    }
    assert got == want
    for j in range(n_clones):
        assert (0, len(docs) + j) in got  # planted clones must pair


@given(
    ratings=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # user
            st.integers(min_value=0, max_value=5),   # item
            st.integers(min_value=1, max_value=10),  # rating
        ),
        min_size=1,
        max_size=20,
    ),
)
@settings(**_SETTINGS)
def test_als_half_step_solves_normal_equations(spark, ratings):
    """The ALS half-step is an EXACT per-entity ridge solve: for every
    user u the returned factors must satisfy
    (YuT Yu + reg*n_u*I) xu = YuT ru against the fixed item factors —
    verified with numpy on arbitrary tiny rating sets (duplicate
    (u, i) pairs included: they stack twice in Y, by design). A wrong
    join key, a dropped rating row, or a mis-grouped solve breaks the
    residual; the convergence test alone would only notice eventually."""
    import numpy as np

    from cs744_big_data_system_spark.ml.als import _seed_factors, _solve_side

    rank, reg = 4, 0.1
    r = spark.createDataFrame(ratings, ["u", "i", "r"]).select(
        "u", "i", F.col("r").cast("double").alias("r")
    )
    item_f = _seed_factors(r.select(F.col("i").alias("id")).distinct(), rank)
    got = {
        row.id: np.array(row.f)
        for row in _solve_side(r, "u", "i", item_f, rank, reg).collect()
    }
    items = {row.id: np.array(row.f) for row in item_f.collect()}

    by_user: dict[int, list] = {}
    for u, i, rv in ratings:
        by_user.setdefault(u, []).append((i, float(rv)))
    assert set(got) == set(by_user)
    for u, pairs in by_user.items():
        Y = np.stack([items[i] for i, _ in pairs])
        rv = np.array([x for _, x in pairs])
        A = Y.T @ Y + reg * len(rv) * np.eye(rank)
        resid = A @ got[u] - Y.T @ rv
        assert np.max(np.abs(resid)) < 1e-8, (u, resid)


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-4, max_value=4),
        ),
        min_size=2,
        max_size=16,
    ),
    iterations=st.sampled_from([1, 3]),
)
@settings(**_SETTINGS)
def test_kmeans_matches_numpy_lloyds(spark, vecs, iterations):
    """fit_kmeans must equal a pure-numpy Lloyd's loop with the same
    semantics — init = first-k vectors by id, ties to the lower
    centroid index, emptied clusters keep their previous centroid.
    Integer-valued vectors make every sum exact in float64, so the
    distributed treeAggregate order cannot hide a semantic bug behind
    rounding. Pins the rows-only ml_kmeans_fit entry's kernel."""
    import numpy as np

    from cs744_big_data_system_spark.ml.kmeans import fit_kmeans

    k = 2
    df = spark.createDataFrame(
        [(i, [float(a), float(b), float(c)]) for i, (a, b, c) in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    got_c, got_curve = fit_kmeans(df, k=k, iterations=iterations)

    X = np.array(vecs, dtype=np.float64)
    C = X[:k].copy()
    want_curve = []
    for _ in range(iterations):
        d2 = (X * X).sum(1, keepdims=True) - 2.0 * X @ C.T + (C * C).sum(1)
        asn = d2.argmin(1)
        want_curve.append(float(d2[np.arange(len(asn)), asn].sum()) / len(X))
        for j in range(k):
            if (asn == j).any():
                C[j] = X[asn == j].mean(0)
    assert np.allclose(got_c, C, atol=1e-9), (got_c, C)
    assert np.allclose(got_curve, want_curve, atol=1e-9)
