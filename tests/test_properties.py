"""Property-based tests (hypothesis) for the algebraic operators whose
correctness is a law, not an example: MERGE branch totality, SCD-2
interval tiling, salted-top-k == naive-top-k, Z-order bijectivity,
and incremental state-merge associativity.

Strategy sizes are kept small (Spark job per example is expensive);
the laws themselves are exact, so a handful of adversarial examples
beats thousands of rows."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    tgt=st.dictionaries(st.integers(0, 15), st.integers(-100, 100), max_size=8),
    src=st.dictionaries(st.integers(0, 15), st.integers(-100, 100), max_size=8),
)
@_settings
def test_merge_upsert_matches_dict_semantics(spark, tgt, src):
    from cs744_big_data_system_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(k, v) for k, v in tgt.items()] or [(None, None)], "k long, v long"
    ).filter(F.col("k").isNotNull())
    source = spark.createDataFrame(
        [(k, v) for k, v in src.items()] or [(None, None)], "k long, d long"
    ).filter(F.col("k").isNotNull())
    out = merge_upsert(
        target,
        source,
        key="k",
        matched_set={"v": F.col("t.v") + F.col("s.d")},
        not_matched_insert={"v": F.col("s.d")},
    )
    got = {r.k: (r.v, r.merge_action) for r in out.collect()}
    want = {}
    for k, v in tgt.items():
        if k in src:
            want[k] = (v + src[k], "updated")
        else:
            want[k] = (v, "kept")
    for k, d in src.items():
        if k not in tgt:
            want[k] = (d, "inserted")
    assert got == want


@given(
    seq=st.lists(st.sampled_from("ABC"), min_size=1, max_size=10),
)
@_settings
def test_scd2_runs_compress_and_tile(spark, seq):
    import datetime

    from cs744_big_data_system_spark.operators.merge import scd2_history

    base = datetime.datetime(2024, 1, 1)
    changes = spark.createDataFrame(
        [(1, s, base + datetime.timedelta(days=i), i) for i, s in enumerate(seq)],
        "k long, status string, ts timestamp, id long",
    )
    rows = sorted(
        scd2_history(changes, "k", "status", ["ts", "id"]).collect(),
        key=lambda r: r.valid_from,
    )
    # run-length compression: one row per status run
    runs = [s for i, s in enumerate(seq) if i == 0 or s != seq[i - 1]]
    assert [r.status for r in rows] == runs
    # intervals tile: each valid_to is the next valid_from; last open
    for a, b in zip(rows, rows[1:]):
        assert a.valid_to == b.valid_from and not a.is_current
    assert rows[-1].is_current and rows[-1].valid_to == "9999-12-31"


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=30
    ),
    k=st.integers(1, 4),
)
@_settings
def test_salted_topk_law(spark, vals, k):
    """Two-stage salted top-k == naive top-k for ANY data and k (the
    containment law the workload relies on)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(vals)], "g long, id long, v long"
    )
    order = [F.desc("v"), F.asc("id")]
    w1 = Window.partitionBy("g", "salt").orderBy(*order)
    w2 = Window.partitionBy("g").orderBy(*order)
    salted = (
        df.withColumn("salt", F.col("id") % 4)
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
    )
    naive = df.withColumn("rnk", F.row_number().over(w2)).filter(F.col("rnk") <= k)
    assert {(r.g, r.rnk, r.id) for r in salted.collect()} == {
        (r.g, r.rnk, r.id) for r in naive.collect()
    }


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@_settings
def test_zorder_key_is_injective_and_monotone_per_dim(spark, pts):
    from cs744_big_data_system_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 8).alias("z")).collect()
    }
    # injective: distinct points -> distinct keys
    assert len(set(got.values())) == len(pts)
    # exact Morton reference
    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y)


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 5), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
    split=st.integers(0, 30),
)
@_settings
def test_incremental_state_merge_associative(spark, vals, split):
    """(count, sum) partial states merged across an arbitrary split
    equal the unsplit aggregate — the IVM law."""
    a, b = vals[:split], vals[split:]
    schema = "k long, v double"
    full = spark.createDataFrame(vals, schema).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    parts = []
    for chunk in (a, b):
        if chunk:
            parts.append(
                spark.createDataFrame(chunk, schema)
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    merged = merged.groupBy("k").agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    got = {r.k: (r.n, round(r.s, 6)) for r in merged.collect()}
    want = {r.k: (r.n, round(r.s, 6)) for r in full.collect()}
    assert got == want


@given(
    n_tokens=st.integers(0, 40),
    chunk=st.integers(2, 12),
    overlap=st.integers(0, 10),
)
@_settings
def test_chunk_documents_reconstruction_law(spark, n_tokens, chunk, overlap):
    """Dropping each non-first chunk's overlap prefix and concatenating
    must reproduce the original token sequence exactly — chunking loses
    nothing and duplicates only the overlap."""
    from hypothesis import assume

    from cs744_big_data_system_spark.operators.text_analysis import chunk_documents

    assume(overlap < chunk)
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    if not toks:
        assert rows == []
        return
    rebuilt = []
    stride = chunk - overlap
    for r in rows:
        piece = r.chunk_text.split(" ")
        assert len(piece) == r.n_tokens <= chunk
        start = r.chunk_idx * stride
        assert piece == toks[start : start + chunk]  # window content law
        rebuilt.extend(piece if r.chunk_idx == 0 else piece[overlap:] if len(piece) > overlap else [])
    # Reconstruction: the deduped concatenation covers the sequence.
    assert rebuilt[: len(toks)] == toks


@given(
    old=st.dictionaries(st.integers(0, 12), st.one_of(st.none(), st.integers(-5, 5)), max_size=10),
    new=st.dictionaries(st.integers(0, 12), st.one_of(st.none(), st.integers(-5, 5)), max_size=10),
)
@_settings
def test_table_diff_matches_dict_semantics(spark, old, new):
    """table_diff over arbitrary (possibly null-valued) snapshots must
    agree with plain dict comparison, null-safely."""
    from cs744_big_data_system_spark.operators.merge import table_diff

    schema = "k int, v int"
    o = spark.createDataFrame(list(old.items()) or [(None, None)], schema).filter(
        F.col("k").isNotNull()
    )
    n = spark.createDataFrame(list(new.items()) or [(None, None)], schema).filter(
        F.col("k").isNotNull()
    )
    got = {r.k: r.diff_class for r in table_diff(o, n, key="k").collect()}
    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        else:
            want[k] = "unchanged" if old[k] == new[k] else "changed"
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=1,
        max_size=40,
    ),
    max_it=st.sampled_from([20, 40]),
)
@_settings
def test_connected_components_matches_union_find(spark, edges, max_it):
    """CC (min-label propagation + pointer jumping from superstep 3)
    must equal a pure-Python union-find on arbitrary graphs — including
    self-loops, parallel/reversed duplicate edges, and path graphs long
    enough to force the compression branch (graph/connected_components
    .py:110). The fixpoint is algorithm-independent: component id =
    min node id."""
    from cs744_big_data_system_spark.graph.connected_components import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: min(m for m in parent if find(m) == find(n)) for n in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iterations=max_it).collect()
    }
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14), st.integers(1, 9)),
        min_size=1,
        max_size=30,
    ),
)
@_settings
def test_sssp_matches_dijkstra(spark, edges):
    """Frontier-relaxation SSSP (graph/sssp.py) must equal pure-Python
    Dijkstra on arbitrary random weighted digraphs — duplicate edges
    (min weight wins), equal-weight ties, cycles, unreachable nodes
    (absent from the result, like the recursive-CTE oracle)."""
    import heapq

    from cs744_big_data_system_spark.graph.sssp import sssp

    source = edges[0][0]
    adj: dict[int, list[tuple[int, int]]] = {}
    for a, b, w in edges:
        if a != b:
            adj.setdefault(a, []).append((b, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            if d + w < dist.get(v, float("inf")):
                dist[v] = d + w
                heapq.heappush(pq, (d + w, v))

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    res = sssp(df, source=source, max_iters=40)
    got = {r["node"]: r["dist"] for r in res.collect()}
    cached = getattr(res, "cached_links", None)
    if cached is not None:
        cached.unpersist()
    assert got == dist


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=30,
    ),
)
@_settings
def test_bfs_hops_matches_python_bfs(spark, edges):
    """Frontier BFS (graph/bfs.py) must equal a pure-Python BFS on
    arbitrary random digraphs — duplicate/reversed edges, self-loops
    (ignored), cycles, unreachable nodes absent from the result."""
    from collections import deque

    from cs744_big_data_system_spark.graph.bfs import bfs_hops

    source = edges[0][0]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
    hops = {source: 0}
    dq = deque([source])
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in hops:
                hops[v] = hops[u] + 1
                dq.append(v)

    df = spark.createDataFrame(edges, "src long, dst long")
    res = bfs_hops(df, source=source, max_iters=20)
    got = {r["node"]: r["hop"] for r in res.collect()}
    cached = getattr(res, "cached_links", None)
    if cached is not None:
        cached.unpersist()
    assert got == hops


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=30,
    ),
    n_seeds=st.integers(1, 3),
)
@_settings
def test_multi_bfs_matches_per_seed_bfs(spark, edges, n_seeds):
    """Batched multi-seed BFS (one frontier loop for k seeds) must
    equal k independent pure-Python BFS runs — the batching is a pure
    scheduling optimization, never a semantic one."""
    from collections import deque

    from cs744_big_data_system_spark.graph.bfs import multi_bfs_hops

    seeds = sorted({a for a, _ in edges})[:n_seeds]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)

    expected = {}
    for s in seeds:
        hops = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, ()):
                if v not in hops:
                    hops[v] = hops[u] + 1
                    dq.append(v)
        for n, h in hops.items():
            expected[(s, n)] = h

    df = spark.createDataFrame(edges, "src long, dst long")
    res = multi_bfs_hops(df, sources=seeds, max_iters=20)
    got = {(r["seed"], r["node"]): r["hop"] for r in res.collect()}
    cached = getattr(res, "cached_links", None)
    if cached is not None:
        cached.unpersist()
    assert got == expected
