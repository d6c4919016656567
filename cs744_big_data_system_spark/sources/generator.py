"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-corpus generator.

At 100 TB the standard way to scale-test a pipeline is a GENERATOR
source — no files, no copies; every task synthesizes its own split.
This source is seedless-deterministic (every field is an md5 function
of the doc id, the same construction as operators/dedup.md5_int60), so
two runs — or two engines — produce bit-identical corpora: the
workload reading this source is hash-checked against a DuckDB oracle
that RE-DERIVES the generation in SQL (workloads/llm.py::
SQL_SYNTHDOCS_PROFILE), which is only possible because generation is
pure hashing, not a stateful RNG.

Usage::

    spark.dataSource.register(SynthDocsDataSource)
    spark.read.format("synthdocs").option("n", 500).option("partitions", 8).load()

Scale shape: ``partitions`` input splits, each generating its disjoint
id range independently — embarrassingly parallel, zero shuffle, zero
I/O; cost scales with rows/partition, memory is one row at a time
(the reader yields).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Fixed 40-word vocabulary; embedded identically in the SQL oracle.
VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "amber", "birch",
    "cedar", "dune", "ember", "fjord", "grove", "harbor", "isle",
    "jade", "knoll", "lagoon", "mesa", "nectar",
]

LANGS = ["en", "de", "es", "fr", "zh"]


def _md5_int60(s: str) -> int:
    """Same 60-bit md5 fold as operators/dedup.md5_int60 (and the SQL
    mirror _sql_md5_int60)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def doc_fields(doc_id: int) -> tuple[int, str, str, int]:
    """(doc_id, text, lang, n_words) — pure function of the id."""
    n_words = 5 + _md5_int60(f"len:{doc_id}") % 20
    words = [VOCAB[_md5_int60(f"w:{doc_id}:{j}") % len(VOCAB)] for j in range(n_words)]
    lang = LANGS[_md5_int60(f"lang:{doc_id}") % len(LANGS)]
    return doc_id, " ".join(words), lang, n_words


class SynthDocsDataSource(DataSource):
    """``format("synthdocs")`` — options: n (rows, default 500),
    partitions (input splits, default 8)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, n_words bigint"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(
            n=int(self.options.get("n", 500)),
            num_partitions=int(self.options.get("partitions", 8)),
        )

    def simpleStreamReader(self, schema) -> "SynthDocsStreamReader":
        # Streaming variant: docs arrive in ``batch``-sized waves with a
        # real offset log — a restarted query resumes from the committed
        # doc id (readBetweenOffsets replays exactly the gap), the
        # exactly-once source contract. Under availableNow one wave is
        # processed per run (what read() reports available at start).
        return SynthDocsStreamReader(
            n=int(self.options.get("n", 500)),
            batch=int(self.options.get("batch", 500)),
        )


class SynthDocsReader(DataSourceReader):
    def __init__(self, n: int, num_partitions: int):
        self.n = n
        self.num_partitions = max(1, min(num_partitions, max(1, n)))
        self.lo = 0  # generation bounds [lo, hi), narrowed by pushdown
        self.hi = n

    def partitions(self):
        return [InputPartition(p) for p in range(self.num_partitions)]

    def read(self, partition):
        # Disjoint contiguous id ranges per split over the (possibly
        # pushdown-narrowed) [lo, hi) id range; yield row-at-a-time so
        # memory stays O(1) however large the split.
        p = partition.value
        count = max(0, self.hi - self.lo)
        per = -(-count // self.num_partitions) if count else 0
        start = self.lo + p * per
        for doc_id in range(start, min(start + per, self.hi)):
            yield doc_fields(doc_id)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"next": <first ungenerated doc id>}. Deterministic
    generation makes replay trivially exact: any offset range maps to
    the same rows on every call."""

    def __init__(self, n: int, batch: int):
        self.n = n
        self.batch = max(1, batch)

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = int(start["next"])
        hi = min(lo + self.batch, self.n)
        return iter([doc_fields(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter([doc_fields(i) for i in range(int(start["next"]), int(end["next"]))])


class SynthDocsPushdownDataSource(DataSource):
    """``format("synthdocs_pd")`` — the generator source with FILTER
    PUSHDOWN (Spark 4.1 ``DataSourceReader.pushFilters``): ``doc_id``
    range/equality predicates narrow the GENERATED id range itself, so
    out-of-range rows are never synthesized (a database-backed source
    would translate them into its native query the same way). Kept as
    a SEPARATE format because implementing pushFilters requires
    ``spark.sql.python.filterPushdown.enabled=true`` — callers opt in
    (see tests/test_sources_ml.py), while plain "synthdocs" keeps
    working under any session configuration."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs_pd"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, n_words bigint"

    def reader(self, schema) -> "SynthDocsPushdownReader":
        return SynthDocsPushdownReader(
            n=int(self.options.get("n", 500)),
            num_partitions=int(self.options.get("partitions", 8)),
        )


class SynthDocsPushdownReader(SynthDocsReader):
    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )

        remaining = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, IsNotNull):
                    continue  # generated ids are never null
            remaining.append(f)
        return remaining
