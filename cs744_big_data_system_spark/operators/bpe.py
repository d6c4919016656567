"""Byte-pair-encoding merge training over a document corpus — the
tokenizer-construction step of an LLM data pipeline (public algorithm:
Sennrich et al. 2016, word-level BPE; no reference file to cite).

Scale design — why this survives 100 TB of text:
  * the corpus is scanned ONCE, into a (word, count) vocabulary table
    (one hash shuffle). Every merge iteration then runs on the vocab
    table, whose size is |distinct words| — millions, not billions —
    and independent of corpus row count;
  * each iteration is: explode adjacent symbol pairs weighted by word
    count → one aggregation → a 1-row argmax collected to the driver
    (the merge decision IS driver state, exactly like the k-means
    centroid update) → apply the merge to the vocab's symbol arrays;
  * the merge application is an Arrow-batched pandas UDF over the
    vocab table only — Python touches |V| rows per round, never the
    corpus;
  * the vocab table is localCheckpoint'd per round (same lineage-
    truncation discipline as graph/pagerank.py).

Deterministic: ties on pair count break lexicographically, so the
merge sequence is reproducible on any cluster layout — golden-tested
on a corpus with hand-computed merges.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(symbols: array<string>, n: long) — whitespace words split into
    character symbols with an end-of-word marker, weighted by corpus
    frequency."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    # chars + '</w>' marker, all JVM-side. Caveat: the Java regex
    # '(?!$)' splits on UTF-16 code units, so non-BMP characters
    # (emoji, rare CJK) become surrogate-pair halves here while the
    # pure-Python reference sees whole code points — merge tables
    # learned over non-BMP text diverge from Sennrich-reference output
    # (BMP text, the tested domain, is identical).
    return vocab.select(
        F.concat(
            F.split(F.col("word"), "(?!$)"), F.array(F.lit("</w>"))
        ).alias("symbols"),
        "n",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count — one explode +
    one aggregation over the vocab table."""
    pairs = vocab.select(
        "n",
        F.explode(
            F.expr(
                "transform(slice(symbols, 1, size(symbols) - 1), "
                "(s, i) -> struct(s AS left, symbols[i + 1] AS right))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("n").alias("cnt"))


def _apply_merge_udf(lft: str, rgt: str):
    """Arrow-batched merge of one adjacent pair inside symbol arrays.
    The pair rides the serialized closure (two short strings — no
    broadcast machinery needed; the UDF is rebuilt per round like the
    k-means centroid literals)."""
    merged = lft + rgt

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(symbols: pd.Series) -> pd.Series:
        def merge_one(syms):
            out, i = [], 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == lft and syms[i + 1] == rgt:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return symbols.map(merge_one)

    return apply_merge


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, count)]
    in merge order."""
    vocab = _word_vocab(docs, text_col).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0].cnt < 2:
            break
        left, right, cnt = best[0].left, best[0].right, best[0].cnt
        merges.append((left, right, int(cnt)))
        vocab = vocab.select(
            _apply_merge_udf(left, right)("symbols").alias("symbols"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "step long, left string, right string, cnt long",
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE encode: repeatedly merge the lowest-rank adjacent
    pair present. Pure function shared by the distributed tokenizer
    and the tests' reference path."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document under the learned
    merge table. The merge ranks ride the UDF closure (a few dozen
    string pairs); encoding memoizes per distinct word inside each
    Arrow batch, so the per-row cost is a dict hit for all but the
    first occurrence — this is the one corpus-wide Python pass, and
    it is batch-vectorized."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    @F.pandas_udf("long")
    def n_bpe(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def count(text):
            total = 0
            for w in text.lower().split():
                if not w:
                    continue
                if w not in memo:
                    memo[w] = len(encode_word(w, ranks))
                total += memo[w]
            return total

        return texts.map(count)

    # F.split on an empty string yields one empty element ("" → [""]),
    # which would count 1 word where the Python-side token count sees 0
    # — guard whitespace-only text to 0 so the two columns agree.
    trimmed = F.trim(F.lower(F.col(text_col)))
    words = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    return docs.select(
        id_col,
        words.cast("long").alias("n_words"),
        n_bpe(text_col).alias("n_bpe_tokens"),
    )
