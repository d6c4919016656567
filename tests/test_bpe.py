"""Golden tests for the BPE merge trainer: the distributed merge
sequence must equal an independent pure-Python reference (Sennrich
et al. 2016 word-level BPE with the same lexicographic tie-break)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def _ref_bpe(word_counts: dict[str, int], k: int):
    """Dictionary-based reference implementation."""
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # max count, ties broken lexicographically ascending
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_on_classic_corpus(spark):
    from cs744_big_data_system_spark.operators.bpe import bpe_train

    # the classic Sennrich example corpus
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = bpe_train(docs, num_merges=6)
    want = _ref_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    assert got == want
    # the famous first merges: ('e','s') then ('es','t') then ('est','</w>')
    assert got[0][:2] == ("e", "s") and got[1][:2] == ("es", "t")


def test_bpe_matches_reference_on_fixture_sample(spark):
    from cs744_big_data_system_spark.operators.bpe import bpe_train
    from cs744_big_data_system_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    texts = [r.text for r in docs.select("text").collect()]
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    got = bpe_train(docs, num_merges=5)
    want = _ref_bpe(counts, 5)
    assert got == want


def test_bpe_tokenize_matches_reference_encode(spark):
    from cs744_big_data_system_spark.operators.bpe import (
        bpe_tokenize,
        bpe_train,
        encode_word,
    )
    from cs744_big_data_system_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    merges = bpe_train(docs, num_merges=6)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in bpe_tokenize(docs, merges).collect()}
    for r in docs.select("doc_id", "text").collect():
        words = [w for w in r.text.lower().split() if w]
        want = sum(len(encode_word(w, ranks)) for w in words)
        assert got[r.doc_id] == (len(words), want)
    # merges compress: BPE tokens strictly fewer than raw characters
    chars = {r.doc_id: r.n for r in docs.select("doc_id", F.length("text").alias("n")).collect()}
    assert all(got[d][1] < chars[d] for d in got)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    ),
)
@settings(
    max_examples=6,  # each example runs num_merges Spark rounds
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_bpe_matches_reference_on_arbitrary_corpora(spark, words):
    """Property twin of the goldens: on ARBITRARY tiny corpora the
    distributed merge sequence must equal the pure-Python reference —
    the goldens pin two fixed corpora, but the tie-break (max count,
    then lexicographic) and the early-stop (count < 2) live exactly in
    the corner cases hypothesis finds (single-char words, repeated
    merges collapsing a whole word, all-unique vocab stopping at 0
    merges)."""
    from cs744_big_data_system_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(" ".join(words),)], ["text"])
    counts = Counter(w for w in " ".join(words).lower().split() if w)
    got = bpe_train(docs, num_merges=4)
    want = _ref_bpe(dict(counts), 4)
    assert got == want


@given(
    train_words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4),
        min_size=1,
        max_size=10,
    ),
    query_word=st.text(alphabet="abc", min_size=1, max_size=8),
)
@settings(max_examples=60, deadline=None)
def test_encode_word_equals_rank_order_application(train_words, query_word):
    """encode_word (merge the lowest-rank adjacent pair repeatedly) and
    the Sennrich reference encoder (apply each merge rule everywhere,
    in rank order) are equivalent algorithms — this pins that
    equivalence on arbitrary merge tables and query words, including
    words with characters never seen in training ('c') and words that
    collapse entirely. Pure-Python: bpe_tokenize's UDF shares
    encode_word, so this is the independent leg its test lacks."""
    from cs744_big_data_system_spark.operators.bpe import encode_word

    counts = Counter(train_words)
    merges = _ref_bpe(dict(counts), 6)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    # reference: apply merges one at a time, rank order, whole word
    syms = list(query_word) + ["</w>"]
    for left, right, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    assert encode_word(query_word, ranks) == syms
