"""Text functions + analysis operators: edge cases (empty text,
punctuation, unicode stopwords) and semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def one(spark, text, expr):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(expr.alias("v")).collect()[0].v


def test_tokens_and_ngrams(spark):
    from cs744_big_data_system_spark.functions.text import token_count, tokens, word_ngrams

    assert one(spark, "a b  c", tokens("text")) == ["a", "b", "c"]
    assert one(spark, "", tokens("text")) == []
    assert one(spark, "   ", tokens("text")) == []
    assert one(spark, "a b  c", token_count("text")) == 3
    assert one(spark, "a b c d", word_ngrams("text", 3)) == ["a b c", "b c d"]
    assert one(spark, "a b", word_ngrams("text", 3)) == []


def test_normalized_text_and_ratios(spark):
    from cs744_big_data_system_spark.functions.text import (
        normalized_text,
        punct_ratio,
        stopword_ratio,
    )

    assert one(spark, "  The   QUICK  fox ", normalized_text("text")) == "the quick fox"
    assert one(spark, "ab!?", punct_ratio("text")) == pytest.approx(0.5)
    assert one(spark, "", punct_ratio("text")) == 0.0
    assert one(spark, "the cat and dog", stopword_ratio("text", "en")) == pytest.approx(0.5)


def test_lang_id_heuristic(spark):
    from cs744_big_data_system_spark.operators.text_analysis import lang_id

    assert one(spark, "the cat and the dog", lang_id("text")) == "en"
    assert one(spark, "der hund und die katze", lang_id("text")) == "de"
    assert one(spark, "le chat et les chiens", lang_id("text")) == "fr"
    assert one(spark, "xyz qrs tuv", lang_id("text")) == "und"
    # tie (la is es+fr): deterministic resolution order de<en<es<fr<zh
    assert one(spark, "la", lang_id("text")) == "es"


def test_quality_features(spark):
    from cs744_big_data_system_spark.operators.text_analysis import quality_features

    rows = [
        (0, "the quick brown fox jumps", "en", "s", 25),
        (1, "!!! ??? ... ###", "en", "s", 15),  # pure punctuation
        (2, "", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.doc_id: r for r in quality_features(df).collect()}
    assert got[0].quality_ok is True and got[0].n_tokens == 5
    assert got[1].quality_ok is False and got[1].punct_ratio > 0.5
    assert got[2].n_tokens == 0 and got[2].mean_token_len == 0.0


def test_fingerprints_stability(spark):
    from cs744_big_data_system_spark.operators.text_analysis import fingerprints

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (1, "ALPHA  beta gamma delta epsilon zeta", "en", "s", 1),  # canonical-equal
        (2, "tiny", "en", "s", 1),  # < 4 tokens → no rolling fp
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.doc_id: r for r in fingerprints(df).collect()}
    assert got[0].content_fp == got[1].content_fp
    assert got[0].rolling_fp == got[1].rolling_fp
    assert got[2].rolling_fp is None


def test_token_counts_bpe_ish(spark):
    from cs744_big_data_system_spark.operators.text_analysis import token_counts

    df = spark.createDataFrame([(0, "don't stop, believing!", "en", "s", 1)],
                               ["doc_id", "text", "lang", "source", "n_chars"])
    r = token_counts(df).collect()[0]
    assert r.ws_tokens == 3
    # don | ' | t | stop | , | believing | ! → 7
    assert r.bpe_ish_tokens == 7


def test_boilerplate_phrases_cross_doc(spark):
    from cs744_big_data_system_spark.operators.text_analysis import boilerplate_phrases

    banner = "this site uses cookies to improve your experience okay"
    rows = [
        (i, f"unique words {i} " + banner, "en", "s", 10) for i in range(3)
    ] + [(9, "totally organic content with no repeats at all here", "en", "s", 10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = boilerplate_phrases(docs, n=6, min_docs=3).collect()
    assert out, "shared banner must be detected"
    assert all(r.n_docs == 3 for r in out)
    assert any("cookies" in r.phrase for r in out)


def test_tfidf_bm25_topk(spark):
    """Known 3-doc corpus: a term unique to one doc must outrank the
    corpus-wide term; tf/df counts are exact; rnk is dense from 1."""
    import math

    from cs744_big_data_system_spark.operators.text_analysis import tfidf_bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "apple banana banana date"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_bm25_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        assert [r.rnk for r in sorted(rows, key=lambda r: r.rnk)] == list(
            range(1, len(rows) + 1)
        )
    # doc 2: "cherry" (df=1) must beat "apple" (df=3, negative bm25 idf).
    d2 = {r.term: r for r in by_doc[2]}
    assert d2["cherry"].rnk == 1 and d2["cherry"].tf == 1 and d2["cherry"].df == 1
    assert d2["apple"].df == 3
    # Spot-check the tfidf formula on (doc 1, apple): tf=2, df=3, N=3.
    d1 = {r.term: r for r in by_doc[1]}
    want = round(2 * (math.log(4.0 / 4.0) + 1.0), 6)
    assert abs(d1["apple"].tfidf - want) < 1e-9


def test_cooccurrence_pmi(spark):
    """4-doc corpus, vocab covers all terms: check df/n_ab and the PMI
    sign — a pair that always co-occurs has pmi > 0, an anti-correlated
    pair is excluded by min_docs."""
    import math

    from cs744_big_data_system_spark.operators.text_analysis import cooccurrence_pmi

    docs = spark.createDataFrame(
        [(i, "x y common") for i in range(4)] + [(9, "z common")],
        ["doc_id", "text"],
    )
    out = {(r.term_a, r.term_b): r for r in cooccurrence_pmi(docs, 8, min_docs=2).collect()}
    assert ("x", "y") in out
    r = out[("x", "y")]
    assert r.df_a == 4 and r.df_b == 4 and r.n_ab == 4
    # pmi = ln(4*5/(4*4)) = ln(1.25)
    assert abs(r.pmi - round(math.log(1.25), 6)) < 1e-9
    assert ("x", "z") not in out  # never co-occur


def test_decontaminate_flags_benchmark_quotes(spark):
    """A train doc quoting a benchmark doc verbatim must be flagged;
    clean docs must report zero contamination (and still appear)."""
    from cs744_big_data_system_spark.operators.text_analysis import decontaminate

    bench_text = "the capital of france is paris and the capital of italy is rome ok"
    clean_text = "completely unrelated words about distributed query engines and shuffles"
    quoting = "intro words then " + bench_text + " closing remark here"
    bench = spark.createDataFrame(
        [(100, bench_text, "en", "b", 1)], ["doc_id", "text", "lang", "source", "n_chars"]
    )
    train = spark.createDataFrame(
        [(1, quoting, "en", "t", 1), (2, clean_text, "en", "t", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r.doc_id: r for r in decontaminate(train, bench, n=6, threshold=0.05).collect()}
    assert got[1].flagged and got[1].n_contaminated > 0
    assert got[1].contamination > 0.3
    assert not got[2].flagged and got[2].n_contaminated == 0
    assert got[2].n_shingles > 0


def test_sample_stratified_deterministic_caps(spark):
    from cs744_big_data_system_spark.operators.text_analysis import sample_stratified

    rows = [(i, f"t{i}", "en" if i % 3 else "de", "s", 1) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    s1 = sorted((r.lang, r.doc_id) for r in sample_stratified(df, "lang", cap=5).collect())
    s2 = sorted((r.lang, r.doc_id) for r in sample_stratified(df, "lang", cap=5).collect())
    assert s1 == s2                     # reproducible
    from collections import Counter
    per = Counter(lang for lang, _ in s1)
    assert per == {"en": 5, "de": 5}    # caps honored per stratum


def test_repetition_features_flags_template_text(spark):
    from cs744_big_data_system_spark.operators.text_analysis import repetition_features

    spam = " ".join(["buy cheap pills now"] * 10)      # one phrase, looped
    normal = "a quick brown fox jumps over the lazy dog near the river bank today"
    df = spark.createDataFrame(
        [(1, spam, "en", "s", 1), (2, normal, "en", "s", 1), (3, "two words", "en", "s", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r.doc_id: r for r in repetition_features(df, n=3, threshold=0.2).collect()}
    assert got[1].repetitive and got[1].repetition_ratio > 0.8
    assert not got[2].repetitive and got[2].repetition_ratio == 0.0
    assert got[3].n_grams == 0 and not got[3].repetitive  # short doc: no grams


def test_pii_redact_counts_and_scrub(spark):
    from cs744_big_data_system_spark.operators.text_analysis import pii_redact

    rows = [
        (1, "mail me at alice.smith+x@sub.example.co.uk thanks", "en", "s", 1),
        (2, "call +1-555-0042 or 44-201-555-9999 today", "en", "s", 1),
        (3, "server at 10.0.255.1 and 192.168.1.34 down", "en", "s", 1),
        (4, "nothing sensitive here", "en", "s", 1),
        (5, "bob@x.io from 10.1.2.3 call +1-555-1234", "en", "s", 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 0 and got[1].n_ips == 0
    assert got[2].n_phones == 2
    assert got[3].n_ips == 2
    assert got[4].n_emails == got[4].n_phones == got[4].n_ips == 0
    assert got[5].n_emails == 1 and got[5].n_phones == 1 and got[5].n_ips == 1
    # scrubbed text carries no residual pattern: re-redacting is a no-op
    red = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    "text",
                    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                    "<EMAIL>",
                ),
                r"\+?\d{1,2}-\d{3}-\d{3,4}(-\d{4})?",
                "<PHONE>",
            ),
            r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
            "<IP>",
        ).alias("text"),
    )
    twice = {r.doc_id: r for r in pii_redact(red).collect()}
    for d in range(1, 6):
        assert twice[d].n_emails == twice[d].n_phones == twice[d].n_ips == 0
        assert twice[d].redacted_fp == got[d].redacted_fp


def test_pack_sequences_invariants(spark):
    from cs744_big_data_system_spark.operators.text_analysis import pack_sequences

    rows = [(i, " ".join(["w"] * (7 * (i % 5) + 1)), "en" if i % 2 else "de", "s", 1)
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = pack_sequences(df, budget=16, n_shards=4).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault((r.lang, r.shard), []).append(r)
    # lang parity couples to shard parity in this fixture: de (even ids)
    # lands in shards {0,2}, en (odd ids) in {1,3}
    assert len(by_shard) == 4
    for rows_ in by_shard.values():
        rows_.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in rows_:
            assert r.tok_offset == pos          # contiguous stream per shard
            assert r.chunk_first == pos // 16
            last = (pos + r.n_tokens - 1) // 16 if r.n_tokens else pos // 16
            assert r.n_chunks == last - pos // 16 + 1
            assert r.n_chunks >= 1
            pos += r.n_tokens


def test_token_histogram_partitions_docs(spark):
    from cs744_big_data_system_spark.operators.text_analysis import token_histogram

    rows = [(i, " ".join(["w"] * (i + 1)), "en", "s", 1) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = token_histogram(df, width=10, n_buckets=3).collect()
    assert sum(r.n_docs for r in out) == 30      # every doc in exactly one bucket
    got = {r.bucket: r for r in out}
    assert got[0].n_docs == 9 and got[0].min_tokens == 1 and got[0].max_tokens == 9
    assert got[2].max_tokens == 30               # open-ended last bucket


def test_domain_mix_weights_rebalance(spark):
    from cs744_big_data_system_spark.operators.text_analysis import domain_mix_weights

    rows = [(i, " ".join(["w"] * (90 if i % 4 == 0 else 10)),
             "en", "big" if i % 4 == 0 else "small", 1) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.source: r for r in domain_mix_weights(df).collect()}
    assert abs(got["big"].token_share + got["small"].token_share - 1.0) < 1e-6
    # rebalancing: under-represented source upweighted, over-represented down
    assert got["small"].mix_weight != got["big"].mix_weight
    assert (got["big"].token_share > 0.5) == (got["big"].mix_weight < 1.0)


def test_bigram_lm_probabilities(spark):
    from cs744_big_data_system_spark.operators.text_analysis import bigram_lm

    # "a b" 6x, "a c" 2x  ->  p(b|a)=0.75, p(c|a)=0.25 (pruned at 2)
    rows = [(i, "a b" if i < 6 else "a c", "en", "s", 1) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {(r.w1, r.w2): r for r in bigram_lm(df, min_count=2).collect()}
    import math

    assert got[("a", "b")].n_big == 6 and got[("a", "b")].n_w1 == 8
    assert got[("a", "b")].logp == pytest.approx(round(math.log(0.75), 6))
    assert got[("a", "c")].logp == pytest.approx(round(math.log(0.25), 6))


def test_perplexity_flags_gibberish(spark):
    from cs744_big_data_system_spark.operators.text_analysis import (
        bigram_lm,
        perplexity_score,
    )

    fluent = "the cat sat on the mat"
    rows = [(i, fluent, "en", "s", 1) for i in range(10)]
    rows.append((99, "zq xv qk jw zz pp qq ww", "en", "s", 1))  # unseen bigrams
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    lm = bigram_lm(df, min_count=2)
    got = {r.doc_id: r for r in perplexity_score(df, lm, threshold=6.0).collect()}
    # "the" branches to cat/mat (p=0.5 each); other bigrams are certain:
    # mean nll = 2*ln(2)/5
    import math

    assert not got[0].flagged
    assert got[0].mean_nll == pytest.approx(round(2 * math.log(2) / 5, 4))
    assert got[99].flagged and got[99].mean_nll == pytest.approx(10.0)  # all backoff


def test_unicode_clean_composes_and_strips(spark):
    from cs744_big_data_system_spark.operators.text_analysis import unicode_clean

    decomposed = "école"          # e + combining acute
    composed = "école"             # é precomposed (NFC form)
    dirty = "a​b\x07c"             # zero-width space + BEL
    docs = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, dirty), (4, "plain")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in unicode_clean(docs).collect()}
    assert got[1].clean_text == composed and got[1].changed
    assert got[2].clean_text == composed and not got[2].changed
    assert got[3].clean_text == "abc" and got[3].changed
    assert got[4].clean_text == "plain" and not got[4].changed
    assert got[1].n_chars_clean == 5


def test_compression_ratio_golden_and_ordering(spark):
    """Scores pinned to direct zlib; repetitive text must compress
    far below prose-like text."""
    import zlib

    from cs744_big_data_system_spark.operators.text_analysis import compression_ratio

    rep = "spam ham " * 200
    prose = " ".join(f"w{i}token{i * 7 % 13}" for i in range(300))
    docs = spark.createDataFrame([(1, rep), (2, prose), (3, "")], ["doc_id", "text"])
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    for d, t in ((1, rep), (2, prose)):
        want = round(len(zlib.compress(t.encode())) / len(t.encode()), 6)
        assert abs(got[d].zlib_ratio - want) < 1e-9
    assert got[1].zlib_ratio < got[2].zlib_ratio / 2
    assert got[3].zlib_ratio == 0.0


def test_feature_hash_matches_hashlib(spark):
    """Buckets, signs, and collision sums must equal a direct hashlib
    recomputation — including two tokens colliding into one bucket."""
    import hashlib
    from collections import defaultdict

    from cs744_big_data_system_spark.operators.text_analysis import feature_hash_bow

    rows = [
        (1, "Alpha beta beta gamma", "en", "s", 10),
        (2, "", "en", "s", 0),
        (3, "gamma gamma gamma", "en", "s", 10),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    dim = 8  # tiny to force collisions
    got = {(r.doc_id, r.bucket): r.weight for r in feature_hash_bow(docs, dim=dim).collect()}

    want: dict = defaultdict(int)
    for doc_id, text, *_ in rows:
        for tok in " ".join(text.lower().split()).split():
            hx = hashlib.md5(tok.encode()).hexdigest()
            bucket = int(hx[:15], 16) % dim
            sign = 1 if int(hx[15], 16) % 2 == 0 else -1
            want[(doc_id, bucket)] += sign
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


def test_zipf_fit_recovers_planted_power_law(spark):
    """Corpus with exact freq = 1000/rank head tokens must fit slope
    ≈ −1 with near-perfect r²; vocab count covers ALL tokens while the
    fit uses only the top-n."""
    from cs744_big_data_system_spark.operators.text_analysis import zipf_fit

    words = []
    for rank, tok in enumerate(["alpha", "beta", "gamma", "delta", "epsilon"], start=1):
        words += [tok] * (1000 // rank)
    # tail singletons: in vocab, outside the top-5 fit
    words += [f"tail{i}" for i in range(50)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i::10])) for i in range(10)], ["doc_id", "text"]
    )
    row = zipf_fit(docs, topn=5).collect()[0]
    assert row.n_vocab == 5 + 50
    assert row.n_top == 5
    assert -1.05 < row.slope < -0.95, row
    assert row.r2 > 0.999, row


def test_gopher_rules_flag_expected_failures(spark):
    from cs744_big_data_system_spark.operators.text_analysis import gopher_rules

    good = (
        "the quick brown foxes have jumped with vigor over that lazy "
        "dog of summer to be happy and " * 4
    ).strip()
    rows = [
        (0, good),                              # passes every rule
        (1, "the cat sat"),                     # too short
        (2, good + " #" * 20),                  # symbol-heavy → alpha + symbol fail
        (3, "\n".join(["- item the have"] * 15)),  # all-bullet lines
        (4, " ".join(["zzz"] * 60)),            # no stop words
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[0].gopher_ok
    assert not out[1].r_word_count and not out[1].gopher_ok
    assert not out[2].r_symbol_ratio and not out[2].r_alpha_ratio
    assert not out[3].r_bullet_lines
    assert not out[4].r_stopwords and out[4].r_word_count


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Importance weights must rank docs resembling the target corpus
    above off-target docs; n_grams counts unigrams+bigrams."""
    from cs744_big_data_system_spark.operators.text_analysis import dsir_weights

    cats = "the cat sat on the mat with the other cat and a kitten"
    dogs = "a dog barked at the loud truck while another dog ran away fast"
    raw = spark.createDataFrame(
        [(0, cats), (1, dogs), (2, cats + " purring softly")],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(100, cats), (101, "cat and kitten nap on the mat")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in dsir_weights(raw, target, num_buckets=256).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].dsir_logratio > out[1].dsir_logratio
    assert out[2].dsir_logratio > out[1].dsir_logratio
    # 13 tokens → 13 unigrams + 12 bigrams
    assert out[0].n_grams == 25


def test_winnowing_matches_reference_and_guarantee(spark):
    """Spark winnowing must equal a pure-Python reference (window min,
    rightmost tie) per doc, and two docs sharing a >= k+w-1 token run
    must share a fingerprint hash."""
    import hashlib

    from cs744_big_data_system_spark.operators.text_analysis import (
        winnowing_fingerprints,
    )

    def py_winnow(text, k=4, w=4):
        toks = text.lower().split()
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        out = set()
        for e in range(w - 1, len(hs)):
            win = hs[e - w + 1 : e + 1]
            m = min(win)
            pos = e - w + 1 + max(i for i, v in enumerate(win) if v == m)
            out.add((pos, m))
        return out

    shared = "alpha bravo charlie delta echo foxtrot golf"  # 7 tokens = k+w-1
    d0 = "one two three four five six " + shared + " seven eight nine ten"
    d1 = shared + " zulu yankee xray whiskey victor uniform tango"
    docs = spark.createDataFrame([(0, d0), (1, d1)], ["doc_id", "text"])
    got = {}
    for r in winnowing_fingerprints(docs, k=4, window=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram_hash))
    assert got[0] == py_winnow(d0)
    assert got[1] == py_winnow(d1)
    shared_hashes = {h for _, h in got[0]} & {h for _, h in got[1]}
    assert shared_hashes, "guarantee: >=k+w-1 shared run must share a fingerprint"
    # compression: far fewer fingerprints than grams (14 grams in d0)
    assert len(got[0]) <= 8


def test_corpus_drift_kl_orders_similar_vs_disjoint(spark):
    from cs744_big_data_system_spark.operators.text_analysis import corpus_drift_kl

    same = [(i, "alpha beta gamma delta " * 5, "en" if i % 2 == 0 else "fr")
            for i in range(20)]
    near_zero = corpus_drift_kl(
        spark.createDataFrame(same, ["doc_id", "text", "lang"]),
        num_buckets=64,
    ).collect()[0]
    disjoint = [(i, ("alpha beta gamma " if i % 2 == 0 else "omega psi chi ") * 5,
                 "en" if i % 2 == 0 else "fr") for i in range(20)]
    far = corpus_drift_kl(
        spark.createDataFrame(disjoint, ["doc_id", "text", "lang"]),
        num_buckets=64,
    ).collect()[0]
    assert abs(near_zero.js) < 1e-6 and abs(near_zero.kl_pq) < 1e-6
    assert far.js > 0.3 and far.kl_pq > 1.0 and far.kl_qp > 1.0


def test_ngram_novelty_flags_recycled_text(spark):
    from cs744_big_data_system_spark.operators.text_analysis import ngram_novelty

    a = "one two three four five six seven eight"
    b = a                                   # full recycle of doc 0
    c = "one two three four " + "nine ten eleven twelve"  # half recycled
    docs = spark.createDataFrame([(0, a), (1, b), (2, c)], ["doc_id", "text"])
    out = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[0].novelty == 1.0
    assert out[1].novelty == 0.0
    assert 0.0 < out[2].novelty < 1.0 and out[2].n_novel < out[2].n_shingles


def test_dsir_weights_self_target_is_exactly_zero(spark):
    """With the target equal to the raw corpus, both bucket
    distributions are identical, so every document's log-likelihood
    ratio is exactly 0 — not approximately: each bucket's two smoothed
    probabilities are the same double, and ln(p)−ln(p) is 0.0."""
    from cs744_big_data_system_spark.operators.text_analysis import dsir_weights

    docs = spark.createDataFrame(
        [(i, f"token{i} the quick brown fox and token{i % 3}") for i in range(12)],
        ["doc_id", "text"],
    )
    rows = dsir_weights(docs, docs, num_buckets=128).collect()
    assert len(rows) == 12
    assert all(r.dsir_logratio == 0.0 for r in rows)


def test_compression_ratio_unicode_bytes_denominator(spark):
    """The ratio divides by UTF-8 BYTE length, not character count —
    multibyte text is where the two diverge and a len(str) slip would
    inflate every non-ASCII document's score."""
    import zlib

    from cs744_big_data_system_spark.operators.text_analysis import (
        compression_ratio,
    )

    texts = ["héllo wörld " * 30, "日本語のテキスト " * 20, "emoji 🚀🚀🚀 " * 25]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        assert len(raw) != len(t)  # the distinction is actually exercised
        want = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert abs(got[i].zlib_ratio - want) < 1e-9, (i, got[i].zlib_ratio, want)
