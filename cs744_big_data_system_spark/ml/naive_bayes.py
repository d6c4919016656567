"""Multinomial Naive Bayes text classification as pure relational
algebra — training AND prediction hash-checked.

The classic first distributed text classifier: class priors and
smoothed token likelihoods are ONE aggregation pass each, scoring is an
explode + broadcast-join + sum — exactly the shape Spark executes best
(map-side partials everywhere, no iteration, no driver math beyond a
bounded vocab table).

Determinism discipline (the pattern shared by the engine's other
hash-verified kernels, ml/linear_gd.py / ml/kmeans_relational.py):
every log-probability is quantized to integer micro-nats with
``floor(ln(p) * 1e6 + 0.5 + 1e-9)`` — after that, all scores are
BIGINT sums, so accumulation order cannot perturb the argmax and the
whole pipeline (vocab selection -> training -> prediction -> confusion
matrix) is bit-reproducible against the DuckDB oracle.

Scale shape (100 TB posture): two corpus passes (vocab count, token
scoring); the model itself is the |L|x|V| grid — bounded and broadcast,
never shuffled with the data; per-doc scores ride one (doc_id,
class) aggregation; the output is the |L|^2 confusion matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs744_big_data_system_spark.functions.text import normalized_text, tokens

#: micro-nat quantization grid for log-probabilities
_QUANT = 1_000_000


def _q_ln(col) -> F.Column:
    """ln(col) quantized to integer micro-nats: floor-round with the
    engine-stable +1e-9 nudge (see operators/timeseries.py EWMA note —
    absorbs cross-libm 1-ulp drift in ln())."""
    return F.floor(F.log(col) * _QUANT + 0.5 + 1e-9).cast("long")


def naive_bayes_confusion(
    documents: DataFrame, vocab_size: int = 150
) -> DataFrame:
    """Train multinomial NB (Laplace alpha=1, top-``vocab_size`` corpus
    vocabulary) to predict ``lang`` from token counts, score every
    document, and return the confusion matrix
    (actual_lang, pred_lang, n_docs)."""
    spark = documents.sparkSession

    # NOTE (r12 negative results, both A/B-killed at 32 cores): a
    # shared per-(doc,token)-counts aggregate (one tokenize pass for
    # all three consumers — structurally clean, oracle-green, but the
    # new high-cardinality exchange sits ON the dependency chain:
    # 3.0 s -> 4.1 s, stages 40 -> 46) and a plain scan fan-out (wall
    # 2.7 s -> 3.2 s: the bare tokenize chain is cheaper than the
    # exchange it rides) were built, measured at both 8 and 32 cores,
    # and reverted. The three independent single-task tokenize branches
    # below overlap on idle cores — the cheapest schedule at this
    # shape. (Both variants DID win at 8 cores; the headline geometry
    # decides.)
    docs = documents.select(
        "doc_id", "lang", tokens(normalized_text("text")).alias("_tk")
    )
    tok = docs.select("doc_id", "lang", F.explode("_tk").alias("token"))

    # bounded vocabulary: top-V tokens by corpus frequency, token tie-break
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(vocab_size)
        .select("token")
    )

    classes = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = classes.agg(F.sum("n_docs").alias("n"))
    priors = classes.crossJoin(F.broadcast(total)).select(
        F.col("lang").alias("cls_lang"),
        _q_ln(F.col("n_docs") * 1.0 / F.col("n")).alias("prior_i"),
    )

    # |L| x |V| smoothed log-likelihood grid (zero counts included)
    tc = (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        classes.select(F.col("lang").alias("cls_lang"))
        .crossJoin(F.broadcast(vocab))
        .join(
            tc.withColumnRenamed("lang", "cls_lang"),
            ["cls_lang", "token"],
            "left",
        )
        .select("cls_lang", "token", F.coalesce("c", F.lit(0)).alias("c"))
    )
    totals = grid.groupBy("cls_lang").agg(F.sum("c").alias("total_c"))
    lp = grid.join(totals, "cls_lang").select(
        "cls_lang",
        "token",
        _q_ln(
            (F.col("c") + F.lit(1.0)) / (F.col("total_c") + F.lit(vocab_size))
        ).alias("lp_i"),
    )

    # scoring: per-(doc, class) integer token sums + prior
    sums = (
        tok.select("doc_id", "token")
        .join(F.broadcast(lp), "token")
        .groupBy("doc_id", "cls_lang")
        .agg(F.sum("lp_i").alias("tok_i"))
    )
    base = docs.select("doc_id", "lang").crossJoin(F.broadcast(priors))
    scored = base.join(sums, ["doc_id", "cls_lang"], "left").select(
        "doc_id",
        "lang",
        "cls_lang",
        (F.col("prior_i") + F.coalesce("tok_i", F.lit(0))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cls_lang")
    pred = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        pred.groupBy(
            F.col("lang").alias("actual_lang"),
            F.col("cls_lang").alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("actual_lang", "pred_lang")
    )
