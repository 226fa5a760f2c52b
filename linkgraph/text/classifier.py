"""Linear quality classifier over hashed token features.

The CCNet / GPT-3 / Llama curation pipelines gate web documents with a
cheap linear classifier (fastText supervised mode: hashed bag-of-ngram
features, a linear layer, trained on "good" vs "raw" text) — the
reference-pipeline component this module re-expresses Spark-first
(REF⚠ fastText supervised / Brown et al. 2020 §A "quality classifier").

Everything stays JVM-side expressions: features are hashed token counts
(xxhash64 fast path, `linkgraph.portable.phash` in portable mode so the
DuckDB gate replays training bit-exactly), and training is synchronous
batch gradient descent on the logistic loss — each iteration is ONE
feature-join + two aggregations, i.e. exactly the PageRank superstep
shape: the weight table (≤ n_features rows) is the only iterated state,
per-iteration shuffle is O(nnz) feature rows, and nothing ever collects
per-document data to the driver.

Why batch GD and not MLlib's LogisticRegression: the gate needs a
fixed-iteration, deterministic, SQL-unrollable trainer; L-BFGS line
searches are neither. For production use the iteration count is a dial
(logistic loss is convex; GD with normalized tf features converges
geometrically), and the trained weights table is a plain DataFrame a
caller can persist and reuse.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from linkgraph.portable import phash
from linkgraph.text.quality import tokens


def hashed_features(
    docs: DataFrame,
    n_features: int = 1 << 18,
    text_col: str = "text",
    lowercase: bool = True,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, feature, x) — hashed bag-of-tokens, x = tf / |doc|.

    feature = hash(token) mod n_features (the fastText hashing trick —
    no vocabulary pass, collisions are benign for a linear model);
    x is the within-doc term frequency normalized by document length so
    the margin scale is length-invariant. Empty documents produce no
    rows (their margin is the bias alone). One explode + one hash-agg.
    """
    base = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    tok = (
        docs.select("doc_id", F.explode(tokens(base)).alias("token"))
        .where(F.col("token") != "")
    )
    h = phash(F.col("token")) if portable else F.xxhash64("token")
    feat = tok.select("doc_id", F.pmod(h, F.lit(n_features)).alias("feature"))
    counts = feat.groupBy("doc_id", "feature").agg(F.count("*").alias("tf"))
    dlen = feat.groupBy("doc_id").agg(F.count("*").alias("dl"))
    return counts.join(dlen, "doc_id").select(
        "doc_id", "feature", (F.col("tf") / F.col("dl")).alias("x")
    )


def train_classifier(
    feats: DataFrame,
    labels: DataFrame,
    iters: int = 8,
    lr: float = 10.0,
) -> tuple[DataFrame, float]:
    """Batch-GD logistic regression → ((feature, w) DataFrame, bias).

    ``labels``: (doc_id, y) with y in {0.0, 1.0}. Weights start at 0
    (so iteration 1 predicts p=0.5 everywhere — the unrolled SQL oracle
    exploits this). Update per iteration, N = |labeled docs|:

        r_d  = sigmoid(Σ_f w_f x_{d,f} + b) − y_d
        w_f ← w_f − lr · Σ_d x_{d,f} r_d / N
        b   ← b   − lr · Σ_d r_d / N

    Plan per iteration: feats⋈weights (hash join on feature) → per-doc
    margin agg → residual join with labels → per-feature gradient agg.
    State = the weight table only; checkpointed each round so the plan
    stays O(1) deep. Two actions per iteration (bias gradient scalar +
    the eager weight checkpoint).
    """
    spark = feats.sparkSession
    feats = feats.persist()
    labeled = labels.select("doc_id", F.col("y").cast("double").alias("y")).persist()
    n = labeled.count()
    if n == 0:
        feats.unpersist()
        labeled.unpersist()
        return spark.createDataFrame([], "feature bigint, w double"), 0.0
    weights = spark.createDataFrame([], "feature bigint, w double")
    bias = 0.0
    for _ in range(iters):
        margins = (
            feats.join(weights, "feature")
            .groupBy("doc_id")
            .agg(F.sum(F.col("x") * F.col("w")).alias("mw"))
        )
        resid = (
            labeled.join(margins, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.coalesce("mw", F.lit(0.0)) + F.lit(bias))))
                    - F.col("y")
                ).alias("r"),
            )
            .persist()
        )
        grad_b = resid.agg(F.avg("r")).collect()[0][0]
        grads = (
            feats.join(resid, "doc_id")
            .groupBy("feature")
            .agg((F.sum(F.col("x") * F.col("r")) / F.lit(float(n))).alias("g"))
        )
        weights = (
            weights.join(grads, "feature", "outer")
            .select(
                "feature",
                (
                    F.coalesce("w", F.lit(0.0)) - F.lit(lr) * F.coalesce("g", F.lit(0.0))
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        bias -= lr * float(grad_b)
        resid.unpersist()
    feats.unpersist()
    labeled.unpersist()
    return weights, bias


def score_classifier(feats: DataFrame, weights: DataFrame, bias: float) -> DataFrame:
    """(doc_id, prob) — sigmoid(Σ w·x + b) per document present in
    ``feats``. A doc whose features all miss the weight table scores
    sigmoid(b); a doc with NO feature rows at all (empty text) is absent
    from ``feats`` and therefore from this result — callers scoring a
    corpus should left-join back and default to sigmoid(b), as
    quality_classifier does. One join + one agg."""
    margins = (
        feats.join(weights, "feature")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("mw"))
    )
    return (
        feats.select("doc_id")
        .distinct()
        .join(margins, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.coalesce("mw", F.lit(0.0)) + F.lit(bias))))
            ).alias("prob"),
        )
    )


def quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    n_features: int = 1 << 18,
    iters: int = 8,
    lr: float = 10.0,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """End-to-end: featurize ``docs``, train on the ``labels`` subset,
    score EVERY document → (doc_id, prob). Docs absent from ``labels``
    are scored but never contribute gradients — the usual
    train-on-curated / score-the-crawl split."""
    feats = hashed_features(docs, n_features, text_col, portable=portable).persist()
    weights, bias = train_classifier(feats.join(labels, "doc_id", "left_semi"),
                                     labels, iters=iters, lr=lr)
    scored = (
        docs.select("doc_id")
        .join(score_classifier(feats, weights, bias), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("prob", F.lit(1.0 / (1.0 + math.exp(-bias)))).alias("prob"),
        )
        .localCheckpoint(eager=True)
    )
    feats.unpersist()
    return scored
