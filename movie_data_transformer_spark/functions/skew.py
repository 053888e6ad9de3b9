"""Skew-handling recipes (SURVEY.md §7 M6): salting for hot keys.

AQE's skew-join splitting (on in ENGINE_CONF) handles most skew at
runtime; these explicit recipes are for the cases AQE can't fix —
aggregation skew (one giant group) and broadcast-ineligible joins with a
known-hot key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def salted_agg_count_sum(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: pre-aggregate on
    (key, salt) — spreading a hot key over n_salts reducers — then combine
    per key. Result identical to a direct groupBy; the hot key's work is
    parallelized across n_salts tasks.

    Output: key, n_rows, sum_value (decimal-exact)."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col(value).cast("decimal(18,4)")).alias("_s"),
        )
    )
    return phase1.groupBy(key).agg(
        F.sum("_n").alias("n_rows"), F.sum("_s").alias("sum_value")
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe equi-join: the big (skewed) side gets a random-ish salt in
    [0, n_salts); the small side is replicated n_salts times. The join key
    becomes (key, salt), so one hot key spreads across n_salts partitions.
    Join RESULT is independent of salt values. Use when the small side is
    too big to broadcast and AQE's split isn't available."""
    b = big.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"]).drop("_salt")
