"""Grouped Pandas operators (applyInPandas) — for per-group algorithms the
built-in aggregate library can't express (here: an OLS slope per group).

This is deliberately the ONLY place (besides multimodal decode) where
Python touches row data — everything else in the engine is JVM-side.
Arrow moves each group as columnar batches; the shuffle is the same
hash-by-key exchange a built-in agg would use, so scaling behavior is
identical (watch per-group size, not group count).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

TREND_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("slope_per_day", DoubleType()),
        StructField("mean_value", DoubleType()),
    ]
)


def _ols(pdf: pd.DataFrame) -> pd.DataFrame:
    # ts arrives as int64 nanos (load_events_raw_ns); regress value on days.
    # Sort by event_id first: group rows arrive in arbitrary partition
    # order, and FP summation order must be fixed for reproducible output.
    pdf = pdf.sort_values("event_id")
    t = (pdf["ts"].astype("int64") / 1e9 / 86400.0).to_numpy()
    v = pdf["value"].to_numpy()
    n = len(pdf)
    if n < 2:
        slope = 0.0
    else:
        tc, vc = t - t.mean(), v - v.mean()
        denom = float((tc * tc).sum())
        slope = float((tc * vc).sum() / denom) if denom > 0 else 0.0
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n": [n],
            "slope_per_day": [round(slope, 6)],
            "mean_value": [round(float(v.mean()), 6)] if n else [0.0],
        }
    )


def user_value_trend(events_raw: DataFrame) -> DataFrame:
    """Per-user OLS slope of event value over time (value units per day).

    Input: RAW events (ts int64 nanos). One shuffle on user_id; each group
    processed as a single Arrow batch."""
    return events_raw.groupBy("user_id").applyInPandas(_ols, schema=TREND_SCHEMA)


def gmean_udaf():
    """Grouped-aggregate pandas UDF (the UDAF extension surface — the
    third leg of the UDF/UDAF/UDTF triad next to token_count_vectorized
    and chunk_text_udtf): geometric mean per group, Arrow-batched.
    Series -> scalar functionType is inferred by Spark from the
    signature. exp(mean(log)) is FP-order dependent -> rows-only in the
    registry; pinned against numpy in tests."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _gmean(v: pd.Series) -> float:
        a = v.to_numpy(dtype="float64")
        a = a[a > 0]
        if a.size == 0:
            return float("nan")
        return float(np.exp(np.log(a).mean()))

    return _gmean
