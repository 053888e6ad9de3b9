"""Window-placement shim: the two pandas-grouped user-extension entries
(`grouped_ols_trend` — applyInPandas per-group OLS; `events_gmean_udaf` —
grouped-agg pandas UDAF) are defined in llm_queries.py but registered here
as their own module, so the r04 driver correctness window can address just
these two never-driver-checked entries without re-including the whole
(already driver-green) text pack (NOTES.md ledger / round-3 VERDICT #1).
"""

from __future__ import annotations

from movie_data_transformer_spark.operators.llm_queries import (
    GROUPED_EXTRA_QUERIES as QUERIES,
)

__all__ = ["QUERIES"]
