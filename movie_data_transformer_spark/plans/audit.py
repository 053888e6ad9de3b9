"""Physical-plan audits: assert the plan properties that make a query
scale (pushdown reached the scan, dims broadcast, codegen fused, no
stray cartesian products) — the checks a human does with
.explain('formatted'), as code."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@dataclass
class PlanAudit:
    has_codegen: bool
    n_exchanges: int
    n_broadcasts: int
    has_cartesian: bool
    pushed_filters: bool
    text: str = field(repr=False)


def audit_plan(df: DataFrame) -> PlanAudit:
    txt = plan_text(df)
    return PlanAudit(
        # formatted mode tags codegen'd operators with [codegen id : N]
        has_codegen="codegen id" in txt,
        # hash-shuffle exchanges only (broadcast exchanges counted apart)
        n_exchanges=txt.count("Arguments: hashpartitioning"),
        n_broadcasts=txt.count("BroadcastExchange"),
        # CartesianProduct is the real red flag; BroadcastNestedLoopJoin is
        # deliberate for broadcast-side theta joins (e.g. brute-force ANN)
        has_cartesian="CartesianProduct" in txt,
        pushed_filters="PushedFilters: [" in txt
        and txt.count("PushedFilters: []") < txt.count("PushedFilters: ["),
        text=txt,
    )
