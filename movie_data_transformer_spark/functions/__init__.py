from movie_data_transformer_spark.functions.core import (
    decimal_sum,
    deterministic_avg,
    micro_ratio,
    money_out,
    running_sum,
    top_k_per_group,
)

__all__ = [
    "decimal_sum",
    "deterministic_avg",
    "micro_ratio",
    "money_out",
    "top_k_per_group",
    "running_sum",
]
