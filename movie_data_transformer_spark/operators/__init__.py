from movie_data_transformer_spark.operators.movie_pipeline import (
    dedup_latest,
    explode_watched,
    group_watched,
    kv_serialize,
    run_pipeline,
)

__all__ = [
    "explode_watched",
    "dedup_latest",
    "group_watched",
    "kv_serialize",
    "run_pipeline",
]
