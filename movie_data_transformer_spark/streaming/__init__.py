from movie_data_transformer_spark.streaming.merge_stream import (
    ParquetStateStore,
    run_incremental_merge,
)

__all__ = ["ParquetStateStore", "run_incremental_merge"]
