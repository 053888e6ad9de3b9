from movie_data_transformer_spark.sinks.kv import FileKVClient, write_kv

__all__ = ["FileKVClient", "write_kv"]
