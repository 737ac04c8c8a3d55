from horaedb_spark.streaming.sink import ingest_stream, write_batch_segmented

__all__ = ["ingest_stream", "write_batch_segmented"]
