"""kinesis_stream_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of 500px/kinesis-stream.

The reference (`/root/reference`) is a streaming ingestion + checkpoint
library (KCL -> Akka Streams source). This package re-expresses that
surface on Spark:

- ``kinesis_stream_spark.checkpoint`` — the reference's one real
  algorithm (out-of-order ack -> contiguous-prefix checkpoint,
  ``ShardCheckpointTrackerActor.scala``) as a pure-Python engine module.
- ``kinesis_stream_spark.sources`` — batch parquet loaders and the
  Kinesis record-envelope streaming source (``Record.scala:13-23``).
- ``kinesis_stream_spark.streaming`` — delivery semantics, event-time
  windows, watermark late-data handling (``README.md:38-43``).
- ``kinesis_stream_spark.operators`` — the host-framework operator
  surface the reference delegates to Akka Streams, plus LLM-data
  pipeline extensions (dedup, similarity, text, multimodal), all
  designed for 100 TB scale.
- ``kinesis_stream_spark.queries`` — the declared query inventory used
  by the driver contract (``__spark_entry__.py``).
"""

from kinesis_stream_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
