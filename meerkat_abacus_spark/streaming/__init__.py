from meerkat_abacus_spark.streaming.foreach_batch import (
    stream_pipeline,
    envelope_schema,
)

__all__ = ["stream_pipeline", "envelope_schema"]
