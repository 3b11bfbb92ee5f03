from meerkat_abacus_spark.sinks.writers import (
    append_sink,
    csv_sink,
    upsert_by_key,
    dead_letter_split,
)

__all__ = ["append_sink", "csv_sink", "upsert_by_key", "dead_letter_split"]
