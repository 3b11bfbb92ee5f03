"""Multi-format date parsing as a coalesce of JVM-side parsers.

The reference parses dates with ``dateutil.parse`` plus an explicit 9-format
whitelist (meerkat_abacus/codes/variable.py:370-380).  Here each format is a
``try_to_timestamp`` arm — all JVM, all codegen'd — and the first success
wins, mirroring the reference's first-format-wins loop.  ``try_`` variants
keep this safe under ANSI mode and simply yield NULL for garbage, which is
the reference's drop/ignore behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark datetime-pattern translations of variable.py:370-380 allowed_formats,
# most-specific first so fractional-second ISO strings don't lose precision.
MULTIFORMAT_PATTERNS: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "MMM d, yyyy",
    # Full month names: the reference's QC path parses with dateutil
    # (quality_control.py:237 `parse(string_date)`), which is permissive —
    # "June 14, 2015" passes QC there.  MMMM arms cover the month-name
    # space; dateutil's wilder inputs (ordinal days, fuzzy text) stay NULL.
    "MMMM d, yyyy",
    "d-MMM-yyyy HH:mm:ss",
    "d-MMM-yyyy",
    "d-MMMM-yyyy",
    "MMM d, yyyy h:mm:ss a",
)


def parse_multiformat_timestamp(col: Column | str) -> Column:
    """First-format-wins timestamp parse; NULL when nothing matches."""
    c = F.col(col) if isinstance(col, str) else col
    arms = [F.try_to_timestamp(c, F.lit(p)) for p in MULTIFORMAT_PATTERNS]
    # Final fallback: Spark's own permissive cast (handles ISO with offsets).
    arms.append(F.try_to_timestamp(c))
    return F.coalesce(*arms)


def timestamp_of(df, column: str) -> Column:
    """Timestamp column for ``column`` of ``df``: already-typed timestamps/
    dates pass through untouched; strings go through the 9-format parse.

    At scale this matters: the multiformat parse is 10 parser arms per row —
    never pay it for a column the scan already typed.
    """
    from meerkat_abacus_spark.functions.cols import qcol

    dtype = dict(df.dtypes).get(column, "string")
    if dtype.startswith(("timestamp", "date")):
        return qcol(column).cast("timestamp")
    return parse_multiformat_timestamp(qcol(column).cast("string"))


def day_truncated(col: Column | str) -> Column:
    """Day-truncated timestamp (reference to_codes.py step:141-142)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("DAY", c)
