"""Column-reference helper for ODK-style names.

Form columns in the reference are ODK paths like ``pt./alert_id`` or
``intro./visit`` (FIXTURES.md §1).  A bare ``F.col("pt./alert_id")`` parses
the dot as struct-field access; every operator that takes column names from
config must quote them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """Backtick-quoted column reference (safe for dots/slashes in names)."""
    return F.col("`" + name.replace("`", "``") + "`")
