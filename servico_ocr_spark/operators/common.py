"""Shared column builders for the cross-document operators.

Every primitive here is a deterministic JVM expression, and each has an
exact DuckDB-SQL twin (used by the driver's correctness oracles in
``__spark_entry__.py``), so operator results are engine-portable:

- ``h48(col)``: first 12 hex chars of md5 as a 48-bit non-negative BIGINT.
  Spark: ``conv(substr(md5(x),1,12),16,10)``; DuckDB:
  ``('0x' || substr(md5(x),1,12))::BIGINT``.
- ``norm_text``: the reference normalization (X1, app/util_ocr.py:309-320)
  as pure SQL: accent translate → symbol strip → lower.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..core.text import ACCENT_DST, ACCENT_SRC


def h48(col: Column) -> Column:
    """Deterministic 48-bit hash, portable across Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def norm_text(col: Column) -> Column:
    """Reference text normalization (accent fold, symbol→space, lower)."""
    return F.lower(
        F.regexp_replace(
            F.translate(col, ACCENT_SRC, ACCENT_DST), "[^0-9a-zA-Z ]", " "
        )
    )


def words_array(col: Column) -> Column:
    """Non-empty whitespace tokens of the normalized text."""
    return F.filter(F.split(norm_text(col), " "), lambda x: x != "")


def distinct_words(col: Column) -> Column:
    return F.array_distinct(words_array(col))
