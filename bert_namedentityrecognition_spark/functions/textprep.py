"""Reference-parity string one-liners as JVM Column expressions.

Each has a byte-identical pure-Python twin in ``oracle/textproc.py`` (the
parity kernel); tests assert Spark output == kernel output on fixture
strings. Both compile to Catalyst regexp built-ins — no Python on the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..oracle.textproc import NEWLINE_AFTER_PERIOD_REGEX, NORMALIZE_PREFIX_REGEX


def newline_after_period(col: Column) -> Column:
    """Insert ``\\n`` after each ``。`` not already followed by one
    (``scripts/predict/predict_for_xls_folder.py:61``)."""
    return F.regexp_replace(col, NEWLINE_AFTER_PERIOD_REGEX, "。\n")


def normalize_text_prefix(col: Column) -> Column:
    """``normalizeText`` (``scripts/utils/excelToTxt.py:9-11``): leading run
    of the JP/ASCII charset (anchored; may extract the empty string)."""
    return F.regexp_extract(col, "^(" + NORMALIZE_PREFIX_REGEX + ")", 1)
