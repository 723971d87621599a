"""Unicode text normalization for web-crawl corpora.

Two cleanup stages every large-scale text pipeline needs BEFORE
fingerprinting/dedup (byte-level hashes treat "é" composed and
decomposed as different documents) and before tokenization (fullwidth
forms, ligatures and compatibility characters explode vocabulary):

* :func:`normalize_unicode` — NFC/NFKC canonical/compatibility
  normalization (unicodedata, the stdlib binding of the UAX #15
  algorithm). There is no JVM-side Spark SQL function for this, so the
  crossing is ONE Arrow-batched pandas UDF — the documented slow-path
  exception, amortized over whole batches; the fast pre-filter below
  keeps the common case cheap.
* :func:`fix_mojibake` — deterministic repair of the classic
  double-encoding family: UTF-8 bytes decoded as Windows-1252/Latin-1
  ("Café" -> "CafÃ©", "’" -> "â€™") somewhere upstream. The repair
  re-encodes through cp1252 and accepts the round trip only when it
  strictly decreases the count of mojibake marker sequences and
  introduces none of its own — same core heuristic as ftfy's
  fix_encoding, reimplemented from the codec tables (no dependency).

Both are pure per-row functions (no state, no shuffle): at 100 TB they
pipeline inside the ingest scan next to html_extract, and incremental
maintenance is trivial (new rows only).

ASCII fast path: a batch that is pure ASCII is returned untouched
without calling unicodedata (ASCII is NFC- and NFKC-invariant, and
mojibake markers are non-ASCII by construction) — on web corpora the
overwhelming majority of English pages take this path, so the Python
cost concentrates on the rows that can actually change.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

def repair_mojibake_str(s: str) -> str:
    """One repair pass on a python string; returns the input unchanged
    unless the cp1252 -> strict-UTF-8 round trip succeeds and strictly
    shortens the text. The strict decode IS the detector: legit non-
    ASCII text re-encoded to cp1252 is almost never valid UTF-8 (a bare
    'é' is byte 0xE9, a UTF-8 lead byte demanding two continuation
    bytes that real words don't supply), while double-encoded text is
    valid by construction. The shortening guard (multibyte sequences
    collapse to single codepoints) rejects the residual coincidences.
    Pure function and idempotent: repaired text either becomes ASCII or
    fails the next round trip."""
    if not s or s.isascii():
        return s
    try:
        # cp1252 leaves 5 bytes unmapped; latin-1 backfill covers
        # producers that emitted 0x81/0x8D/0x8F/0x90/0x9D raw
        raw = s.encode("cp1252", errors="strict")
    except UnicodeEncodeError:
        try:
            raw = s.encode("latin-1", errors="strict")
        except UnicodeEncodeError:
            return s
    try:
        fixed = raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return s
    return fixed if len(fixed) < len(s) else s


def normalize_unicode(
    df: DataFrame, col: str = "text", form: str = "NFC"
) -> DataFrame:
    """Replace ``col`` with its ``form``-normalized text (UAX #15;
    form in NFC/NFD/NFKC/NFKD). Null-safe; one Arrow crossing."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: x
            if x is None or x.isascii()
            else unicodedata.normalize(form, x)
        )

    return df.withColumn(col, _norm(F.col(col)))


def fix_mojibake(df: DataFrame, col: str = "text") -> DataFrame:
    """Repair double-encoded text in ``col``; adds ``<col>_was_mojibake``
    marking rows the repair changed (the corpus-health metric a crawl
    operator tracks per source/domain). Null-safe; one Arrow crossing
    computes both columns (repair once, compare once)."""

    @F.pandas_udf(StringType())
    def _fix(s: pd.Series) -> pd.Series:
        return s.map(lambda x: x if x is None else repair_mojibake_str(x))

    fixed = F.when(
        F.col(col).isNull(), F.lit(None).cast("string")
    ).otherwise(_fix(F.col(col)))
    out = df.withColumn("__fixed", fixed)
    return (
        out.withColumn(
            f"{col}_was_mojibake",
            F.when(F.col(col).isNull(), F.lit(None).cast("boolean"))
            .otherwise(F.col("__fixed") != F.col(col))
            .cast(BooleanType()),
        )
        .withColumn(col, F.col("__fixed"))
        .drop("__fixed")
    )
