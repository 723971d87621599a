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
  double-encoding family: UTF-8 bytes decoded as Windows-1252
  ("Café" -> "CafÃ©", "’" -> "â€™") somewhere upstream. The repair
  re-encodes per WHATWG windows-1252 (cp1252 plus C1 passthrough for
  the five unmapped bytes, so mixed smart-quote + accented-capital
  pages repair too), accepts the round trip only when (a) the input
  contains at least one UTF-8-lead + continuation character pair,
  (b) the bytes decode as STRICT UTF-8, (c) the text strictly
  shortens (multibyte sequences collapse), and (d) no new lead +
  continuation pairs appear — then iterates to fixpoint so
  double-mangled text peels every layer. Residual false-positive
  class, documented rather than hidden: a legit string whose cp1252
  bytes coincidentally form valid UTF-8 AND that carries a
  lead+continuation pair (e.g. the contrived "é©\\xad") is
  indistinguishable from real mojibake at the byte level; the
  ``_was_mojibake`` flag exists so operators can audit repairs per
  source.

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

# WHATWG windows-1252: cp1252 with the five unmapped bytes
# (0x81/0x8D/0x8F/0x90/0x9D) passing through as C1 controls — browsers
# decode this way, so real mixed mojibake contains BOTH cp1252
# punctuation chars and C1 controls in one string
_W1252_ENC = {
    bytes([b]).decode("cp1252", errors="ignore") or chr(b): b
    for b in range(256)
}
# producers that decoded as latin-1 (or errors='replace'-ish paths)
# emit the RAW C1 control for 0x80-0x9F instead of the cp1252 char —
# alias both spellings back to the byte (no collisions: C1 controls
# are not cp1252 images of any other byte)
for _b in range(0x80, 0xA0):
    _W1252_ENC.setdefault(chr(_b), _b)
# continuation class: what bytes 0x80-0xBF look like after the WHATWG
# decode; lead class: bytes 0xC2-0xF4 (UTF-8 2/3/4-byte leads)
_CONT = {bytes([b]).decode("cp1252", errors="ignore") or chr(b)
         for b in range(0x80, 0xC0)} | {chr(b) for b in range(0x80, 0xA0)}
_LEAD = {bytes([b]).decode("cp1252", errors="ignore") or chr(b)
         for b in range(0xC2, 0xF5)}


def _seq_count(s: str) -> int:
    """Number of UTF-8-lead + continuation character pairs — the
    byte-level signature mojibake always carries and clean text rarely
    does."""
    return sum(
        1
        for a, b in zip(s, s[1:])
        if a in _LEAD and b in _CONT
    )


def _w1252_bytes(s: str) -> bytes | None:
    """Encode per WHATWG windows-1252 (cp1252 + C1 passthrough); None
    when any character has no single-byte image."""
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        b = _W1252_ENC.get(ch)
        if b is None:
            return None
        out.append(b)
    return bytes(out)


def repair_mojibake_str(s: str) -> str:
    """Repair double-encoded text, peeling one encoding layer per pass
    and iterating to fixpoint (a twice-mangled 'CafÃƒÂ©' reaches
    'Café'). A pass rewrites only when the input carries a
    lead+continuation pair, its WHATWG-windows-1252 bytes decode as
    STRICT UTF-8, the text strictly shortens, and the repair does not
    introduce new lead+continuation pairs. Idempotent by construction:
    the fixpoint loop stops exactly when a pass changes nothing."""
    while True:
        nxt = _repair_once(s)
        if nxt == s:
            return s
        s = nxt


def _repair_once(s: str) -> str:
    if not s or s.isascii():
        return s
    seq = _seq_count(s)
    if seq == 0:
        return s
    raw = _w1252_bytes(s)
    if raw is None:
        return s
    try:
        fixed = raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return s
    if len(fixed) >= len(s):
        return s
    fixed_seq = _seq_count(fixed)
    # strictly fewer signature pairs, never new garbage of our own
    return fixed if fixed_seq < seq else s


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

    out = df.withColumn("__fixed", _fix(F.col(col)))
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
