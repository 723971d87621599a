"""WARC / WET source — read Common-Crawl-style archives into the pages table.

The reference fetches one article at a time over HTTP (pub.py:69-211); the
corpus this engine targets (BASELINE.json input_hint) is a pre-crawled web
snapshot, and the interchange format every public crawl ships is WARC
(ISO 28500): ~1 GB gzip archives of HTTP capture records, with a parallel
"WET" variant carrying pre-extracted plain text as ``conversion`` records.
This module turns a directory of ``*.warc[.gz]`` / ``*.wet[.gz]`` files into
the engine's PAGES schema so the whole pipeline (paragraphs -> mentions ->
triples -> graph) runs straight off an archive drop.

Spark plan shape (the 100-TB story):

* ``spark.read.format("binaryFile")`` lists the archive files and hands each
  to ONE task — gzip members are not splittable without an external record
  index, so per-file is the correct (and the standard) parallelism unit: a
  monthly Common-Crawl snapshot is ~72k WARC files of ~1 GB, i.e. ~72k
  independent tasks, far above any executor count. No shuffle anywhere:
  listing -> parse -> downstream filters are one map-only stage.
* Record parsing runs in ``mapInPandas`` (one Arrow crossing); the parser is
  a pure function of the file bytes, so any file-to-task placement yields
  identical rows.
* Pruning happens at the LISTING: ``pathGlobFilter`` and
  ``modifiedAfter/modifiedBefore`` options skip files before a byte is read,
  which is the only pushdown that exists for opaque archives.
* ``binaryFile`` caps single files at ``spark.sql.sources.binaryFile``'s 2 GB
  column limit — real crawl archives stay under 1 GB by convention.
* Incremental ingestion: ``binaryFile`` is also a Structured Streaming file
  source, so the same parse function behind ``readStream`` gives
  arrive-as-they-land archive ingestion (pair with streaming/incremental.py).

Format notes (spec-direct, no external libs):

* A WARC file is a sequence of records: ``WARC/1.0\\r\\n`` + named fields +
  ``\\r\\n\\r\\n`` + exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``.
* ``response`` records carry the raw HTTP response (status line + headers +
  body); the body is what downstream wants, so HTTP headers are stripped and
  ``Transfer-Encoding: chunked`` bodies are de-chunked here.
* ``conversion`` (WET) records carry extracted UTF-8 text directly.
* ``.gz`` archives are per-record gzip members concatenated; Python's zlib
  consumes concatenated members natively, and the same code path covers
  whole-file gzip.

Tests build their fixture archives with an independent spec-direct writer
(tests/test_warc.py) — the parser is never checked against itself.
"""

from __future__ import annotations

import datetime as _dt
import zlib

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES

# record types that become pages rows; request/warcinfo/metadata/revisit are
# crawl bookkeeping, not content
_CONTENT_TYPES = ("response", "conversion", "resource")


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (the WARC.gz layout:
    one member per record). Plain (uncompressed) input passes through."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    while data:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        data = d.unused_data
        if not d.eof:  # truncated trailing member: keep what decoded
            break
    return b"".join(out)


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (RFC 9112 §7.1)."""
    out, i, n = [], 0, len(body)
    while i < n:
        j = body.find(b"\r\n", i)
        if j < 0:
            break
        size_tok = body[i:j].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[j + 2 : j + 2 + size])
        i = j + 2 + size + 2  # skip chunk + trailing CRLF
    return b"".join(out)


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record payload:
    drop status line + headers, de-chunk if the headers say so."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return payload  # header-less capture: treat whole payload as body
    head = payload[:sep].decode("latin-1", "replace")
    body = payload[sep + 4 :]
    for line in head.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "transfer-encoding" and "chunked" in v.lower():
            return _dechunk(body)
    return body


def _parse_warc_date(v: str) -> _dt.datetime | None:
    """WARC-Date is ISO 8601 UTC (``2024-01-01T00:00:00Z``)."""
    try:
        return _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
    except ValueError:
        return None


def iter_warc_records(data: bytes):
    """Yield ``(fields, payload)`` per record from raw archive bytes.

    ``fields`` maps lower-cased WARC header names to values. Tolerant of
    leading/trailing CRLF padding between records; stops (rather than
    raising) at a malformed header block so one corrupt tail record cannot
    fail a whole 1 GB archive task."""
    data = _gunzip_members(data)
    i, n = 0, len(data)
    while i < n:
        while i < n and data[i] in (0x0D, 0x0A):
            i += 1
        if i >= n:
            break
        j = data.find(b"\r\n\r\n", i)
        if j < 0:
            break
        lines = data[i:j].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            break
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            break
        payload = data[j + 4 : j + 4 + clen]
        yield fields, payload
        i = j + 4 + clen


def records_to_page_rows(data: bytes) -> list[dict]:
    """Pure bytes -> PAGES-shaped dict rows (unit-testable without Spark).

    ``response``/``resource`` records land as ``html`` bytes (the pipeline's
    html_extract owns charset handling and text extraction); ``conversion``
    (WET) records land as ``text`` directly."""
    rows = []
    for fields, payload in iter_warc_records(data):
        rtype = fields.get("warc-type", "")
        if rtype not in _CONTENT_TYPES:
            continue
        url = fields.get("warc-target-uri")
        if not url:
            continue
        body = _http_body(payload) if rtype == "response" else payload
        is_text = rtype == "conversion"
        rows.append(
            {
                "url": url,
                "warc_ts": _parse_warc_date(fields.get("warc-date", "")),
                "html": None if is_text else bytes(body),
                "text": body.decode("utf-8", "replace") if is_text else None,
                "lang": None,
            }
        )
    return rows


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    stream: bool = False,
) -> DataFrame:
    """Archive directory -> PAGES DataFrame (one map-only stage).

    ``glob`` forwards to binaryFile's ``pathGlobFilter`` (listing-time
    pruning). ``stream=True`` swaps in ``readStream`` for incremental
    ingestion of archives as they land — same parse, same schema."""
    import pandas as pd

    reader = spark.readStream if stream else spark.read
    reader = reader.format("binaryFile")
    if stream:
        # streaming file sources demand an explicit schema; binaryFile's is
        # fixed by the format spec
        reader = reader.schema(
            "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
        )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("content")

    def parse(batches):
        for pdf in batches:
            rows: list[dict] = []
            for content in pdf["content"]:
                rows.extend(records_to_page_rows(bytes(content)))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.mapInPandas(parse, schema=PAGES)
