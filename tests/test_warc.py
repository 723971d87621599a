"""WARC/WET source tests.

The fixture archives are built by an INDEPENDENT spec-direct writer below
(ISO 28500 record layout written by hand) — the parser is never checked
against bytes it produced itself (same discipline as test_media_containers).
"""

import datetime as dt
import gzip
import os

import pytest
from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.sources.warc import (
    read_warc,
    records_to_page_rows,
)

UTC = dt.timezone.utc


# ---- independent spec-direct writer (not the module under test) ----------

def warc_record(rtype: str, uri: str | None, date: str, payload: bytes) -> bytes:
    lines = [b"WARC/1.0"]
    lines.append(b"WARC-Type: " + rtype.encode())
    if uri is not None:
        lines.append(b"WARC-Target-URI: " + uri.encode())
    lines.append(b"WARC-Date: " + date.encode())
    lines.append(b"WARC-Record-ID: <urn:uuid:test-" + rtype.encode() + b">")
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def http_response(body: bytes, extra_headers: bytes = b"") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + extra_headers
        + b"Content-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
    )


def chunked(parts: list[bytes]) -> bytes:
    out = b""
    for p in parts:
        out += format(len(p), "x").encode() + b"\r\n" + p + b"\r\n"
    return out + b"0\r\n\r\n"


HTML_A = b"<html><body><p>Alpha page about AKT1.</p></body></html>"
HTML_B = b"<html><body><p>Beta page.</p></body></html>"
WET_TEXT = "Gamma extracted text.\n\nSecond paragraph."


def sample_archive() -> bytes:
    """warcinfo + request (both skipped) + 2 responses + 1 WET conversion."""
    return b"".join(
        [
            warc_record("warcinfo", None, "2024-03-01T00:00:00Z", b"robots: classic\r\n"),
            warc_record(
                "request",
                "https://example.org/a",
                "2024-03-01T10:00:00Z",
                b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n",
            ),
            warc_record(
                "response",
                "https://example.org/a",
                "2024-03-01T10:00:00Z",
                http_response(HTML_A),
            ),
            warc_record(
                "response",
                "https://example.org/b",
                "2024-03-01T10:05:00Z",
                http_response(
                    chunked([HTML_B[:10], HTML_B[10:]]),
                    extra_headers=b"Transfer-Encoding: chunked\r\n",
                ),
            ),
            warc_record(
                "conversion",
                "https://example.org/c",
                "2024-03-01T10:10:00Z",
                WET_TEXT.encode(),
            ),
        ]
    )


def gzip_members(archive: bytes) -> bytes:
    """Re-encode each record as its own gzip member (the WARC.gz layout)."""
    out = []
    # split on record starts — the writer knows its own framing
    recs, rest = [], archive
    while rest:
        nxt = rest.find(b"WARC/1.0", 1)
        if nxt < 0:
            recs.append(rest)
            break
        recs.append(rest[:nxt])
        rest = rest[nxt:]
    for r in recs:
        out.append(gzip.compress(r))
    return b"".join(out)


# ---- pure-python parser tests --------------------------------------------

def check_rows(rows):
    assert [r["url"] for r in rows] == [
        "https://example.org/a",
        "https://example.org/b",
        "https://example.org/c",
    ]
    a, b, c = rows
    assert a["html"] == HTML_A and a["text"] is None
    assert a["warc_ts"] == dt.datetime(2024, 3, 1, 10, 0, tzinfo=UTC)
    # chunked body reassembled exactly
    assert b["html"] == HTML_B
    assert c["html"] is None and c["text"] == WET_TEXT


def test_plain_archive_rows():
    check_rows(records_to_page_rows(sample_archive()))


def test_gzip_member_archive_rows():
    check_rows(records_to_page_rows(gzip_members(sample_archive())))


def test_whole_file_gzip_rows():
    check_rows(records_to_page_rows(gzip.compress(sample_archive())))


def test_corrupt_tail_keeps_good_records():
    data = sample_archive() + b"WARC/1.0\r\nContent-Length: garbage"
    assert len(records_to_page_rows(data)) == 3


# ---- Spark source tests ---------------------------------------------------

@pytest.fixture()
def warc_dir(tmp_path):
    (tmp_path / "part-0.warc").write_bytes(sample_archive())
    (tmp_path / "part-1.warc.gz").write_bytes(gzip_members(sample_archive()))
    (tmp_path / "notes.txt").write_bytes(b"not an archive")
    return str(tmp_path)


def test_read_warc_pages_schema(spark, warc_dir):
    df = read_warc(spark, warc_dir, glob="*.warc*")
    rows = {(r["url"], str(r["warc_ts"])): r for r in df.collect()}
    # 3 content records per archive file, 2 files, same urls -> 6 rows
    assert df.count() == 6
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    r = rows[("https://example.org/a", "2024-03-01 10:00:00")]
    assert bytes(r["html"]) == HTML_A


def test_warc_pipeline_equivalence(spark, tmp_path):
    """Corpus pages written to WARC and read back extract the SAME triples
    as the in-memory pages frame — the source is a transparent boundary."""
    from llm_text_to_knowledge_graph_spark.corpus import build_alias_rows, pages_df
    from llm_text_to_knowledge_graph_spark.operators.fused import (
        extract_triples_fused,
    )

    pages = pages_df(spark, 40, seed=7)
    pdf = pages.orderBy("url").toPandas()
    buf = []
    for _, row in pdf.iterrows():
        if row["html"] is not None:
            payload = http_response(bytes(row["html"]))
            rtype = "response"
        else:
            payload = row["text"].encode()
            rtype = "conversion"
        ts = row["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        buf.append(warc_record(rtype, row["url"], ts, payload))
    out = tmp_path / "corpus.warc.gz"
    out.write_bytes(b"".join(gzip.compress(r) for r in buf))

    alias_rows = build_alias_rows()
    direct = extract_triples_fused(pages, alias_rows)
    # lang is NULL off the wire (the crawler's lang tag isn't in the WARC
    # record) — restore the corpus default so the lang filter matches
    via_warc = extract_triples_fused(
        read_warc(spark, str(out)).withColumn("lang", F.lit("en")),
        alias_rows,
    )
    key = ["url", "subj", "pred", "obj", "evidence"]
    d = sorted(map(tuple, direct.select(*key).collect()))
    w = sorted(map(tuple, via_warc.select(*key).collect()))
    assert d == w and len(d) > 0


def test_streaming_read_warc(spark, warc_dir, tmp_path):
    """stream=True: same rows arrive through a Structured Streaming source."""
    q = (
        read_warc(spark, warc_dir, glob="*.warc*", stream=True)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 6
    assert got.filter(F.col("text").isNotNull()).count() == 2
