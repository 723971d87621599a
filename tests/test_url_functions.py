"""URL canonicalization / registered-domain tests.

Expected values are written BY HAND from the frozen rules in
functions/urls.py — never computed with the functions under test.
"""

import pytest
from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.functions.urls import (
    host_col,
    normalize_url_col,
    registered_domain_col,
)

CANON_CASES = [
    # (raw, canonical)
    ("http://WWW.Example.COM/a?utm_source=f&b=2&a=1#frag",
     "http://example.com/a?a=1&b=2"),
    ("https://example.com:443/path", "https://example.com/path"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://News.example.co.uk", "https://news.example.co.uk/"),
    ("http://example.com/a?fbclid=xyz&gclid=1", "http://example.com/a"),
    ("http://example.com/a?z=1&y=2&z=0", "http://example.com/a?y=2&z=0&z=1"),
    ("http://example.com/a?UTM_CAMPAIGN=x&q=1", "http://example.com/a?q=1"),
]


def test_normalize_url(spark):
    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], ["url"])
    got = [
        r["norm"]
        for r in df.select(normalize_url_col(F.col("url")).alias("norm")).collect()
    ]
    assert got == [c for _, c in CANON_CASES]


def test_normalize_is_idempotent(spark):
    df = spark.createDataFrame([(c,) for _, c in CANON_CASES], ["url"])
    got = [
        r["norm"]
        for r in df.select(normalize_url_col(F.col("url")).alias("norm")).collect()
    ]
    assert got == [c for _, c in CANON_CASES]


DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.news.example.co.uk", "example.co.uk"),
    ("b.blogspot.co.uk", "blogspot.co.uk"),
    ("sub.site.com.au", "site.com.au"),
    ("example.org", "example.org"),
    ("localhost", "localhost"),
    ("deep.sub.example.io", "example.io"),
]


def test_registered_domain(spark):
    df = spark.createDataFrame(DOMAIN_CASES, ["host", "expected"])
    bad = df.filter(
        registered_domain_col(F.col("host")) != F.col("expected")
    ).count()
    assert bad == 0


def test_registered_domain_extra_suffixes(spark):
    df = spark.createDataFrame([("a.b.example.custom.tld",)], ["host"])
    got = df.select(
        registered_domain_col(F.col("host"), extra_suffixes=("custom.tld",)).alias("d")
    ).collect()[0]["d"]
    assert got == "example.custom.tld"


def test_host_col_strips_port_and_case(spark):
    df = spark.createDataFrame([("https://ABC.Example.com:8443/x",)], ["url"])
    assert df.select(host_col(F.col("url")).alias("h")).collect()[0]["h"] == (
        "abc.example.com"
    )


def test_normalization_is_jvm_only(spark):
    """The whole canonical form must be a JVM expression: no Python eval
    nodes in the plan (it rides inside the scan stage at 100 TB)."""
    df = spark.createDataFrame([("http://a.com/x",)], ["url"]).select(
        normalize_url_col(F.col("url")).alias("n")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
