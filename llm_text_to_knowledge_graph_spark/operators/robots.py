"""RFC 9309 robots.txt evaluation — the crawl-politeness gate.

A crawl pipeline filters its URL frontier against each host's
robots.txt BEFORE fetching; re-crawls re-evaluate stored frontiers
whenever a robots body changes. Implemented from the RFC (and the
classic Google REP draft it standardized):

* group selection — the group whose ``User-agent`` token is the
  longest case-insensitive match for the crawler's product token;
  ``*`` is the fallback group; consecutive UA lines share one group.
* rule matching — ``Allow``/``Disallow`` patterns match the URL path
  by prefix, with ``*`` (any octets) and ``$`` (end anchor); the rule
  with the LONGEST pattern (octet length) wins, and on a tie Allow
  wins (RFC 9309 §2.2.2). An empty ``Disallow:`` matches nothing, and
  a missing/empty group allows everything.

Spark shape: robots bodies are parsed ONCE PER HOST into a broadcast
or hash-joined rules table (hosts number in the millions where pages
number in the trillions), and the per-URL check is a pandas UDF over
(path, compiled-rules) — regex compilation amortized per host via an
lru cache keyed by the rules tuple. Percent-encoding normalization is
intentionally out of scope (both sides of the comparison come from the
same crawler's canonicalizer — urls.py).

Reference analogue: none (the reference fetches no web pages); this
serves the crawl-ingest family (linkgraph.py, urls.py, corpus.py).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_UA_RE = re.compile(r"^\s*user-agent\s*:\s*([^#]*?)\s*(?:#.*)?$", re.I)
# a comment may abut the value with no whitespace ('Disallow: /a#staff')
_RULE_RE = re.compile(r"^\s*(allow|disallow)\s*:\s*([^\s#]*)", re.I)
# RFC 9309 2.2.4: records other than Allow/Disallow (Crawl-delay,
# Sitemap, ...) MUST NOT interfere with group parsing — they neither
# open nor close a group body, so 'UA: a / Crawl-delay: 1 / UA: b /
# Disallow: /x' keeps a and b as consecutive start-group lines that
# share the rules (matching Google's reference parser)


def parse_robots(body: str | None, agent: str = "*") -> tuple:
    """Extract the (allow, pattern) rules governing ``agent`` from a
    robots.txt body, per RFC 9309 group selection. Returns a tuple
    (hashable — it keys the compiled-matcher cache), empty = allow all.
    """
    if not body:
        return ()
    body = body.lstrip("\ufeff")  # real robots.txt files carry BOMs
    agent_lc = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_group_body = False
    for line in body.splitlines():
        m = _UA_RE.match(line)
        if m:
            if in_group_body and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            in_group_body = False
            cur_agents.append(m.group(1).lower())
            continue
        m = _RULE_RE.match(line)
        if m and cur_agents:
            in_group_body = True
            cur_rules.append(
                (m.group(1).lower() == "allow", m.group(2))
            )
            continue
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    # the group token matches when it is a prefix of the crawler's
    # product token (never the reverse: agent 'bot' must not adopt
    # 'googlebot' rules); longest token wins, '*' is the fallback, and
    # per RFC 9309 2.2.1 ALL groups at the winning specificity combine
    best_len = 0
    for agents, _rules in groups:
        for a in agents:
            if a and a != "*" and agent_lc.startswith(a):
                best_len = max(best_len, len(a))
    combined: list[tuple[bool, str]] = []
    for agents, rules in groups:
        tokens = [a for a in agents if a]
        if best_len:
            if any(
                a != "*" and len(a) == best_len and agent_lc.startswith(a)
                for a in tokens
            ):
                combined.extend(rules)
        elif "*" in tokens:
            combined.extend(rules)
    return tuple(r for r in combined if r[1] or r[0])


@lru_cache(maxsize=4096)
def _rules_cached(body: str | None, agent: str) -> tuple:
    """Module-level parse cache: one parse per distinct (body, agent)
    per Python WORKER, not per Arrow batch."""
    return parse_robots(body, agent)


@lru_cache(maxsize=4096)
def _compiled(rules: tuple):
    """[(allow, pattern_len, compiled_regex)] sorted longest-first so
    the first match IS the most specific; Allow sorts before Disallow
    at equal length (the RFC tiebreak)."""
    out = []
    for allow, pat in rules:
        if not pat:
            continue  # empty Disallow matches nothing
        rx = re.escape(pat).replace(r"\*", ".*")
        if rx.endswith(r"\$"):
            rx = rx[: -len(r"\$")] + "$"
        out.append((allow, len(pat), re.compile("^" + rx)))
    out.sort(key=lambda t: (-t[1], not t[0]))
    return tuple(out)


def robots_allowed(path: str, rules: tuple) -> bool:
    """Longest-match verdict for one URL path; no rules = allowed."""
    for allow, _n, rx in _compiled(rules):
        if rx.match(path):
            return allow
    return True


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    path_col: str = "path",
    body_col: str = "robots_body",
) -> DataFrame:
    """Adds ``crawl_allowed`` to ``urls(host, path, ...)`` by joining
    ``robots(host, robots_body)`` and evaluating RFC 9309 rules.

    The join is host-keyed (broadcast when the robots table is small —
    AQE decides); the UDF re-parses one body per DISTINCT body via an
    lru cache, so per-row cost is one longest-first regex scan.
    """

    @F.pandas_udf(BooleanType())
    def _allowed(path: pd.Series, body: pd.Series) -> pd.Series:
        return pd.Series(
            [
                robots_allowed(p or "/", _rules_cached(b, agent))
                for p, b in zip(path, body)
            ]
        )

    joined = urls.join(robots, host_col, "left")
    return joined.withColumn(
        "crawl_allowed", _allowed(F.col(path_col), F.col(body_col))
    ).drop(body_col)


# --- sitemap parsing (frontier seeding, the robots gate's companion) --

_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.I | re.S)
_LASTMOD_RE = re.compile(r"<lastmod>\s*(.*?)\s*</lastmod>", re.I | re.S)
_URL_BLOCK_RE = re.compile(r"<(url|sitemap)\b.*?</\1>", re.I | re.S)
# stdlib unescape handles entity ordering correctly ('&amp;lt;' is the
# LITERAL text '&lt;', not '<') and numeric references
from html import unescape as _xml_unescape  # noqa: E402


def parse_sitemap(body: str | None) -> list[tuple[str, str | None, bool]]:
    """(loc, lastmod, is_index) rows from a sitemap or sitemap-index
    body (sitemaps.org protocol). Regex-scoped per <url>/<sitemap>
    block so a lastmod never attaches to a neighboring loc; XML entity
    escapes in locs are decoded (the protocol REQUIRES escaping '&').
    Malformed blocks without a <loc> are skipped, not fatal — crawl
    inputs are hostile."""
    if not body:
        return []
    out = []
    for m in _URL_BLOCK_RE.finditer(body):
        block = m.group(0)
        loc = _LOC_RE.search(block)
        if not loc:
            continue
        lm = _LASTMOD_RE.search(block)
        out.append((
            _xml_unescape(loc.group(1)),
            lm.group(1) if lm else None,
            m.group(1).lower() == "sitemap",
        ))
    return out


def sitemap_urls(
    sitemaps: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """sitemaps(host, body) -> (host, loc, lastmod, is_index): one
    Arrow crossing parses, posexplode flattens — the frontier-seed
    source that joins against the robots gate and the URL canonicalizer
    (urls.py). Index rows (is_index=true) are the NEXT fetch round's
    sitemap list; at scale the fetch loop iterates exactly like the
    WARC reader's listing pass."""
    from pyspark.sql.types import (
        ArrayType, BooleanType as _B, StringType as _S, StructField,
        StructType,
    )

    row_t = StructType([
        StructField("loc", _S()),
        StructField("lastmod", _S()),
        StructField("is_index", _B()),
    ])

    @F.pandas_udf(ArrayType(row_t))
    def _parse(body: pd.Series) -> pd.Series:
        return pd.Series([parse_sitemap(b) for b in body])

    return (
        sitemaps.select(
            host_col, F.explode(_parse(F.col(body_col))).alias("u")
        )
        .select(
            host_col,
            F.col("u.loc").alias("loc"),
            F.col("u.lastmod").alias("lastmod"),
            F.col("u.is_index").alias("is_index"),
        )
    )
