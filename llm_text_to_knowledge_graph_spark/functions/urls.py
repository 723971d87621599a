"""URL canonicalization + registered-domain (eTLD+1) column functions.

Web-corpus plumbing the reference never needs (it keys on PMIDs —
pub.py:69-90) but a crawl-scale KG cannot live without: the SAME page is
crawled under `http://WWW.Example.com/a?utm_source=feed#frag` and
`https://example.com/a`, and url-keyed operators (exact dedup, the
crawl-snapshot delta in operators/delta.py, edge provenance) fragment
unless every url is first reduced to one canonical key. Domain-level
curation (per-site quality scores, domain blocklists, per-domain caps à la
C4/Gopher) additionally needs the REGISTERED domain: `a.blogspot.co.uk` and
`b.blogspot.co.uk` are different sites even though a naive last-two-labels
rule would merge them with `blogspot.co.uk`.

Everything here is a pure Column expression (parse_url / split / filter /
array_sort — all JVM-codegen built-ins, no Python), so canonicalization
rides INSIDE the page scan stage: zero extra passes, zero shuffles, and
Catalyst folds it into whatever filter/join consumes the result.

NOTE — this is the AGGRESSIVE corpus-dedup key (drops a leading
``www.``, larger frozen tracking list): use it where over-merging
near-identical origins is the point (dedup, snapshot delta, edge
provenance). The CONSERVATIVE frontier/revisit key — which must NOT
merge ``www.x.com`` with ``x.com`` because a crawler needs fetch
identity — lives in ``operators/urls.py::normalize_url``. Both are
frozen and tested; pick by consumer.

Canonical form (documented, frozen):
  * scheme and host lower-cased; a leading ``www.`` dropped
  * default ports (http:80, https:443) dropped, explicit others kept
  * fragment dropped
  * tracking parameters dropped (utm_* prefix + the frozen id list below)
  * surviving query params sorted byte-wise (param order is transport
    noise); empty query drops the ``?``
  * empty path becomes ``/``

The multi-label suffix table is a frozen subset of the Mozilla Public
Suffix List (publicsuffix.org — public data) covering the high-traffic
ccTLD second-level registries; at 100 TB the FULL list is ~9k rows — pass
it via ``extra_suffixes`` (it compiles into the same literal array; 9k
literals is still a map-only broadcast-free plan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# frozen non-prefix tracking params (prefix rule: utm_*)
TRACKING_PARAMS = (
    "fbclid", "gclid", "yclid", "msclkid", "igshid",
    "mc_cid", "mc_eid", "_ga", "ref_src", "spm",
)

# frozen subset of the Public Suffix List: ccTLDs whose registries sit at
# the second level, so eTLD+1 is the LAST THREE labels
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "firm.in", "gen.in",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "org.za", "net.za", "gov.za", "web.za",
    "com.ar", "com.tr", "com.tw", "com.sg", "com.hk", "com.my",
    "co.th", "co.id", "or.id", "ac.id", "com.vn", "com.ph",
    "com.sa", "com.eg", "com.ua", "in.ua", "com.pl", "edu.pl",
)


def _part(url: Column, part: str) -> Column:
    return F.parse_url(url, F.lit(part))


def host_col(url: Column) -> Column:
    """Lower-cased hostname (no port, no userinfo)."""
    return F.lower(_part(url, "HOST"))


def canonical_query_col(url: Column) -> Column:
    """Query string with tracking params dropped and the rest sorted;
    NULL when nothing survives."""
    params = F.filter(
        F.split(F.coalesce(_part(url, "QUERY"), F.lit("")), "&"),
        lambda p: (p != "")
        & ~F.lower(p).startswith("utm_")
        & ~F.split(F.lower(p), "=")[0].isin(*TRACKING_PARAMS),
    )
    joined = F.array_join(F.array_sort(params), "&")
    return F.when(joined != "", joined)


def _explicit_port(url: Column) -> Column:
    """Non-default explicit port as ':NNNN', else empty string."""
    port = F.regexp_extract(F.coalesce(_part(url, "AUTHORITY"), F.lit("")), r":(\d+)$", 1)
    scheme = F.lower(_part(url, "PROTOCOL"))
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    return F.when((port != "") & ~default, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )


def normalize_url_col(url: Column) -> Column:
    """Canonical url (see module docstring for the frozen rules)."""
    scheme = F.lower(F.coalesce(_part(url, "PROTOCOL"), F.lit("http")))
    host = F.regexp_replace(host_col(url), r"^www\.", "")
    path = F.coalesce(_part(url, "PATH"), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = canonical_query_col(url)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        _explicit_port(url),
        path,
        F.coalesce(F.concat(F.lit("?"), query), F.lit("")),
    )


def registered_domain_col(
    host: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """eTLD+1: last two host labels, or last three when the last two form a
    second-level public suffix (MULTI_SUFFIXES + ``extra_suffixes``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    suffixes = tuple(MULTI_SUFFIXES) + tuple(extra_suffixes)
    return (
        F.when((n >= 3) & last2.isin(*suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )
