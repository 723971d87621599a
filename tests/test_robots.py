"""RFC 9309 robots.txt evaluation (operators/robots.py)."""

from llm_text_to_knowledge_graph_spark.operators.robots import (
    parse_robots,
    robots_allowed,
    robots_filter,
)

BODY = """
# global
User-agent: *
Disallow: /private/
Allow: /private/public-page.html
Disallow: /tmp
Disallow:

User-agent: examplebot
User-agent: otherbot
Disallow: /only-for-example/
Crawl-delay: 2
"""


def test_group_selection():
    star = parse_robots(BODY, "somebot")
    assert ("/private/" in {p for _, p in star}) and (
        "/only-for-example/" not in {p for _, p in star}
    )
    ex = parse_robots(BODY, "ExampleBot/1.0")
    assert {p for _, p in ex} == {"/only-for-example/"}
    # consecutive UA lines share one group
    other = parse_robots(BODY, "otherbot")
    assert {p for _, p in other} == {"/only-for-example/"}


def test_longest_match_and_allow_tiebreak():
    rules = parse_robots(BODY, "somebot")
    assert not robots_allowed("/private/secret.html", rules)
    # the longer Allow overrides the shorter Disallow prefix
    assert robots_allowed("/private/public-page.html", rules)
    assert robots_allowed("/other/", rules)
    # Disallow /tmp is a PREFIX match
    assert not robots_allowed("/tmpfile", rules)
    # RFC tiebreak: equal length -> Allow wins
    tie = ((False, "/p"), (True, "/p"))
    assert robots_allowed("/page", tie)


def test_wildcards_and_anchor():
    rules = (
        (False, "/*.pdf$"),
        (False, "/search*q="),
        (True, "/search/help"),
    )
    assert not robots_allowed("/docs/file.pdf", rules)
    assert robots_allowed("/docs/file.pdf.html", rules)  # $ anchor
    assert not robots_allowed("/search?q=x", rules)
    assert robots_allowed("/search/help", rules)  # longer allow


def test_degenerate_bodies():
    assert parse_robots(None) == ()
    assert parse_robots("") == ()
    assert robots_allowed("/anything", ()) is True
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /x\n") == ()


def test_robots_filter_dataframe(spark):
    urls = spark.createDataFrame(
        [
            ("a.org", "/private/x", 1),
            ("a.org", "/ok", 2),
            ("b.org", "/anything", 3),   # no robots row -> allowed
        ],
        "host string, path string, uid long",
    )
    robots = spark.createDataFrame(
        [("a.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_body string",
    )
    got = {
        r["uid"]: r["crawl_allowed"]
        for r in robots_filter(urls, robots).collect()
    }
    assert got == {1: False, 2: True, 3: True}
