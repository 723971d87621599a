"""Entity resolution (operators/resolution.py) vs a pure-Python replay:
char-shingle Jaccard, transitive closure, lexicographic-min canonical."""

from __future__ import annotations

import pytest

from llm_text_to_knowledge_graph_spark.operators.resolution import (
    alias_pairs,
    resolve_entities,
)

ALIASES = [
    "TP53", "tp53", "TP-53",      # one cluster (case + hyphen variants)
    "BRCA1", "BRCAA1",            # one cluster (single-char typo)
    "EGFR",                        # singleton
    "insulin",                     # singleton
]


def _shingles_py(s: str, n: int = 2) -> set[str]:
    low = s.lower()
    hi = max(len(low) - n, 0)
    return {low[i : i + n] for i in range(hi + 1)}


def _pairs_py(threshold: float) -> set[tuple[str, str]]:
    out = set()
    for i, a in enumerate(ALIASES):
        for b in ALIASES[i + 1 :]:
            x, y = sorted((a, b))
            sa, sb = _shingles_py(x), _shingles_py(y)
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out.add((x, y))
    return out


def _closure_py(pairs: set[tuple[str, str]]) -> dict[str, str]:
    canon = {a: a for a in ALIASES}

    def root(x):
        while canon[x] != x:
            x = canon[x]
        return x

    for a, b in pairs:
        ra, rb = root(a), root(b)
        lo, hi = sorted((ra, rb))
        canon[hi] = lo
    return {a: root(a) for a in ALIASES}


@pytest.fixture(scope="module")
def adf(spark):
    # duplicates on purpose: the operator must distinct first
    return spark.createDataFrame(
        [(a,) for a in ALIASES + ALIASES[:3]], ["alias"]
    )


def test_alias_pairs_match_python(adf):
    got = {
        (r["alias_a"], r["alias_b"])
        for r in alias_pairs(adf, threshold=0.4).collect()
    }
    assert got == _pairs_py(0.4)


def test_resolve_entities_clusters(adf):
    got = {
        r["alias"]: r["canonical"]
        for r in resolve_entities(adf, threshold=0.4).collect()
    }
    expected = _closure_py(_pairs_py(0.4))
    assert got == expected
    # the intended semantics, pinned explicitly
    assert got["TP53"] == got["tp53"] == got["TP-53"]
    assert got["BRCA1"] == got["BRCAA1"] == "BRCA1"
    assert got["TP53"] == "TP-53"
    assert got["EGFR"] == "EGFR"
    assert got["insulin"] == "insulin"


def test_resolve_entities_no_pairs(spark):
    df = spark.createDataFrame([("aaaa",), ("zzzz",)], ["alias"])
    got = {r["alias"]: r["canonical"] for r in resolve_entities(df).collect()}
    assert got == {"aaaa": "aaaa", "zzzz": "zzzz"}


def test_hot_shingle_cap_only_loses_recall(adf):
    # capping stop-shingles can only drop pairs, never invent them
    capped = {
        (r["alias_a"], r["alias_b"])
        for r in alias_pairs(adf, threshold=0.4, max_shingle_freq=2).collect()
    }
    assert capped <= _pairs_py(0.4)
