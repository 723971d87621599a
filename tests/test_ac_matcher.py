"""Aho-Corasick alias-matcher engine: exact parity with the regex engine.

The two engines must produce identical mention tuples on any input — the
AC path is the at-scale engine (O(text) scan regardless of dictionary
size), the alternation regex is the reference semantics.
"""

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from llm_text_to_knowledge_graph_spark.operators.mentions import (
    _AC_THRESHOLD,
    AliasMatcher,
)

ROWS = [
    ("spark", "V", "1", "SPARK", 1.0),
    ("spark sql", "V", "2", "SPARK_SQL", 1.0),
    ("spark sql engine", "V", "3", "SSE", 1.0),
    ("sql", "V", "4", "SQL", 0.9),
    ("a+b", "V", "5", "APLUSB", 1.0),
    ("b", "V", "6", "B", 0.5),
    ("b", "W", "7", "B2", 0.9),  # ambiguous surface form, top-1 by prior
    ("été", "V", "8", "ETE", 1.0),  # unicode alias
    ("ab cd", "V", "9", "ABCD", 1.0),
    ("ab", "V", "10", "AB", 1.0),
]

TRICKY = [
    "spark sql engine beats spark sql beats spark beats sql",
    "sparky is not spark, but spark-sql has hyphens",
    "a+b and a+bc and b alone and étéX vs été ok",
    "ab cdX falls back to ab; ab cd stands alone",
    "bbbb b b,b",
    "",
    "no hits at all here",
    "spark sql engin",  # prefix of a long alias, shorter must win
]


def _pairs(m, texts):
    return [m.find(t) for t in texts]


def test_engines_agree_on_tricky_corpus():
    rx = AliasMatcher(ROWS, engine="regex")
    ac = AliasMatcher(ROWS, engine="ac")
    assert _pairs(rx, TRICKY) == _pairs(ac, TRICKY)
    # and they actually match things
    assert any(any(f) for f in _pairs(ac, TRICKY))


def test_top1_disambiguation_identical():
    rx = AliasMatcher(ROWS, engine="regex")
    ac = AliasMatcher(ROWS, engine="ac")
    got_rx = rx.find("b")
    got_ac = ac.find("b")
    assert got_rx == got_ac
    assert got_rx[0][5] == "B2"  # prior 0.9 beats 0.5


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=" abcdeé+-_,.()", min_size=0, max_size=60),
)
def test_engines_agree_property(text):
    rx = AliasMatcher(ROWS, engine="regex")
    ac = AliasMatcher(ROWS, engine="ac")
    assert rx.find(text) == ac.find(text)


def test_engines_agree_random_dictionary():
    rng = random.Random(7)
    alphabet = string.ascii_lowercase[:6] + " -"
    rows = []
    for i in range(400):
        alias = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6))).strip()
        if alias:
            rows.append((alias, "R", str(i), alias.upper(), rng.random()))
    rx = AliasMatcher(rows, engine="regex")
    ac = AliasMatcher(rows, engine="ac")
    for _ in range(300):
        text = "".join(rng.choice(alphabet + "xyz,.") for _ in range(rng.randint(0, 80)))
        assert rx.find(text) == ac.find(text), text


def test_auto_threshold_selects_ac():
    rows = [(f"alias{i}", "V", str(i), f"A{i}", 1.0) for i in range(_AC_THRESHOLD)]
    assert AliasMatcher(rows).engine == "ac"
    assert AliasMatcher(rows[:10]).engine == "regex"
    # identical results either way
    text = "alias7 and alias1999 and alias2048x"
    assert AliasMatcher(rows, engine="ac").find(text) == AliasMatcher(
        rows, engine="regex"
    ).find(text)
