"""Unit tests for the pure BEL utilities — parity cases derived from the
reference's observable behavior (transform_bel_statements.py, convert_to_cx2.py)."""

from llm_text_to_knowledge_graph_spark.functions.bel import (
    extract_label,
    extract_type,
    identifiers_url,
    make_term,
    split_statement,
)


def test_split_binary():
    assert split_statement("p(HGNC:AKT1) increases p(HGNC:TP53)") == (
        "p(HGNC:AKT1)",
        "increases",
        "p(HGNC:TP53)",
    )


def test_split_nested_complex():
    s = "complex(p(HGNC:A), p(HGNC:B)) directlyIncreases bp(GO:0006915)"
    assert split_statement(s) == (
        "complex(p(HGNC:A), p(HGNC:B))",
        "directlyIncreases",
        "bp(GO:0006915)",
    )


def test_split_pmod_with_spaces_inside():
    s = "p(HGNC:AKT1) directlyIncreases p(HGNC:HSF1, pmod(Ph, Thr, 142))"
    assert split_statement(s) == (
        "p(HGNC:AKT1)",
        "directlyIncreases",
        "p(HGNC:HSF1, pmod(Ph, Thr, 142))",
    )


def test_split_quoted_namespace_value():
    s = 'a(CHEBI:"oxygen atom") decreases p(HGNC:EGFR)'
    assert split_statement(s) == (
        'a(CHEBI:"oxygen atom")',
        "decreases",
        "p(HGNC:EGFR)",
    )


def test_split_unary():
    # unary statements return (stmt, None, None) — transform_bel_statements.py:13-15
    assert split_statement("p(HGNC:AKT1)") == ("p(HGNC:AKT1)", None, None)


def test_split_empty():
    assert split_statement("") == (None, None, None)


def test_split_act_wrapped():
    s = "act(p(HGNC:MAPK1)) increases act(p(HGNC:JUN))"
    assert split_statement(s) == (
        "act(p(HGNC:MAPK1))",
        "increases",
        "act(p(HGNC:JUN))",
    )


def test_extract_type():
    assert extract_type("p(HGNC:AKT1)") == "p"
    assert extract_type("complex(p(HGNC:A), p(HGNC:B))") == "complex"
    assert extract_type("bareword") == "unknown"


def test_extract_label_simple():
    assert extract_label("p(HGNC:AKT1)") == "AKT1"


def test_extract_label_quoted():
    assert extract_label('a(CHEBI:"oxygen atom")') == "oxygen atom"


def test_extract_label_no_ns():
    assert extract_label("something") == "something"


def test_extract_label_pmod():
    # reference regex captures through the pmod args and appends the pmod
    # type (convert_to_cx2.py:11-39 observable behavior)
    lbl = extract_label("p(HGNC:HSF1, pmod(Ph, Thr, 142))")
    assert lbl.startswith("HSF1")
    assert "Ph" in lbl


def test_identifiers_url_bare_and_prefixed():
    # grounding_genes.py:80-88 both branches
    assert identifiers_url("HGNC", "14929") == "https://identifiers.org/HGNC:14929"
    assert identifiers_url("CHEBI", "CHEBI:15846") == "https://identifiers.org/CHEBI:15846"


def test_make_term():
    assert make_term("HGNC", "AKT1") == "p(HGNC:AKT1)"
    assert make_term("CHEBI", "thapsigargin") == "a(CHEBI:thapsigargin)"
    assert (
        make_term("HGNC", "HSF1", pmod=("Ph", "Thr", 142))
        == "p(HGNC:HSF1, pmod(Ph, Thr, 142))"
    )
    assert make_term("CHEBI", "oxygen atom") == 'a(CHEBI:"oxygen atom")'


def test_passive_pmod_extraction_reverses_roles():
    from llm_text_to_knowledge_graph_spark.operators.statements import (
        extract_from_sentence,
    )

    def ment(s, name):
        i = s.index(name)
        return {"begin": i, "end": i + len(name), "db": "HGNC", "entry_name": name}

    s = "HSF1 is phosphorylated by AKT1 at Ser 326."
    got = extract_from_sentence(s, [ment(s, "HSF1"), ment(s, "AKT1")])
    assert got == [
        ("p(HGNC:AKT1) directlyIncreases p(HGNC:HSF1, pmod(Ph, Ser, 326))", s)
    ]
    # without a site phrase the pmod keeps type only
    s2 = "HSF1 is dephosphorylated by AKT1."
    got2 = extract_from_sentence(s2, [ment(s2, "HSF1"), ment(s2, "AKT1")])
    assert got2 == [("p(HGNC:AKT1) directlyDecreases p(HGNC:HSF1, pmod(Ph))", s2)]


def test_nominalization_extraction_reverses_roles():
    from llm_text_to_knowledge_graph_spark.operators.statements import (
        extract_from_sentence,
    )

    def ment(s, name):
        i = s.index(name)
        return {"begin": i, "end": i + len(name), "db": "HGNC", "entry_name": name}

    s = "The inhibition of MTOR by AKT1 was evident."
    got = extract_from_sentence(s, [ment(s, "MTOR"), ment(s, "AKT1")])
    assert got == [("p(HGNC:AKT1) decreases p(HGNC:MTOR)", s)]
    # bare "by" without a known nominal prefix extracts nothing
    s2 = "The observation of MTOR by AKT1 was evident."
    assert extract_from_sentence(s2, [ment(s2, "MTOR"), ment(s2, "AKT1")]) == []


def test_custom_relation_lexicon_mode():
    """extract_from_sentence with a custom (phrase, relation) lexicon: the
    adjacency + exact-inter-text semantics are unchanged, but the biomedical
    extras (pmod verbs, subject wrappers, nominalizations) are disabled so
    behavior is fully determined by the supplied lexicon."""
    from llm_text_to_knowledge_graph_spark.operators.statements import (
        extract_from_sentence,
    )

    def ments(text, words):
        out = []
        for w in words:
            i = text.index(w)
            out.append({"begin": i, "end": i + len(w), "db": "VOCAB",
                        "id": w, "entry_name": w.upper(), "score": 1.0})
        return out

    lex = [("value", "increases"), ("key", "decreases")]
    text = "hash value table"
    got = extract_from_sentence(text, ments(text, ["hash", "table"]), lex)
    assert got == [("a(VOCAB:HASH) increases a(VOCAB:TABLE)", text)]

    # a phrase outside the custom lexicon emits nothing — even one the
    # default biomedical lexicon knows
    text2 = "hash phosphorylates table"
    assert extract_from_sentence(text2, ments(text2, ["hash", "table"]), lex) == []
    # ... while the default lexicon still handles it (pmod branch intact)
    got2 = extract_from_sentence(text2, ments(text2, ["hash", "table"]))
    assert got2 and "pmod(Ph)" in got2[0][0]

    # negation gate still applies in custom mode (inter text must not start
    # with a cue; here it simply fails the exact-match lookup too)
    text3 = "hash not value table"
    assert extract_from_sentence(text3, ments(text3, ["hash", "table"]), lex) == []
