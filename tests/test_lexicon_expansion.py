"""Orthography expansion (operators/lexicon.py) and the conjoined-VP
subject re-binding it motivated (r5: VERDICT item #4 — the Gilda-style
variant pass, validated on the Selventa DEV shard, reported on the
frozen held-out shard)."""

from llm_text_to_knowledge_graph_spark.operators.lexicon import (
    expand_orthography,
)


def _aliases(rows):
    return {r[0] for r in rows}


def _expand_one(alias):
    return _aliases(expand_orthography([(alias, "HGNC", "1", alias, 1.0)]))


def test_greek_suffix_twins():
    got = _expand_one("HIF1A")
    for want in ("HIF-1A", "HIF1alpha", "HIF-1alpha", "HIF1α", "HIF-1α"):
        assert want in got, want
    got = _expand_one("TGFA")
    for want in ("TGF-A", "TGF-alpha", "TGFalpha", "TGF-α", "TGFα"):
        assert want in got, want


def test_greek_word_char_twins():
    assert "TGF-β" in _expand_one("TGF-beta")
    assert "TGF-beta" in _expand_one("TGF-β")


def test_dash_twins():
    got = _expand_one("IRAK1")
    assert "IRAK-1" in got
    got = _expand_one("NF-kB")
    assert "NFkB" in got
    # the SPACED twin is deliberately absent: "Akt-Ser473" -> "Akt
    # Ser473" measurably steals residue spans from the pmod patterns
    assert "NF kB" not in got


def test_no_expansion_for_short_or_wordlike():
    # short symbols and English-word shapes never expand ("AKT" has no
    # trailing-Greek stem of length 3 with the gate; "NO"/"insulin"
    # style aliases stay untouched)
    assert _expand_one("AKT") == {"AKT"}
    assert _expand_one("insulin") == {"insulin"}
    assert _expand_one("NO") == {"NO"}


def test_idempotent_and_deterministic():
    rows = [
        ("HIF1A", "HGNC", "1", "HIF1A", 1.0),
        ("TGF-beta", "HGNC", "2", "TGFB1", 1.0),
    ]
    once = expand_orthography(rows)
    twice = expand_orthography(once)
    assert once == twice
    assert once == expand_orthography(rows)


def test_variants_inherit_grounding():
    rows = expand_orthography([("HIF1A", "HGNC", "7", "HIF1A", 0.5)])
    for alias, ns, id_, entry, prior in rows:
        assert (ns, id_, entry, prior) == ("HGNC", "7", "HIF1A", 0.5)


def test_collision_first_wins():
    # a variant equal to an EXISTING alias is never re-added or re-bound
    rows = [
        ("IRAK-1", "HGNC", "A", "IRAK1", 1.0),
        ("IRAK1", "HGNC", "B", "OTHER", 1.0),
    ]
    out = expand_orthography(rows)
    bound = [r for r in out if r[0] == "IRAK-1"]
    assert bound == [("IRAK-1", "HGNC", "A", "IRAK1", 1.0)]


def test_conjoined_vp_rebinds_matrix_subjects():
    """'<S> stimulated phosphorylation of X and increased phosphorylation
    of Y': the second VP shares the MATRIX subject(s); X must not be
    wrongly read as Y's subject (the shape block 744 of the Selventa
    corpus prints)."""
    import sys

    sys.path.insert(0, "tests")
    from test_real_gold import _extract

    got = _extract(
        "AAA or BBB stimulated phosphorylation of CCC and increased "
        "phosphorylation of DDD."
    )
    assert set(got) == {
        "p(HGNC:AAA) increases p(HGNC:CCC, pmod(Ph))",
        "p(HGNC:BBB) increases p(HGNC:CCC, pmod(Ph))",
        "p(HGNC:AAA) increases a(CHEBI:ddd, pmod(Ph))",
        "p(HGNC:BBB) increases a(CHEBI:ddd, pmod(Ph))",
    }
    # subject-coordination through the connective is untouched: left of
    # "and" here is a genuine subject conjunct, not a first-VP object
    got = _extract("AAA and BBB are required for CCC.")
    assert set(got) == {
        "p(HGNC:AAA) increases p(HGNC:CCC)",
        "p(HGNC:BBB) increases p(HGNC:CCC)",
    }


_FAM_LEX = [
    ("GSK-3α", "HGNC", "1", "GSK3A", 1.0),
    ("GSK-3β", "HGNC", "2", "GSK3B", 1.0),
    ("forskolin", "CHEBI", "f", "forskolin", 1.0),
    ("Forskolin", "CHEBI", "f", "forskolin", 1.0),
    ("CD40", "HGNC", "c", "CD40", 1.0),
]


def _fam_extract(text):
    import sys

    sys.path.insert(0, "tests")
    from test_real_gold import _ments_for

    from llm_text_to_knowledge_graph_spark.operators.extraction import (
        extract_from_block,
    )

    return [
        s for s, _ in extract_from_block(text, _ments_for(text, _FAM_LEX))
    ]


def test_family_member_anaphora():
    """A family token the block's own mentions extend with a
    Greek/uppercase suffix ('GSK-3' after 'GSK-3α' was printed) denotes
    those members on subsequent reference; the statement distributes
    with pmod(Ph). Relative clauses between agent and family NP are
    stripped by the comma-segment retry."""
    got = _fam_extract(
        "GSK-3α and GSK-3β were examined. Forskolin, which raises "
        "intracellular cAMP levels, triggered a similar elevation in "
        "GSK-3 phosphorylation at serine 21 and 9."
    )
    assert set(got) == {
        "a(CHEBI:forskolin) increases p(HGNC:GSK3A, pmod(Ph))",
        "a(CHEBI:forskolin) increases p(HGNC:GSK3B, pmod(Ph))",
    }
    # digit extensions are NOT family members: "CD4 phosphorylation"
    # never resolves to the CD40 mention (a different gene)
    got = _fam_extract(
        "CD40 was examined. Forskolin stimulated CD4 phosphorylation."
    )
    assert got == []
    # a family token that IS part of a real mention never fires twice:
    # the normal pair machinery owns it
    got = _fam_extract("Forskolin stimulated GSK-3α phosphorylation.")
    assert got == [
        "a(CHEBI:forskolin) increases p(HGNC:GSK3A, pmod(Ph))"
    ]


def test_lowercase_continuation_is_not_a_sentence_boundary():
    """A period followed by a lowercase FUNCTION word is corpus noise
    ('acid. also led to') and must not split the sentence — here the
    agent and the family NP sit on opposite sides of the noise."""
    got = _fam_extract(
        "GSK-3α was examined. Stimulation with agonists, such as "
        "forskolin. also led to GSK-3 phosphorylation (data not shown)"
    )
    assert got == [
        "a(CHEBI:forskolin) increases p(HGNC:GSK3A, pmod(Ph))"
    ]
    # ...but a lowercase CONTENT word still splits: biomedical prose
    # legitimately opens sentences with lowercase symbols, and merging
    # them would create cross-boundary false pairs
    from llm_text_to_knowledge_graph_spark.operators.extraction import (
        _sentence_spans,
    )

    t = "GSK-3β plays a role. forskolin treatment was examined."
    assert len(_sentence_spans(t)) == 2


def test_family_anaphora_hardening():
    """Review-closed hazards: (a) members resolve ANAPHORICALLY only —
    a paralog first printed AFTER the family NP may be contrasted, not
    co-referred; (b) an unhyphenated trailing Latin letter is not a
    member (EGFR is EGF's receptor, not a paralog); (c) a loss-of
    prefix before the agent flips the sign, same as the pair branch."""
    got = _fam_extract(
        "forskolin led to GSK-3 phosphorylation. In contrast, "
        "GSK-3β was unaffected."
    )
    assert got == []  # no member printed BEFORE the family NP
    egfr_lex = [
        ("EGFR", "HGNC", "e", "EGFR", 1.0),
        ("forskolin", "CHEBI", "f", "forskolin", 1.0),
    ]
    import sys

    sys.path.insert(0, "tests")
    from test_real_gold import _ments_for

    from llm_text_to_knowledge_graph_spark.operators.extraction import (
        extract_from_block,
    )

    got = [
        s for s, _ in extract_from_block(
            "EGFR was examined. forskolin stimulated EGF phosphorylation.",
            _ments_for(
                "EGFR was examined. forskolin stimulated EGF "
                "phosphorylation.",
                egfr_lex,
            ),
        )
    ]
    assert got == []  # EGFR is not a member of family "EGF"
    got = _fam_extract(
        "GSK-3α was examined. Inhibition of forskolin, however, "
        "led to GSK-3 phosphorylation."
    )
    assert got == [
        "a(CHEBI:forskolin) decreases p(HGNC:GSK3A, pmod(Ph))"
    ]
