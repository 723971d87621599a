"""Property-based tests: BEL term/statement construction round-trips
through the parser for arbitrary generated entities and relations."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from llm_text_to_knowledge_graph_spark.eval.bel_eval import match_score, parse_statement
from llm_text_to_knowledge_graph_spark.functions.bel import (
    BEL_RELATIONS,
    NS_FUNC,
    PMOD_RESIDUES,
    make_term,
    split_statement,
)

_name = st.text(alphabet=string.ascii_uppercase + string.digits, min_size=2, max_size=12).filter(
    lambda s: s[0].isalpha()
)
_ns = st.sampled_from(list(NS_FUNC))
_rel = st.sampled_from(BEL_RELATIONS)
_pmod = st.one_of(
    st.none(),
    st.tuples(
        st.sampled_from(["Ph", "Ac", "Me", "Ub", "Sumo"]),
        st.sampled_from(PMOD_RESIDUES),
        st.integers(min_value=1, max_value=2000),
    ),
)


@settings(max_examples=300, deadline=None)
@given(ns1=_ns, n1=_name, rel=_rel, ns2=_ns, n2=_name, pm=_pmod)
def test_split_round_trip(ns1, n1, rel, ns2, n2, pm):
    subj = make_term(ns1, n1)
    obj = make_term(ns2, n2, pmod=pm)
    stmt = f"{subj} {rel} {obj}"
    s, r, o = split_statement(stmt)
    assert (s, r, o) == (subj, rel, obj)


@settings(max_examples=200, deadline=None)
@given(ns1=_ns, n1=_name, rel=_rel, ns2=_ns, n2=_name, pm=_pmod)
def test_self_match_score_is_max(ns1, n1, rel, ns2, n2, pm):
    subj = make_term(ns1, n1)
    obj = make_term(ns2, n2, pmod=pm)
    stmt = f"{subj} {rel} {obj}"
    p = parse_statement(stmt)
    # relationship-detection requires the relation to survive normalization;
    # every vocabulary relation must be self-comparable at max score 0.80
    score = match_score(p, p)
    assert score == 0.80, (stmt, score)


@settings(max_examples=200, deadline=None)
@given(n1=_name)
def test_unary_statements_never_split(n1):
    term = make_term("HGNC", n1)
    assert split_statement(term) == (term, None, None)


# names with spaces / dots exercise the quoted-name path of make_term
_messy_name = st.text(
    alphabet=string.ascii_letters + string.digits + " .-", min_size=2, max_size=16
).filter(lambda s: s.strip() == s and s[0].isalpha())


@settings(max_examples=300, deadline=None)
@given(
    ns1=_ns, n1=_messy_name, ns2=_ns, n2=_messy_name, ns3=_ns, n3=_messy_name,
    pm=_pmod,
)
def test_extract_parts_equal_split_statement(ns1, n1, ns2, n2, ns3, n3, pm):
    """The fused operators consume extract_parts_from_sentence's (subj, rel,
    obj) WITHOUT re-parsing; this pins that split_statement(stmt) would have
    produced exactly those parts — including complex() subjects, act()
    wrappers, pmod objects with sites, and quoted entity names."""
    from llm_text_to_knowledge_graph_spark.operators.statements import (
        extract_parts_from_sentence,
    )

    def ment(begin, text, ns, name):
        return {"begin": begin, "end": begin + len(text), "db": ns,
                "entry_name": name, "alias": text, "id": "1", "score": 1.0}

    cases = [
        # phrase relation + activity wrapper
        ("The catalytic activity of AAA activates BBB today.",
         [ment(26, "AAA", ns1, n1), ment(40, "BBB", ns2, n2)]),
        # pmod verb with a site phrase
        ("AAA phosphorylates BBB at Ser 9 in cells.",
         [ment(0, "AAA", ns1, n1), ment(19, "BBB", ns2, n2)]),
        # passive pmod (roles reversed)
        ("BBB is phosphorylated by AAA at Thr 308.",
         [ment(0, "BBB", ns2, n2), ment(25, "AAA", ns1, n1)]),
        # nominalization (roles reversed)
        ("Strong inhibition of BBB by AAA was seen.",
         [ment(21, "BBB", ns2, n2), ment(28, "AAA", ns1, n1)]),
        # complex subject over three mentions
        ("AAA/BBB complex increases CCC here.",
         [ment(0, "AAA", ns1, n1), ment(4, "BBB", ns2, n2),
          ment(26, "CCC", ns3, n3)]),
        # Phosphorylated-subject wrapper
        ("Phosphorylated AAA inhibits BBB.",
         [ment(15, "AAA", ns1, n1), ment(28, "BBB", ns2, n2)]),
    ]
    for sentence, mentions in cases:
        parts = extract_parts_from_sentence(sentence, mentions)
        # every case must actually fire — a silent [] (e.g. from a bad
        # mention offset) would make the round-trip assertions vacuous
        assert parts, sentence
        for subj, rel, obj, stmt, ev in parts:
            assert stmt == f"{subj} {rel} {obj}"
            assert split_statement(stmt) == (subj, rel, obj), stmt
            assert ev == sentence
