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
