"""E1-E3 behavior on the reference's real LLM-vs-INDRA comparison data.

The reference ships 42 (llm_statement, indra_statement) pairs from its
published comparison run (bel_comparison_results.json). Our evaluation
harness must (a) parse every real INDRA-format statement (`ns:id ! name`,
`pmod(go:... ! "protein phosphorylation", Ser, N)`), (b) agree with the
fixture's relationship verdict on every pair, and (c) score with exactly
the documented discrete constants (bel_parser.py:379-412 — the fixture's
own `match_score` column comes from a separate text-similarity-blended
analysis script and is intentionally NOT the target).
"""

import json
import os

import pytest

FIXTURE = (
    "/root/reference/evaluation_tests_and_analysis/indra_vs_texttoKG_tests/"
    "bel_comparison_results.json"
)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference not present")
def test_real_indra_pairs_parse_match_and_score_discretely():
    from llm_text_to_knowledge_graph_spark.eval.bel_eval import (
        match_score,
        parse_statement,
    )

    rows = json.load(open(FIXTURE))
    both = [r for r in rows if r.get("llm_statement") and r.get("indra_statement")]
    assert len(both) == 42

    # the discrete lattice the documented constants can produce:
    # entity-gate 0, then {0, .20, .30} + subj_mod {0, .10, .25} + obj {0, .10, .25}
    lattice = {
        round(rel + sm + om, 2)
        for rel in (0.0, 0.20, 0.30)
        for sm in (0.0, 0.10, 0.25)
        for om in (0.0, 0.10, 0.25)
    } | {0.0}

    rel_agree = 0
    for r in both:
        a = parse_statement(r["llm_statement"])
        b = parse_statement(r["indra_statement"])  # must not raise on INDRA form
        # E2 normalization grounds the INDRA side: real entities come out
        assert b["subj_entities"] or b["obj_entities"], r["indra_statement"]
        rel_match = a["rel"] is not None and a["rel"] == b["rel"]
        rel_agree += rel_match == bool(r["relationship_match"])
        score = match_score(a, b)
        assert round(score, 2) in lattice, (score, r["llm_statement"])
    assert rel_agree == len(both)  # 42/42 relationship-verdict agreement


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference not present")
def test_entity_normalization_outmatches_fixture_script():
    """The fixture's subject_match column was computed WITHOUT INDRA-form
    normalization (its own summary reports 0 exact matches partly from
    format differences); our E2 normalization must recover the genuinely
    identical entities the fixture script missed — e.g. HGNC AKT1/AKT2
    subjects written as `p(HGNC:391 ! AKT1)` vs `act(p(HGNC:AKT1), ...)`."""
    from llm_text_to_knowledge_graph_spark.eval.bel_eval import parse_statement

    rows = json.load(open(FIXTURE))
    both = [r for r in rows if r.get("llm_statement") and r.get("indra_statement")]
    recovered = 0
    for r in both:
        a = parse_statement(r["llm_statement"])
        b = parse_statement(r["indra_statement"])
        ours = bool(a["subj_entities"] & b["subj_entities"])
        if ours and not r["subject_match"]:
            recovered += 1
    assert recovered >= 10  # many same-entity subjects the raw comparison missed
