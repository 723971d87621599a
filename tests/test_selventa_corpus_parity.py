"""Parser robustness against the reference's full Selventa gold corpus.

The reference ships ~2000 hand-curated BEL statements from 57 PubMeds
(papers/small_corpus.bel:4-6). Every binary statement must round-trip
through our balanced-paren splitter (functions/bel.py::split_statement,
the P1 operator) and parse under the E1 evaluation parser — real curated
BEL, not synthetic, so this pins parity where it matters.
"""

import os
import re

import pytest

CORPUS = "/root/reference/papers/small_corpus.bel"
_STMT_RE = re.compile(r"^[A-Za-z]+\(")


def _statement_lines(path: str) -> list[str]:
    """Statement lines of a BEL script document: skip the document/definition
    header lines, comments, and the multi-line quoted values of SET
    statements (evidence text wraps across lines)."""
    out = []
    open_string = False
    for raw in open(path, encoding="utf-8", errors="replace"):
        line = raw.rstrip("\n")
        nq = line.count('"')
        if open_string:
            if nq % 2 == 1:
                open_string = False
            continue
        stripped = line.strip()
        if (
            not stripped
            or stripped.startswith("#")
            or stripped.startswith(("SET ", "UNSET ", "DEFINE "))
        ):
            if nq % 2 == 1:
                open_string = True
            continue
        if not _STMT_RE.match(stripped):
            continue  # wrapped prose that escaped the heuristic
        # BEL script allows trailing // comments — strip outside quotes
        if "//" in stripped:
            inq = False
            for j, c in enumerate(stripped):
                if c == '"':
                    inq = not inq
                elif not inq and c == "/" and stripped[j : j + 2] == "//":
                    stripped = stripped[:j].rstrip()
                    break
        if stripped.count('"') % 2 or stripped.count("(") != stripped.count(")"):
            continue  # not a complete single-line statement
        out.append(stripped)
    return out


@pytest.mark.skipif(not os.path.exists(CORPUS), reason="reference not present")
def test_selventa_corpus_round_trips_through_parser(spark):
    from pyspark.sql import functions as F

    from llm_text_to_knowledge_graph_spark.functions.bel import split_statement
    from llm_text_to_knowledge_graph_spark.operators.triples import parse_triples

    stmts = _statement_lines(CORPUS)
    assert len(stmts) > 1500, len(stmts)  # "approximately 2000 statements"

    # distributed parse through the production P1 operator
    df = spark.createDataFrame(
        [("bel://selventa", None, 0, i, s, "") for i, s in enumerate(stmts)],
        "url string, warc_ts timestamp, para_idx int, sent_idx int, "
        "bel_statement string, evidence string",
    )
    parsed = parse_triples(df, keep_unary=True).collect()
    assert len(parsed) == len(stmts)

    binary = [r for r in parsed if r.pred is not None]
    unary = [r for r in parsed if r.pred is None and r.subj is not None]
    failed = [r for r in parsed if r.subj is None]
    # hand-curated corpus: everything parses; ~94% binary, the rest are
    # genuine node-declaration statements (complex/rxn/sec/pmod'd proteins)
    assert not failed, [r.bel_statement for r in failed][:5]
    assert len(binary) / len(stmts) > 0.9
    for r in unary:
        assert re.fullmatch(r"[A-Za-z]+\(.*\)", r.subj), r.subj
        assert r.subj.count("(") == r.subj.count(")")

    # round-trip: subject + relation + object reassemble the original
    # statement byte-for-byte (whitespace-normalized)
    for r in binary:
        original = re.sub(r"\s+", " ", r.bel_statement).strip()
        assert f"{r.subj} {r.pred} {r.obj}" == original, r.bel_statement

    # relations seen are plausible BEL relation tokens (no parser drift into
    # swallowing terms): lowerCamelCase or ->/-| style arrows
    rels = {r.pred for r in binary}
    assert all(re.fullmatch(r"[a-zA-Z]+|->|-\||=>|=\||--|:>", p) for p in rels), rels


@pytest.mark.skipif(not os.path.exists(CORPUS), reason="reference not present")
def test_selventa_corpus_under_eval_parser():
    from llm_text_to_knowledge_graph_spark.eval.bel_eval import parse_statement

    stmts = _statement_lines(CORPUS)
    with_entities = 0
    for s in stmts:
        parsed = parse_statement(s)  # must never raise on curated BEL
        if parsed["subj_entities"] or parsed["obj_entities"]:
            with_entities += 1
    assert with_entities / len(stmts) > 0.9
