"""E7 reviewer consensus: Spark aggregation vs the reference loop semantics.

The oracle inside this test reimplements comp_reviews.py:28-63's
Counter-based per-statement loop directly (driver-side, tiny data) and
compares it to the distributed plan's output, including the pinned
tie-break (reference Counter insertion order -> lexicographically smallest
fingerprint, documented in eval/reviews.py).
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.eval.reviews import (
    CRITERIA,
    REVIEWERS,
    fleiss_kappa,
    review_consensus,
    synth_reviews,
)


@pytest.fixture(scope="module")
def campaign(spark):
    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    return synth_reviews(ids, seed=11).cache()


def reference_loop(rows):
    """comp_reviews.py semantics over long-format rows, Counter and all."""
    by_idx = {}
    for r in rows:
        by_idx.setdefault(r["idx"], {}).setdefault(r["reviewer"], {})[
            r["criterion"]
        ] = r["marked"]
    out = {}
    for idx, reviewers in by_idx.items():
        all_correct_count = 0
        fingerprints = []
        error_counter = Counter()
        for reviewer in sorted(reviewers):  # file order in the reference
            scores = reviewers[reviewer]
            if scores.get("all_correct", False):
                all_correct_count += 1
            fingerprints.append(
                frozenset(
                    k for k, v in scores.items() if v is True and k != "comments"
                )
            )
            for k, v in scores.items():
                if k not in {"comments", "all_correct"} and v is True:
                    error_counter[k] += 1
        counts = Counter(fingerprints)
        top_n = max(counts.values())
        # pinned tie-break: smallest joined string among max-count fps
        best = min(
            "|".join(sorted(fp)) for fp, n in counts.items() if n == top_n
        )
        out[idx] = {
            "total_reviewers": len(reviewers),
            "all_correct_count": all_correct_count,
            "consensus_count": top_n,
            "agreed_criteria": best,
            "error_summary": ",".join(
                f"{k}:{error_counter[k]}" for k in sorted(error_counter)
            ),
        }
    return out


def test_consensus_matches_reference_loop(spark, campaign):
    rows = [r.asDict() for r in campaign.collect()]
    expected = reference_loop(rows)
    got = {r["idx"]: r.asDict() for r in review_consensus(campaign).collect()}
    assert set(got) == set(expected)
    for idx, exp in expected.items():
        g = got[idx]
        for k, v in exp.items():
            assert g[k] == v, (idx, k, g[k], v)


def test_campaign_shape_and_determinism(spark, campaign):
    assert campaign.count() == 40 * len(REVIEWERS) * len(CRITERIA)
    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    again = synth_reviews(ids, seed=11)
    assert campaign.exceptAll(again).count() == 0
    # a different seed actually changes draws
    other = synth_reviews(ids, seed=12)
    assert campaign.exceptAll(other).count() > 0


def test_fleiss_kappa_sufficient_stats(spark, campaign):
    row = fleiss_kappa(campaign).collect()[0]
    assert row.n_raters == len(REVIEWERS)
    assert row.n_subjects == 40 * len(CRITERIA)  # no 'comments' in synth
    # recompute kappa from the emitted integer sufficient statistics
    import math

    N, n, S, ssq = row.n_subjects, row.n_raters, row.sum_marked, row.sum_sq
    sum_sq_both = ssq + N * n * n - 2 * n * S + ssq
    p_bar = (sum_sq_both - N * n) / (N * n * (n - 1))
    p1 = S / (N * n)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert math.isclose(row.kappa, round(kappa, 6), abs_tol=1e-9)
    # binary-agreement sanity: kappa in [-1, 1]
    assert -1.0 <= row.kappa <= 1.0


def test_consensus_plan_is_partial_agg_no_python(spark, campaign):
    plan = review_consensus(campaign)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial" in plan.lower() or "HashAggregate" in plan
