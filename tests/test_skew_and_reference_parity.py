"""salted_join correctness + eval-parser robustness on real reference BEL."""

import json
import os

import pytest
from pyspark.sql import functions as F

REF_FIXTURE = "/root/reference/results/pmid9813040/sentences_with_extractions.json"


def test_salted_join_equals_plain_join(spark):
    from llm_text_to_knowledge_graph_spark.plans.ids import salted_join

    # Zipf-skewed fact side: hot key 'k0' dominates
    fact = spark.createDataFrame(
        [(f"k{min(i % 50, i % 7)}", i) for i in range(5000)], "k string, v long"
    )
    dim = spark.createDataFrame(
        [(f"k{i}", f"name-{i}") for i in range(50)], "k string, name string"
    )
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, on="k").select("k", "v", "name")
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b
    assert len(a) == 5000


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="reference not present")
def test_eval_parser_on_reference_gold_statements():
    """Parse every gold BEL statement from the reference's per-sentence
    fixture: the split + component parse must succeed and the statement
    must self-match at the 0.80 ceiling when relational."""
    from llm_text_to_knowledge_graph_spark.eval.bel_eval import (
        match_score,
        parse_statement,
    )
    from llm_text_to_knowledge_graph_spark.functions.bel import split_statement

    with open(REF_FIXTURE, encoding="utf-8") as f:
        data = json.load(f)
    stmts = []
    for entry in data.values():
        for s in entry.get("bel_statements", []):
            s = s.strip()
            # fixture interleaves BEL-script SET directives with statements
            if s and not s.startswith(("SET ", "UNSET")):
                stmts.append(s)
    assert len(stmts) > 10
    n_relational = 0
    for s in stmts:
        subj, rel, obj = split_statement(s)
        assert subj is not None
        p = parse_statement(s)
        if p["rel"] is not None and p["obj_entities"]:
            n_relational += 1
            assert match_score(p, p) >= 0.5, s
    assert n_relational > 5


def test_dense_ids_dedup_fold_matches_distinct_path(spark):
    """dense_ids(dedup=True) over duplicated keys == dense_ids over distinct
    keys, with one fewer exchange in the plan."""
    from llm_text_to_knowledge_graph_spark.plans.ids import dense_ids
    from pyspark.sql import functions as F

    rows = [(f"k{i % 37}", i % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "a string, b int")
    via_distinct = dense_ids(df.distinct(), ["a", "b"], out_col="id", buckets=8)
    via_fold = dense_ids(df, ["a", "b"], out_col="id", buckets=8, dedup=True)
    assert sorted(map(tuple, via_distinct.collect())) == sorted(
        map(tuple, via_fold.collect())
    )
    n = via_fold.count()
    assert sorted(r.id for r in via_fold.collect()) == list(range(n))
    # the fold saves the distinct's exchange: strictly fewer shuffles overall.
    # Compare with materialize_once=False — the cached path reads an
    # InMemoryTableScan, hiding the upstream exchanges this assertion is
    # about.
    lazy_fold = dense_ids(
        df, ["a", "b"], out_col="id", buckets=8, dedup=True,
        materialize_once=False,
    )
    lazy_dist = dense_ids(
        df.distinct(), ["a", "b"], out_col="id", buckets=8,
        materialize_once=False,
    )
    lazy_fold.collect()
    lazy_dist.collect()
    plan_fold = lazy_fold._jdf.queryExecution().executedPlan().toString()
    plan_dist = lazy_dist._jdf.queryExecution().executedPlan().toString()
    assert plan_fold.count("Exchange") < plan_dist.count("Exchange")


def test_dense_ids_laziness_and_materialize_modes(spark):
    """dense_ids construction must run ZERO jobs, in both modes — the
    round-4 localCheckpoint variant violated this under AQE (checkpoint
    forces queryExecution.toRdd, which materializes every upstream query
    stage at plan-BUILD time), which made merely composing nodes/edges
    execute the whole extraction and halved the benched modular-pipeline
    throughput.

    Execution counts are mode-dependent and DELIBERATE: the default
    (materialize_once=False, pure/stateless — no CacheManager entry
    pinned forever, the leak that OOM'd the 1 GB scaling-job driver at
    trial 2) lets the offsets broadcast job re-execute the bucketed
    subtree once (ReuseExchange misses after not-null inference);
    materialize_once=True pins exactly-once via a lazy persist."""
    import pandas as pd

    from llm_text_to_knowledge_graph_spark.plans.ids import dense_ids

    def make(acc_):
        def counting(batches):
            for pdf in batches:
                acc_.add(len(pdf))
                yield pdf
        return counting

    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(400)], "name string"
    ).repartition(4)

    # default: lazy construction, stateless, upstream runs once per
    # consumer (ranked window + offsets broadcast = 2x)
    acc = spark.sparkContext.accumulator(0)
    out = dense_ids(
        df.mapInPandas(make(acc), schema="name string"),
        ["name"], out_col="id", buckets=8,
    )
    assert acc.value == 0  # zero jobs at plan-build
    assert out.count() == 400
    assert sorted(r.id for r in out.collect()) == list(range(400))
    assert acc.value >= 400  # ran; exactly-once NOT promised here

    # materialize_once=True: still lazy at build, exactly-once at run
    acc2 = spark.sparkContext.accumulator(0)
    out2 = dense_ids(
        df.mapInPandas(make(acc2), schema="name string"),
        ["name"], out_col="id", buckets=8, materialize_once=True,
    )
    assert acc2.value == 0
    n = out2.count()
    assert n == 400
    assert sorted(r.id for r in out2.collect()) == list(range(400))
    # every downstream action re-reads the cached blocks, never the
    # Python stage: the accumulator saw each row exactly once
    assert acc2.value == 400
    spark.catalog.clearCache()  # drop the pinned b-cache entry
