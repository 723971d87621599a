"""Profile the fused-extraction hot loop WITHOUT Spark.

The fused operator's per-batch body (html -> paragraphs -> sentences ->
mentions -> statements -> triples) is pure Python; Spark only schedules it.
Profiling it driver-side over a synthetic page sample therefore shows the
exact per-function cost structure the executors see, with zero scheduler
noise. Run:

    python scripts/profile_fused.py [n_docs] [engine]

engine: sentence (default) | block
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    engine = sys.argv[2] if len(sys.argv) > 2 else "sentence"

    # Generate pages without a SparkSession: corpus.py's row synthesis is
    # pure; reuse its per-doc builder directly.
    from llm_text_to_knowledge_graph_spark.corpus import (
        build_alias_rows,
        build_entities,
        gen_doc,
    )

    entities = build_entities(seed=42)
    alias_rows = build_alias_rows(seed=42)
    rows = [
        r
        for i in range(n_docs)
        for r in [gen_doc(42, i, entities)]
        if r["lang"] == "en"
    ]

    from llm_text_to_knowledge_graph_spark.functions.bel import split_statement
    from llm_text_to_knowledge_graph_spark.operators.mentions import AliasMatcher
    from llm_text_to_knowledge_graph_spark.operators.statements import (
        extract_parts_from_sentence,
    )
    from llm_text_to_knowledge_graph_spark.sources.html_extract import (
        extract_paragraphs_text,
        split_sentences,
    )

    matcher = AliasMatcher(alias_rows)
    if engine == "block":
        from llm_text_to_knowledge_graph_spark.operators.extraction import (
            extract_from_block,
            normalize_block_text,
        )

    n_triples = 0

    def work() -> None:
        nonlocal n_triples
        for r in rows:
            html, text = r["html"], r["text"]
            for para in extract_paragraphs_text(html, text):
                if engine == "block":
                    para = normalize_block_text(para)
                    mentions = [
                        {"begin": b, "end": e, "alias": a, "db": db,
                         "id": i, "entry_name": n, "score": p}
                        for (b, e, a, db, i, n, p) in matcher.find(para)
                    ]
                    for stmt, _ev in extract_from_block(para, mentions):
                        if all(split_statement(stmt)):
                            n_triples += 1
                else:
                    for sentence in split_sentences(para):
                        mentions = [
                            {"begin": b, "end": e, "db": db, "entry_name": n}
                            for (b, e, _a, db, _i, n, _p) in matcher.find(sentence)
                        ]
                        # mirrors fused.extract_triples_fused: parts come
                        # pre-split, no split_statement re-parse
                        for _parts in extract_parts_from_sentence(
                            sentence, mentions
                        ):
                            n_triples += 1

    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    work()
    prof.disable()
    wall = time.perf_counter() - t0

    buf = io.StringIO()
    stats = pstats.Stats(prof, stream=buf)
    stats.sort_stats("cumulative").print_stats(30)
    print(buf.getvalue())
    print(
        f"engine={engine} docs={n_docs} triples={n_triples} wall={wall:.2f}s "
        f"({n_triples / wall:.0f} triples/s single-core)"
    )


if __name__ == "__main__":
    main()
