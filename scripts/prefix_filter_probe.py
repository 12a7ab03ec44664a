"""Measure the AllPairs/PPJoin prefix filter on a Zipfian-vocabulary
corpus (VERDICT r03 #4).

The sf* synthetic documents have a tiny template vocabulary, so nearly
every pair shares a token and the prefix filter has almost no room
(dedup.py module docstring: 12.50M → 11.32M candidates at t=0.9).  On
natural web text the vocabulary is Zipfian — rare tokens are actually
rare — and prefix filtering is the published sub-quadratic shape.  This
probe generates such a corpus (fixtures.zipfian_corpus), counts the
operator's OWN candidate pairs (dedup._jaccard_candidates — the same
code path ngram_jaccard_pairs runs) with the filter on and off, verifies
result parity end-to-end, and prints one JSON line:

  {"n_docs": ..., "threshold": ..., "cand_unfiltered": N,
   "cand_prefix": M, "reduction_x": N/M, "pairs_match": true}

Appends the measurement to BENCH/PREFIX_FILTER.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from entity_linking_spark.fixtures import zipfian_corpus  # noqa: E402
from entity_linking_spark.functions.text import normalize_text, words  # noqa: E402
from entity_linking_spark.operators._cache import cache_scope, track  # noqa: E402
from entity_linking_spark.operators.dedup import (  # noqa: E402
    _jaccard_candidates,
    ngram_jaccard_pairs,
)
from entity_linking_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_docs = int(os.environ.get("PREFIX_PROBE_DOCS", "5000"))
    threshold = float(os.environ.get("PREFIX_PROBE_T", "0.9"))
    spark = get_spark(app_name="prefix-filter-probe", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = zipfian_corpus(spark, n_docs=n_docs).persist()
    docs.count()

    with cache_scope():
        exploded = track(
            docs.select(
                "id",
                F.explode(
                    F.array_distinct(words(normalize_text(F.col("text"))))
                ).alias("key"),
            )
        )
        exploded.count()
        n_unfiltered = _jaccard_candidates(
            exploded, threshold, prefix_filter=False
        ).count()
        n_prefix = _jaccard_candidates(
            exploded, threshold, prefix_filter=True
        ).count()

    # end-to-end parity: the filter is a pure candidate optimization
    with cache_scope():
        with_f = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(
                docs, "id", "text", threshold=threshold, tokenizer="word"
            ).collect()
        }
    with cache_scope():
        without_f = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(
                docs, "id", "text", threshold=threshold, tokenizer="word",
                prefix_filter=False,
            ).collect()
        }

    out = {
        "n_docs": n_docs,
        "threshold": threshold,
        "cand_unfiltered": n_unfiltered,
        "cand_prefix": n_prefix,
        "reduction_x": round(n_unfiltered / max(n_prefix, 1), 2),
        "true_pairs": len(with_f),
        "pairs_match": with_f == without_f,
    }
    print(json.dumps(out))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    note = os.path.join(repo, "BENCH", "PREFIX_FILTER.md")
    header_needed = not os.path.exists(note)
    with open(note, "a") as f:
        if header_needed:
            f.write(
                "# Prefix-filter measurement (scripts/prefix_filter_probe.py)\n\n"
                "AllPairs/PPJoin candidate reduction on a Zipfian-vocabulary\n"
                "corpus (fixtures.zipfian_corpus — natural-web-text token\n"
                "statistics), counted on the operator's own candidate stage\n"
                "(dedup._jaccard_candidates).  `pairs_match` re-verifies the\n"
                "filter is result-identical end-to-end on this corpus.\n\n"
                "| n_docs | t | candidates (no filter) | candidates (prefix) "
                "| reduction | true pairs | parity |\n"
                "|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {n_docs} | {threshold} | {n_unfiltered} | {n_prefix} "
            f"| {out['reduction_x']}× | {len(with_f)} | {out['pairs_match']} |\n"
        )
    spark.stop()
    return 0 if out["pairs_match"] else 1


if __name__ == "__main__":
    sys.exit(main())
