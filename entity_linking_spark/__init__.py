"""entity_linking_spark — a PySpark-native record-linkage / entity-linking engine.

Built from scratch with the query & data-processing capabilities of the
reference bi-encoder entity-linking pipeline (david-wb/entity-linking),
re-expressed Spark-first:

- transform: denormalize mentions against document corpora
  (reference: src/transform_zeshel.py) → broadcast hash joins + dedup.
- embed: deterministic 128-d hashed char-n-gram encoder
  (reference: src/bi_encoder.py:36-37 fixes the 128-d shared space and
  dot-product score semantic) → Arrow-vectorized pandas UDFs.
- candidate generation: salted-key blocking + MinHash-LSH bands, replacing
  the reference's exhaustive M×N matmul (src/eval_zeshel.py:44).
- pairwise scoring: embedding dot product + Jaro-Winkler + Levenshtein,
  batched through Arrow (no per-row Python).
- transitive clustering: large-star/small-star connected components.
- evaluation: per-mention top-k retrieval rate (src/eval_zeshel.py:38-53)
  and pairwise precision/recall/F1.

All heavy relational work is plain DataFrame ops so Catalyst/AQE handle
pushdown, join selection, and skew; Python appears only inside
Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
