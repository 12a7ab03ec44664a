"""Deterministic HTML→text extraction as a Column expression.

North-rule invariant (BASELINE.json:input_hint): byte-identical extracted
text per url.  The reference consumes pre-extracted text (its corpora
already carry ``text`` fields, reference src/transform_zeshel.py:42-49), so
the invariant binds this extractor to the engine's own frozen semantics:

  1. drop <script>/<style> subtrees
  2. replace every remaining tag with a single space
  3. decode the five standard entities (&amp; &lt; &gt; &quot; &#39;)
  4. collapse whitespace runs to single spaces, trim

Pure regexp_replace chain — JVM-side, whole-stage codegen, deterministic
across runs and parallelism levels.  FROZEN: changing any step breaks the
byte-identical gate in tests/test_extract.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def extract_text(html: Column | str) -> Column:
    """html: binary (UTF-8) or string column → extracted plain text."""
    c = F.col(html) if isinstance(html, str) else html
    s = c.cast("string")
    s = F.regexp_replace(s, r"(?is)<script\b.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style>", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    s = F.regexp_replace(s, r"&amp;", "&")
    s = F.regexp_replace(s, r"&lt;", "<")
    s = F.regexp_replace(s, r"&gt;", ">")
    s = F.regexp_replace(s, r"&quot;", "\"")
    s = F.regexp_replace(s, r"&#39;", "'")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def extract_title(html: Column | str) -> Column:
    c = F.col(html) if isinstance(html, str) else html
    s = c.cast("string")
    return F.trim(F.regexp_extract(s, r"(?is)<title[^>]*>(.*?)</title>", 1))
