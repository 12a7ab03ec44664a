"""Text normalization & mention-context windowing as Column expressions.

All functions here return pure Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs.

Reference parity notes:
- Python ``str.split()`` (reference src/zeshel_dataset.py:66) collapses
  whitespace runs and drops leading/trailing empties; ``words()`` below
  replicates that byte-identically.
- The context window replicates the keep_left/keep_right arithmetic of
  reference src/zeshel_dataset.py:72-74 at word granularity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(col: Column | str) -> Column:
    """Whitespace word split with Python str.split() semantics.

    ``F.split`` on ``\\s+`` leaves an empty leading element when the string
    starts with whitespace and an empty trailing element set; filter them.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda w: w != F.lit(""))


def normalize_text(col: Column | str) -> Column:
    """Lowercase + trim + collapse internal whitespace to single spaces.

    Mirrors reference lowercasing (src/zeshel_dataset.py:65-66,94-95) plus
    the whitespace collapse implied by split-then-join (':69-70').
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def word_count(col: Column | str) -> Column:
    return F.size(words(col))


def context_window(
    text: Column | str,
    start_index: Column | str,
    end_index: Column | str,
    context_size: int = 32,
) -> Column:
    """Words kept around a mention, replicating the reference arithmetic.

    Reference (src/zeshel_dataset.py:68-74):
        mention_tokens = [start_tag] + tokenize(mention) + [end_tag]
        keep_left  = (context_size - 2 - len(mention_tokens)) // 2
        keep_right = context_size - 2 - keep_left - len(mention_tokens)
        ctx = left[-keep_left:] + mention_tokens + right[:keep_right]

    Here tokens are whitespace words, so len(mention_tokens) =
    (end-start+1) + 2 tags.  Returns the joined window string
    "left_ctx mention right_ctx" (lowercased, single-spaced).

    The Python slice semantics of the reference are reproduced EXACTLY,
    including the degenerate budgets (ADVICE r01 #5): when the mention
    fills the budget, keep_left hits 0 and ``left[-0:]`` keeps ALL left
    tokens; past that, keep_left goes negative and ``left[-keep_left:]``
    DROPS tokens from the front, while a negative keep_right makes
    ``right[:keep_right]`` drop from the end.  Verified against a
    literal-Python replica in tests/test_text.py.
    """
    t = F.col(text) if isinstance(text, str) else text
    s = F.col(start_index) if isinstance(start_index, str) else start_index
    e = F.col(end_index) if isinstance(end_index, str) else end_index

    ws = words(F.lower(t))
    n = F.size(ws)
    mention_len = e - s + F.lit(1) + F.lit(2)  # + start/end tags
    budget = F.lit(context_size - 2)
    # Python floor division (// floors toward -inf) — F.floor on the
    # double quotient matches for negative budgets too.
    keep_left = F.floor((budget - mention_len) / 2).cast("int")
    keep_right = (budget - keep_left - mention_len).cast("int")
    s_i = s.cast("int")

    # left words = ws[0:s]; Python left[-keep_left:]  (slice() is 1-based)
    left_start = (
        F.when(keep_left > 0, F.greatest(s_i - keep_left, F.lit(0)))
        .when(keep_left == 0, F.lit(0))
        .otherwise(F.least(-keep_left, s_i))
    )
    left = F.slice(ws, left_start + 1, s_i - left_start)

    mention = F.slice(ws, s_i + 1, (e - s + 1).cast("int"))

    # right words = ws[e+1:n]; Python right[:keep_right]
    right_start = e.cast("int") + 1
    rlen_all = F.greatest(n - right_start, F.lit(0))
    right_take = F.when(keep_right >= 0, F.least(keep_right, rlen_all)).otherwise(
        F.greatest(rlen_all + keep_right, F.lit(0))
    )
    right = F.slice(ws, right_start + 1, right_take)

    return F.concat_ws(" ", F.concat(left, mention, right))


def pad_or_truncate(col: Column | str, max_len: int, pad_value=0) -> Column:
    """Fixed-length sequence: truncate an array column to ``max_len`` then
    right-pad with ``pad_value`` — the reference's input_ids padding
    (src/zeshel_dataset.py:76-81: ctx_tokens[:model_max_length-2] then
    `+ [pad_token_id] * remaining`), SURVEY §2.5 W5, as a pure Column
    expression (no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    sliced = F.slice(c, 1, max_len)
    pad_n = F.greatest(F.lit(max_len) - F.size(sliced), F.lit(0))
    return F.concat(sliced, F.array_repeat(F.lit(pad_value), pad_n))


def mention_surface_from_text(
    text: Column | str, start_index: Column | str, end_index: Column | str
) -> Column:
    """Reconstruct the (lowercased) mention surface from word offsets —
    the FIXTURES.md §2 invariant: words(lower(text))[start:end+1]."""
    t = F.col(text) if isinstance(text, str) else text
    s = F.col(start_index) if isinstance(start_index, str) else start_index
    e = F.col(end_index) if isinstance(end_index, str) else end_index
    ws = words(F.lower(t))
    return F.concat_ws(" ", F.slice(ws, s.cast("int") + 1, (e - s + 1).cast("int")))
