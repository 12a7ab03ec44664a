"""words()/normalize/context-window parity with reference semantics
(reference src/zeshel_dataset.py:62-91 arithmetic)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from entity_linking_spark.functions.text import (
    context_window,
    mention_surface_from_text,
    normalize_text,
    words,
)


def reference_window(text: str, start: int, end: int, context_size: int) -> str:
    """LITERAL Python replica of the reference keep_left/keep_right slice
    arithmetic (src/zeshel_dataset.py:71-73) at word granularity — the
    oracle.  Deliberately unclamped: left[-keep_left:] keeps ALL left
    words when keep_left == 0 and drops from the front when negative;
    right[:keep_right] drops from the end when negative (ADVICE r01 #5 —
    the previous replica clamped both, hiding the divergence)."""
    ws = text.lower().split()
    mention = ws[start : end + 1]
    mention_len = len(mention) + 2  # start/end tags
    budget = context_size - 2
    keep_left = (budget - mention_len) // 2
    keep_right = budget - keep_left - mention_len
    left = ws[:start][-keep_left:]
    right = ws[end + 1 :][:keep_right]
    return " ".join(left + mention + right)


CASES = [
    ("alpha beta gamma delta epsilon zeta eta theta", 2, 3, 8),
    ("alpha beta gamma delta epsilon zeta eta theta", 0, 0, 8),   # at doc start
    ("alpha beta gamma delta epsilon zeta eta theta", 7, 7, 8),   # at doc end
    ("a b c d e f g h i j k l m n o p", 5, 6, 6),                 # keep_left==0 → all left
    ("one two three", 0, 2, 4),                                   # mention > window
    ("a b c d e f g h i j k l m n o p", 8, 14, 8),                # negative keep_left/right
    ("single", 0, 0, 32),
]


@pytest.mark.parametrize("text,s,e,cs", CASES)
def test_context_window_matches_reference_arithmetic(spark, text, s, e, cs):
    df = spark.createDataFrame([(text, s, e)], "text string, s long, e long")
    got = df.select(context_window("text", "s", "e", cs).alias("w")).collect()[0]["w"]
    assert got == reference_window(text, s, e, cs)


@given(
    st.lists(st.sampled_from(["foo", "Bar", "baz9", "x"]), min_size=1, max_size=20),
    st.data(),
)
@settings(max_examples=20, deadline=None)
def test_window_property(spark, tokens, data):
    text = " ".join(tokens)
    s = data.draw(st.integers(0, len(tokens) - 1))
    e = data.draw(st.integers(s, len(tokens) - 1))
    cs = data.draw(st.sampled_from([4, 8, 32]))
    df = spark.createDataFrame([(text, s, e)], "text string, s long, e long")
    got = df.select(context_window("text", "s", "e", cs).alias("w")).collect()[0]["w"]
    assert got == reference_window(text, s, e, cs)


def test_words_python_split_parity(spark):
    samples = ["", "  ", "a b", " a  b ", "\t x \n y ", "one"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    rows = df.select("t", words("t").alias("w")).collect()
    for r in rows:
        assert r.w == r.t.split()


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Foo   BAR baz ",)], "t string")
    assert df.select(normalize_text("t").alias("n")).collect()[0]["n"] == "foo bar baz"


def test_mention_surface_reconstruction(spark):
    df = spark.createDataFrame(
        [("The Quick  Brown Fox", 1, 2)], "text string, s long, e long"
    )
    got = df.select(
        mention_surface_from_text("text", "s", "e").alias("m")
    ).collect()[0]["m"]
    assert got == "quick brown"


def test_pad_or_truncate(spark):
    from entity_linking_spark.functions.text import pad_or_truncate

    df = spark.createDataFrame(
        [(1, [5, 6, 7]), (2, list(range(20))), (3, []), (4, [1, 2, 3, 4])],
        "id long, ids array<int>",
    )
    got = {
        r["id"]: r["p"]
        for r in df.select("id", pad_or_truncate("ids", 4, 0).alias("p")).collect()
    }
    assert got == {
        1: [5, 6, 7, 0],
        2: [0, 1, 2, 3],
        3: [0, 0, 0, 0],
        4: [1, 2, 3, 4],
    }


def test_canonical_url_shapes(spark):
    """Case-fold, default-port strip, fragment/tracking removal, param
    sort, trailing-slash strip, non-default port retained."""
    from entity_linking_spark.functions.url import canonical_url, url_host

    cases = [
        ("HTTP://Example.COM:80/a/?utm_source=x&q=1#frag",
         "http://example.com/a?q=1", "example.com"),
        ("https://Sub.Ex.org:443/path/", "https://sub.ex.org/path",
         "sub.ex.org"),
        ("https://ex.org/p?b=2&a=1&fbclid=zzz", "https://ex.org/p?a=1&b=2",
         "ex.org"),
        ("https://ex.org/", "https://ex.org", "ex.org"),
        ("http://ex.org:8080/z?ref=abc&x=9", "http://ex.org:8080/z?x=9",
         "ex.org:8080"),
        # :80 stripped only for http, :443 only for https
        ("https://ex.org:80/p", "https://ex.org:80/p", "ex.org:80"),
        # utm params without '=' are tracking params too
        ("http://ex.org/p?utm_campaign&keep=1", "http://ex.org/p?keep=1",
         "ex.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "u string")
    got = df.select(
        canonical_url("u").alias("c"),
        url_host(canonical_url("u")).alias("h"),
    ).collect()
    for (u, want_c, want_h), r in zip(cases, got):
        assert r["c"] == want_c, (u, r["c"])
        assert r["h"] == want_h, (u, r["h"])


def test_canonical_url_idempotent(spark):
    """canonical_url is a closure: applying it to its own output is the
    identity — the property that makes it safe as a dedup KEY (keys
    derived from keys never drift)."""
    from entity_linking_spark.functions.url import canonical_url

    urls = [
        "HTTP://Example.COM:80/a/?utm_source=x&q=1#frag",
        "https://Sub.Ex.org:443/path/",
        "https://ex.org/p?b=2&a=1&fbclid=zzz",
        "https://ex.org/",
        "http://ex.org:8080/z?ref=abc&x=9",
        "http://ex.org/p?utm_campaign&keep=1&also=2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = df.select(
        canonical_url("u").alias("c1"),
        canonical_url(canonical_url("u")).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], r
