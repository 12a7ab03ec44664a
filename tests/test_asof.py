"""As-of join vs a brute-force Python oracle (inclusive <= semantics,
per-key, NULL when no preceding right row)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.asof import as_of_join


def brute_force_asof(left_rows, right_rows):
    """{(key, lts, lid): (rts, rv) | None} — max right ts <= left ts."""
    out = {}
    for k, lts, lid in left_rows:
        best = None
        for rk, rts, rv in right_rows:
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, rv)
        out[(k, lts, lid)] = best
    return out


def test_asof_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    left_rows = [
        (int(rng.randint(0, 5)), int(rng.randint(0, 1000)), i) for i in range(60)
    ]
    # unique (key, ts) on the right side (defined-winner contract)
    seen = set()
    right_rows = []
    for j in range(80):
        k, t = int(rng.randint(0, 5)), int(rng.randint(0, 1000))
        if (k, t) not in seen:
            seen.add((k, t))
            right_rows.append((k, t, float(j)))
    left = spark.createDataFrame(left_rows, "k int, ts long, lid int")
    right = spark.createDataFrame(right_rows, "k int, ts long, rv double")

    got = {
        (r["k"], r["ts"], r["lid"]): (r["ts_r"], r["rv"])
        for r in as_of_join(left, right, on=["k"]).collect()
    }
    want = brute_force_asof(left_rows, right_rows)
    assert set(got) == set(want)
    for key in want:
        if want[key] is None:
            assert got[key] == (None, None), key
        else:
            assert got[key] == want[key], key


def test_asof_inclusive_tie_and_name_clash(spark):
    """right.ts == left.ts matches (>= semantics); clashing value column
    names get the suffix."""
    left = spark.createDataFrame([(1, 10, "L")], "k int, ts long, value string")
    right = spark.createDataFrame([(1, 10, 99.0)], "k int, ts long, value double")
    rows = as_of_join(left, right, on=["k"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["value"] == "L" and r["value_r"] == 99.0 and r["ts_r"] == 10
