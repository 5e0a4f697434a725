"""Skyline (operators/pareto.py) and blocked Levenshtein join
(operators/fuzzy.py) against brute-force Python references, plus
dominance/blocking edge cases. Cross-engine parity for the registered
queries runs in test_oracle_parity.py."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from kinesis_stream_spark.operators.fuzzy import fuzzy_pairs
from kinesis_stream_spark.operators.pareto import skyline_2d


def _dominates(p, q):
    """p dominates q: ≤ on price, ≥ on size, strict in one."""
    return (
        p[0] <= q[0]
        and p[1] >= q[1]
        and (p[0] < q[0] or p[1] > q[1])
    )


def _skyline_truth(rows):
    out = []
    for i, (g, _, pr, sz) in enumerate(rows):
        if not any(
            _dominates((pr2, sz2), (pr, sz))
            for j, (g2, _, pr2, sz2) in enumerate(rows)
            if j != i and g2 == g
        ):
            out.append(rows[i])
    return sorted(out)


ROWS = [
    # group A: a clean staircase plus dominated interior points
    ("A", 1, 1.0, 5),
    ("A", 2, 2.0, 7),
    ("A", 3, 2.0, 7),  # duplicate of 2 — incomparable, both survive
    ("A", 4, 1.5, 6),
    ("A", 5, 3.0, 6),  # dominated by 4 (more expensive, smaller-or-eq)
    ("A", 6, 2.0, 3),  # same price as 2 but smaller — dominated
    ("A", 7, 0.5, 1),  # cheapest: always on the frontier
    # group B: price tie at the cheap end
    ("B", 8, 1.0, 4),
    ("B", 9, 1.0, 9),
    ("B", 10, 4.0, 9),  # dominated: same size as 9, pricier
    ("B", 11, 5.0, 10),
]


def test_skyline_matches_bruteforce(spark):
    df = spark.createDataFrame(ROWS, "grp string, id long, price double, size int")
    got = sorted(
        (r.grp, r.id, r.price, r.size)
        for r in skyline_2d(
            df, min_col="price", max_col="size", group_col="grp"
        ).collect()
    )
    assert got == _skyline_truth(ROWS)
    # spot-check the reasoning above encoded correctly
    ids = {i for (_, i, _, _) in got}
    assert {1, 2, 3, 4, 7, 9, 11}.issubset(ids) and not {5, 6, 10} & ids


def test_skyline_null_dims_excluded(spark):
    df = spark.createDataFrame(
        [("A", 1, None, 5), ("A", 2, 1.0, None), ("A", 3, 9.0, 1)],
        "grp string, id long, price double, size int",
    )
    rows = skyline_2d(df, min_col="price", max_col="size", group_col="grp").collect()
    assert [r.id for r in rows] == [3]


def test_skyline_global_no_group(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1), (2, 2.0, 2), (3, 1.0, 2)], "id long, price double, size int"
    )
    rows = skyline_2d(df, min_col="price", max_col="size").collect()
    assert sorted(r.id for r in rows) == [3]


NAMES = [
    (1, "red apple pie"),
    (2, "red apple pia"),      # dist 1 from 1
    (3, "red apple pint"),     # dist 2 from 1, 2 from 2
    (4, "red grape pie"),      # dist 4 from 1 — past the cap
    (5, "blue apple pie"),     # different block (first token)
    (6, "red apple pie"),      # exact dup of 1 — dist 0
]


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fuzzy_truth(rows, max_dist):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        if ia > ib:
            ia, ib, sa, sb = ib, ia, sb, sa
        if sa.split(" ")[0] != sb.split(" ")[0]:
            continue
        if abs(len(sa) - len(sb)) > max_dist:
            continue
        d = _lev(sa, sb)
        if d <= max_dist:
            out.add((ia, ib, d))
    return out


@pytest.mark.parametrize("salt", [1, 4])
def test_fuzzy_pairs_matches_bruteforce(spark, salt):
    """Salting is balance-only: every salt setting yields the identical
    pair set as the brute-force blocked reference."""
    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(
            df, id_col="id", text_col="name", max_dist=2, salt_buckets=salt
        ).collect()
    }
    assert got == _fuzzy_truth(NAMES, 2)
    assert (1, 6, 0) in got and (1, 2, 1) in got  # dup + near-dup found
    assert not any(4 in (a, b) for a, b, _ in got)  # past-cap pruned
    assert not any(5 in (a, b) for a, b, _ in got)  # cross-block never compared


HIST_NAMES = NAMES + [
    (7, "red apple pie"),       # third copy of the dup group (cnt=3)
    (8, "red apple pint"),      # second copy — two dup groups
    (9, "blue apple pie"),      # dup in the other block
    (10, "blue apple pix"),     # dist 2 within blue block
    (11, "red apple piex"),     # dist 1 from pie copies (len band edge)
]


@pytest.mark.parametrize("salt", [1, 4])
def test_fuzzy_pair_histogram_matches_pair_aggregate(spark, salt):
    """The distinct-string histogram must equal the brute aggregate of
    the full id-level pair stream — including the intra-group dist-0
    bucket (count = cnt*(cnt-1)/2, sample_id_b = the group's SECOND
    smallest id) and min-sample semantics across mixed contributions."""
    from collections import defaultdict

    from kinesis_stream_spark.operators.fuzzy import fuzzy_pair_histogram

    truth = defaultdict(lambda: [0, None, None])
    for ia, ib, d in _fuzzy_truth(HIST_NAMES, 2):
        blk = dict(HIST_NAMES)[ia].split(" ")[0]
        t = truth[(blk, d)]
        t[0] += 1
        t[1] = ia if t[1] is None else min(t[1], ia)
        t[2] = ib if t[2] is None else min(t[2], ib)
    df = spark.createDataFrame(HIST_NAMES, "id long, name string")
    got = {
        (r.block_key, r.dist): [r.n_pairs, r.sample_id_a, r.sample_id_b]
        for r in fuzzy_pair_histogram(
            df, id_col="id", text_col="name", max_dist=2, salt_buckets=salt
        ).collect()
    }
    assert got == dict(truth)
    # the dup-group invariants this rewrite depends on, explicitly:
    assert got[("red", 0)][0] == 3 + 1  # C(3,2) pie copies + pint pair
    assert got[("red", 0)][1:] == [1, 6]  # min id, second-min of its group


def test_fuzzy_pair_histogram_null_rows_produce_no_pairs(spark):
    """NULL name/id rows never pair in the id-level join; the grouped
    rewrite must not manufacture phantom intra pairs from them."""
    from kinesis_stream_spark.operators.fuzzy import fuzzy_pair_histogram

    df = spark.createDataFrame(
        [(1, "red apple pie"), (2, None), (3, None), (None, "red apple pie")],
        "id long, name string",
    )
    assert fuzzy_pair_histogram(
        df, id_col="id", text_col="name", max_dist=2
    ).count() == 0


def test_fuzzy_pairs_rejects_bad_params(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, id_col="id", text_col="name", max_dist=-1)
    with pytest.raises(ValueError):
        fuzzy_pairs(df, id_col="id", text_col="name", max_dist=1, salt_buckets=0)


def test_skyline_null_group_is_its_own_group(spark):
    """Spark groupBy buckets NULL group keys together — dominance must
    apply WITHIN the NULL group (the oracle mirrors this with a
    NULL-safe compare), and never across named and NULL groups."""
    df = spark.createDataFrame(
        [(None, 1, 1.0, 5), (None, 2, 2.0, 4), ("A", 3, 9.0, 1)],
        "grp string, id long, price double, size int",
    )
    rows = skyline_2d(df, min_col="price", max_col="size", group_col="grp").collect()
    # id 2 is dominated by id 1 inside the NULL group; id 3 is alone in A
    assert sorted(r.id for r in rows) == [1, 3]


def test_fuzzy_nonascii_codepoint_semantics_and_ascii_guard(spark):
    """The operator is codepoint-correct on non-ASCII text (Spark
    levenshtein counts codepoints: héllo→hallo is ONE edit), while the
    DuckDB oracle's levenshtein counts UTF-8 bytes (two) — so the
    registered query and oracle both scope to ASCII rows via the
    char-length == byte-length guard. Pins both halves."""
    df = spark.createDataFrame(
        [(1, "x héllo"), (2, "x hallo"), (3, "x hillo")],
        "id long, name string",
    )
    # operator alone: codepoint distance 1 pairs all three names
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs(
            df, id_col="id", text_col="name", max_dist=1
        ).collect()
    }
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    # the registration's ASCII guard drops the multibyte row, matching
    # the oracle-side LENGTH = STRLEN filter
    kept = df.where(F.length("name") == F.octet_length("name"))
    guarded = {
        (r.id_a, r.id_b)
        for r in fuzzy_pairs(
            kept, id_col="id", text_col="name", max_dist=1
        ).collect()
    }
    assert guarded == {(2, 3)}
