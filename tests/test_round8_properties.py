"""Property tests for the round-8 operators (the reference's
QuickCheck style, SURVEY.md §5.3): each op is checked against an
ENGINE-INDEPENDENT python reference over hypothesis-generated inputs —
a third implementation, so agreement is evidence beyond the DuckDB
oracle pair.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

P = 2_147_483_647
COEFFS = [(2, 1), (3, 7), (5, 13), (7, 31)]


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


def _bands_of(text: str):
    toks = [t for t in text.split(" ") if t]
    sh = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not sh:
        return []
    hs = [_h64(s) for s in sh]
    mh = [min((a * h + b) % P for h in hs) for a, b in COEFFS]
    return [(0, f"{mh[0]}_{mh[1]}"), (1, f"{mh[2]}_{mh[3]}")]


_texts = st.lists(
    st.lists(
        st.sampled_from(["row", "scan", "hash", "key", "fast", "x"]),
        min_size=0,
        max_size=5,
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(texts=_texts)
def _near_dup_prop(spark, texts):
    from striot_spark.functions.dedup import near_dup_filter

    rows = list(enumerate(texts))
    # python reference: first-wins per band bucket over ascending ids
    owner: dict = {}
    kept_ref = []
    for i, t in rows:
        bands = _bands_of(t)
        dup = any(owner.get(b, i) < i for b in bands)
        for b in bands:
            owner.setdefault(b, i)
        if not dup:
            kept_ref.append(i)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in near_dup_filter(df, "doc_id", "text").collect()
    )
    assert got == kept_ref


def test_near_dup_filter_matches_python_reference(spark):
    """First-wins band semantics against an independent python
    implementation of the full minhash/band pipeline, over random
    small-vocab corpora (collision-rich by construction)."""
    _near_dup_prop(spark)


@settings(
    max_examples=15, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    counts=st.dictionaries(
        st.integers(-5, 20), st.integers(1, 7), min_size=1, max_size=8
    )
)
def _quantile_prop(spark, counts):
    from striot_spark.functions.analytics import binned_quantile_serve

    df = spark.createDataFrame(
        sorted(counts.items()), "bin long, n_rows long"
    )
    got = sorted(
        (r["q"], r["bin"])
        for r in binned_quantile_serve(df, "bin", "n_rows").collect()
    )
    vals = [b for b in sorted(counts) for _ in range(counts[b])]
    n = len(vals)
    expect = sorted(
        (q, vals[(q * (n - 1)) // 10] if n > 1 else vals[0])
        for q in range(11)
    )
    assert got == expect


def test_binned_quantile_serve_matches_rank_selection(spark):
    """The sequence-explode decile cover equals expand-rank-select for
    ANY bin table, including negative bins, gaps, and N=1."""
    _quantile_prop(spark)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(texts=_texts, phrase=st.lists(
    st.sampled_from(["row", "scan", "hash"]), min_size=1, max_size=3
))
def _phrase_prop(spark, texts, phrase):
    from striot_spark.functions.text import (
        phrase_search,
        positional_postings,
    )

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    post = positional_postings(df, "doc_id", "text")
    got = {
        (r["doc"],): r["n_matches"]
        for r in phrase_search(post, [" ".join(phrase)]).collect()
    }
    for i, t in rows:
        toks = [x for x in t.split(" ") if x]
        k = len(phrase)
        n = sum(
            1
            for j in range(len(toks) - k + 1)
            if toks[j : j + k] == phrase
        )
        if n:
            assert got.get((i,)) == n
        else:
            assert (i,) not in got
    assert sum(got.values()) == sum(
        1
        for _, t in rows
        for j in range(len([x for x in t.split(" ") if x]))
        if [x for x in t.split(" ") if x][j : j + len(phrase)] == phrase
    )


def test_phrase_search_matches_sublist_scan(spark):
    """Positional-intersection phrase counts equal a naive sliding
    sublist scan for ANY corpus and phrase length 1-3."""
    _phrase_prop(spark)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=25),
    bins=st.integers(1, 6),
)
def _equidepth_prop(spark, vals, bins):
    from striot_spark.functions.analytics import equidepth_histogram

    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "cv long, tb long")
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
        for r in equidepth_histogram(df, "cv", "tb", bins=bins).collect()
    }
    n = len(vals)
    ordered = sorted(rows)
    expect: dict = {}
    for rank, (v, _) in enumerate(ordered):
        b = rank * bins // n
        cnt, lo, hi = expect.get(b, (0, v, v))
        expect[b] = (cnt + 1, min(lo, v), max(hi, v))
    assert got == expect


def test_equidepth_histogram_matches_sorted_reference(spark):
    """Bucket assignment, counts and ranges equal the sort-then-slice
    python reference for ANY values (dups, negatives) and bin count."""
    _equidepth_prop(spark)
