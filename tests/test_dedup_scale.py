"""Scale guards on the SimHash LSH path (r1 verdict: 8-bit bands made the
band self-join O(n^2/256) at 10^9 docs). Now: 60-bit fingerprints, 15-bit
bands, and the same max_bucket degenerate-key cap as the MinHash path."""

from __future__ import annotations

from pyspark.sql import functions as F

from pysparkenc.dedup import simhash, simhash_dup_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_simhash_is_60_bit(spark):
    df = _docs(spark, [("a", "the quick brown fox jumps over the lazy dog")])
    val = simhash(df).collect()[0]["simhash"]
    assert 0 <= val < (1 << 60)
    # a generic sentence's sign votes should spread well past bit 31
    assert val >= (1 << 32)


def test_bucket_cap_drops_degenerate_band(spark):
    # 12 identical docs: every band-bucket has 12 members; with the cap
    # below that, the degenerate bucket must be dropped -> no pairs at all
    rows = [(f"d{i}", "same text every time") for i in range(12)]
    df = _docs(spark, rows)
    assert simhash_dup_pairs(df, max_bucket=5).count() == 0
    # with the cap above the bucket size, all 66 exact-dup pairs emerge
    assert simhash_dup_pairs(df, max_bucket=100).count() == 66


def test_cap_keeps_real_duplicates(spark):
    # two small duplicate clusters + unrelated docs; generous cap
    rows = (
        [(f"a{i}", "alpha beta gamma delta epsilon zeta") for i in range(3)]
        + [(f"b{i}", "one two three four five six seven") for i in range(2)]
        + [("x", "completely unrelated content words here"),
           ("y", "another totally different document body")]
    )
    df = _docs(spark, rows)
    pairs = simhash_dup_pairs(df, max_bucket=10_000).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert {("a0", "a1"), ("a0", "a2"), ("a1", "a2"), ("b0", "b1")} <= got
    # hamming 0 for exact dups
    assert all(r["hamming"] == 0 for r in pairs
               if r["doc_a"][0] == r["doc_b"][0])


def test_banding_width_matches_pigeonhole(spark):
    # hamming <= 3 over 4 bands: at least one 15-bit band identical, so a
    # pair differing in exactly 3 bits spread over 3 distinct bands is
    # still found. Construct via two docs and check the invariant on the
    # survivors instead of synthesizing exact fingerprints: every emitted
    # pair must satisfy hamming <= 3.
    rows = [(f"d{i}", f"shared prefix words {'tail' if i % 2 else 'tale'}")
            for i in range(6)]
    pairs = simhash_dup_pairs(_docs(spark, rows)).collect()
    assert all(r["hamming"] <= 3 for r in pairs)
