"""Cuckoo filter codec + cuckoo-mode seen set."""

import numpy as np
import pytest

from jsonextract_spark.crawl.cuckoo import CuckooFilter, sized_for


def test_insert_contains_delete_roundtrip():
    rng = np.random.default_rng(11)
    keys = rng.integers(-2**62, 2**62, size=4000)
    other = rng.integers(-2**62, 2**62, size=4000)
    f = CuckooFilter(sized_for(len(keys)))
    fails = f.insert_many(keys)
    assert fails == 0
    assert f.contains_many(keys).all()          # no false negatives
    fp_rate = f.contains_many(other).mean()
    assert fp_rate < 0.01                       # 16-bit fp, 2 buckets

    # delete half, they must disappear; the rest must stay
    f.delete_many(keys[:2000])
    assert not f.contains_many(keys[:2000]).all()
    assert f.contains_many(keys[2000:]).all()


def test_serialization_roundtrip():
    rng = np.random.default_rng(12)
    keys = rng.integers(-2**62, 2**62, size=500)
    f = CuckooFilter(sized_for(500))
    f.insert_many(keys)
    g = CuckooFilter.from_bytes(f.to_bytes(), f.n)
    assert g.contains_many(keys).all()
    assert g.nb == f.nb


def test_incremental_insert_after_deserialize():
    rng = np.random.default_rng(13)
    a = rng.integers(-2**62, 2**62, size=300)
    b = rng.integers(-2**62, 2**62, size=300)
    f = CuckooFilter(sized_for(1000))
    f.insert_many(a)
    g = CuckooFilter.from_bytes(f.to_bytes(), f.n)
    g.insert_many(b)
    assert g.contains_many(a).all() and g.contains_many(b).all()


def test_overflow_is_reported_not_silent():
    rng = np.random.default_rng(14)
    keys = rng.integers(-2**62, 2**62, size=2000)
    tiny = CuckooFilter(16)  # 64 slots for 2000 keys -> must overflow
    fails = tiny.insert_many(keys)
    assert fails > 0


@pytest.mark.spark
def test_seen_cuckoo_mode_exactness(spark):
    from jsonextract_spark.crawl import seen as sm

    rng = np.random.default_rng(15)
    seen_hashes = rng.integers(-2**62, 2**62, size=3000).tolist()
    cand_new = rng.integers(-2**62, 2**62, size=2000).tolist()
    seen_df = spark.createDataFrame([(int(h),) for h in seen_hashes],
                                    "url_hash long")
    cand_df = spark.createDataFrame(
        [(int(h), f"u{i}") for i, h in
         enumerate(seen_hashes[:800] + cand_new)],
        "url_hash long, url string")

    filters = sm.build_filters(seen_df, kind="cuckoo")
    out = sm.new_urls(cand_df, seen_df, filters)
    got = {r["url_hash"] for r in out.collect()}
    assert got == set(cand_new) - set(seen_hashes)

    # incremental merge keeps exactness
    fresh = spark.createDataFrame([(int(h),) for h in cand_new[:500]],
                                  "url_hash long")
    merged = sm.merge_filters(filters, fresh, kind="cuckoo")
    all_seen = seen_df.unionByName(fresh)
    cand2 = spark.createDataFrame(
        [(int(h), f"v{i}") for i, h in
         enumerate(cand_new[:500] + cand_new[1500:])],
        "url_hash long, url string")
    out2 = sm.new_urls(cand2, all_seen, merged)
    got2 = {r["url_hash"] for r in out2.collect()}
    assert got2 == set(cand_new[1500:]) - set(cand_new[:500]) - set(seen_hashes)


def test_delete_from_filters(spark):
    """Recrawl maintenance: cuckoo buckets truly forget deleted keys,
    bloom buckets pass through unchanged (and stay exact via the
    anti-join backstop)."""
    import numpy as np
    from jsonextract_spark.crawl import seen as sm

    rng = np.random.default_rng(9)
    keys = [int(x) for x in
            rng.integers(-2**62, 2**62, size=2000)]
    seen_df = spark.createDataFrame([(k,) for k in keys],
                                    "url_hash long")
    stale = spark.createDataFrame([(k,) for k in keys[:300]],
                                  "url_hash long")

    cuckoo_f = sm.build_filters(seen_df, kind="cuckoo")
    after = sm.delete_from_filters(cuckoo_f, stale)
    cand = spark.createDataFrame(
        [(k, f"u{i}") for i, k in enumerate(keys)],
        "url_hash long, url string")
    flagged = {r["url_hash"]: r["maybe_seen"]
               for r in sm.prune_candidates(cand, after).collect()}
    # deleted keys may now read definitely-new; retained keys must all
    # still be flagged (cuckoo has no false negatives for present keys)
    assert all(flagged[k] for k in keys[300:])
    assert sum(1 for k in keys[:300] if not flagged[k]) > 250

    bloom_f = sm.build_filters(seen_df, kind="bloom")
    after_b = sm.delete_from_filters(bloom_f, stale)
    flagged_b = {r["url_hash"]: r["maybe_seen"]
                 for r in sm.prune_candidates(cand, after_b).collect()}
    assert all(flagged_b[k] for k in keys)  # bloom unchanged
