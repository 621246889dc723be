"""Count-min / HyperLogLog sketches: bounds, mergeability, hash
independence (the affine-family regression), and plan shape."""

import pyspark.sql.functions as F
import pytest

from ocr_spark.operators import sketches as sk


def _words_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "key string")


def test_cms_never_undercounts_and_exact_when_wide(spark):
    words = (["join"] * 9 + ["hash"] * 5 + ["row"] * 2 + ["rare"]) * 3
    df = _words_df(spark, words)
    true = {r.key: r.cnt for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}

    # tiny sketch: collisions expected, but est >= true ALWAYS
    sketch = sk.cms_build(df, width=4, depth=2)
    est = {r.key: r.est for r in sk.cms_estimate(df, sketch, width=4, depth=2).collect()}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)

    # wide sketch: no collisions over 4 keys -> exact
    sketch = sk.cms_build(df, width=1024, depth=4)
    est = {r.key: r.est for r in sk.cms_estimate(df, sketch, width=1024, depth=4).collect()}
    assert est == true


def test_cms_rows_are_independent_hash_functions(spark):
    """Same-LENGTH keys must not collide in every row at once (the affine
    salted-init family did exactly that): with per-row multipliers there
    is a same-length pair colliding in some row but not in all rows."""
    keys = [f"k{i:03d}" for i in range(200)]  # all length 4
    df = _words_df(spark, keys)
    pos = df.select(
        "key", F.explode(sk._cms_positions(F.col("key"), width=8, depth=3)).alias("rp")
    ).select("key", "rp.row", "rp.pos").collect()
    by_key = {}
    for r in pos:
        by_key.setdefault(r.key, {})[r.row] = r.pos
    rows0 = {}
    partial = full = 0
    for k, m in by_key.items():
        sig = (m[0], m[1], m[2])
        for k2, sig2 in rows0.items():
            same = sum(a == b for a, b in zip(sig, sig2))
            if same == 3:
                full += 1
            elif same > 0:
                partial += 1
        rows0[k] = sig
    # collisions happen (width=8) but are row-local, not all-row
    assert partial > 0
    assert full < partial


def test_cms_sketch_is_mergeable(spark):
    words = [f"w{i % 7}" for i in range(50)]
    df = _words_df(spark, words)
    half_a = _words_df(spark, words[:25])
    half_b = _words_df(spark, words[25:])
    merged = (
        sk.cms_build(half_a, width=16, depth=3)
        .unionByName(sk.cms_build(half_b, width=16, depth=3))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.cms_build(df, width=16, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_heavy_hitters_no_false_negatives(spark):
    words = ["hot"] * 30 + ["warm"] * 10 + [f"cold{i}" for i in range(40)]
    out = {r.key for r in sk.heavy_hitters(_words_df(spark, words), width=8, depth=3, min_count=10).collect()}
    assert {"hot", "warm"} <= out  # est >= true: true hitters always survive


def test_hll_registers_mergeable_and_estimate_accuracy(spark):
    n = 5000
    keys = spark.range(n).select(F.concat(F.lit("user-"), F.col("id")).alias("key"))
    regs = sk.hll_registers(keys, m=128)
    assert regs.count() <= 128

    # mergeability: max-merge of half-corpus registers == whole-corpus
    ka = keys.where(F.col("key") < "user-3")
    kb = keys.where(~(F.col("key") < "user-3"))
    merged = (
        sk.hll_registers(ka, m=128)
        .unionByName(sk.hll_registers(kb, m=128))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, regs.collect()))

    est = sk.hll_estimate(regs, m=128).collect()[0]
    assert est.m == 128 and est.n_registers_set <= 128
    # raw HLL (no bias correction): 1.04/sqrt(128) ~ 9% std error; allow 3.5x
    assert abs(est.estimate - n) / n < 0.32


def _vals_df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "v long")


def test_hdr_buckets_bounded_and_mergeable(spark):
    vals = list(range(1, 2000)) + [10_000_000] * 5
    df = _vals_df(spark, vals)
    buckets = sk.hdr_buckets(df, "v", sub_bits=4)
    rows = buckets.collect()
    # bounded: at most 2^sub_bits sub-buckets per octave
    assert len(rows) <= 64 * 16
    assert sum(r.cnt for r in rows) == len(vals)

    # mergeability: count-add of half-corpus buckets == whole-corpus
    merged = (
        sk.hdr_buckets(_vals_df(spark, vals[:1000]), "v", sub_bits=4)
        .unionByName(sk.hdr_buckets(_vals_df(spark, vals[1000:]), "v", sub_bits=4))
        .groupBy("lb")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rows))


def test_hdr_quantiles_relative_error_bound(spark):
    import math

    vals = [int(math.exp(i / 100.0)) + 1 for i in range(1200)]  # log-spaced
    df = _vals_df(spark, vals)
    sub_bits = 5
    qs = sk.hdr_quantiles(
        sk.hdr_buckets(df, "v", sub_bits=sub_bits), q_millis=(500, 900, 990, 999)
    ).collect()
    assert len(qs) == 4
    svals = sorted(vals)
    for r in qs:
        rank = -(-r.q_milli * len(vals) // 1000)  # ceil
        true = svals[rank - 1]
        # lower bound within one sub-bucket: est <= true, rel err < 2^-sub_bits
        assert r.est <= true
        assert (true - r.est) / true <= 2.0 ** -sub_bits
        assert r.total == len(vals)


def test_hdr_exact_for_small_values(spark):
    # values below 2^sub_bits get exact buckets (shift clamps to 0)
    vals = [1, 2, 3, 4, 5] * 10
    qs = sk.hdr_quantiles(
        sk.hdr_buckets(_vals_df(spark, vals), "v", sub_bits=5), q_millis=(500, 999)
    ).collect()
    by_q = {r.q_milli: r.est for r in qs}
    assert by_q[500] == 3 and by_q[999] == 5


def test_hdr_partition_invariance(spark):
    vals = [((i * 2654435761) % 100000) + 1 for i in range(3000)]
    a = sk.hdr_quantiles(
        sk.hdr_buckets(_vals_df(spark, vals).repartition(1), "v")
    ).collect()
    b = sk.hdr_quantiles(
        sk.hdr_buckets(_vals_df(spark, vals).repartition(17), "v")
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hdr_buckets_single_exchange(spark):
    df = _vals_df(spark, range(1, 100))
    plan = sk.hdr_buckets(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the one bucket groupBy
    assert "partial_count" in plan  # map-side combine = per-partition sketch


def test_cms_estimate_broadcasts_sketch(spark):
    df = _words_df(spark, [f"w{i}" for i in range(30)])
    sketch = sk.cms_build(df, width=16, depth=3)
    plan = (
        sk.cms_estimate(df, sketch, width=16, depth=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_hll_union_is_lossless_merge(spark):
    # sketch(A) ∪ sketch(B) must EQUAL sketch(A ++ B), register for register
    a = spark.createDataFrame([(f"k{i}",) for i in range(0, 600)], "key string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(400, 1000)], "key string")
    both = a.unionByName(b)
    u = sk.hll_union(sk.hll_registers(a, "key"), sk.hll_registers(b, "key"))
    direct = sk.hll_registers(both, "key")
    assert sorted(map(tuple, u.collect())) == sorted(map(tuple, direct.collect()))
    # idempotent: A ∪ A == A
    ra = sk.hll_registers(a, "key")
    self_u = sk.hll_union(ra, ra)
    assert sorted(map(tuple, self_u.collect())) == sorted(map(tuple, ra.collect()))


def test_hll_inclusion_exclusion_accuracy(spark):
    # |A|=3000, |B|=3000, |A∩B|=2000: intersection via est_a+est_b-est_union
    a = spark.createDataFrame([(f"k{i}",) for i in range(0, 3000)], "key string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(1000, 4000)], "key string")
    ea = sk.hll_estimate(sk.hll_registers(a, "key")).collect()[0].estimate
    eb = sk.hll_estimate(sk.hll_registers(b, "key")).collect()[0].estimate
    eu = sk.hll_estimate(
        sk.hll_union(sk.hll_registers(a, "key"), sk.hll_registers(b, "key"))
    ).collect()[0].estimate
    inter = ea + eb - eu
    # three raw estimates at ~9% each: allow a generous combined band
    assert abs(inter - 2000) / 2000 < 0.5
    assert abs(eu - 4000) / 4000 < 0.32
