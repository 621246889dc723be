"""Deterministic training-shard shuffle: permutation properties,
partition invariance (the reason for hashing over rand()), and seed
sensitivity."""

from ocr_spark.operators.corpus_filters import shuffle_shards


def _df(spark, n=200, parts=4):
    return spark.range(n).toDF("doc_id").repartition(parts)


def test_every_doc_lands_exactly_once(spark):
    out = shuffle_shards(_df(spark), n_shards=8).collect()
    assert len(out) == 200
    assert {r.doc_id for r in out} == set(range(200))
    # per-shard positions are 1..len(shard) with no gaps
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    assert set(by_shard) <= set(range(8))


def test_partition_invariance_and_determinism(spark):
    a = sorted(map(tuple, shuffle_shards(_df(spark, parts=2)).collect()))
    b = sorted(map(tuple, shuffle_shards(_df(spark, parts=16)).collect()))
    assert a == b


def test_seed_changes_permutation(spark):
    a = {r.doc_id: (r.shard, r.pos_in_shard)
         for r in shuffle_shards(_df(spark), seed=17).collect()}
    b = {r.doc_id: (r.shard, r.pos_in_shard)
         for r in shuffle_shards(_df(spark), seed=18).collect()}
    assert any(a[d] != b[d] for d in a)


def test_order_is_shuffled_not_identity(spark):
    out = shuffle_shards(_df(spark), n_shards=1).collect()
    order = [r.doc_id for r in sorted(out, key=lambda r: r.pos_in_shard)]
    assert order != sorted(order)
