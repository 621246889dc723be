"""Persisted vector index (sources/vecindex.py): build/reopen round trip,
zero-retraining query path, reconstruction, incremental extend, rebuild
overwrite, and semdedup_pq recall vs exact semdedup.

Reference parity: VectorDatabase build-once/save/load
(/root/reference/utils/databases/vector_database.py:1-122)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import similarity as sim
from ocr_spark.sources.vecindex import (
    VectorIndex,
    build_vector_index,
    open_vector_index,
)


def _emb(spark, n=64, dim=16, seed=3, start_id=0, dups_of=None):
    """Deterministic synthetic embeddings; optionally append near-identical
    copies of the listed vec_ids (for dedup recall)."""
    rng = np.random.RandomState(seed)
    M = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(start_id + i, [float(v) for v in M[i]]) for i in range(n)]
    if dups_of:
        nid = start_id + n
        for j, src in enumerate(dups_of):
            v = M[src - start_id] * (1.0 + 1e-4)  # cosine ~ 1.0
            rows.append((nid + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vecidx") / "idx")
    e = _emb(spark)
    idx = build_vector_index(e, root, m=4, n_codes=8, n_iters=2)
    return root, e, idx


def test_reopen_matches_build(built):
    root, _, idx = built
    re = open_vector_index(root)
    assert re.books == idx.books
    assert re.meta["m"] == 4 and re.meta["n_codes"] == 8


def test_query_path_never_trains(spark, built, monkeypatch):
    """The artifact's contract: reopening + querying launches no training.
    Poison pq_train — open/topk/reconstruct must not touch it."""
    root, e, _ = built

    def boom(*a, **k):  # pragma: no cover - must not run
        raise AssertionError("query path retrained the index")

    monkeypatch.setattr(sim, "pq_train", boom)
    idx = open_vector_index(root)
    out = idx.topk(spark, e.where(F.col("vec_id") < 3), k=3).collect()
    assert len(out) == 9
    assert idx.reconstruct(spark).count() == 64


def test_reopened_query_bit_identical_to_inline(spark, built):
    """Same corpus, same params: the persisted-index query path returns the
    inline pq_topk result bit-for-bit."""
    root, e, _ = built
    q = e.where(F.col("vec_id") < 5)
    inline = sim.pq_topk(e, q, k=4, m=4, n_codes=8, n_iters=2)
    stored = open_vector_index(root).topk(spark, q, k=4)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, stored.collect())
    )


def test_codes_only_scan_prunes_refine_column(spark, built):
    """The ADC scan must read codes without the q (refine) column — the
    storage layout's point. Assert at the optimized plan's ReadSchema."""
    root, _, _ = built
    idx = open_vector_index(root)
    plan = (
        idx.codes(spark)
        .select("vec_id", "codes")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "codes" in plan and "q#" not in plan.split("ReadSchema")[-1][:200]


def test_reconstruct_is_codebook_rows(spark, built):
    _, _, idx = built
    C = np.asarray(idx.books, dtype=np.int64)
    m, _, d_sub = C.shape
    rows = idx.codes(spark).select("vec_id", "codes").collect()
    rec = {r["vec_id"]: r["rec"] for r in idx.reconstruct(spark).collect()}
    for r in rows:
        want = np.concatenate([C[s][r["codes"][s]] for s in range(m)])
        assert list(want) == list(rec[r["vec_id"]])


def test_extend_appends_without_retraining(spark, built, monkeypatch):
    root, _, _ = built
    monkeypatch.setattr(sim, "pq_train", lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("extend retrained")
    ))
    idx = open_vector_index(root)
    before = idx.codes(spark).count()
    idx.extend(_emb(spark, n=8, seed=9, start_id=1000))
    assert idx.codes(spark).count() == before + 8
    # the new vectors are queryable through the same stored-code path
    got = idx.topk(spark, _emb(spark, n=8, seed=9, start_id=1000), k=2)
    assert got.count() == 16


def test_rebuild_overwrites_not_duplicates(spark, tmp_path):
    root = str(tmp_path / "idx2")
    e = _emb(spark, n=32)
    build_vector_index(e, root, m=4, n_codes=8, n_iters=1)
    idx = build_vector_index(e, root, m=4, n_codes=8, n_iters=2)
    assert idx.codes(spark).count() == 32  # not 64


def test_semdedup_pq_recall_vs_exact(spark, tmp_path):
    """VERDICT r03 #6: semdedup driven through the persisted index must
    recover >= 0.9 of exact semdedup's removals (near-identical vectors
    land in the same PQ cell, so reconstructed cosine ~ 1)."""
    root = str(tmp_path / "idx3")
    e = _emb(spark, n=48, dim=64, seed=11, dups_of=list(range(0, 24)))
    exact = {
        r["vec_id"]
        for r in sim.semdedup(e).collect()
        if not r["kept"]
    }
    idx = build_vector_index(e, root, m=8, n_codes=16, n_iters=2)
    via_pq = {
        r["vec_id"]
        for r in sim.semdedup_pq(idx.reconstruct(spark)).collect()
        if not r["kept"]
    }
    assert len(exact) >= 20  # the planted dups are actually caught
    recall = len(exact & via_pq) / len(exact)
    assert recall >= 0.9, (recall, exact - via_pq)


def test_identical_vectors_dedup_to_lowest_id(spark, tmp_path):
    """Identical raw vectors (zero pairs included) share PQ codes, so the
    code-space dedup keeps exactly the lowest vec_id of the pair — and a
    zero-norm RECONSTRUCTION is never removed (dot=0 fails dot>0)."""
    root = str(tmp_path / "idx4")
    e = _emb(spark, n=16, dim=16, seed=5)
    zero = spark.createDataFrame(
        [(900, [0.0] * 16), (901, [0.0] * 16)], "vec_id long, embedding array<float>"
    )
    idx = build_vector_index(e.union(zero), root, m=4, n_codes=8, n_iters=1)
    out = {
        r["vec_id"]: r["kept"]
        for r in sim.semdedup_pq(idx.reconstruct(spark), dim=16).collect()
    }
    assert out[900] and not out[901]


def test_ivf_index_partition_pruning_and_consistency(spark, tmp_path, monkeypatch):
    """IVFPQ layout: codes hive-partitioned by list_id; a probed query's
    scan must show a PartitionFilters entry (files of unprobed lists are
    never opened), the query path must not retrain, and probing ALL
    lists must equal the flat-PQ answer exactly."""
    root = str(tmp_path / "ivf")
    e = _emb(spark, n=64, dim=16, seed=3)
    idx = build_vector_index(
        e, root, m=4, n_codes=8, n_iters=2, n_lists=4, coarse_iters=2
    )
    assert idx.meta["format"] == "ivfpq" and len(idx.meta["coarse_cents"]) == 4

    q = e.where(F.col("vec_id") < 3)
    monkeypatch.setattr(sim, "pq_train", lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("ivf query path retrained")
    ))
    idx = open_vector_index(root)

    # partition pruning is visible in the executed plan of the probed scan
    probes = idx.probe_lists(q, 2)
    assert all(len(v) == 2 for v in probes.values())
    union = sorted({l for ls in probes.values() for l in ls})
    plan = (
        idx.codes(spark)
        .where(F.col("list_id").isin(union))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "list_id" in plan

    got = idx.topk(spark, q, k=3, n_probe=2)
    assert got.count() == 9

    # probing every list == the flat answer (restriction is the ONLY
    # difference between the paths)
    full = idx.topk(spark, q, k=3)
    all_probed = idx.topk(spark, q, k=3, n_probe=4)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, all_probed.collect())
    )


def test_text_embeddings_and_cli_export_shape(spark, tmp_path):
    """The production wiring (--export-vecindex): extracted docs ->
    normalized feature-hash embeddings -> IVFPQ artifact; reopen and
    query without retraining."""
    from ocr_spark.sources.vecindex import text_embeddings

    docs = spark.createDataFrame(
        [(f"https://h{i % 7}.example/p{i}", f"alpha beta doc {i} " * (i % 5 + 1))
         for i in range(40)],
        "url string, text string",
    )
    emb = text_embeddings(docs)
    rows = emb.collect()
    assert len(rows) == 40 and len(set(r["vec_id"] for r in rows)) == 40
    assert all(len(r["embedding"]) == 32 for r in rows)
    assert all(abs(v) <= 1.0 for r in rows for v in r["embedding"])

    root = str(tmp_path / "cli_idx")
    idx = build_vector_index(emb, root, m=8, n_codes=8, n_iters=1, n_lists=4)
    re = open_vector_index(root)
    q = emb.limit(3)
    got = re.topk(spark, q, k=2, n_probe=2)
    assert got.count() == 6
    # extend keeps the hive layout and the new vectors are queryable
    more = text_embeddings(
        spark.createDataFrame(
            [("https://new.example/x", "gamma delta fresh text")],
            "url string, text string",
        )
    )
    re.extend(more)
    assert re.codes(spark).count() == 41


def test_extended_ivf_table_survives_all_catalog_reads(spark, tmp_path):
    """After extend() an IVF table has TWO hive-partitioned sibling
    commits — read, read_pruned, read_changes, and compact must all work
    (the multi-root partition-discovery trap)."""
    root = str(tmp_path / "ivf_multi")
    e = _emb(spark, n=32, dim=16, seed=3)
    idx = build_vector_index(e, root, m=4, n_codes=8, n_iters=1, n_lists=4)
    idx.extend(_emb(spark, n=8, seed=9, start_id=1000))
    assert idx.codes(spark).count() == 40
    pruned = idx.table.read_pruned(spark, "vec_id", 1000, 2000)
    assert pruned is not None and pruned.count() == 8
    changes = idx.table.read_changes(spark, since=0)
    assert changes.count() == 8
    cid = idx.table.compact(spark)
    assert cid is not None and idx.codes(spark).count() == 40


def test_topk_batch_bit_identical_to_driver_path(spark, tmp_path):
    """VERDICT r04 #4: the distributed batch query path must return
    exactly what the driver-probe path returns — same probe lists, same
    ADC scores, same tie order."""
    root = str(tmp_path / "ivf_batch")
    e = _emb(spark, n=64, dim=16, seed=3)
    build_vector_index(e, root, m=4, n_codes=8, n_iters=2, n_lists=4, coarse_iters=2)
    idx = open_vector_index(root)
    q = e.where(F.col("vec_id") < 7)
    driver = sorted(map(tuple, idx.topk(spark, q, k=3, n_probe=2).collect()))
    batch = sorted(map(tuple, idx.topk_batch(spark, q, k=3, n_probe=2).collect()))
    assert batch == driver
    # and at full probe width both equal the flat answer
    driver_full = sorted(map(tuple, idx.topk(spark, q, k=3, n_probe=4).collect()))
    batch_full = sorted(map(tuple, idx.topk_batch(spark, q, k=3, n_probe=4).collect()))
    assert batch_full == driver_full


def test_topk_batch_plans_with_zero_collect(spark, tmp_path, monkeypatch):
    """The batch path's contract at scale: CONSTRUCTING the query plan
    must launch no driver-side collect of the probe side (the driver path
    collects by design — poisoning DataFrame.collect during construction
    distinguishes the two)."""
    root = str(tmp_path / "ivf_zc")
    e = _emb(spark, n=64, dim=16, seed=3)
    build_vector_index(e, root, m=4, n_codes=8, n_iters=2, n_lists=4, coarse_iters=2)
    idx = open_vector_index(root)
    q = e.where(F.col("vec_id") < 3)

    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract facade in Spark 4 — patching it never intercepts calls)
    SparkDF = type(q)
    real_collect = SparkDF.collect

    def boom(self):  # pragma: no cover - must not run during planning
        raise AssertionError("batch query path collected the probe side")

    monkeypatch.setattr(SparkDF, "collect", boom)
    out = idx.topk_batch(spark, q, k=3, n_probe=2)  # plan construction only
    monkeypatch.setattr(SparkDF, "collect", real_collect)
    assert len(out.collect()) == 9

    # the driver path DOES collect during construction — the probe is valid
    monkeypatch.setattr(SparkDF, "collect", boom)
    with pytest.raises(AssertionError, match="collected the probe side"):
        idx.topk(spark, q, k=3, n_probe=2)


def test_topk_batch_requires_ivf(spark, built):
    root, e, idx = built
    with pytest.raises(ValueError, match="IVF"):
        idx.topk_batch(spark, e.where(F.col("vec_id") < 3), k=3, n_probe=2)
