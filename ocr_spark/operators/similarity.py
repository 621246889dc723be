"""Similarity search over the embeddings table (array<float> column).

Training-data-pipeline staple (driver brief): approximate nearest neighbor.
- brute-force cosine top-k: exact baseline; dot products via higher-order
  array functions (JVM-side `aggregate`/`zip_with` — no Python).
- LSH-bucketed variant (random-hyperplane signs): the scale path — the
  cross product is restricted to same-bucket candidates, so cost is
  O(n * bucket_size) instead of O(n * m).

Determinism: hyperplanes are a fixed seeded numpy matrix broadcast as a
literal array; ties in top-k break on vec_id.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _const_dots_udf(mat):
    """Arrow-batched dots of an embedding column against a CONSTANT matrix
    (hyperplanes / centroids): embedding -> array<double>, one dot per
    matrix row.

    Replaces per-plane `aggregate(zip_with(...))` Column algebra: Spark's
    higher-order functions are interpreted per element, and 32 of them per
    row measured ~4x slower than one Arrow batch through numpy (profiled at
    sf0.1, BENCH/BASELINE.md round-2 notes). Accumulation is an explicit
    ascending-j loop — NOT BLAS matmul — so every row's dots are
    bit-identical regardless of Arrow batch size, partitioning, or BLAS
    kernel selection; results stay deterministic at any parallelism.
    """
    from pyspark.sql.functions import pandas_udf

    W = np.ascontiguousarray(np.asarray(mat, dtype=np.float64).T)  # dim x out

    @pandas_udf("array<double>")
    def dots(emb: pd.Series) -> pd.Series:
        M = np.array([np.asarray(v, dtype=np.float64) for v in emb])
        if M.size == 0:
            return pd.Series([], dtype=object)
        acc = np.zeros((len(M), W.shape[1]))
        for j in range(W.shape[0]):
            acc += M[:, j : j + 1] * W[j]
        return pd.Series(list(acc))

    return dots


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    # zero vectors (padding rows, failed encoders) are routine at corpus
    # scale; x/0 is a hard job abort under ANSI mode, so define cos(0,.) = 0
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, *, k: int = 5, round_to: int = 4
) -> DataFrame:
    """Exact cosine top-k per query. Output (query_id, vec_id, sim, rank).

    The queries side is small -> Catalyst broadcasts it; the big side is
    scanned once with no shuffle before the per-query top-k aggregation.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    from ..plans.session import widen

    pairs = widen(embeddings).crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_emb")), round_to).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Random-hyperplane LSH ANN with MULTI-TABLE probing: a candidate is
    any vector sharing the sign-pattern bucket with the query in AT LEAST
    ONE of ``n_tables`` independent plane sets (VERDICT r01 item 7 — the
    single-band variant's recall was too low and untested).

    Miss probability decays exponentially with tables: for same-bucket
    probability p per table, P(miss) = (1 - p)^n_tables. Candidates dedupe
    on (query_id, vec_id) BEFORE scoring, so each pair is scored once. At
    100 TB the (table, bucket) equi-join replaces the cross product; keys
    are hash-distributed, no hot keys.
    """

    # all n_tables*n_planes dots in ONE Arrow batch pass (see _const_dots_udf
    # for why this beats 32 interpreted higher-order-function dots), then the
    # cheap bit-packing stays JVM-side on the returned dots array.
    all_planes = np.vstack(
        [_hyperplanes(dim, n_planes, seed=42 + 1000 * t) for t in range(n_tables)]
    )
    plane_dots = _const_dots_udf(all_planes)

    def bucket_structs(dots_col):
        per_table = []
        for t in range(n_tables):
            acc = None
            for i in range(n_planes):
                b = F.when(
                    F.element_at(dots_col, t * n_planes + i + 1) > 0, F.lit(1)
                ).otherwise(F.lit(0)) * F.lit(2 ** i)
                acc = b if acc is None else acc + b
            per_table.append(
                F.struct(F.lit(t).alias("table"), acc.alias("bucket"))
            )
        return F.explode(F.array(*per_table)).alias("tb")

    from ..plans.session import widen

    emb_b = (
        widen(embeddings)
        .select("vec_id", "embedding", plane_dots("embedding").alias("pd"))
        .select("vec_id", "embedding", bucket_structs(F.col("pd")))
        .select(
            "vec_id",
            "embedding",
            F.col("tb.table").alias("table"),
            F.col("tb.bucket").alias("bucket"),
        )
    )
    q_b = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            plane_dots("embedding").alias("pd"),
        )
        .select("query_id", "q_emb", bucket_structs(F.col("pd")))
        .select(
            "query_id",
            "q_emb",
            F.col("tb.table").alias("table"),
            F.col("tb.bucket").alias("bucket"),
        )
    )

    pairs = (
        emb_b.join(F.broadcast(q_b), ["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_emb")), round_to).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _train_centroids(
    embeddings: DataFrame, *, n_centroids: int, sample_size: int, iters: int = 10
) -> np.ndarray:
    """Spherical k-means on a deterministic driver-side sample (orderBy vec_id
    -> stable across runs and parallelism levels). IVF training is sample-
    based by design: at 100 TB you train the coarse quantizer on ~1e5
    vectors, then index the full corpus with one JVM-side assignment pass."""
    sample = np.array(
        [
            r[0]
            for r in embeddings.select("embedding")
            .orderBy("vec_id")
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    if sample.size == 0:
        raise ValueError(
            "ivf_topk: embeddings table is empty — no centroids to train; "
            "use brute_force_topk for tiny/empty corpora"
        )
    # fewer vectors than requested centroids: clamp (degenerates gracefully
    # toward brute force rather than producing duplicate/NaN centroids)
    n_centroids = min(n_centroids, len(sample))
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = sample[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents.round(6)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 512,
    round_to: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize vectors to their nearest
    centroid, probe the ``n_probe`` closest centroids per query.

    The scale shape: assignment is a JVM-side argmax over ``n_centroids``
    dot products (array_max over (sim, cid) structs — no Python, no
    shuffle); the candidate join is an equi-join on cid where the query
    side is broadcast; recall tunes with n_probe (n_probe = n_centroids
    degrades to exact brute force). Centroids are trained once on a
    deterministic sample and shipped as literal arrays (broadcast-once
    semantics, north_rule "decoder tables once per executor").
    """
    cents = _train_centroids(
        embeddings, n_centroids=n_centroids, sample_size=sample_size
    )

    # all centroid dots in one Arrow pass (fixed-order accumulation — see
    # _const_dots_udf); centroids are unit-norm, so argmax_c dot(e,c)/|e| ==
    # argmax_c dot(e,c): no per-row norm needed, well-defined for zero
    # vectors. The argmax / probe ranking stays JVM-side over the small
    # dots array.
    cent_dots = _const_dots_udf(cents)

    def sim_structs(dots_col):
        return F.array(
            *[
                F.struct(
                    F.element_at(dots_col, i + 1).alias("sim"),
                    F.lit(i).alias("cid"),
                )
                for i in range(len(cents))
            ]
        )

    from ..plans.session import widen

    inv = widen(embeddings).select(
        "vec_id",
        "embedding",
        F.array_max(sim_structs(cent_dots("embedding"))).getField("cid").alias("cid"),
    )

    q_sims = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        sim_structs(cent_dots("embedding")).alias("cand"),
    )
    probes = q_sims.select(
        "query_id",
        "q_emb",
        F.explode(
            F.slice(F.reverse(F.array_sort("cand")), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "q_emb", F.col("probe.cid").alias("cid"))

    pairs = inv.join(F.broadcast(probes), "cid").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("q_emb")), round_to).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _pq_assign_udf(books):
    """Arrow-batched PQ code assignment: embedding-micro-units ->
    array<int> of m codes (one per subspace).

    ``books`` is an (m, k, d_sub) int64 codebook shipped in the closure
    (broadcast-once semantics). Per subspace the distance is the exact
    integer squared L2 via q.q - 2 q.c + c.c — int64 adds are associative,
    so any Arrow batch size / partitioning gives bit-identical codes;
    argmin takes the FIRST minimum so ties break to the lowest code,
    matching the DuckDB replay (same contract as kmeans_assign)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(books, dtype=np.int64)  # (m, k, d_sub)
    m, _, d_sub = C.shape
    c2 = (C * C).sum(axis=2)  # (m, k)

    @pandas_udf("array<int>")
    def assign(qs: pd.Series) -> pd.Series:
        if len(qs) == 0:
            return pd.Series([], dtype=object)
        M = np.array([np.asarray(v, dtype=np.int64) for v in qs])
        M = M.reshape(len(M), m, d_sub)
        codes = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            Ms = M[:, s, :]
            d = (Ms * Ms).sum(axis=1)[:, None] - 2 * (Ms @ C[s].T) + c2[s][None, :]
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return assign


def pq_train(
    embeddings: DataFrame, *, m: int = 4, k: int = 16, n_iters: int = 2
) -> list:
    """Train product-quantization codebooks (m subspaces x k codes) over the
    full embedding table with the integer-exact Lloyd recipe of
    ``kmeans_assign`` run on every subspace at once.

    Per iteration: ONE zero-exchange Arrow assignment pass + ONE bounded
    groupBy — dims explode to (subspace, code, within-dim) keys that
    map-side-combine down to m*k*d_sub rows; the driver only ever holds the
    codebooks (m*k*d_sub longs). Seeds are the first-k vec_ids' subvectors;
    updates floor(sum/count) with empty-code carryover — all integer, so the
    DuckDB oracle replays training bit-for-bit (``_pq_oracle_sql``).

    At 100 TB you would train on a bounded sample (as ``ivf_topk`` does) and
    encode the full corpus in the same single pass; full-table training here
    keeps the replay oracle total."""
    q = embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(KMEANS_QUANT)).cast("long"),
        ).alias("q"),
    )
    from pyspark import StorageLevel

    q = q.persist(StorageLevel.MEMORY_AND_DISK)
    seed_rows = q.orderBy("vec_id").limit(k).collect()
    if not seed_rows:
        raise ValueError("pq_train: embeddings table is empty")
    dim = len(seed_rows[0]["q"])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    d_sub = dim // m
    books = [
        [list(r["q"][s * d_sub : (s + 1) * d_sub]) for r in seed_rows]
        for s in range(m)
    ]
    for _ in range(n_iters):
        rows = (
            q.select(
                _pq_assign_udf(books)(F.col("q")).alias("codes"),
                F.posexplode("q").alias("d", "v"),
            )
            .select(
                (F.col("d") / d_sub).cast("int").alias("s"),
                (F.col("d") % d_sub).alias("wd"),
                "v",
                "codes",
            )
            .select(
                "s",
                F.element_at("codes", F.col("s") + 1).alias("code"),
                "wd",
                "v",
            )
            .groupBy("s", "code", "wd")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        upd = {(r["s"], r["code"], r["wd"]): (int(r["sv"]), int(r["n"])) for r in rows}
        books = [
            [
                [
                    (
                        math.floor(upd[(s, c, d)][0] / upd[(s, c, d)][1])
                        if (s, c, d) in upd
                        else books[s][c][d]
                    )
                    for d in range(d_sub)
                ]
                for c in range(k)
            ]
            for s in range(m)
        ]
    q.unpersist()
    return books


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    m: int = 8,
    n_codes: int = 64,
    n_iters: int = 2,
    rerank: int = 100,
) -> DataFrame:
    """Product-quantization ANN with exact re-ranking (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"; the FAISS
    IVFPQ+refine shape) — the memory path for corpus-scale similarity:
    each vector is stored as m small codes (8 bytes/vector vs 256 bytes of
    float32), queries scan CODES via asymmetric distance computation (ADC)
    to build a short-list of ``rerank`` candidates, and only the short-list
    is re-ranked by the exact integer L2 distance.

    Output (query_id, vec_id, dist_q, rank): top-k per query by exact
    squared L2 in embedding micro-units over the ADC short-list.

    Scale shape: encode is one zero-exchange Arrow pass over the corpus;
    the per-query ADC TABLES (m*k longs each) are built driver-side from
    the bounded probe side and shipped in the scoring UDF's closure
    (broadcast-once); scoring is a table-lookup sum per row — no vector
    arithmetic, no join — and only n_q*rerank candidate rows ever touch a
    full vector again. The exchanges are the two per-query top-k windows
    (short-list + final), both over candidate-sized inputs. Integer end to
    end, so the DuckDB oracle re-derives training, codes, tables,
    short-lists, and re-ranked ranks bit-for-bit.

    On this sandbox's near-random synthetic embeddings the raw ADC ranking
    saturates at ~0.3 recall@5 (neighbor margins are noise-level — the
    same regime that pushes lsh_ann to 12 tables and ivf_ann to
    n_probe=8); the re-rank stage restores 0.9+ while preserving the
    codes-only corpus scan that makes PQ the 100 TB design."""
    books = pq_train(embeddings, m=m, k=n_codes, n_iters=n_iters)
    enc = pq_encode(embeddings, books)
    return pq_query(enc, queries, books, k=k, rerank=rerank)


def pq_encode(embeddings: DataFrame, books: list) -> DataFrame:
    """Encode every vector against trained codebooks in ONE zero-exchange
    Arrow pass -> (vec_id, codes:array<int>, q:array<bigint>).

    ``codes`` is the m-byte ADC-scannable representation; ``q`` keeps the
    quantized full vector for exact re-ranking (the FAISS ``IVFPQ,Refine``
    layout — codes and refine vectors live in the SAME table as separate
    columns, so a codes-only scan prunes ``q`` at the parquet reader)."""
    return embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(KMEANS_QUANT)).cast("long"),
        ).alias("q"),
    ).select("vec_id", _pq_assign_udf(books)(F.col("q")).alias("codes"), "q")


def pq_query(
    enc: DataFrame,
    queries: DataFrame,
    books: list,
    *,
    k: int = 5,
    rerank: int = 100,
    probe_lists: dict | None = None,
) -> DataFrame:
    """Query-side half of :func:`pq_topk` over an already-encoded corpus
    (``enc`` = (vec_id, codes, q) from :func:`pq_encode`, in-memory or
    reopened from a persisted index — sources/vecindex.py). Builds the
    per-query ADC tables driver-side, scans CODES ONLY for the short-list,
    then re-ranks the short-list by exact integer L2 against ``q``.
    Bit-identical to the inline path: same arithmetic, same tie order.

    ``probe_lists`` ({query_id: [list ids]}, IVF path) restricts each
    query's candidates to its own probed lists via a broadcast semi-join
    on (query_id, list_id) — ``enc`` must then carry ``list_id`` and
    should already be filtered to the probed union so the scan prunes
    partitions."""
    C = np.asarray(books, dtype=np.int64)  # (m, k, d_sub)
    d_sub = C.shape[2]
    codes = enc.select(
        "vec_id", "codes", *(["list_id"] if probe_lists is not None else [])
    )

    # bounded probe side -> driver; ADC tables T[j, s, c] = ||q_j,s - c_s,c||^2
    q_rows = queries.select("vec_id", "embedding").orderBy("vec_id").collect()
    if not q_rows:
        raise ValueError("pq_topk: queries side is empty")
    qids = [int(r["vec_id"]) for r in q_rows]
    Q = np.array(
        [
            np.floor(np.asarray(r["embedding"], dtype=np.float64) * KMEANS_QUANT)
            for r in q_rows
        ],
        dtype=np.int64,
    ).reshape(len(q_rows), C.shape[0], d_sub)
    T = np.empty((len(qids), C.shape[0], C.shape[1]), dtype=np.int64)
    for s in range(C.shape[0]):
        Qs = Q[:, s, :]
        T[:, s, :] = (
            (Qs * Qs).sum(axis=1)[:, None]
            - 2 * (Qs @ C[s].T)
            + (C[s] * C[s]).sum(axis=1)[None, :]
        )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def adc(code_series: pd.Series) -> pd.Series:
        if len(code_series) == 0:
            return pd.Series([], dtype=object)
        Cd = np.array([np.asarray(c, dtype=np.int64) for c in code_series])
        n = len(Cd)
        out = np.zeros((n, T.shape[0]), dtype=np.int64)
        for s in range(T.shape[1]):
            out += T[:, s, :][:, Cd[:, s]].T
        return pd.Series(list(out))

    qid_arr = F.array(*[F.lit(q) for q in qids])
    scored = (
        codes.select(
            "vec_id",
            *(["list_id"] if probe_lists is not None else []),
            F.posexplode(adc("codes")).alias("qi", "adist_q"),
        )
        .select(
            F.element_at(qid_arr, F.col("qi") + 1).cast("long").alias("query_id"),
            "vec_id",
            *(["list_id"] if probe_lists is not None else []),
            "adist_q",
        )
        .where(F.col("vec_id") != F.col("query_id"))
    )
    if probe_lists is not None:
        pr = enc.sparkSession.createDataFrame(
            [(q, l) for q, ls in probe_lists.items() for l in ls],
            "query_id long, list_id int",
        )
        scored = scored.join(
            F.broadcast(pr), ["query_id", "list_id"]
        ).drop("list_id")
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adist_q"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("crank", F.row_number().over(w_adc))
        .where(F.col("crank") <= rerank)
        .select("query_id", "vec_id")
    )

    # exact integer L2 re-rank of the short-list only: candidates join back
    # to the quantized vectors (n_q*rerank rows — Catalyst broadcasts the
    # candidate side), distances against the driver-held query matrix in
    # one Arrow pass (fixed-order int64 — bit-identical at any batch size).
    Qfull = Q.reshape(len(qids), -1)
    qindex = {qid: j for j, qid in enumerate(qids)}

    @pandas_udf("bigint")
    def exact_dist(q_col: pd.Series, qid_col: pd.Series) -> pd.Series:
        if len(q_col) == 0:
            return pd.Series([], dtype="int64")
        M = np.array([np.asarray(v, dtype=np.int64) for v in q_col])
        J = np.array([qindex[int(q)] for q in qid_col])
        d = M - Qfull[J]
        return pd.Series((d * d).sum(axis=1).astype("int64"))

    qvecs = enc.select("vec_id", "q")
    reranked = qvecs.join(F.broadcast(shortlist), "vec_id").select(
        "query_id", "vec_id", exact_dist(F.col("q"), F.col("query_id")).alias("dist_q")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist_q"), F.asc("vec_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dist_q", "rank")
    )


def _probe_lists_udf(cents, n_probe: int):
    """Arrow-batched per-query probe-list selection against literal coarse
    centroids -> array<int> of the ``n_probe`` nearest list ids by exact
    int64 squared L2, stable ties -> lowest list id — the SAME (dist, cl)
    order as ``VectorIndex.probe_lists``'s driver argsort, so the two
    probe paths pick identical lists for identical queries."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cents, dtype=np.int64)  # (L, dim)
    c2 = (C * C).sum(axis=1)

    @pandas_udf("array<int>")
    def probes(qs: pd.Series) -> pd.Series:
        if len(qs) == 0:
            return pd.Series([], dtype=object)
        M = np.array([np.asarray(v, dtype=np.int64) for v in qs])
        d = (M * M).sum(axis=1)[:, None] - 2 * (M @ C.T) + c2[None, :]
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probes


def _recon_l2_udf(books):
    """(codes, qq) -> int64 squared L2 between the query's quantized
    vector and the candidate's PQ reconstruction. Per subspace s,
    ||qq_s - C[s, codes_s]||^2 summed over s — EXACTLY the per-query ADC
    table entries ``pq_query`` builds driver-side, summed in the same
    integer arithmetic (association-free int64), so batch and driver ADC
    scores are bit-identical."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(books, dtype=np.int64)  # (m, k, d_sub)

    @pandas_udf("bigint")
    def adist(codes: pd.Series, qq: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="int64")
        Cd = np.array([np.asarray(c, dtype=np.int64) for c in codes])
        Q = np.array([np.asarray(v, dtype=np.int64) for v in qq])
        R = np.concatenate(
            [C[s][Cd[:, s]] for s in range(C.shape[0])], axis=1
        )  # (n, dim) reconstruction
        d = R - Q
        return pd.Series((d * d).sum(axis=1).astype("int64"))

    return adist


def _pair_l2_udf():
    """(q, qq) -> exact int64 squared L2 between two quantized vectors —
    the batch-path twin of ``pq_query``'s ``exact_dist`` (which indexes a
    driver-held query matrix instead of reading the joined column)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def dist(q: pd.Series, qq: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype="int64")
        A = np.array([np.asarray(v, dtype=np.int64) for v in q])
        B = np.array([np.asarray(v, dtype=np.int64) for v in qq])
        d = A - B
        return pd.Series((d * d).sum(axis=1).astype("int64"))

    return dist


def pq_query_batch(
    enc: DataFrame,
    queries: DataFrame,
    books: list,
    coarse_cents: list,
    *,
    k: int = 5,
    rerank: int = 100,
    n_probe: int = 3,
) -> DataFrame:
    """Distributed IVFPQ query path for LARGE query sets (VERDICT r04 #4):
    zero driver-side collect — the probe side stays a DataFrame end to
    end, so a 1M-row query batch plans exactly like a 10-row one.

    ``pq_query`` + ``VectorIndex.probe_lists`` collect the probe side and
    build per-query ADC tables in a UDF closure — the right shape for
    interactive query sets (bounded driver state, one corpus scan), the
    wrong one when a batch job probes with millions of queries. Here:

    - coarse probe selection runs through an Arrow kernel against the
      literal centroids (``_probe_lists_udf`` — same arithmetic and tie
      order as the driver argsort), exploded to a (query_id, list_id)
      probe table;
    - the ADC short-list comes from joining that probe table to the
      hive-partitioned codes on ``list_id`` (the equi-join gives Spark a
      dynamic-partition-pruning opportunity on the codes scan; candidates
      never exceed the probed lists), scoring each pair via the PQ
      reconstruction L2 (`_recon_l2_udf` — bit-identical to the driver
      ADC-table sums);
    - the exact re-rank joins the short-list back to the refine column and
      the quantized queries — same integer arithmetic, same
      (dist, vec_id) tie order.

    Output (query_id, vec_id, dist_q, rank) is bit-identical to
    ``VectorIndex.topk`` with ``n_probe`` for the same inputs
    (tests/test_vecindex.py pins equality AND the zero-collect plan
    construction)."""
    qq = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(KMEANS_QUANT)).cast("long"),
        ).alias("qq"),
    )
    probe = qq.select(
        "query_id",
        "qq",
        F.explode(_probe_lists_udf(coarse_cents, n_probe)(F.col("qq"))).alias(
            "list_id"
        ),
    )
    pairs = (
        probe.join(enc.select("list_id", "vec_id", "codes"), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _recon_l2_udf(books)(F.col("codes"), F.col("qq")).alias("adist_q"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adist_q"), F.asc("vec_id"))
    shortlist = (
        pairs.withColumn("crank", F.row_number().over(w_adc))
        .where(F.col("crank") <= rerank)
        .select("query_id", "vec_id")
    )
    # the re-rank reads the refine column ONLY from the probed lists: the
    # shortlist's members all come from probed partitions, so the semi-
    # join against the (distinct, bounded-by-L) probed-list table prunes
    # the other partitions' files from the q scan instead of scanning the
    # whole corpus to serve n_q*rerank rows
    probed = probe.select("list_id").distinct()
    reranked = (
        enc.join(F.broadcast(probed), "list_id", "left_semi")
        .select("vec_id", "q")
        .join(shortlist, "vec_id")
        .join(qq, "query_id")
        .select(
            "query_id",
            "vec_id",
            _pair_l2_udf()(F.col("q"), F.col("qq")).alias("dist_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist_q"), F.asc("vec_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dist_q", "rank")
    )


def semdedup(
    embeddings: DataFrame,
    *,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup —
    cluster the embedding space, then inside each cluster drop every vector
    that has a near-identical neighbor (cosine >= ``threshold``), keeping
    one representative (the lowest vec_id) per near-dup set.

    Cluster here = sign-LSH bucket over ``n_planes`` seeded hyperplanes
    (deterministic literals, so an independent SQL engine re-derives the
    same clusters — the paper uses k-means; the dedup semantics inside a
    cluster are identical and the bucket count 2^n_planes plays the role
    of k). The within-cluster pair join is SemDeDup's inherent quadratic
    step; at corpus scale n_planes grows so expected bucket size stays
    bounded (the paper's k ~ sqrt(N) heuristic), and buckets are
    hash-distributed with no hot keys.

    Output: (vec_id, bucket, kept) for EVERY input vector.
    """
    planes = _hyperplanes(dim, n_planes, seed=seed)
    plane_dots = _const_dots_udf(np.asarray(planes))

    def bucket_col(dots_col):
        acc = None
        for i in range(n_planes):
            b = F.when(F.element_at(dots_col, i + 1) > 0, F.lit(1)).otherwise(
                F.lit(0)
            ) * F.lit(2 ** i)
            acc = b if acc is None else acc + b
        return acc.cast("long")

    from ..plans.session import widen

    b = (
        widen(embeddings)
        .select("vec_id", "embedding", plane_dots("embedding").alias("_d"))
        .select("vec_id", "embedding", bucket_col(F.col("_d")).alias("bucket"))
    )
    lo = b.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    hi = b.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "bucket"
    )
    removed = (
        lo.join(hi, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), round_to)
            >= F.lit(threshold)
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        b.join(removed.withColumn("_rm", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "bucket",
            F.coalesce(~F.col("_rm"), F.lit(True)).alias("kept"),
        )
    )


def _int_hyperplanes(dim: int, n_planes: int, seed: int, quant: int = 1_000_000):
    """Integer-quantized hyperplanes for exact sign-LSH over integer
    vectors: floor(p * quant) computed ONCE here and embedded as literals
    in the DuckDB oracle, so both engines hash with the same int64 dots —
    no float summation-order risk at the sign boundary."""
    return [
        [int(math.floor(v * quant)) for v in p]
        for p in _hyperplanes(dim, n_planes, seed=seed)
    ]


def semdedup_pq(
    rec: DataFrame,
    *,
    threshold_num: int = 9,
    threshold_den: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup over PQ-RECONSTRUCTED vectors — the memory path that makes
    100-TB semantic dedup feasible (VERDICT r03 next-round #6): the corpus
    is scanned as m-byte codes from the persisted index
    (sources/vecindex.py), reconstructed to codebook centroids in one
    Arrow pass, and deduped WITHOUT ever touching the raw embedding
    column. ``rec`` = (vec_id, rec: array<bigint>) from
    ``VectorIndex.reconstruct``.

    Same shape as :func:`semdedup` (sign-LSH bucket ~ the paper's cluster;
    within-bucket pair join; keep lowest vec_id per near-dup set) but ALL
    arithmetic is integer-exact: bucket bits come from int64 dots against
    floor-quantized hyperplanes, and the cosine test
    ``cos >= num/den`` is evaluated as
    ``dot > 0 AND den^2 * dot^2 >= num^2 * |a|^2 * |b|^2`` in
    decimal(38,0) — no sqrt, no float rounding, so the DuckDB oracle
    replays training + reconstruction + dedup bit-for-bit. Zero-norm
    RECONSTRUCTED vectors are never removed (dot = 0 fails ``dot > 0``,
    matching semdedup's cos(0, .) = 0 convention); note raw zero vectors
    reconstruct to their cell centroid, so identical raw vectors —
    including zero pairs — share codes and dedup to the lowest vec_id,
    which is exactly the code-space semantics a 100-TB pass wants.

    Output: (vec_id, bucket, kept) for EVERY input vector.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.asarray(
        _int_hyperplanes(dim, n_planes, seed, KMEANS_QUANT), dtype=np.int64
    )  # (n_planes, dim)

    @pandas_udf("array<bigint>")
    def plane_dots_and_norm(rec_s: pd.Series) -> pd.Series:
        """[dot(rec, plane_0..n-1), dot(rec, rec)] per row — int64 exact
        (|coord| <= ~5e5 * quant planes -> per-term < 2^60/dim; integer
        addition is associative, any order identical)."""
        if len(rec_s) == 0:
            return pd.Series([], dtype=object)
        M = np.array([np.asarray(v, dtype=np.int64) for v in rec_s])
        dots = M @ planes.T  # (n, n_planes) int64
        na = (M * M).sum(axis=1)[:, None]
        return pd.Series(list(np.concatenate([dots, na], axis=1)))

    def bucket_col(dn):
        acc = None
        for i in range(n_planes):
            b = F.when(F.element_at(dn, i + 1) > 0, F.lit(1)).otherwise(
                F.lit(0)
            ) * F.lit(2 ** i)
            acc = b if acc is None else acc + b
        return acc.cast("long")

    from ..plans.session import widen

    b = (
        widen(rec)
        .select("vec_id", "rec", plane_dots_and_norm("rec").alias("_dn"))
        .select(
            "vec_id",
            "rec",
            bucket_col(F.col("_dn")).alias("bucket"),
            F.element_at("_dn", n_planes + 1).alias("na"),
        )
    )

    @pandas_udf("long")
    def pair_dot(a_s: pd.Series, b_s: pd.Series) -> pd.Series:
        if len(a_s) == 0:
            return pd.Series([], dtype="int64")
        A = np.array([np.asarray(v, dtype=np.int64) for v in a_s])
        B = np.array([np.asarray(v, dtype=np.int64) for v in b_s])
        return pd.Series((A * B).sum(axis=1).astype("int64"))

    lo = b.select(
        F.col("vec_id").alias("vec_a"),
        F.col("rec").alias("rec_a"),
        F.col("na").alias("n_a"),
        "bucket",
    )
    hi = b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("rec").alias("rec_b"),
        F.col("na").alias("n_b"),
        "bucket",
    )
    dec = "decimal(38,0)"
    d = F.col("_dot").cast(dec)
    removed = (
        lo.join(hi, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_b",
            pair_dot(F.col("rec_a"), F.col("rec_b")).alias("_dot"),
            "n_a",
            "n_b",
        )
        .where(
            (F.col("_dot") > 0)
            & (
                d * d * F.lit(threshold_den * threshold_den).cast(dec)
                >= F.col("n_a").cast(dec)
                * F.col("n_b").cast(dec)
                * F.lit(threshold_num * threshold_num).cast(dec)
            )
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return b.join(removed.withColumn("_rm", F.lit(True)), "vec_id", "left").select(
        "vec_id",
        "bucket",
        F.coalesce(~F.col("_rm"), F.lit(True)).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's) — full-corpus clustering, integer-exact
# ---------------------------------------------------------------------------

KMEANS_QUANT = 1_000_000  # embedding micro-units (floor quantization)


def kmeans_assign(
    embeddings: DataFrame,
    *,
    k: int = 8,
    n_iters: int = 3,
) -> DataFrame:
    """Distributed Lloyd's k-means over the FULL embedding table ->
    (vec_id, cluster:int, dist_q:long).

    The scalable shape (what Spark MLlib's KMeans also does, minus its
    float nondeterminism): per iteration, assignment is a zero-exchange
    Arrow-batched int64 kernel against centroids shipped in the UDF
    closure (k*dim longs), and the update is
    one bounded groupBy — dims explode narrowly to (cluster, dim) keys,
    map-side partial agg reduces to k*dim rows, the driver rebuilds the
    literals. Corpus rows are never collected; driver state is k*dim longs
    per iteration (the same bounded-scalar pattern as dsir/bm25 stats).

    Integer-exact end to end, so the DuckDB oracle replays it bit-for-bit
    and any partitioning / reduction order gives identical clusters:

    - vectors quantize once: q[i] = floor(double(x[i]) * 1e6) as long
    - seeds: the k smallest vec_ids' quantized vectors (deterministic
      "first-k" policy; k-means|| would add exchanges for no test value)
    - distance: integer squared L2 (exact in long: |q| <= ~2^22 coords,
      dim * (2*2^22)^2 << 2^63); ties -> lowest cluster index
    - update: centroid dim = floor(sum / count) via double (sums < 2^53,
      so the double division is exact and floor matches every engine);
      empty clusters keep their previous centroid
    """
    q = quantize_embeddings(embeddings)
    from pyspark import StorageLevel

    q = q.persist(StorageLevel.MEMORY_AND_DISK)
    cents = kmeans_train(q, k=k, n_iters=n_iters)
    a = _kmeans_assign_udf(cents)(F.col("q")).alias("a")
    out = q.select("vec_id", a).select(
        "vec_id", F.col("a.cluster").alias("cluster"), F.col("a.dist_q").alias("dist_q")
    )
    return out


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """(vec_id, q: array<bigint>) — the shared micro-unit quantization
    every integer-exact vector operator starts from."""
    return embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(KMEANS_QUANT)).cast("long"),
        ).alias("q"),
    )


def _kmeans_assign_udf(cents):
    """Arrow-batched int64 assignment against literal centroids. The
    Column-algebra form (k aggregate(zip_with(...)) expressions over
    literal centroid arrays) is interpreted per element and re-analyzed
    per pass — measured 70 s for 2000x64 at k=8; this kernel does the
    same arithmetic in one numpy pass per batch (~100x). Exactness is
    unchanged: ||q-c||^2 = q.q - 2 q.c + c.c in int64, and integer
    addition is associative, so any batch size / partitioning / numpy
    reduction order gives bit-identical distances (bounds: |q| <= ~2^22
    coords => per-term < 2^46, dim-sums < 2^52 — no overflow). argmin
    takes the FIRST minimum -> lowest cluster index wins ties, matching
    the oracle's replay."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cents, dtype=np.int64)  # (k, dim)
    c2 = (C * C).sum(axis=1)  # (k,)

    @pandas_udf("struct<cluster:int, dist_q:long>")
    def assign(qs: pd.Series) -> pd.DataFrame:
        if len(qs) == 0:
            return pd.DataFrame(
                {
                    "cluster": pd.Series([], dtype="int32"),
                    "dist_q": pd.Series([], dtype="int64"),
                }
            )
        M = np.array([np.asarray(v, dtype=np.int64) for v in qs])  # (n, dim)
        d = (M * M).sum(axis=1)[:, None] - 2 * (M @ C.T) + c2[None, :]
        cl = d.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": cl.astype("int32"),
                "dist_q": d[np.arange(len(M)), cl].astype("int64"),
            }
        )

    return assign


def kmeans_train(q: DataFrame, *, k: int = 8, n_iters: int = 3) -> list:
    """The training loop of :func:`kmeans_assign` over an already-
    quantized (vec_id, q) table -> the final centroid lists (k*dim
    longs). Shared by the IVF coarse quantizer of the persisted vector
    index (sources/vecindex.py), which needs the centroids themselves to
    assign probe lists at query time."""
    seed_rows = q.orderBy("vec_id").limit(k).collect()
    if not seed_rows:
        raise ValueError("kmeans_train: embeddings table is empty")
    cents = [list(r["q"]) for r in seed_rows]
    dim = len(cents[0])
    for _ in range(n_iters):
        sums = (
            q.select(
                _kmeans_assign_udf(cents)(F.col("q"))
                .getField("cluster")
                .alias("cluster"),
                F.posexplode("q").alias("dim", "v"),
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = {(int(r["cluster"]), int(r["dim"])): (int(r["s"]), int(r["n"])) for r in sums}
        cents = [
            [
                (
                    math.floor(new[(c, d)][0] / new[(c, d)][1])
                    if (c, d) in new
                    else cents[c][d]
                )
                for d in range(dim)
            ]
            for c in range(k)
        ]
    return cents


def embed_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroids of the embedding column — the reference's
    utils/embeddings.compute_centroids (tested at
    /root/reference/tests/test_utils_embeddings.py:38-63: group-mean of
    the member vectors per id), re-expressed as ONE bounded aggregation.

    Integer-exact so the DuckDB oracle hash-matches: components are
    micro-scaled (round(v * 1e6) as BIGINT) before summing; the mean is
    a floor division of exact integers. posexplode -> groupBy(label, dim)
    partial-aggregates map-side and the output is bounded by
    n_labels * dim rows — no corpus-wide shuffle of raw vectors."""
    dims = embeddings.select(
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "label",
        "dim",
        F.round(F.col("v").cast("double") * 1e6).cast("long").alias("micro"),
    )
    agg = dims.groupBy("label", "dim").agg(
        F.sum("micro").alias("sum_micro"),
        F.count(F.lit(1)).alias("n"),
    )
    # floor(sum/n) on exact integers: |sum| < 2^40 so the double division
    # is exact enough for floor to agree with arbitrary-precision floor
    # everywhere except exact-integer quotients, which floor identically
    return agg.select(
        "label",
        "dim",
        "sum_micro",
        "n",
        F.floor(F.col("sum_micro") / F.col("n")).cast("long").alias("centroid_micro"),
    )
