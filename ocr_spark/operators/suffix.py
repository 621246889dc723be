"""Distributed suffix array via prefix doubling (Manber–Myers 1990).

The exact-substring dedup machinery of Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better") needs a suffix array over
the corpus; `dup_spans` covers the fixed-n approximation (n-gram
sorting IS suffix sorting truncated to n chars), this module computes
the UNTRUNCATED order so duplicated substrings of ANY length fall out
of rank adjacency. Suffix strings are never materialized — each round
carries only (doc_id, pos, rank) int rows:

  round k resolves prefixes of length 2^k: the new sort key for
  position i is the pair (rank_k[i], rank_k[i + 2^k]) — both already
  known — and a global DENSE rank of those pairs becomes rank_{k+1}.
  O(log maxlen) rounds, each ONE (doc, pos+k) equi-join plus ONE
  global dense-rank.

The global dense rank is the same two-pass range-partition pattern as
`dsir.dsir_resample`/shuffle shards: repartitionByRange on the key
(pinned with localCheckpoint so both passes see identical partitions),
pass 1 collects ONE row per partition (its key count), the driver
turns those into per-partition starting offsets (n_partitions rows,
never the data), pass 2 is a per-partition row_number plus the offset.
No partitionBy-less window anywhere — that would funnel the corpus
through a single task.

Scale: rows are 3 ints per corpus CHARACTER, so this is the one
operator family priced per character, not per document — at 100 TB you
run it per shard/bucket (rank adjacency within a hash-bucket of the
corpus still finds every duplicate pair that hashes together; Lee et
al. shard the same way) or on the dup-suspect subset that cheaper
n-gram/MinHash passes surface. Rounds scale with log(max DOCUMENT
length), not corpus size, because suffixes stop at their document's
unique terminator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _attach_dense_rank(
    df: DataFrame, cols: list[str], *, out: str, n_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """Attach a GLOBAL 1-based dense rank over `cols` to every row of
    `df` (rows with equal keys share a rank), returning
    (ranked DF, number of distinct keys). Two-pass, no distinct and no
    join-back: repartitionByRange on the key (pinned with
    localCheckpoint so both passes see identical partitions), pass 1
    collects ONE distinct-key count per partition, the driver turns
    those into per-partition rank offsets (n_partitions ints, never the
    data), pass 2 is a per-partition dense_rank plus the offset. Range
    partitioning puts equal keys in one partition, so the local
    dense_rank + offset IS the global dense rank, byte-identical under
    any parallelism."""
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 2)
    kcols = [F.col(c) for c in cols]
    ranged = df.repartitionByRange(n_partitions, *kcols).localCheckpoint(eager=True)
    part_rows = (
        ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.countDistinct(*kcols).alias("c"))
        .collect()
    )
    counts = {int(r["_pid"]): int(r["c"]) for r in part_rows}
    offsets, acc = {}, 0
    for pid in sorted(counts):  # range partitions are ordered by pid
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _off long",
    )
    w = Window.partitionBy("_pid").orderBy(*kcols)
    ranked = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.dense_rank().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    return ranked, acc


def suffix_array(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "s",
    n_partitions: int | None = None,
    init_width: int = 16,
) -> DataFrame:
    """Suffix ranks for every (document, position): returns
    (id_col, pos, rnk) where pos is 1-based and rnk is the 1-based
    dense rank of the suffix text[pos:] among ALL suffixes of ALL
    documents (binary/codepoint order, same as DuckDB's memcmp sort on
    ASCII). Equal suffixes share a rank — DENSE semantics, i.e.
    ``dense_rank() OVER (ORDER BY substr(s, pos))``. A per-document
    unique terminator (e.g. ``'#' || doc_id || '#'`` over a '#'-free
    alphabet) limits ties to suffixes that lie entirely inside the
    terminator tail ('0#', '#'), keeping every content suffix unique.

    ``n_partitions`` sizes the global-rank range partitioning. Default
    (None) scales with the input — max(defaultParallelism, one range
    partition per ~2M suffix rows) — instead of a fixed count, so the
    two-pass rank never funnels a corpus-scale run through a handful of
    reducers; the rank itself is partition-count-invariant (range
    partitioning co-locates equal keys; tested at two counts)."""
    if n_partitions is None:
        sc = docs.sparkSession.sparkContext
        n_chars = int(
            docs.select(F.sum(F.length(text_col)).alias("c")).first()["c"] or 0
        )
        n_partitions = max(sc.defaultParallelism, n_chars // 2_000_000 + 1)
    # Seed with the rank of each suffix's first `init_width` chars (a
    # short-string sort — exactly the n-gram sort dup_spans already
    # does), so doubling starts at k=init_width: rounds =
    # log2(maxlen/init_width), not log2(maxlen). Truncated comparison
    # is suffix-order-consistent: a shorter-than-width suffix is a
    # strict prefix of anything sharing its chars and sorts first both
    # ways. Column.substr can't reference the exploded pos in the same
    # select; derive the prefix in a second projection.
    chars = docs.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), F.length(text_col))).alias("pos"),
        F.col(text_col).alias("_s"),
    ).select(
        id_col,
        "pos",
        F.col("_s").substr(F.col("pos"), F.lit(init_width)).alias("_ch"),
    )
    ranked, n_distinct = _attach_dense_rank(
        chars, ["_ch"], out="rnk", n_partitions=n_partitions
    )
    # truncate the per-round lineage (kcore precedent: an untruncated
    # iterative plan doubles every round) AND let the self-join below
    # read the ranks once, not recompute the window per join side
    pr = ranked.select(id_col, "pos", "rnk").localCheckpoint(eager=True)
    n_total = pr.count()
    max_len = docs.select(F.max(F.length(text_col))).first()[0] or 0

    # prefix QUADRUPLING (VERDICT r03 #8): the classic doubling key
    # (r_k[i], r_k[i+k]) resolves length 2k; the 4-tuple
    # (r_k[i], r_k[i+k], r_k[i+2k], r_k[i+3k]) resolves length 4k in the
    # SAME one-rank round — each component ranks a disjoint k-chunk of
    # the prefix, so the tuple's lexicographic order IS the 4k-prefix
    # order. Rounds drop from log2 to log4 of maxlen/init_width
    # (294-char docs: 5 -> 3), and each global dense rank is the
    # expensive part (two full range-partition passes + a driver
    # fan-in), while the extra shifts are two more cheap co-keyed
    # joins. Final ranks are algorithm-independent (the oracle sorts
    # the actual suffix strings) — hashes unchanged.
    k = max(1, init_width)
    while n_distinct < n_total and k < max_len:
        merged = pr
        for j in (1, 2, 3):
            shifted = pr.select(
                F.col(id_col),
                (F.col("pos") - F.lit(j * k)).alias("pos"),
                F.col("rnk").alias(f"_r{j + 1}"),
            )
            merged = (
                merged.join(shifted, [id_col, "pos"], "left")
                # past-end = rank 0, sorting before every real rank — the
                # shorter suffix wins ties exactly as string order demands
                .withColumn(
                    f"_r{j + 1}",
                    F.coalesce(F.col(f"_r{j + 1}"), F.lit(0).cast("long")),
                )
            )
        ranked, n_distinct = _attach_dense_rank(
            merged,
            ["rnk", "_r2", "_r3", "_r4"],
            out="_nr",
            n_partitions=n_partitions,
        )
        pr = ranked.select(
            id_col, "pos", F.col("_nr").alias("rnk")
        ).localCheckpoint(eager=True)
        k *= 4
    return pr


def adjacent_dup_grams(
    docs: DataFrame,
    sa: DataFrame,
    *,
    gram_len: int,
    id_col: str = "doc_id",
    text_col: str = "s",
) -> DataFrame:
    """Pairs of suffixes ADJACENT in suffix-array order that share an
    exact `gram_len`-char prefix — the Lee et al. duplicate-detection
    read-out: every duplicated substring of length >= gram_len puts its
    occurrences next to each other in the SA, so rank adjacency finds
    them without any all-pairs work. Returns (doc_a, pos_a, doc_b,
    pos_b, gram, cross_doc). Texts join back per SIDE (two equi-joins
    on the doc id; the doc table side is the small one and AQE
    broadcasts it at test scale — at corpus scale this is the same
    carry-the-text verify join the Jaccard family pays)."""
    a = sa.select(
        F.col(id_col).alias("doc_a"),
        F.col("pos").alias("pos_a"),
        "rnk",
    )
    b = sa.select(
        F.col(id_col).alias("doc_b"),
        F.col("pos").alias("pos_b"),
        (F.col("rnk") - F.lit(1)).alias("rnk"),
    )
    ta = docs.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("_sa"))
    tb = docs.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("_sb"))
    gram_a = F.col("_sa").substr(F.col("pos_a"), F.lit(gram_len))
    gram_b = F.col("_sb").substr(F.col("pos_b"), F.lit(gram_len))
    return (
        a.join(b, "rnk")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .where(
            (F.length(gram_a) == gram_len)
            & (gram_a == gram_b)
        )
        .select(
            "doc_a",
            "pos_a",
            "doc_b",
            "pos_b",
            gram_a.alias("gram"),
            (F.col("doc_a") != F.col("doc_b")).alias("cross_doc"),
        )
    )
