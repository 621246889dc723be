"""Vector-index scale proof (VERDICT r04 #3): build the persisted IVFPQ
artifact over a corpus replicated MULT x beyond sf0.1, extend() it with
one increment, and record probed-query latency vs the flat-PQ scan at
both scales.

The claim being evidenced: with the list COUNT scaled to keep list SIZE
constant (the production sizing — lists ~ corpus / target_list_rows),
the probed query touches n_probe lists of bounded size, so its latency
stays roughly flat while the flat ADC scan grows linearly with the
corpus. Partition pruning was plan-asserted at sf0.01 in
tests/test_vecindex.py; this records the measured effect at soak scale.

Replication keeps vec_ids unique (id + k * stride) and perturbs one
coordinate per replica so copies are not byte-identical vectors.

Usage: python scripts/vecindex_scale.py [mult] [sf_dir] [out_root]
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ocr_spark.plans.session import get_spark  # noqa: E402
from ocr_spark.sources.vecindex import (  # noqa: E402
    build_vector_index,
    open_vector_index,
)


def replicate(emb, mult: int, stride: int):
    """mult copies with unique ids; replica k nudges coordinate k % dim so
    copies are distinct vectors (the index must not dedup them away)."""
    k = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k")
    dim = len(emb.select("embedding").head()["embedding"])
    return emb.select("vec_id", "embedding", k).select(
        (F.col("vec_id") + F.col("k").cast("long") * stride).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x
            + F.when(i == (F.col("k") % dim), F.col("k").cast("float") * 1e-4).otherwise(
                0.0
            ),
        ).alias("embedding"),
    )


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 3)


def query_stats(spark, idx, queries, *, n_probe):
    probed, t_probed = timed(lambda: idx.topk(spark, queries, k=5, n_probe=n_probe).count())
    flat, t_flat = timed(lambda: idx.topk(spark, queries, k=5).count())
    return {
        "probed_rows": probed,
        "probed_sec": t_probed,
        "flat_rows": flat,
        "flat_sec": t_flat,
    }


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ocr_spark_vecindex_scale"
    spark = get_spark("vecindex_scale")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_base = emb.count()
    stride = n_base * 10
    queries = emb.where(F.col("vec_id") < 5)
    result = {"sf": sf, "n_base": n_base, "mult": mult, "levels": []}

    shutil.rmtree(out_root, ignore_errors=True)
    for level_mult, n_lists in ((1, 8), (mult, 8 * mult)):
        corpus = emb if level_mult == 1 else replicate(emb, level_mult, stride)
        # the replica explode inherits the 1-row-group scan's single
        # partition — spread it so build/query measure parallel work
        corpus = corpus.repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        n = corpus.count()
        root = os.path.join(out_root, f"x{level_mult}")
        _, t_build = timed(
            lambda: build_vector_index(
                corpus,
                root,
                m=8,
                n_codes=64,
                n_iters=2,
                n_lists=n_lists,
                coarse_iters=2,
            )
        )
        idx = open_vector_index(root)  # reopen: zero training jobs
        stats = query_stats(spark, idx, queries, n_probe=3)
        level = {
            "mult": level_mult,
            "n_vectors": n,
            "n_lists": n_lists,
            "build_sec": t_build,
            **stats,
        }
        if level_mult == mult:
            # one extend() increment (a fresh 1x batch) at soak scale:
            # frozen codebooks, one manifest commit, queries see the rows
            inc = replicate(emb, 1, stride).select(
                (F.col("vec_id") + mult * stride).alias("vec_id"), "embedding"
            )
            _, t_extend = timed(lambda: idx.extend(inc))
            n_after = idx.codes(spark).count()
            stats2 = query_stats(spark, idx, queries, n_probe=3)
            level["extend_sec"] = t_extend
            level["n_after_extend"] = n_after
            level["post_extend"] = stats2
        result["levels"].append(level)
        corpus.unpersist()

    lv = {l["mult"]: l for l in result["levels"]}
    result["flat_slowdown"] = round(lv[mult]["flat_sec"] / lv[1]["flat_sec"], 2)
    result["probed_slowdown"] = round(lv[mult]["probed_sec"] / lv[1]["probed_sec"], 2)
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
