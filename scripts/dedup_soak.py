"""10x-duplication dedup soak (VERDICT r02 item 6).

Worst-case corpus for near-dup candidate generation: every document sits in
a 10-member exact-dup cluster (sf0.1 documents x 10 replicas with distinct
doc_ids), so prefix filtering cannot prune anything — identical shingle
sets share every element. Times the four family members recorded in the
round-1 table (BENCH/BASELINE.md "Dedup at 10x duplication") on the
restructured doc-level shingle-array code:

    python scripts/dedup_soak.py [sf_dir] [replicas] [cpus]

Prints one JSON line per operator + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ocr_spark.operators import dedup as dd  # noqa: E402
from ocr_spark.plans.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark("dedup_soak", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(F.broadcast(reps))
        .select((F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"), "text")
        .repartition(cpus * 3, "doc_id")
    )
    docs = docs.persist()
    n_docs = docs.count()
    print(
        json.dumps(
            {"corpus": {"sf_dir": sf_dir, "n_base": n_base, "replicas": replicas,
                        "n_docs": n_docs, "cpus": cpus}}
        ),
        flush=True,
    )

    results = {}

    def run(name, fn):
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 1)
        results[name] = {"wall_sec": dt, "result_rows": n}
        print(json.dumps({name: results[name]}), flush=True)
        spark.catalog.clearCache()
        docs.persist().count()  # re-warm the shared input

    run(
        "minhash_lsh_t09",
        lambda: dd.minhash_lsh_pairs(docs, jaccard_threshold=0.9).count(),
    )
    run(
        "simhash_4band_h3",
        lambda: dd.simhash_near_pairs(docs, max_hamming=3).count(),
    )
    run(
        "exact_jaccard_t09",
        lambda: dd.ngram_jaccard_pairs(docs, threshold=0.9).count(),
    )
    pairs = dd.minhash_lsh_pairs(docs, jaccard_threshold=0.9)
    run(
        "pairs_to_clusters",
        lambda: dd.dedup_clusters(pairs).select("cluster_id").distinct().count(),
    )

    print(json.dumps({"summary": results, "n_docs": n_docs, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
