"""Video fingerprint: per-frame dHash + per-bit majority vote (vfp64),
the video leg of the near-dup family. Covers the two properties the
temporal pooling buys — single-frame noise is absorbed, global edits
shift the vote — plus the no-task-failure NULL contract."""

import numpy as np

from ocr_spark.kernels.avicodec import avi_encode
from ocr_spark.operators.multimodal import dhash64, vfp64, video_fingerprint


def _frame(seed: int) -> np.ndarray:
    r = np.arange(8)[:, None]
    c = np.arange(9)[None, :]
    g = ((seed + 1) * (r * 131 + c * c * 29 + c * 31 + 7)) % 256
    return np.stack([g, g, g], axis=-1).astype(np.uint8)


def test_identical_frames_vote_to_frame_dhash():
    fr = _frame(3)
    assert vfp64([fr] * 7) == dhash64(fr)


def test_single_corrupt_frame_absorbed():
    frames = [_frame(3)] * 6 + [_frame(99)]  # one intro card / glitch
    assert vfp64(frames) == dhash64(_frame(3))


def test_global_edit_shifts_vote():
    frames = [_frame(3 + f) for f in range(7)]
    edited = []
    for fr in frames:
        e = fr.copy()
        e[0, 0, :] = 255  # overlay on EVERY frame: (0,0)<(0,1) now false in all
        edited.append(e)
    a, b = vfp64(frames), vfp64(edited)
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert 0 < ham <= 1  # only the (0,0) comparison can move


def test_operator_pairs_and_null_contract(spark):
    vids = [
        (1, avi_encode([_frame(3 + f) for f in range(7)])),
        (2, avi_encode([_frame(3 + f) for f in range(7)])),  # exact dup
        (3, avi_encode([_frame(40 + f) for f in range(7)])),
        (4, b"not an avi at all"),
        (5, None),
    ]
    df = spark.createDataFrame(vids, "blob_id long, blob binary")
    sig = video_fingerprint(df).collect()
    by_id = {r.blob_id: r for r in sig}
    assert by_id[1].vfp == by_id[2].vfp and by_id[1].n_frames == 7
    assert by_id[4].vfp is None and by_id[5].vfp is None

    from ocr_spark.operators.dedup import hamming_near_pairs

    pairs = hamming_near_pairs(
        video_fingerprint(df).drop("n_frames"),
        sig_col="vfp",
        id_col="blob_id",
        max_hamming=3,
        n_blocks=4,
    ).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} >= {(1, 2)}
    assert all({p.doc_a, p.doc_b} != {4, 5} for p in pairs)
