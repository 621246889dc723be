"""Content-defined chunking: boundary math vs brute force, the
insert-realignment property that motivates CDC over fixed blocks, the
min/max floors-and-ceilings path, and the operator's NULL contract."""

import hashlib

import numpy as np

from ocr_spark.kernels.cdc import cdc_boundaries, cdc_chunks, window_hashes


def _payload(seed: int, n: int = 400) -> bytes:
    return bytes(((seed + 1) * (i * i * i + 5 * i + 11)) % 9973 % 126 + 1 for i in range(n))


def test_window_hashes_match_bruteforce():
    data = _payload(7)
    brute = [
        sum(data[i - 7 + j] * 31 ** (7 - j) for j in range(8)) % 1_000_000_007
        for i in range(7, len(data))
    ]
    assert window_hashes(data).tolist() == brute


def test_chunks_partition_the_payload():
    data = _payload(3)
    chunks = cdc_chunks(data)
    assert chunks[0][0] == 0
    assert sum(c[1] for c in chunks) == len(data)
    for (o1, l1, _), (o2, _, _) in zip(chunks, chunks[1:]):
        assert o2 == o1 + l1
    for off, ln, h in chunks:
        assert h == hashlib.md5(data[off : off + ln]).hexdigest()


def test_insert_realigns_fixed_blocks_do_not():
    base = _payload(11, 600)
    edited = b"\x01\x02\x03" + base  # 3-byte insertion at the front
    a = {h for _, _, h in cdc_chunks(base)}
    b = {h for _, _, h in cdc_chunks(edited)}
    assert len(a) > 3
    # CDC: everything after the first shared boundary realigns
    assert len(a & b) >= len(a) - 2
    # fixed-size blocks: the same insertion shifts EVERY block
    fixed_a = {hashlib.md5(base[i : i + 64]).hexdigest() for i in range(0, len(base), 64)}
    fixed_b = {
        hashlib.md5(edited[i : i + 64]).hexdigest() for i in range(0, len(edited), 64)
    }
    assert not (fixed_a & fixed_b)


def test_min_max_size_constraints():
    data = _payload(5, 1000)
    chunks = cdc_chunks(data, min_size=48, max_size=200)
    assert sum(c[1] for c in chunks) == len(data)
    for off, ln, _ in chunks[:-1]:
        assert 48 <= ln <= 200
    assert chunks[-1][1] <= 200
    # pure mode can emit tiny chunks the floored mode may not
    assert min(c[1] for c in cdc_chunks(data)) <= min(c[1] for c in chunks)


def test_short_and_empty_inputs():
    assert cdc_chunks(b"") == []
    assert cdc_boundaries(b"abc") == []
    (off, ln, h) = cdc_chunks(b"abc")[0]
    assert (off, ln) == (0, 3) and h == hashlib.md5(b"abc").hexdigest()


def test_operator_null_contract_and_savings(spark):
    from ocr_spark.operators.cdc import chunk_refs, payload_chunks, storage_savings

    rows = [(1, _payload(1)), (2, _payload(1)), (3, None), (4, b"")]
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    chunks = payload_chunks(df)
    got = chunks.collect()
    assert {r.blob_id for r in got} == {1, 2}  # NULL and empty yield no rows
    refs = chunk_refs(chunks).where("blob_id = 1").collect()
    assert all(r.ref_count == 2 for r in refs)  # doc 2 is an exact copy
    s = storage_savings(chunks).collect()[0]
    assert s.logical_bytes == 2 * len(_payload(1))
    assert s.stored_bytes == len(_payload(1))
    assert s.saved_bytes == len(_payload(1))


def test_numpy_path_equals_python_fold_on_random_bytes():
    rng = np.random.default_rng(42)
    for n in (0, 5, 8, 9, 257):
        data = bytes(rng.integers(0, 256, n).astype(np.uint8).tolist())
        got = window_hashes(data)
        brute = [
            sum(data[i - 7 + j] * 31 ** (7 - j) for j in range(8)) % 1_000_000_007
            for i in range(7, len(data))
        ]
        assert got.tolist() == brute
