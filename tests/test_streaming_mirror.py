"""Live streaming e2e (VERDICT r03 #7): local HTTP camera -> httpmirror
readStream -> flagship decode/detect/recognize extraction -> ManifestTable
catalog commits, checkpointed, exactly-once across a restart.

The served frames are REAL rendered text images (the 5x7 dot-matrix font
kernels/pixel_ocr renders), so the assertion is full-pipeline text
correctness, not just plumbing: extracted text per frame must equal the
font-sanitized rendition by construction."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ocr_spark.kernels.imagecodec import png_encode
from ocr_spark.kernels.pixel_ocr import render_text_image, sanitize_for_font
from ocr_spark.plans.pipeline import run_streaming_mirror_extract_to_catalog

INDEX = b'<html><body><img src="cam_1699999999999.jpg"></body></html>'

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]


def _frame_text(ms: int) -> str:
    slot = ms // 20
    return f"{WORDS[slot % len(WORDS)]} {WORDS[(slot + 2) % len(WORDS)]} {slot % 100}"


def _frame_bytes(ms: int) -> bytes:
    return png_encode(render_text_image([_frame_text(ms)], scale=2))


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path in ("", "/"):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(INDEX)
            return
        name = self.path.rsplit("/", 1)[-1]
        if name.startswith("cam_") and name.endswith(".jpg"):
            ms = int(name[4:-4])
            if (ms // 20) % 9 == 4:  # periodic miss: camera blink
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(_frame_bytes(ms))
            return
        self.send_response(404)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _drain(spark, q, tbl, min_docs, timeout=45):
    deadline = time.time() + timeout
    rows = []
    try:
        while time.time() < deadline:
            if tbl.exists() and tbl.snapshots:
                rows = tbl.read(spark).collect()
                if len(rows) >= min_docs:
                    break
            time.sleep(0.4)
    finally:
        q.stop()
    return rows


def test_live_mirror_to_catalog_end_to_end(spark, server, tmp_path):
    q, tbl = run_streaming_mirror_extract_to_catalog(
        spark,
        server,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        min_time=0.02,
        max_frames_per_batch=8,
    )
    rows = _drain(spark, q, tbl, min_docs=5)
    assert len(rows) >= 5

    # full-pipeline correctness: every committed doc's extracted text is
    # the font-sanitized rendition of what the camera actually served
    for r in rows:
        assert r.url.startswith(server + "#t=")
        ms = int(r.url.rsplit("=", 1)[1])
        assert ms % 20 == 0 and (ms // 20) % 9 != 4  # misses never commit
        assert r.text == sanitize_for_font(_frame_text(ms))
        assert r.n_spans > 0
    # one url per captured slot, never duplicated
    urls = [r.url for r in rows]
    assert len(set(urls)) == len(urls)
    # commit ids are the stream's batch ids — each at most once
    ids = [s["commit_id"] for s in tbl.snapshots]
    assert len(set(ids)) == len(ids)


def test_restart_resumes_exactly_once(spark, server, tmp_path):
    table_root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    q, tbl = run_streaming_mirror_extract_to_catalog(
        spark, server, table_root, ckpt, min_time=0.02
    )
    first = _drain(spark, q, tbl, min_docs=3)
    assert len(first) >= 3

    # restart from the SAME checkpoint: per-camera ms cursors resume, so
    # already-committed slots are never re-fetched; replayed batches (if
    # any) overwrite their own commit_id instead of duplicating
    q2, tbl2 = run_streaming_mirror_extract_to_catalog(
        spark, server, table_root, ckpt, min_time=0.02
    )
    second = _drain(spark, q2, tbl2, min_docs=len(first) + 3)
    assert len(second) > len(first)
    urls = [r.url for r in second]
    assert len(set(urls)) == len(urls)  # exactly-once across the restart
    assert {r.url for r in first} <= set(urls)
    for r in second:
        ms = int(r.url.rsplit("=", 1)[1])
        assert r.text == sanitize_for_font(_frame_text(ms))
