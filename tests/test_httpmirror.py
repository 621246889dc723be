"""S6 live analog: httpmirror streaming DataSource against a local server.

Serves deterministic PNG frames (one gray level per ms slot) from a
threaded stdlib HTTP server; every 5th slot is a miss (empty body), every
7th a 404 — the stream must skip both without failing, the reference's
(False, None) contract (http_screen_mirror.py:33-49)."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from ocr_spark.kernels.imagecodec import png_decode, png_encode
from ocr_spark.sources import httpmirror as hm

INDEX = b"""<html><body>
<h1>mirror</h1>
<img src="cam_1699999999999.jpg">
</body></html>"""


def _frame_bytes(ms: int) -> bytes:
    g = ms % 251
    return png_encode(np.full((4, 6, 3), g, dtype=np.uint8))


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
            slot = ms // 20
            if slot % 7 == 3:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            if slot % 5 != 2:  # every 5th slot: empty body (camera blink)
                self.wfile.write(_frame_bytes(ms))
            return
        self.send_response(404)
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_prefix_discovery(server):
    assert hm.discover_prefix(server) == "cam_"
    assert hm.discover_prefix("http://127.0.0.1:9") == ""  # unreachable -> ''


def test_fetch_frame_miss_contract(server):
    ms_ok = 20 * 8  # slot 8: served (8%7=1, 8%5=3)
    ms_blank = 20 * 12  # slot 12 % 5 == 2: empty body
    assert hm.fetch_frame(server, "cam_", ms_ok) == _frame_bytes(ms_ok)
    assert hm.fetch_frame(server, "cam_", ms_blank) is None
    assert hm.fetch_frame(server, "cam_", 20 * 3) is None  # slot 3 -> 404


def test_offsets_json_roundtrip(server):
    r = hm.HttpMirrorStreamReader(
        {"urls": server, "min_time": "0.02", "max_frames_per_batch": "8"}
    )
    off = r.initialOffset()
    assert hm.offsets_roundtrip(off) == off
    assert all(v % 20 == 0 for v in off.values())
    time.sleep(0.1)
    end = r.latestOffset()
    # backpressure: at most 8 slots ahead of committed
    assert all(end[u] - off[u] <= 8 * 20 for u in off)
    parts = r.partitions(off, end)
    assert len(parts) == 1 and parts[0].prefix == "cam_"


def test_stream_end_to_end(spark, server, tmp_path):
    hm.register(spark)
    df = (
        spark.readStream.format("httpmirror")
        .option("urls", server)
        .option("min_time", "0.02")
        .option("max_frames_per_batch", "16")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("mirror_frames")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from mirror_frames").collect()
            if len(rows) >= 5:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    assert len(rows) >= 5
    assert {r.camera for r in rows} == {server}
    ms_seen = sorted(r.frame_ms for r in rows)
    # slots are distinct multiples of min_time, misses skipped
    assert len(set(ms_seen)) == len(ms_seen)
    assert all(m % 20 == 0 for m in ms_seen)
    assert all((m // 20) % 5 != 2 and (m // 20) % 7 != 3 for m in ms_seen)
    # bytes decode downstream (magic-byte dispatch target)
    img = png_decode(bytes(rows[0].content))
    assert img.shape == (4, 6, 3)
    assert int(img[0, 0, 0]) == rows[0].frame_ms % 251


def test_two_cameras_two_partitions(server):
    r = hm.HttpMirrorStreamReader(
        {"urls": f"{server},http://127.0.0.1:9", "min_time": "0.02"}
    )
    off = r.initialOffset()
    assert len(off) == 2
    end = {u: v + 40 for u, v in off.items()}
    parts = r.partitions(off, end)
    assert len(parts) == 2  # one per camera: per-host politeness unit
    got = list(r.read(parts[0]))
    assert all(len(t) == 3 for t in got)
