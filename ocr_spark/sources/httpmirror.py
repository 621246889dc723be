"""HTTP screen-mirror / camera streaming source (S6 live analog).

The reference streams frames from the "HTTP screen mirror" mobile app by
polling ``{url}/{prefix}{ms}.jpg`` with a ``min_time`` rate limit and
discovering ``prefix`` from the app's index page (reference:
utils/image/video/http_screen_mirror.py:23-66 — behavior studied, no code
taken; it uses requests+PIL, returns one BGR frame per poll).

Spark-first re-expression: a PySpark Python Data Source
(`pyspark.sql.datasource.DataSource`) STREAMING reader, so the camera feed
is a first-class `readStream.format("httpmirror")` table instead of a
driver-side poll loop:

- offsets are per-camera millisecond cursors (JSON dict), so a restart
  resumes exactly where the checkpoint says — the same commit-level
  resume contract as the file sinks;
- `latestOffset` advances each cursor to "now" quantized to ``min_time``
  ticks; one microbatch therefore carries the frames that became due
  since the last batch, each at its deterministic ms slot;
- one :class:`InputPartition` per camera per batch: the fetch runs ON THE
  EXECUTOR, and a single partition serializes all requests to one host —
  the per-host politeness unit (the same shape as the crawl frontier's
  host partitioning).  N cameras -> N parallel partitions; scale is by
  adding cameras, never by hammering one host harder;
- rows are ``(camera, frame_ms, content:binary)`` — raw bytes, decoded
  downstream by `operators.multimodal.decode_image` (magic-byte dispatch:
  PNG/JPEG/GIF), so the source stays IO-only and the decode stays in the
  existing Arrow-batched stage;
- a missed frame (empty body / connection refused / HTTP error) yields no
  row, exactly the reference's ``(False, None)`` contract — the stream
  never fails because a camera blinked.

Everything is stdlib (`urllib.request`); no external HTTP/image deps.
"""

from __future__ import annotations

import json
import re
import time
import urllib.error
import urllib.request
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_SCHEMA = StructType(
    [
        StructField("camera", StringType()),
        StructField("frame_ms", LongType()),
        StructField("content", BinaryType()),
    ]
)

# index-page prefix discovery: any src/href whose name is <prefix><ms>.jpg
_PREFIX_RE = re.compile(
    r"""(?:src|href)\s*=\s*["']/?([^"']*?)\d{10,}\.jpe?g["']""", re.IGNORECASE
)


def discover_prefix(url: str, *, timeout: float = 5.0) -> str:
    """Learn the frame-name prefix from a mirror's index page.

    The reference hardcodes "9th line from the end, first quoted token" of
    the app's index HTML; we scan for any img/anchor that references a
    ``<prefix><epoch-ms>.jpg`` name, which is the same contract without
    the line-position fragility.  Returns '' (bare ``<ms>.jpg`` names) if
    the page is unreachable or carries no frame link.
    """
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            page = resp.read().decode("utf-8", "replace")
    except (urllib.error.URLError, OSError, ValueError):
        return ""
    m = _PREFIX_RE.search(page)
    return m.group(1) if m else ""


def fetch_frame(url: str, prefix: str, ms: int, *, timeout: float = 5.0):
    """GET one frame; None on any miss (reference read() -> (False, None))."""
    try:
        with urllib.request.urlopen(
            f"{url}/{prefix}{ms}.jpg", timeout=timeout
        ) as resp:
            body = resp.read()
        return body or None
    except (urllib.error.URLError, OSError, ValueError):
        return None


class CameraPartition(InputPartition):
    def __init__(self, url: str, prefix: str, start_ms: int, end_ms: int, step_ms: int):
        self.url = url
        self.prefix = prefix
        self.start_ms = start_ms
        self.end_ms = end_ms
        self.step_ms = step_ms


class HttpMirrorStreamReader(DataSourceStreamReader):
    """Per-camera millisecond cursors; one partition per camera per batch."""

    def __init__(self, options):
        urls = options.get("urls") or options.get("url")
        if not urls:
            raise ValueError("httpmirror: set .option('urls', 'http://cam1,http://cam2')")
        self.urls = [u.strip().rstrip("/") for u in urls.split(",") if u.strip()]
        self.step_ms = max(1, int(float(options.get("min_time", "0.1")) * 1000))
        self.max_frames = int(options.get("max_frames_per_batch", "64"))
        opt_prefix = options.get("prefix")
        self.prefixes = {
            u: opt_prefix if opt_prefix is not None else discover_prefix(u)
            for u in self.urls
        }
        self._t0 = int(time.time() * 1000)
        self._committed: dict = {}

    def initialOffset(self) -> dict:
        # quantized so every camera's slots land on shared min_time ticks
        start = self._t0 - self._t0 % self.step_ms
        self._committed = {u: start for u in self.urls}
        return dict(self._committed)

    def latestOffset(self) -> dict:
        now = int(time.time() * 1000)
        due = now - now % self.step_ms
        out = {}
        for u in self.urls:
            # backpressure: at most max_frames new slots per camera per batch
            # (on restart _committed is empty — the checkpointed start still
            # bounds the batch via partitions(start, end))
            lo = self._committed.get(u, due - self.step_ms * self.max_frames)
            out[u] = min(due, lo + self.step_ms * self.max_frames)
        return out

    def partitions(self, start: dict, end: dict):
        return [
            CameraPartition(u, self.prefixes.get(u, ""), int(start.get(u, 0)), int(end.get(u, 0)), self.step_ms)
            for u in self.urls
            if int(end.get(u, 0)) > int(start.get(u, 0))
        ]

    def read(self, partition: CameraPartition) -> Iterator[Tuple]:
        # executor-side, one host per partition: the politeness unit
        for ms in range(partition.start_ms, partition.end_ms, partition.step_ms):
            body = fetch_frame(partition.url, partition.prefix, ms)
            if body is not None:
                yield (partition.url, ms, body)

    def commit(self, end: dict) -> None:
        self._committed.update({u: int(v) for u, v in end.items()})

    def stop(self) -> None:
        pass


class HttpMirrorDataSource(DataSource):
    """`spark.dataSource.register(HttpMirrorDataSource)` then
    `spark.readStream.format("httpmirror").option("urls", ...).load()`."""

    @classmethod
    def name(cls) -> str:
        return "httpmirror"

    def schema(self):
        return FRAME_SCHEMA

    def streamReader(self, schema):
        return HttpMirrorStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(HttpMirrorDataSource)


def offsets_roundtrip(offset: dict) -> dict:
    """Offsets must survive JSON (checkpoint log round-trip)."""
    return json.loads(json.dumps(offset))
