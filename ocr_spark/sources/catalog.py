"""Parquet-backed table catalog with manifest snapshots ("iceberg-like").

The sandbox runtime has no Iceberg catalog jar (SURVEY.md §7 risk 5), so the
writer sits behind this one interface: each ``commit`` appends parquet files
under ``data/commit=<n>/`` and records a manifest entry (snapshot id, row
count, wall time). Resume and exactly-once semantics come from the lineage
table + anti-join (lineage.py), matching the reference's predicted-map skip
(/root/reference/models/detection/base_detector.py:170-207).

On a real cluster this maps 1:1 onto ``df.writeTo(tbl).append()`` with
Iceberg snapshot commits (north_rule "commit-level checkpoints").
"""

from __future__ import annotations

import json
import os
import time


class ManifestTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "manifest.json")
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _load_manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return json.load(f)

    def _save_manifest(self, manifest: list[dict]):
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)

    @property
    def snapshots(self) -> list[dict]:
        return self._load_manifest()

    def next_commit_id(self) -> int:
        manifest = self._load_manifest()
        return (max((s["commit_id"] for s in manifest), default=-1)) + 1

    # -- IO ----------------------------------------------------------------
    def append(self, df, commit_id: int | None = None) -> int:
        """Write df as one atomic-ish commit; manifest updated last (a crash
        mid-write leaves an unreferenced directory, never a torn snapshot)."""
        if commit_id is None:
            commit_id = self.next_commit_id()
        path = os.path.join(self.data_dir, f"commit={commit_id}")
        df.write.mode("overwrite").parquet(path)
        # the data write above is an overwrite; the manifest entry must be
        # too, or a retry of the same commit id would list the path twice
        # and read() would duplicate every row of the commit
        manifest = [
            s for s in self._load_manifest() if s["commit_id"] != commit_id
        ]
        manifest.append(
            {"commit_id": commit_id, "path": path, "ts": time.time()}
        )
        self._save_manifest(manifest)
        return commit_id

    def rollback(self, commit_id: int):
        """Drop a commit from the manifest (aborted-transaction cleanup).
        The data directory is left unreferenced — read() never sees it, and
        the id is reused by the retry (next_commit_id scans the manifest),
        overwriting the partial files."""
        self._save_manifest(
            [s for s in self._load_manifest() if s["commit_id"] != commit_id]
        )

    def read(self, spark):
        manifest = self._load_manifest()
        if not manifest:
            return None
        return spark.read.parquet(*[s["path"] for s in manifest])

    def exists(self) -> bool:
        return bool(self._load_manifest())
