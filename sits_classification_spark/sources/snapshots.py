"""Snapshot-id emulation for plain parquet directories.

Stands in for Iceberg snapshot ids when no catalog is available: the
snapshot id of a parquet dataset is a content hash of its file listing
(relative name + size), so any change to the input produces a new id and
invalidates resume state — the same contract an Iceberg ``snapshot_id``
gives the lineage table.
"""

from __future__ import annotations

import hashlib
import os


def snapshot_id(path: str) -> str:
    """Deterministic snapshot id for a local parquet directory or file."""
    h = hashlib.sha256()
    if os.path.isfile(path):
        h.update(f"{os.path.basename(path)}:{os.path.getsize(path)}".encode())
    else:
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                fp = os.path.join(root, f)
                rel = os.path.relpath(fp, path)
                h.update(f"{rel}:{os.path.getsize(fp)}".encode())
    return h.hexdigest()[:16]
