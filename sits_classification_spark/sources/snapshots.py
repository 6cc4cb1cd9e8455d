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


def _stat_token(fp: str, rel: str) -> bytes:
    # name + size + mtime_ns: a same-size in-place rewrite changes the id
    # (size alone missed it and resume would silently reuse stale tiers);
    # the cost is that a byte-identical rewrite also invalidates resume —
    # recomputing is the safe direction
    st = os.stat(fp)
    return f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode()


def snapshot_id(path: str) -> str:
    """Deterministic snapshot id for a local parquet directory or file."""
    h = hashlib.sha256()
    if os.path.isfile(path):
        h.update(_stat_token(path, os.path.basename(path)))
    else:
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.startswith(("_", ".")):
                    continue
                fp = os.path.join(root, f)
                h.update(_stat_token(fp, os.path.relpath(fp, path)))
    return h.hexdigest()[:16]
