"""Index replication — ReplicationHandler / SnapShooter / SnapPuller
analogues over the segment store directory.

References (solr/core/src/java/org/apache/solr/handler/):
  - SnapShooter.java:~60-120 (createSnapshot): copy the CURRENT commit
    point's files into a snapshot directory.
  - SnapPuller.java fetchLatestIndex (:~290-420): the slave compares
    its generation with the master's; when behind, it pulls the
    changed index files FIRST and the commit point (segments_N) LAST,
    so a torn transfer never yields an openable-but-corrupt index.
  - ReplicationHandler.java command dispatch (indexversion / backup /
    fetchindex).

Spark shape: the store is parquet directories + a segments_N.json
manifest (index/segments.py); replication is therefore pure file
plumbing on the shared filesystem/object store — no Spark jobs. The
manifest-last ordering gives the same atomicity the reference gets
from copying segments_N last.
"""

from __future__ import annotations

import os
import shutil

from .segments import commit_manifest, read_manifest


def _data_entries(index_dir: str) -> list[str]:
    return [
        name
        for name in sorted(os.listdir(index_dir))
        if not name.startswith("segments_")
    ]


def index_generation(index_dir: str) -> int:
    """ReplicationHandler 'indexversion' command: the latest committed
    generation, -1 when the directory holds no commit."""
    m = read_manifest(index_dir)
    return int(m["generation"]) if m else -1


def create_snapshot(index_dir: str, snapshot_dir: str) -> dict:
    """SnapShooter.createSnapshot: copy the current commit point (all
    data directories, then the latest manifest LAST). Returns the
    snapshot's manifest."""
    manifest = read_manifest(index_dir)
    if manifest is None:
        raise FileNotFoundError(f"no commit point under {index_dir}")
    os.makedirs(snapshot_dir, exist_ok=True)
    for name in _data_entries(index_dir):
        src = os.path.join(index_dir, name)
        dst = os.path.join(snapshot_dir, name)
        if os.path.isdir(src):
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
    # commit point last — a torn copy has data but no manifest and is
    # not openable (SegmentIndex.open requires segments_N.json)
    commit_manifest(snapshot_dir, manifest)
    return manifest


def fetch_index(master_dir: str, slave_dir: str) -> bool:
    """SnapPuller.fetchLatestIndex: no-op when the slave is already at
    the master's generation; otherwise pull data files then the commit
    point. Returns True when a transfer happened."""
    m_gen = index_generation(master_dir)
    if m_gen < 0:
        raise FileNotFoundError(f"master has no commit: {master_dir}")
    if index_generation(slave_dir) >= m_gen:
        return False
    create_snapshot(master_dir, slave_dir)
    return True
