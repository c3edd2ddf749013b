"""Partition lineage manifest + resume logic (SURVEY.md §2.7 D1/J3 analogs).

The reference resumes with `NOT EXISTS` anti-joins against already-written
rows (/root/reference/ec2/parse_arxiv_papers/__main__.py:167-175) and
idempotent upserts (/root/reference/ec2/rds/upsert.py:29-52).  Our engine's
equivalent is file-system truth: each build phase writes its outputs to a
temp dir and renames atomically, then records a manifest entry keyed by a
fingerprint of its inputs.  On restart, entries whose fingerprint still
matches are skipped — a driver-side set difference, no shuffle.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from contextlib import contextmanager


def fingerprint_files(paths: list[str]) -> str:
    """Cheap lineage fingerprint: (path, size, mtime-free content head).

    Content-sensitive without reading whole files: name + size + first 64KiB
    hash per file.  mtime is excluded so a byte-identical regenerated input
    doesn't invalidate the checkpoint.
    """
    h = hashlib.blake2b(digest_size=16)
    for p in sorted(paths):
        st = os.stat(p)
        h.update(p.encode())
        h.update(str(st.st_size).encode())
        with open(p, "rb") as f:
            h.update(f.read(65536))
    return h.hexdigest()


class BuildManifest:
    """JSON manifest at <index_dir>/manifest.json.

    Structure::

        {"config": {...},
         "partitions": {pid: {"inputs": [...], "fingerprint": str,
                               "phase": {"extract": {...}, "postings": {...}}}},
         "phases": {"losers": {...}, "stats": {...}, "segments": {...}}}
    """

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "manifest.json")
        self.data: dict = {"config": {}, "partitions": {}, "phases": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def save(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- partition-phase records ------------------------------------------
    def partition_done(self, pid: str, phase: str, fingerprint: str, out_dir: str) -> bool:
        ent = self.data["partitions"].get(pid, {})
        rec = ent.get("phase", {}).get(phase)
        return (
            rec is not None
            and rec.get("fingerprint") == fingerprint
            and os.path.isdir(out_dir)
        )

    def record_partition(
        self, pid: str, phase: str, fingerprint: str, inputs: list[str], metrics: dict
    ) -> None:
        ent = self.data["partitions"].setdefault(pid, {"phase": {}})
        if inputs:
            ent["inputs"] = inputs
        ent["phase"][phase] = {"fingerprint": fingerprint, "metrics": metrics}
        self.save()

    # -- global-phase records ---------------------------------------------
    def phase_done(self, phase: str, fingerprint: str, out_path: str) -> bool:
        rec = self.data["phases"].get(phase)
        return (
            rec is not None
            and rec.get("fingerprint") == fingerprint
            and os.path.exists(out_path)
        )

    def record_phase(self, phase: str, fingerprint: str, metrics: dict) -> None:
        self.data["phases"][phase] = {"fingerprint": fingerprint, "metrics": metrics}
        self.save()

    def partials_fingerprint(self) -> str:
        """Fingerprint of all completed postings partitions — phase-2 inputs.

        If any partition is rebuilt, downstream stats/segments invalidate.
        """
        h = hashlib.blake2b(digest_size=16)
        for pid in sorted(self.data["partitions"]):
            rec = self.data["partitions"][pid]["phase"].get("postings")
            if rec:
                h.update(pid.encode())
                h.update(rec["fingerprint"].encode())
        return h.hexdigest()


@contextmanager
def atomic_dir(final_dir: str):
    """Write into a tmp sibling dir; rename over `final_dir` on success."""
    parent = os.path.dirname(final_dir.rstrip("/"))
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=os.path.basename(final_dir) + ".tmp.", dir=parent)
    try:
        yield tmp
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)
        os.replace(tmp, final_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
