"""Per-model index families: several analyzer configurations side-by-side.

The reference keeps one embedding table PER MODEL and selects the table at
query time (/root/reference/rds_schema.sql:45-58, `EMBED_TABLE` selection at
/root/reference/streamlit_app.py:49), feeding all of them from ONE `paper`
ingest.  The engine analog: one independent, resumable index per analyzer
config under a shared root (``root/model=<name>/``), with a warm reader per
model selected by name per query — and, like the reference's single ingest,
ONE extraction of the corpus shared by every member.

Extraction is analyzer-independent (the extract lineage fingerprint carries
input + loser-set + extractor-chain state, never the analyzer hash), so the
first member extracts the corpus into its doc store and every other member
adopts it: a relative ``extracted`` symlink into the primary member plus a
copy of the primary's extract-phase lineage records.  `build_index` then
sees valid extract checkpoints and runs only its postings-resume path — one
tokenize+merge wave per model, the corpus extracted exactly once (at F
models the old design extracted it F times).  Resume semantics are
preserved per member: re-running is a no-op, changing one model's analyzer
re-tokenizes only that member from the shared doc store, and appended input
files re-extract once (in the primary) before the others re-adopt.
"""

from __future__ import annotations

import os
import shutil

from .analyze import AnalyzerConfig
from .build import build_index
from .checkpoint import BuildManifest
from .query import IndexReader


def _adopt_shared_docstore(src_dir: str, dst_dir: str) -> None:
    """Point ``dst_dir``'s doc store at ``src_dir``'s and copy the
    extract-phase lineage, so the next `build_index` in ``dst_dir`` skips
    extraction and goes straight to its tokenize wave.

    No-op when the source has no completed extraction yet, or when the
    member already owns a REAL (non-symlink) doc store from a pre-sharing
    build — mixing the two would double rows.
    """
    os.makedirs(dst_dir, exist_ok=True)
    dst_x = os.path.join(dst_dir, "extracted")
    if os.path.isdir(dst_x) and not os.path.islink(dst_x):
        return
    src_man = BuildManifest(src_dir)
    if not src_man.data.get("partitions"):
        return
    dst_man = BuildManifest(dst_dir)
    scfg = src_man.data.get("config", {})
    dcfg = dst_man.data.setdefault("config", {})
    # same format version (else build_index wipes the dir), same sticky
    # file->partition assignment (pids must line up with the shared store)
    dcfg["format_version"] = scfg.get("format_version")
    dcfg["assignment"] = dict(scfg.get("assignment", {}))
    dcfg["assign_num_partitions"] = scfg.get("assign_num_partitions")
    for pid, ent in src_man.data["partitions"].items():
        rec = ent.get("phase", {}).get("extract")
        if rec:
            dent = dst_man.data["partitions"].setdefault(pid, {"phase": {}})
            if ent.get("inputs"):
                dent["inputs"] = list(ent["inputs"])
            dent["phase"]["extract"] = dict(rec)
    # the loser set is extraction-side state too (same input fingerprint):
    # carry the artifact so members never re-scan the raw corpus for it
    lrec = src_man.data.get("phases", {}).get("losers")
    src_losers = os.path.join(src_dir, "losers.parquet")
    if lrec and os.path.exists(src_losers):
        tmp = os.path.join(dst_dir, "losers.parquet.tmp")
        shutil.copyfile(src_losers, tmp)
        os.replace(tmp, os.path.join(dst_dir, "losers.parquet"))
        dst_man.data["phases"]["losers"] = dict(lrec)
    dst_man.save()
    if not os.path.islink(dst_x):
        # relative link: the family root stays relocatable as one tree
        os.symlink(
            os.path.relpath(os.path.join(src_dir, "extracted"), dst_dir),
            dst_x,
            target_is_directory=True,
        )


def build_family(
    input_path: str | list[str],
    root: str,
    analyzers: dict[str, AnalyzerConfig],
    *,
    share_extraction: bool = True,
    metrics_out: dict | None = None,
    **build_kw,
) -> dict[str, str]:
    """Build (or resume) one index per named analyzer under ``root``.
    Returns {model_name: index_dir}.

    With ``share_extraction`` (default) the first member (sorted order)
    extracts the corpus and every later member adopts its doc store — see
    the module docstring.  ``metrics_out``, if given, is filled with each
    member's build metrics ({name: metrics}); a sharing member shows
    ``skipped_extract == partitions`` and zero extraction wall time.
    """
    names = sorted(analyzers)
    for name in names:
        if "=" in name or "/" in name:
            raise ValueError(f"invalid model name {name!r}")
    dirs: dict[str, str] = {}
    primary_dir: str | None = None
    for name in names:
        d = os.path.join(root, f"model={name}")
        if share_extraction and primary_dir is not None:
            _adopt_shared_docstore(primary_dir, d)
        m = build_index(input_path, d, analyzer=analyzers[name], **build_kw)
        if metrics_out is not None:
            metrics_out[name] = m
        if primary_dir is None:
            primary_dir = d
        dirs[name] = d
    return dirs


class FamilyReader:
    """Warm readers over every member of a family; the query-time model
    selector (the reference's EMBED_TABLE dropdown).  Each member reader
    caches independently, so switching models never evicts another model's
    hot state."""

    def __init__(self, root: str):
        self.readers: dict[str, IndexReader] = {}
        for d in sorted(os.listdir(root)):
            if d.startswith("model="):
                self.readers[d[len("model="):]] = IndexReader(
                    os.path.join(root, d)
                )
        if not self.readers:
            raise FileNotFoundError(f"no model=* indexes under {root}")

    def models(self) -> list[str]:
        return sorted(self.readers)

    def analyzer(self, model: str) -> AnalyzerConfig:
        return self.readers[model].analyzer

    def search(self, model: str, query_text: str, **kw):
        return self.readers[model].search(query_text, **kw)
