"""Per-model index families: several analyzer configurations side-by-side.

The reference keeps one embedding table PER MODEL and selects the table at
query time (/root/reference/rds_schema.sql:45-58, `EMBED_TABLE` selection at
/root/reference/streamlit_app.py:49).  The engine analog: one independent,
resumable index per analyzer config under a shared root
(``root/model=<name>/``), with a warm reader per model selected by name per
query.

Each member is a full `build_index` lineage: adding a model to the family
builds only the new member, re-running with unchanged configs is a no-op
resume, and changing one model's analyzer rebuilds only that member (the
analyzer hash is part of the postings fingerprint, build.py).  At 100 TB the
extraction phase would be shared across members (extract once into a common
doc store, one tokenize wave per model); here each member owns its full
lineage for isolation — the dominant cost at scale, tokenize+merge, is
per-model either way.
"""

from __future__ import annotations

import os

from .analyze import AnalyzerConfig
from .build import build_index
from .query import IndexReader


def build_family(
    input_path: str | list[str],
    root: str,
    analyzers: dict[str, AnalyzerConfig],
    **build_kw,
) -> dict[str, str]:
    """Build (or resume) one index per named analyzer under ``root``.
    Returns {model_name: index_dir}."""
    dirs: dict[str, str] = {}
    for name in sorted(analyzers):
        if "=" in name or "/" in name:
            raise ValueError(f"invalid model name {name!r}")
        d = os.path.join(root, f"model={name}")
        build_index(input_path, d, analyzer=analyzers[name], **build_kw)
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
