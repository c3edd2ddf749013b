"""Enrichment stage: actor-pool model calls with bounded retry
(SURVEY.md §2.3 T3) and per-row hard timeouts (SURVEY.md §4 stragglers).

The reference enriches rows through an external LLM with a
fill-in-the-Nones retry loop, max 4 rounds
(/root/reference/ec2/generate_slogans/slogans.py:118-170) and guards
pathological inputs with a nested-process hard timeout
(/root/reference/ec2/parse_arxiv_papers/__main__.py:54-103).  No model APIs
exist in this sandbox, so the "model" is a deterministic stub with injected
transient failures — the Ray-side mechanics (actor pool, per-item retry,
timeout sandbox) are real and tested.
"""

from __future__ import annotations

import concurrent.futures
import hashlib
import os

import pyarrow as pa
import ray.data as rd

from ..analyze import tokenize

MAX_RETRIES = 4


class _FlakyModel:
    """Deterministic stand-in for a remote model: 'summarizes' a text, but
    transiently fails on a deterministic schedule (fails the first
    `fail_count(text)` attempts) so the retry loop is actually exercised."""

    def __init__(self, fail_every: int = 7):
        self.fail_every = fail_every
        self.attempts: dict[str, int] = {}

    def __call__(self, key: str, text: str) -> str:
        n = self.attempts.get(key, 0)
        self.attempts[key] = n + 1
        h = int(hashlib.blake2b(key.encode(), digest_size=4).hexdigest(), 16)
        planned_failures = 2 if h % self.fail_every == 0 else 0
        if n < planned_failures:
            raise TimeoutError(f"transient model failure for {key} (attempt {n})")
        toks = tokenize(text)
        headline = " ".join(toks[:8])
        return f"summary[{len(toks)} tokens]: {headline}"


class Enricher:
    """Actor-pool stage: per-batch model calls with the reference's
    retry-until-filled loop (bounded rounds, only missing rows retried)."""

    def __init__(self):
        self.model = _FlakyModel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        # keyed by ROW POSITION, not doc_id: duplicate ids in a batch each get
        # their own result, and the retry scan is O(n) per round
        out: list[str | None] = [None] * len(ids)
        for _round in range(MAX_RETRIES):
            missing = [p for p, v in enumerate(out) if v is None]
            if not missing:
                break
            for p in missing:
                try:
                    out[p] = self.model(str(ids[p]), texts[p])
                except TimeoutError:
                    pass  # retried next round
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "summary": pa.array(out, pa.string()),
                "enrich_ok": pa.array([v is not None for v in out], pa.bool_()),
            }
        )


def enrich_documents(sf_dir: str):
    """documents -> (doc_id, summary, enrich_ok); rows-only check (stubbed
    model output is engine-defined, not SQL-expressible)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        Enricher, batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
def run_with_timeout(fn, args=(), timeout_s: float = 10.0, default=None):
    """Per-row hard-timeout sandbox (SURVEY.md §4 'Stragglers / poison
    inputs').

    Ray retries failed tasks but does not bound a row's CPU time; the
    reference solves this with a nested process it can kill
    (parse_arxiv_papers/__main__.py:54-103).  A thread pool with a deadline
    gives the same contract for COOPERATIVE workloads (blocking IO / API
    calls — this module's domain).  Runaway NATIVE code cannot be stopped by
    a thread deadline; that case is engine/sandbox.py's killable sidecar,
    which the build wires in via build_index(extract_timeout_s=...).
    """
    ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    fut = ex.submit(fn, *args)
    try:
        return fut.result(timeout=timeout_s)
    except concurrent.futures.TimeoutError:
        fut.cancel()
        return default
    finally:
        # never join the (possibly stuck) worker thread — that would turn
        # the timeout back into a blocking wait (the exact failure mode the
        # reference's kill-able nested process avoids)
        ex.shutdown(wait=False)
