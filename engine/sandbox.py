"""Killable extraction sandbox + strategy fallback chain (T4, §2.10).

The reference wraps every LaTeX parse in a process it can kill on a hard
deadline and dispatches one of several parser strategies per paper
(/root/reference/ec2/parse_arxiv_papers/__main__.py:42-47,54-103): web-scale
inputs contain pages that wedge a parser (catastrophic regex backtracking,
zip bombs), and a thread-based timeout cannot interrupt C code.

Engine analog: each extraction worker (Ray actor/task process) lazily forks
ONE long-lived sidecar process and streams rows to it over a pipe.  A row
that exceeds its budget gets the sidecar killed (SIGKILL — the only way to
stop a stuck regex), a fresh sidecar forked, and the NEXT strategy in the
chain tried for that row; a row whose every strategy fails yields "".
Strategies are import paths ("module:attr"), so the chain is declarative
build config (lineage-fingerprinted in build.py) and user-extensible without
touching engine code.

Fast path note: the pipe round-trip costs ~30-50us/row, so the sandbox is
OPT-IN (build_index(extract_timeout_s=...)); trusted corpora keep the
in-process path.
"""

from __future__ import annotations

import importlib
import multiprocessing as mp
import os
import signal

# strict tokenizer-based parser first (raises on ambiguous markup), regex
# spec parser as the always-succeeds fallback — two genuinely different
# implementations of the same output contract, mirroring the reference's
# interchangeable parser dispatch (ec2/parse_arxiv_papers/__main__.py:42-47)
DEFAULT_CHAIN = (
    "engine.extract:extract_text_strict",
    "engine.extract:extract_text",
)


def resolve(path: str):
    mod, _, attr = path.partition(":")
    return getattr(importlib.import_module(mod), attr)


def _sidecar(conn, chain_paths: tuple[str, ...]) -> None:
    fns = [resolve(p) for p in chain_paths]
    conn.send("ready")  # spawn startup handshake (not counted per-row)
    while True:
        msg = conn.recv()
        if msg is None:
            return
        i, data = msg
        try:
            conn.send((True, fns[i](data)))
        except Exception:
            conn.send((False, ""))


class TimeoutExtractor:
    """Streams rows to a killable sidecar; one instance per worker process."""

    def __init__(self, chain: tuple[str, ...], timeout_s: float):
        self.chain = tuple(chain)
        self.timeout_s = float(timeout_s)
        self._proc = None
        self._conn = None
        self.restarts = 0  # observability: how many kills happened
        # validate the chain eagerly in the parent (clear error, not a dead
        # sidecar) — the child re-resolves after fork
        for p in self.chain:
            resolve(p)

    def _ensure(self) -> None:
        if self._proc is not None and self._proc.is_alive():
            return
        # spawn, NOT fork: the parent is typically a Ray worker whose grpc
        # threads are not fork-safe — a forked child can wedge inside atfork
        # handlers before reaching the sidecar loop.  Spawn pays an
        # interpreter boot once per (worker, chain) and after each kill,
        # absorbed by the ready-handshake below rather than a row's budget.
        ctx = mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(target=_sidecar, args=(child, self.chain), daemon=True)
        self._proc.start()
        child.close()
        if not self._conn.poll(60) or self._conn.recv() != "ready":
            self._kill()
            raise RuntimeError("extraction sidecar failed to start")

    def _kill(self) -> None:
        if self._proc is not None and self._proc.pid:
            try:
                os.kill(self._proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            self._proc.join(timeout=5)
        self._proc = None
        self._conn = None
        self.restarts += 1

    def extract_one(self, data) -> str:
        for i in range(len(self.chain)):
            self._ensure()
            self._conn.send((i, data))
            if self._conn.poll(self.timeout_s):
                ok, out = self._conn.recv()
                if ok:
                    return out  # "" is a legitimate result (empty page)
                # strategy raised -> fall through to the next one
            else:
                self._kill()  # stuck in C code; only SIGKILL stops it
        return ""

    def extract_many(self, datas) -> list[str]:
        return [self.extract_one(d) for d in datas]

    def close(self) -> None:
        if self._proc is not None and self._proc.is_alive():
            try:
                self._conn.send(None)
                self._proc.join(timeout=2)
            except (BrokenPipeError, OSError):
                pass
            if self._proc.is_alive():
                self._kill()


_cache: dict[tuple, TimeoutExtractor] = {}


def get_extractor(chain: tuple[str, ...], timeout_s: float) -> TimeoutExtractor:
    """Per-worker-process sidecar cache (fork once, reuse across batches)."""
    key = (tuple(chain), float(timeout_s))
    ex = _cache.get(key)
    if ex is None:
        ex = _cache[key] = TimeoutExtractor(chain, timeout_s)
    return ex
