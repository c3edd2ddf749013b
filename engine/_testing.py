"""Chaos helpers for exercising the extraction sandbox.

`hang_on_poison` stands in for a parser with a catastrophic-backtracking
input class: any page containing the POISON marker spins forever (only
SIGKILL stops it — exactly the failure mode of a stuck C regex).  Lives in
the engine package (not tests/) so Ray worker processes and forked sidecars
can import it by path.
"""

from __future__ import annotations

from .extract import extract_text

POISON = b"<!--graft:poison-->"


def hang_on_poison(html_bytes: bytes | None) -> str:
    if html_bytes and POISON in html_bytes:
        while True:  # uninterruptible busy loop, like runaway backtracking
            pass
    return extract_text(html_bytes)


def raise_on_poison(html_bytes: bytes | None) -> str:
    if html_bytes and POISON in html_bytes:
        raise ValueError("poisoned page")
    return extract_text(html_bytes)
