"""Join strategies (SURVEY.md §2.4).

Two physical plans, chosen by side size — the same decision the reference
makes implicitly (dict-probe joins for small sides at
/root/reference/parsed_papers_to_vector_rds/stacks_parsing/stacks_parsing.py:114-122,
SQL hash joins in Postgres for the rest, /root/reference/streamlit_app.py:277-279):

- ``broadcast_join``: small side pinned once in the object store with
  ``ray.put``, probed per batch with zero-copy Arrow ``Table.join`` inside
  ``map_batches``.  No shuffle; the only sane plan when one side fits in
  memory (dimension tables, top-k id sets, loser sets).
- large ⋈ large: ``ray.data.Dataset.join`` (hash-partitioned) — used
  directly at call sites; ``num_partitions`` is the explicit partitioning
  decision.
"""

from __future__ import annotations

import pyarrow as pa
import ray

_ARROW_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "semi": "left semi",
    "anti": "left anti",
}


def broadcast_join(
    ds,
    small: pa.Table,
    on: list[str] | str,
    how: str = "inner",
    right_on: list[str] | str | None = None,
):
    """Join a Dataset against a small in-memory Arrow table, broadcast once."""
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    join_type = _ARROW_JOIN_TYPE[how]
    ref = ray.put(small)

    class _Probe:
        def __init__(self):
            self.small = ray.get(ref)  # fetched once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(
                self.small, keys=keys, right_keys=rkeys, join_type=join_type
            )

    return ds.map_batches(_Probe, batch_format="pyarrow", concurrency=(1, 4))
