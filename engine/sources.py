"""Alternate ingest sources: zip-of-JSONL, unioned with parquet (S6 + D3).

The reference ingests a second corpus shipped as zip archives of JSON files
and unions it with the primary source under one schema
(/root/reference/ec2/upsert_stacks/__main__.py:19-69).  Ray-Data-first
analog: `read_binary_files` over the archives + a flat-map task that opens
each zip and parses its NDJSON members with Arrow's C++ JSON reader
(pyarrow.json.read_json — no Python-per-line loop), then `Dataset.union`
with the parquet side under a `src` discriminator column.

At 100 TB the unit of parallelism is one archive per task (archives are
many and individually modest, like WARC/stacks dumps); oversized archives
would be split by member range in the same pattern.
"""

from __future__ import annotations

import io
import zipfile

import pyarrow as pa
import pyarrow.json as pajson
import ray.data as rd


def parse_jsonl_zip_batch(
    batch: pa.Table, empty_schema: pa.Schema | None = None
) -> pa.Table:
    """(bytes, path) rows -> concatenated parsed rows of every NDJSON member.

    A batch whose archives contain no non-empty JSONL members returns an
    empty table WITH the caller-declared schema (a zero-column `pa.table({})`
    would schema-mismatch a downstream union/projection instead of reading
    as zero rows)."""
    tables = []
    for buf in batch.column("bytes").to_pylist():
        with zipfile.ZipFile(io.BytesIO(buf)) as zf:
            for name in sorted(zf.namelist()):
                if not name.endswith((".jsonl", ".json")):
                    continue
                data = zf.read(name)
                if data:
                    tables.append(pajson.read_json(io.BytesIO(data)))
    if not tables:
        return empty_schema.empty_table() if empty_schema is not None else pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def read_jsonl_zip(
    paths: str | list[str], empty_schema: pa.Schema | None = None
) -> rd.Dataset:
    """Zip-of-JSONL archives -> Dataset (one flat-map task per archive)."""
    import functools

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(
        functools.partial(parse_jsonl_zip_batch, empty_schema=empty_schema),
        batch_format="pyarrow",
        batch_size=None,
    )


def union_with_source(
    parquet_ds: rd.Dataset, zip_ds: rd.Dataset,
    names: tuple[str, str] = ("parquet", "jsonl_zip"),
) -> rd.Dataset:
    """D3: union two source datasets under a `src` discriminator column."""

    def tag(name: str):
        def _t(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "src",
                pa.DictionaryArray.from_arrays(
                    pa.array([0] * batch.num_rows, pa.int8()),
                    pa.array([name], pa.string()),
                ),
            )

        return _t

    return parquet_ds.map_batches(
        tag(names[0]), batch_format="pyarrow", batch_size=None
    ).union(
        zip_ds.map_batches(tag(names[1]), batch_format="pyarrow", batch_size=None)
    )
