"""Index build pipeline: pages parquet -> inverted-index segments.

Ray-Data-first realization of the reference's ETL
(/root/reference/ec2/parse_arxiv_papers/__main__.py:128-287, SURVEY.md §3.1),
re-expressed per SURVEY.md §7.2:

  phase extract   per input partition: read_parquet -> map_batches(extract)
                  -> within-batch keep-latest dedup -> write extracted/pid=K
  phase losers    global keep-latest-by-url dedup residue: pre-aggregated
                  groupby(doc_id) over (doc_id, warc_ts) -> tiny loser set,
                  broadcast (no row-level shuffle of documents)
  phase postings  per partition: read extracted (pruned columns) -> filter
                  losers -> Tokenizer actor pool -> write partials/pid=K
  phase stats     N, avgdl, per-term df (map-side partial df -> small groupby)
  phase segments  THE wide step: salted groupby(term, salt) shuffle of the
                  pre-aggregated partials -> map_groups merge: sort by docID,
                  delta+varint compress, block-max metadata -> parquet
                  partitioned by term-hash bucket

Every phase is checkpointed in the lineage manifest (engine/checkpoint.py);
re-running skips partitions/phases whose input fingerprints are unchanged —
the reference's NOT-EXISTS anti-join semantics (SURVEY.md §2.4 J3) as a
driver-side set difference.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet  # noqa: F401  (enables pa.parquet.*)
import ray
import ray.data as rd
from ray.data.aggregate import Max, Sum

from . import codec
from .analyze import Tokenizer
from .checkpoint import BuildManifest, atomic_dir, fingerprint_files
from .extract import dedup_latest_in_batch, extract_batch
from .schema import (
    B,
    EXTRACTED_SCHEMA,
    HOT_TERM_DF_FRACTION,
    K1,
    NUM_SALTS,
    NUM_TERM_BUCKETS,
    PARTIAL_POSTINGS_SCHEMA,
    SEGMENT_SCHEMA,
    term_bucket,
)


def _ensure_nonempty(out_dir: str, schema: pa.Schema) -> None:
    """Zero-row stages must still leave a schema-bearing parquet file so
    downstream column-pruned reads work (empty-corpus / empty-partition)."""
    if not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        pa.parquet.write_table(
            schema.empty_table(), os.path.join(out_dir, "empty.parquet")
        )


def _partition_inputs(input_files: list[str], num_partitions: int) -> dict[str, list[str]]:
    files = sorted(input_files)
    num_partitions = max(1, min(num_partitions, len(files)))
    out: dict[str, list[str]] = {}
    for i, f in enumerate(files):
        out.setdefault(f"{i % num_partitions:05d}", []).append(f)
    return out


def _default_concurrency() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, cpus - 2)


def documents_to_extracted(batch: pa.Table) -> pa.Table:
    """Adapter: a `documents(doc_id, text, lang, ...)` table -> EXTRACTED rows.

    The table's own int64 doc_id is kept (any unique uint64 works for the
    postings); url is synthesized as doc://<id>; warc_ts is a fixed epoch.
    """
    ids = batch.column("doc_id").to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.uint64()),
            "url": pa.array([f"doc://{i}" for i in ids], pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "lang": batch.column("lang"),
            "text": batch.column("text"),
        }
    )


def build_index(
    input_path: str | list[str],
    index_dir: str,
    *,
    num_partitions: int = 8,
    extract_batch_size: int = 256,
    tokenize_batch_size: int = 512,
    tokenizer_concurrency: int | None = None,
    input_kind: str = "pages",
) -> dict:
    """Build (or resume) the full index under ``index_dir``. Returns metrics."""
    if isinstance(input_path, str):
        if os.path.isdir(input_path):
            files = [
                os.path.join(input_path, f)
                for f in os.listdir(input_path)
                if f.endswith(".parquet")
            ]
        else:
            files = [input_path]
    else:
        files = list(input_path)
    os.makedirs(index_dir, exist_ok=True)
    man = BuildManifest(index_dir)
    parts = _partition_inputs(files, num_partitions)
    concurrency = tokenizer_concurrency or _default_concurrency()
    metrics: dict = {"partitions": len(parts), "skipped_extract": 0, "skipped_postings": 0}

    # ---- phase extract (per partition, checkpointed) ---------------------
    extracted_root = os.path.join(index_dir, "extracted")
    for pid, pfiles in parts.items():
        out_dir = os.path.join(extracted_root, f"pid={pid}")
        fp = fingerprint_files(pfiles)
        if man.partition_done(pid, "extract", fp, out_dir):
            metrics["skipped_extract"] += 1
            continue
        ds = rd.read_parquet(pfiles)
        extract_fn = extract_batch if input_kind == "pages" else documents_to_extracted
        ds = ds.map_batches(
            extract_fn, batch_format="pyarrow", batch_size=extract_batch_size,
            zero_copy_batch=True,
        )
        ds = ds.map_batches(dedup_latest_in_batch, batch_format="pyarrow")
        with atomic_dir(out_dir) as tmp:
            ds.write_parquet(tmp)
            _ensure_nonempty(tmp, EXTRACTED_SCHEMA)
        n_rows = sum(
            pa.parquet.read_metadata(os.path.join(out_dir, f)).num_rows
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )
        man.record_partition(pid, "extract", fp, pfiles, {"rows": n_rows})

    extract_fps = sorted(
        man.data["partitions"][pid]["phase"]["extract"]["fingerprint"] for pid in parts
    )
    total_extracted = sum(
        man.data["partitions"][pid]["phase"]["extract"]["metrics"]["rows"]
        for pid in parts
    )

    # ---- phase losers (global cross-partition dedup residue) -------------
    losers_path = os.path.join(index_dir, "losers.parquet")
    losers_fp = "extract:" + "|".join(extract_fps)
    if not man.phase_done("losers", losers_fp, losers_path):
        losers_tbl = _compute_losers(extracted_root)
        pa.parquet.write_table(losers_tbl, losers_path + ".tmp")
        os.replace(losers_path + ".tmp", losers_path)
        man.record_phase(
            "losers", losers_fp,
            {"dup_urls": losers_tbl.num_rows, "dup_extra_rows": int(pa.compute.sum(losers_tbl["extra"]).as_py() or 0)},
        )
    losers_tbl = pa.parquet.read_table(losers_path)
    n_loser_rows = int(pa.compute.sum(losers_tbl["extra"]).as_py() or 0)
    loser_ids = losers_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    loser_max_ts = losers_tbl["max_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
    loser_order = np.argsort(loser_ids)
    loser_ref = ray.put((loser_ids[loser_order], loser_max_ts[loser_order]))

    # ---- phase postings (per partition, checkpointed) --------------------
    partials_root = os.path.join(index_dir, "partials")
    for pid in parts:
        out_dir = os.path.join(partials_root, f"pid={pid}")
        fp = man.data["partitions"][pid]["phase"]["extract"]["fingerprint"] + "+" + losers_fp[:16]
        if man.partition_done(pid, "postings", fp, out_dir):
            metrics["skipped_postings"] += 1
            continue
        ds = rd.read_parquet(
            os.path.join(extracted_root, f"pid={pid}"),
            columns=["doc_id", "warc_ts", "text"],  # prune at the read
        )
        if len(loser_ids):
            ds = ds.map_batches(
                _LoserFilter(loser_ref), batch_format="pyarrow", zero_copy_batch=True
            )
        ds = ds.map_batches(
            Tokenizer,
            batch_format="pyarrow",
            batch_size=tokenize_batch_size,
            concurrency=(1, concurrency),
            zero_copy_batch=True,
        )
        with atomic_dir(out_dir) as tmp:
            ds.write_parquet(tmp)
            _ensure_nonempty(tmp, PARTIAL_POSTINGS_SCHEMA)
        man.record_partition(pid, "postings", fp, [], {})

    # ---- phase stats -----------------------------------------------------
    stats_path = os.path.join(index_dir, "stats.json")
    dfs_path = os.path.join(index_dir, "dfs.parquet")
    partials_fp = man.partials_fingerprint()
    n_docs = total_extracted - n_loser_rows
    if not man.phase_done("stats", partials_fp, stats_path):
        df_tbl, total_tokens = _compute_stats(partials_root)
        pa.parquet.write_table(df_tbl, dfs_path + ".tmp")
        os.replace(dfs_path + ".tmp", dfs_path)
        avgdl = float(total_tokens) / n_docs if n_docs else 0.0
        hot_threshold = max(2.0, HOT_TERM_DF_FRACTION * n_docs)
        n_hot = int(
            pa.compute.sum(
                pa.compute.greater(df_tbl["df"], pa.scalar(hot_threshold))
            ).as_py()
            or 0
        )
        stats = {
            "n_docs": n_docs,
            "total_tokens": int(total_tokens),
            "avgdl": avgdl,
            "n_terms": df_tbl.num_rows,
            "hot_df_threshold": hot_threshold,
            "n_hot_terms": n_hot,
            "k1": K1,
            "b": B,
            "num_salts": NUM_SALTS,
            "num_buckets": NUM_TERM_BUCKETS,
        }
        with open(stats_path + ".tmp", "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(stats_path + ".tmp", stats_path)
        man.record_phase("stats", partials_fp, stats)
    with open(stats_path) as f:
        stats = json.load(f)

    # ---- phase segments (THE salted wide shuffle) ------------------------
    segments_root = os.path.join(index_dir, "segments")
    if not man.phase_done("segments", partials_fp, segments_root):
        df_tbl = pa.parquet.read_table(dfs_path)
        hot = df_tbl.filter(
            pa.compute.greater(df_tbl["df"], pa.scalar(stats["hot_df_threshold"]))
        )
        hot_terms = frozenset(hot["term"].to_pylist())
        hot_ref = ray.put(hot_terms)
        avgdl = stats["avgdl"]
        parts_ds = rd.read_parquet(partials_root)
        parts_ds = parts_ds.map_batches(
            _SaltAndBucket(hot_ref), batch_format="pyarrow", zero_copy_batch=True
        )
        merged = parts_ds.groupby(["term", "salt"]).map_groups(
            lambda g: _compress_group(g, avgdl), batch_format="pyarrow"
        )
        with atomic_dir(segments_root) as tmp:
            merged.write_parquet(tmp, partition_cols=["bucket"])
            if not os.listdir(tmp):  # empty corpus: keep a readable layout
                os.makedirs(os.path.join(tmp, "bucket=0"), exist_ok=True)
                pa.parquet.write_table(
                    SEGMENT_SCHEMA.empty_table().drop_columns(["bucket"]),
                    os.path.join(tmp, "bucket=0", "empty.parquet"),
                )
        man.record_phase(
            "segments", partials_fp, {"hot_terms": len(hot_terms)}
        )

    metrics.update(stats)
    return metrics


class _LoserFilter:
    """Drop rows of duplicate urls that are not the latest crawl.

    Broadcast-small-side anti-join (SURVEY.md §2.4 J5 pattern): the loser set
    lives in the object store once (ray.put), fetched per actor, probed with
    np.searchsorted per batch — no shuffle of the documents.
    """

    def __init__(self, loser_ref):
        self.ids, self.max_ts = ray.get(loser_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        ts = batch.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.ids, ids)
        pos = np.minimum(pos, len(self.ids) - 1)
        is_dup = self.ids[pos] == ids
        keep = ~is_dup | (ts == self.max_ts[pos])
        return batch.filter(pa.array(keep))


class _SaltAndBucket:
    """Add (salt, bucket) keys for the merge shuffle.

    Hot terms (df above threshold — Zipf head, SURVEY.md §4 'Skew') are salted
    by doc_id % NUM_SALTS so no single reduce task owns a head term's full
    posting list; cold terms use salt 0.  bucket = hash(term) % NUM_BUCKETS is
    the segment-file partitioning key used for query-side pruning.
    """

    def __init__(self, hot_ref):
        self.hot = ray.get(hot_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch.column("term")
        de = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        de = de.dictionary_encode()
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = de.dictionary.to_pylist()
        uniq_hot = np.array([t in self.hot for t in uniq], dtype=bool)
        uniq_bucket = np.array([term_bucket(t) for t in uniq], dtype=np.int32)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        salt = np.where(
            uniq_hot[codes], (doc_ids % np.uint64(NUM_SALTS)).astype(np.int32), 0
        ).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, pa.int32())).append_column(
            "bucket", pa.array(uniq_bucket[codes], pa.int32())
        )


def _compress_group(group: pa.Table, avgdl: float) -> pa.Table:
    """map_groups reducer: one (term, salt) group -> one compressed chunk row."""
    doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    tfs = group.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    dls = group.column("doclen").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    tf_f = tfs.astype(np.float64)
    dl_f = dls.astype(np.float64)
    # identical op order to oracle.py: tf*(K1+1)/(tf + K1*((1-B) + (B*dl)/avgdl))
    impacts = tf_f * (K1 + 1.0) / (tf_f + K1 * ((1.0 - B) + (B * dl_f) / avgdl))
    block_last, block_max = codec.block_metadata(doc_ids, impacts)
    term = group.column("term")[0].as_py()
    salt = group.column("salt")[0].as_py()
    bucket = group.column("bucket")[0].as_py()
    return pa.table(
        {
            "term": pa.array([term], pa.string()),
            "salt": pa.array([salt], pa.int32()),
            "bucket": pa.array([bucket], pa.int32()),
            "df_chunk": pa.array([len(doc_ids)], pa.int64()),
            "doc_ids": pa.array([codec.delta_encode(doc_ids)], pa.binary()),
            "tfs": pa.array([codec.varint_encode(tfs.astype(np.uint64))], pa.binary()),
            "impacts": pa.array([codec.floats_encode(impacts)], pa.binary()),
            "block_last_doc": pa.array([block_last.tolist()], pa.list_(pa.uint64())),
            "block_max_impact": pa.array([block_max.tolist()], pa.list_(pa.float64())),
        }
    )


def _compute_losers(extracted_root: str) -> pa.Table:
    """Find urls crawled more than once; return (doc_id, max_ts, extra).

    Pre-aggregated map-side per batch, then a groupby over one small row per
    distinct (batch, url-hash) — the shuffle carries ~|distinct urls| rows of
    16 bytes, not documents.
    """

    def batch_agg(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        ts = t.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        sids, sts = ids[order], ts[order]
        boundary = np.ones(len(sids), dtype=bool)
        if len(sids) > 1:
            boundary[1:] = sids[1:] != sids[:-1]
        group_id = np.cumsum(boundary) - 1
        cnt = np.bincount(group_id)
        max_ts = np.full(cnt.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(max_ts, group_id, sts)
        return pa.table(
            {
                "doc_id": pa.array(sids[boundary], pa.uint64()),
                "cnt": pa.array(cnt, pa.int64()),
                "max_ts": pa.array(max_ts, pa.int64()),
            }
        )

    ds = rd.read_parquet(extracted_root, columns=["doc_id", "warc_ts"])
    agg = (
        ds.map_batches(batch_agg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Sum("cnt", alias_name="cnt"), Max("max_ts", alias_name="max_ts"))
    )
    pdf = agg.to_pandas()
    empty_losers = pa.table(
        {
            "doc_id": pa.array([], pa.uint64()),
            "max_ts": pa.array([], pa.int64()),
            "extra": pa.array([], pa.int64()),
        }
    )
    if len(pdf) == 0 or "cnt" not in pdf.columns:
        return empty_losers
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    dup = tbl.filter(pa.compute.greater(tbl["cnt"], pa.scalar(1)))
    extra = pa.compute.subtract(dup["cnt"], pa.scalar(1))
    return pa.table(
        {
            "doc_id": dup["doc_id"].cast(pa.uint64()),
            "max_ts": dup["max_ts"].cast(pa.int64()),
            "extra": extra.cast(pa.int64()),
        }
    )


def _compute_stats(partials_root: str) -> tuple[pa.Table, int]:
    """Per-term global df + total token count, map-side pre-aggregated."""

    def batch_df(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("tf", "sum"), ("term", "count")])
        return pa.table(
            {
                "term": g["term"],
                "df_part": g["term_count"].cast(pa.int64()),
                "tf_sum": g["tf_sum"].cast(pa.int64()),
            }
        )

    ds = rd.read_parquet(partials_root, columns=["term", "tf"])
    agg = (
        ds.map_batches(batch_df, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"), Sum("tf_sum", alias_name="tf_total"))
    )
    pdf = agg.to_pandas()
    if len(pdf) == 0 or "df" not in pdf.columns:
        return (
            pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}),
            0,
        )
    total_tokens = int(pdf["tf_total"].sum())
    df_tbl = pa.table(
        {
            "term": pa.array(pdf["term"], pa.string()),
            "df": pa.array(pdf["df"].astype("int64"), pa.int64()),
        }
    )
    return df_tbl, total_tokens
