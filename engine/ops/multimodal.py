"""Multimodal columns: opaque binary payloads + typed metadata.

A large-scale training-data pipeline treats image/audio/video as `binary`
columns with decode / feature-extract stages on actor pools.  The media
libraries are not in this container, so the decoders are STUBS (clearly
marked), but the Ray-side plumbing — schema, magic-byte sniffing (the
reference's archive sniffer, SURVEY.md §2.1 S3:
/root/reference/ec2/parse_arxiv_papers/download_and_extract_paper.py:48-95),
batch sizing for large payloads, actor signatures, output layout — is real
and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.uint64()),
        pa.field("payload", pa.binary()),
        pa.field("content_type", pa.string()),
    ]
)

_MAGIC = [
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),
    (b"<html", "text/html"),
    (b"<!doc", "text/html"),
]


def sniff_content_type(payload: bytes) -> str:
    """Magic-byte detection (S3 analog: zip/tar/gzip/raw dispatch)."""
    if not payload:
        return "application/empty"
    head = payload[:16]
    for magic, ctype in _MAGIC:
        if head[: len(magic)].lower().startswith(magic.lower()):
            return ctype
    if len(payload) > 262 and payload[257:262] == b"ustar":
        return "application/x-tar"
    return "application/octet-stream"


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — image decoding needs PIL/libjpeg, absent from this container.

    The real deployment drops a PIL/torchvision decode in here; everything
    around it (batching, schema, actor pool) is already wired.
    """
    raise NotImplementedError("image decode requires PIL; not in this container")


def fake_embedding(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic payload 'feature vector' (stands in for a real encoder):
    blake2b-seeded pseudo-random unit vector, stable across processes."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big"
    )
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


class MediaFeaturizer:
    """Actor-pool stage over binary payloads.

    Use small batch sizes for large payloads (batch_size * concurrency *
    payload_size must fit the worker heap — SURVEY.md 'Memory-aware').
    Output: metadata + fixed-width feature vectors; the payload column is
    dropped so downstream stages never re-ship the heavy bytes.
    """

    def __init__(self, dim: int = 16):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ctypes = [sniff_content_type(p or b"") for p in payloads]
        sizes = [len(p or b"") for p in payloads]
        embs = [fake_embedding(p or b"", self.dim).astype(np.float32) for p in payloads]
        decoded_ok = []
        for p, ct in zip(payloads, ctypes):
            if ct.startswith("image/"):
                try:
                    decode_image(p)
                    decoded_ok.append(True)
                except NotImplementedError:
                    decoded_ok.append(False)  # stubbed decoder
            else:
                decoded_ok.append(False)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "content_type": pa.array(ctypes, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "decoded": pa.array(decoded_ok, pa.bool_()),
                "embedding": pa.array(
                    [e.tolist() for e in embs],
                    pa.list_(pa.float32(), self.dim),
                ),
            }
        )


def media_features(sf_dir: str):
    """Featurize a deterministic synthetic media table (the testdata has no
    binary column; payloads are the synthetic corpus's html bytes plus a few
    crafted zip/gzip/png headers).  Rows-only check."""
    import ray.data as rd

    from .. import synth

    pages = synth.gen_pages_table(200)
    payloads = pages["html"].to_pylist()
    # splice in non-html payloads so the sniffer has real work
    payloads[0] = b"PK\x03\x04" + b"\x00" * 64
    payloads[1] = b"\x1f\x8b\x08" + b"\x00" * 64
    payloads[2] = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    payloads[3] = b""
    tbl = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.uint64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=32,  # payload-sized batches, not row-count-sized
        concurrency=(1, 4),
        zero_copy_batch=True,
    )
