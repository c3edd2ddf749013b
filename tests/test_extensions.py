"""Tests for the extension surface: eval metrics, snippets, enrichment retry,
timeouts, analyzer config, multimodal stubs, pagination/sampling ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _to_pandas(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


# ---------------------------------------------------------------------------
def test_eval_metrics_hand_computed():
    from engine.evaluate import evaluate_ranking

    results = pd.DataFrame(
        {
            "query_id": [0, 0, 0, 1, 1, 1],
            "rank": [1, 2, 3, 1, 2, 3],
            "doc_id": [10, 11, 12, 20, 21, 22],
        }
    )
    qrels = pd.DataFrame(
        {
            "query_id": [0, 1, 1],
            "doc_id": [11, 20, 22],
            "grade": [1.0, 1.0, 0.5],
        }
    )
    df = evaluate_ranking(results, qrels, k=3)
    q0 = df[df["query_id"] == 0].iloc[0]
    assert q0["p_at_1"] == 0.0 and q0["hit_at_k"] == 1.0
    assert q0["mrr_at_k"] == 0.5
    # nDCG q0: gains [0,1,0]; dcg = 1/log2(3); idcg = 1
    assert q0["ndcg_at_k"] == pytest.approx(1 / np.log2(3), abs=1e-6)
    q1 = df[df["query_id"] == 1].iloc[0]
    assert q1["p_at_1"] == 1.0 and q1["mrr_at_k"] == 1.0
    mean = df[df["query_id"] == -1].iloc[0]
    assert mean["p_at_1"] == 0.5


def test_eval_on_engine_results():
    """Engine results vs its own golden set -> perfect metrics (J6 analog)."""
    from engine.evaluate import evaluate_ranking, qrels_from_expected
    from engine.ops.docsearch import bm25_docs_topk

    res = _to_pandas(bm25_docs_topk(SF))
    qrels = qrels_from_expected(res)
    df = evaluate_ranking(res, qrels, k=10)
    mean = df[df["query_id"] == -1].iloc[0]
    assert mean["p_at_1"] == 1.0 and mean["mrr_at_k"] == 1.0


# ---------------------------------------------------------------------------
def test_snippets():
    from engine.snippets import make_snippet

    text = "alpha beta gamma. " * 10 + "the needle term appears here once. " + "delta " * 40
    s = make_snippet(text, "needle appears", window=10)
    assert "**needle**" in s and "**appears**" in s
    assert len(s) < len(text)
    assert s.startswith("…") or s.endswith("…")
    # no query terms -> leading text, no highlight
    s2 = make_snippet(text, "zzznothing", window=10)
    assert "**" not in s2
    assert make_snippet("", "x") == ""


# ---------------------------------------------------------------------------
def test_enrich_retry_fills_all():
    from engine.ops.enrich import enrich_documents

    df = _to_pandas(enrich_documents(SF))
    assert len(df) == 500
    assert df["enrich_ok"].all()  # retries recovered every transient failure
    assert df["summary"].str.startswith("summary[").all()


def test_timeout_wrapper():
    import time

    from engine.ops.enrich import run_with_timeout

    assert run_with_timeout(lambda: 42, timeout_s=5) == 42
    t0 = time.time()
    out = run_with_timeout(lambda: time.sleep(8) or 1, timeout_s=0.3, default="TO")
    assert out == "TO"
    assert time.time() - t0 < 5


# ---------------------------------------------------------------------------
def test_custom_analyzer_end_to_end(tmp_path):
    """Custom analyzer (stopwords + min_len) stays rank-identical vs the
    oracle configured identically (SURVEY.md §2.10 extension surface)."""
    from engine import synth
    from engine.analyze import AnalyzerConfig, tokenize
    from engine.build import build_index
    from engine.oracle import OracleIndex
    from engine.query import IndexReader

    cfg = AnalyzerConfig(stopwords=frozenset({synth.HEAD_TERMS[0]}), min_len=3)
    assert tokenize("a bb ccc " + synth.HEAD_TERMS[0], cfg) == ["ccc"]

    pages_dir = str(tmp_path / "pages")
    synth.write_pages(pages_dir, 300, num_files=2)
    idx_dir = str(tmp_path / "idx")
    build_index(pages_dir, idx_dir, num_partitions=2, analyzer=cfg)
    reader = IndexReader(idx_dir)
    assert reader.analyzer == cfg
    oracle = OracleIndex(synth.gen_pages_table(300), analyzer=cfg)
    q = synth.HEAD_TERMS[0] + " " + synth.VOCAB[150] + " " + synth.VOCAB[400]
    got = reader.search(q, k=10)
    want = oracle.search(q, k=10)
    assert got == want
    # the stopworded head term contributes nothing
    assert reader.search(synth.HEAD_TERMS[0], k=5) == []


# ---------------------------------------------------------------------------
def test_multimodal_features():
    from engine.ops.multimodal import media_features, sniff_content_type

    assert sniff_content_type(b"PK\x03\x04rest") == "application/zip"
    assert sniff_content_type(b"\x1f\x8b\x08") == "application/gzip"
    assert sniff_content_type(b"\x89PNG\r\n\x1a\nxx") == "image/png"
    assert sniff_content_type(b"") == "application/empty"
    assert sniff_content_type(b"random bytes here") == "application/octet-stream"
    df = _to_pandas(media_features(SF)).set_index("media_id").sort_index()
    assert len(df) == 200
    types = df["content_type"]
    assert types[0] == "image/png"
    assert types[1] == "image/bmp"
    assert types[2] == "image/x-portable-pixmap"
    assert types[3] == "audio/wav"
    assert types[4] == "image/jpeg"
    assert types[5] == "application/zip"
    assert types[6] == "application/gzip"
    assert types[7] == "application/empty"
    assert (types[8:] == "text/html").all()
    # PNG/BMP/PPM/JPEG/WAV decode for REAL; the three lossless image
    # encodings carry the same source array so their features agree exactly,
    # and the (lossy) JPEG agrees to within quantization error
    assert df.loc[[0, 1, 2, 3, 4], "decoded"].all()
    assert not df.loc[5:, "decoded"].any()  # non-media rows
    assert (df.loc[[0, 1, 2, 4], "width"] == 32).all()
    assert (df.loc[[0, 1, 2, 4], "height"] == 24).all()
    assert df.loc[0, "mean_lum"] == df.loc[1, "mean_lum"] == df.loc[2, "mean_lum"]
    assert abs(df.loc[4, "mean_lum"] - df.loc[0, "mean_lum"]) < 2.0
    t0, t1, t2 = (np.array(df.loc[i, "thumb"]) for i in (0, 1, 2))
    assert np.array_equal(t0, t1) and np.array_equal(t0, t2)
    assert abs(df.loc[3, "duration_s"] - 1.0) < 1e-9
    assert abs(df.loc[3, "rms"] - (10_000 / 32768) / np.sqrt(2)) < 1e-3
    embs = np.array(df["embedding"].tolist())
    assert embs.shape == (200, 16)
    assert np.allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-5)


def test_media_codecs_roundtrip():
    from engine.ops import mediacodec as mc

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(img)), img)
    gray = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(gray))[:, :, 0], gray)
    rgba = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(rgba)), rgba)
    # all five PNG row filters unfilter correctly: re-encode with each
    # filter type by hand and decode
    import struct
    import zlib

    for f in (0, 1, 2, 3, 4):
        h, w, c = img.shape
        rows = img.reshape(h, w * c).astype(np.int32)
        raw = bytearray()
        prior = np.zeros(w * c, np.int32)
        for y in range(h):
            raw.append(f)
            rec = rows[y]
            if f == 0:
                filt = rec
            elif f == 1:
                left = np.concatenate([np.zeros(c, np.int32), rec[:-c]])
                filt = (rec - left) & 0xFF
            elif f == 2:
                filt = (rec - prior) & 0xFF
            elif f == 3:
                left = np.concatenate([np.zeros(c, np.int32), rec[:-c]])
                filt = (rec - (left + prior) // 2) & 0xFF
            else:
                left = np.concatenate([np.zeros(c, np.int32), rec[:-c]])
                ul = np.concatenate([np.zeros(c, np.int32), prior[:-c]])
                from engine.ops.mediacodec import _paeth

                pred = _paeth(
                    left.astype(np.uint8),
                    prior.astype(np.uint8),
                    ul.astype(np.uint8),
                ).astype(np.int32)
                filt = (rec - pred) & 0xFF
            raw.extend(filt.astype(np.uint8).tobytes())
            prior = rec
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        from engine.ops.mediacodec import _png_chunk

        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(mc.decode_png(png), img), f"filter {f}"
    # audio roundtrip + frame sampling
    tone = rng.integers(-30000, 30000, size=(8000, 2), dtype=np.int16)
    dec, rate = mc.decode_wav(mc.encode_wav(tone, rate=8000))
    assert rate == 8000 and np.array_equal(dec, tone)
    frames = mc.sample_audio_frames(dec, rate, frame_s=0.25, hop_s=0.25)
    assert frames.shape == (4, 2000, 2)
    assert np.array_equal(frames[1], tone[2000:4000])
    # resize: exact on integer downscale
    small = mc.resize_nearest(img, 17, 23)
    assert np.array_equal(small, img)


def test_jpeg_codec_roundtrip():
    """Baseline-DCT JPEG (pure numpy, ITU T.81): quality 100 scales the
    quant tables to all-ones, so the round trip is exact up to DCT/color
    rounding; 4:2:0 subsampling and restart intervals exercise the
    decoder's sampling-factor and RST paths."""
    from engine.ops import mediacodec as mc

    yy, xx = np.mgrid[0:37, 0:50]
    img = np.stack(
        [(xx * 7) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    out = mc.decode_jpeg(mc.encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    gray = ((xx * 11 + yy * 3) % 256).astype(np.uint8)
    gout = mc.decode_jpeg(mc.encode_jpeg(gray, quality=100))
    assert gout.shape == (37, 50, 1)
    assert np.abs(gout[:, :, 0].astype(int) - gray.astype(int)).max() <= 2
    sub = mc.decode_jpeg(mc.encode_jpeg(img, quality=95, subsample=True))
    assert sub.shape == img.shape
    assert np.abs(sub.astype(float) - img).mean() < 8.0
    rst = mc.decode_jpeg(
        mc.encode_jpeg(img, quality=100, restart_interval=2)
    )
    assert np.abs(rst.astype(int) - img.astype(int)).max() <= 2
    q80 = mc.decode_jpeg(mc.encode_jpeg(img, quality=80))
    assert np.abs(q80.astype(float) - img).mean() < 6.0


def test_jpeg_12bit_extended_sequential_roundtrip():
    """12-bit extended-sequential (SOF1) per T.81 F.1.3: uint16 samples in
    [0, 4095], flat _EXT Huffman tables riding the file's own DHT.  The
    8-bit decode path is untouched (asserted byte-identical output above);
    12-bit gets the same round-trip guarantees at 16x the sample range."""
    from engine.ops import mediacodec as mc

    yy, xx = np.mgrid[0:37, 0:50]
    gray = ((xx * 53 + yy * 31) % 4096).astype(np.uint16)
    g = mc.decode_jpeg(mc.encode_jpeg(gray, quality=100, precision=12))
    assert g.dtype == np.uint16 and g.shape == (37, 50, 1)
    assert np.abs(g[:, :, 0].astype(int) - gray.astype(int)).max() <= 2
    rgb = np.stack(
        [(xx * 97) % 4096, (yy * 61) % 4096, ((xx + yy) * 41) % 4096], axis=-1
    ).astype(np.uint16)
    r = mc.decode_jpeg(mc.encode_jpeg(rgb, quality=100, precision=12))
    assert r.dtype == np.uint16
    assert np.abs(r.astype(int) - rgb.astype(int)).max() <= 2
    # restart-interval and 4:2:0 paths hold at 12 bits too
    rst = mc.decode_jpeg(
        mc.encode_jpeg(rgb, quality=100, precision=12, restart_interval=2)
    )
    assert np.abs(rst.astype(int) - rgb.astype(int)).max() <= 2
    sub = mc.decode_jpeg(
        mc.encode_jpeg(rgb, quality=95, precision=12, subsample=True)
    )
    assert np.abs(sub.astype(float) - rgb).mean() < 8.0 * 16  # 8-bit bound x16
    # out-of-range samples and unsupported precisions decline loudly
    with pytest.raises(ValueError):
        mc.encode_jpeg(np.full((8, 8), 4096, np.uint16), precision=12)
    with pytest.raises(NotImplementedError):
        mc.encode_jpeg(gray, precision=10)


def test_decode_image_dispatches_jpeg_including_progressive():
    from engine.ops import mediacodec as mc
    from engine.ops.multimodal import decode_image, sniff_content_type

    img = np.full((16, 16, 3), (10, 200, 60), np.uint8)
    payload = mc.encode_jpeg(img, quality=95)
    assert sniff_content_type(payload) == "image/jpeg"
    out = decode_image(payload)  # solid color: DC-only, near-exact
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    # progressive (SOF2) dispatches through the same entry point
    prog = mc.encode_jpeg_progressive(img, quality=95)
    assert sniff_content_type(prog) == "image/jpeg"
    assert np.array_equal(decode_image(prog), out)
    # lossless (SOF3) still declines loudly instead of mis-decoding
    with pytest.raises(NotImplementedError):
        decode_image(payload.replace(b"\xff\xc0", b"\xff\xc3", 1))


def test_jpeg_progressive_matches_baseline_pixelwise():
    """Progressive (SOF2) per T.81 Annex G: spectral selection + successive
    approximation over the SAME quantized coefficients as ``encode_jpeg``
    (shared ``_plan_jpeg``), so decoding the two streams must be
    pixel-identical — the entropy re-ordering is lossless.  Covers DC
    first/refine, AC first/refine with EOB runs, interleaved and
    single-component scans, 4:2:0 subsampling, and MCU padding."""
    from engine.ops import mediacodec as mc

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:37, 0:50]
    color = np.stack(
        [(xx * 7) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    gray = ((xx * 11 + yy * 3) % 256).astype(np.uint8)
    noise = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    flat = np.full((16, 24, 3), 128, np.uint8)
    for img, kw in [
        (color, {}),
        (color, {"subsample": True}),
        (gray, {}),
        (noise, {"quality": 50}),
        (flat, {}),  # long EOB runs
        (color[:1, :1], {}),  # 1x1: heavy MCU padding
    ]:
        base = mc.decode_jpeg(mc.encode_jpeg(img, **kw))
        prog = mc.decode_jpeg(mc.encode_jpeg_progressive(img, **kw))
        assert prog.shape == base.shape
        assert np.array_equal(prog, base)


# ---------------------------------------------------------------------------
def test_pagination_and_sampling_vs_duckdb():
    import duckdb

    import __ray_entry__ as e

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    for name in ("events_page3", "events_sample_stats"):
        got = _to_pandas(e.queries()[name](SF))
        want = con.sql(e.oracle_sql()[name]).df()
        got = got[sorted(got.columns)].reset_index(drop=True)
        want = want[sorted(want.columns)].reset_index(drop=True)
        gs = got.sort_values(list(got.columns)).reset_index(drop=True)
        ws = want.sort_values(list(want.columns)).reset_index(drop=True)
        for c in gs.columns:
            if pd.api.types.is_float_dtype(gs[c]):
                assert np.allclose(gs[c], ws[c].astype("float64"), rtol=0, atol=0), (name, c)
            else:
                assert gs[c].astype(str).equals(ws[c].astype(str)), (name, c)


def test_q_measure_perfect_and_degraded():
    import pandas as pd

    from engine.evaluate import evaluate_ranking

    qrels = pd.DataFrame(
        {"query_id": [0, 0, 0], "doc_id": [1, 2, 3], "grade": [1.0, 0.5, 0.5]}
    )
    perfect = pd.DataFrame(
        {"query_id": [0, 0, 0], "rank": [1, 2, 3], "doc_id": [1, 2, 3]}
    )
    df = evaluate_ranking(perfect, qrels, k=10)
    row = df[df.query_id == 0].iloc[0]
    assert row["q_at_k"] == 1.0  # ideal ranking -> Q = 1
    # drop one relevant doc out of the list: Q < 1 (R-normalized)
    partial = pd.DataFrame(
        {"query_id": [0, 0, 0], "rank": [1, 2, 3], "doc_id": [1, 2, 99]}
    )
    df2 = evaluate_ranking(partial, qrels, k=10)
    assert 0.0 < df2[df2.query_id == 0].iloc[0]["q_at_k"] < 1.0
