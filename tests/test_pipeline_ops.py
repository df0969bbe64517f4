"""Training-data pipeline operators: correctness of the approximate paths
against exact baselines (the oracle-less queries' safety net)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_learning_spark.operators import dedup as D
from clickhouse_learning_spark.operators import multimodal as MM
from clickhouse_learning_spark.operators import similarity as S
from clickhouse_learning_spark.operators import text as X
from clickhouse_learning_spark.schemas import load_table

from .conftest import SF_SMOKE


def test_simhash_pairs_equal_bruteforce_hamming(spark):
    """LSH-bucketed SimHash candidates == brute-force Hamming ≤ k pairs.
    Pigeonhole guarantee: Hamming ≤ 3 pairs agree on ≥1 of the 4 16-bit
    chunks, so recall is exactly 1.0 for max_hamming ≤ 3."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    got = {
        (r.id_a, r.id_b)
        for r in D.simhash_pairs(docs, max_hamming=3).collect()
    }
    sh = docs.select(F.col("doc_id").alias("id"), D.simhash(F.col("text")).alias("sim"))
    a, b = sh.alias("a"), sh.alias("b")
    want = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            D.hamming64(F.col("a.sim"), F.col("b.sim")).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert got == want


def test_simhash_detects_planted_near_dup(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    one = docs.filter("doc_id = 7").select("text").collect()[0]["text"]
    mutated = one.rsplit(" ", 2)[0]  # drop last two words
    extra = spark.createDataFrame([(99999, mutated)], "doc_id long, text string")
    both = docs.select("doc_id", "text").unionByName(extra)
    pairs = D.simhash_pairs(both, max_hamming=3)
    assert pairs.filter("id_a = 7 and id_b = 99999").count() == 1


def test_minhash_shuffle_path_equals_broadcast_path(spark):
    """broadcast_docs=False (the >10M-doc scale path: shuffle joins
    keyed by doc id instead of broadcast attach) returns the identical
    pair set."""
    docs = load_table(spark, SF_SMOKE, "documents")
    bc = sorted(map(tuple, D.minhash_lsh_pairs(docs, threshold=0.5).collect()))
    sh = sorted(
        map(
            tuple,
            D.minhash_lsh_pairs(docs, threshold=0.5, broadcast_docs=False).collect(),
        )
    )
    assert bc == sh and len(bc) > 0


def test_minhash_jaccard_estimate_close_to_exact(spark):
    """Signature agreement ratio ≈ true Jaccard (MinHash theory)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    sigs = docs.select(
        F.col("doc_id").alias("id"),
        D.minhash_signature(F.col("text")).alias("sig"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    est = (
        pairs.join(a, pairs.id_a == F.col("a.id"))
        .join(b, pairs.id_b == F.col("b.id"))
        .select(
            "id_a",
            "id_b",
            "jaccard",
            (
                F.size(
                    F.filter(
                        F.zip_with("a.sig", "b.sig", lambda x, y: (x == y).cast("int")),
                        lambda v: v == 1,
                    )
                )
                / F.lit(64.0)
            ).alias("est"),
        )
    )
    rows = est.collect()
    assert rows, "expected planted near-dup pairs"
    for r in rows:
        assert abs(r["est"] - r["jaccard"]) < 0.25, r


def test_embedding_lsh_recall_vs_bruteforce(spark):
    """Hyperplane LSH recall vs exact pairs. The fixture's closest pairs
    sit at cosine ≈ 0.45-0.51 (θ ≈ 63°, p_plane ≈ 0.65) — far for
    sign-LSH — so the test uses short keys and many tables (16×4:
    per-table hit ≈ 0.18, P(hit in ≥1 of 16) ≈ 0.96). Precision is 1.0
    by construction (exact cosine verification in-bucket)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in D.embedding_bruteforce_pairs(emb, threshold=0.45).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in D.embedding_lsh_pairs(emb, threshold=0.45, n_tables=16, n_planes=4).collect()
    }
    assert got <= exact
    if exact:
        assert len(got & exact) / len(exact) >= 0.8, (len(got), len(exact))


def test_blocked_pairs_tiled_equals_single_tile(spark):
    """embedding_blocked_pairs with chunk_rows forcing 5 tiles must
    return exactly the single-tile (and brute-force) pair set — no pair
    lost or duplicated across tile boundaries."""
    emb = load_table(spark, SF_SMOKE, "embeddings")

    def pairs(df):
        return {(r.id_a, r.id_b, r.cos_sim) for r in df.collect()}

    one = pairs(D.embedding_blocked_pairs(emb, threshold=0.4))
    tiled = pairs(D.embedding_blocked_pairs(emb, threshold=0.4, chunk_rows=25))
    brute = pairs(D.embedding_bruteforce_pairs(emb, threshold=0.4))
    assert one == brute
    assert tiled == brute
    assert brute, "expected pairs at threshold 0.4 in the fixture"


def test_blocked_topk_equals_expression_topk(spark):
    """The BLAS-blocked top-k must return bit-identical rows (values,
    ranks, tie-breaks) to the Catalyst-expression baseline."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {
        (r.query_id, r.rank): (r.vec_id, r.cos_sim)
        for r in S.cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    b = {
        (r.query_id, r.rank): (r.vec_id, r.cos_sim)
        for r in S.cosine_topk_blocked(emb, q, k=10).collect()
    }
    assert a == b and len(a) == 500


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in S.ivf_topk(spark, emb, q, k=10, n_centroids=16, n_probes=6).collect()
    }
    assert len(got & exact) / len(exact) >= 0.9, len(got & exact) / len(exact)


def test_df_cut_drops_only_hot_tokens(spark):
    """DF cut removes exactly the tokens present in > max_df of docs and
    keeps every other (id, token) row."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    toks_all = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(X.tokens(F.col("text")))).alias("t"),
    )
    n = 100
    dfreq = {r["t"]: r["c"] for r in toks_all.groupBy("t").agg(F.count(F.lit(1)).alias("c")).collect()}
    kept = D.df_cut(docs, max_df=0.5)
    kept_tokens = {r["t"] for r in kept.select("t").distinct().collect()}
    for t, c in dfreq.items():
        if c > 0.5 * n:
            assert t not in kept_tokens, t
        else:
            assert t in kept_tokens, t
    # row-level: kept rows == all rows minus hot-token rows
    hot = {t for t, c in dfreq.items() if c > 0.5 * n}
    assert kept.count() == toks_all.filter(~F.col("t").isin(list(hot) or ["__none__"])).count()


def test_exact_dedup_removes_only_copies(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 50000
    )
    out = D.exact_dedup(docs.unionByName(copies))
    assert out.count() == docs.count()
    assert out.filter(F.col("doc_id") >= 50000).count() == 0


def test_text_stats_columns_sane(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    st = X.text_stats(docs)
    r = st.agg(
        F.min("n_tokens"), F.min("quality"), F.max("quality"), F.count_distinct("lang_pred")
    ).collect()[0]
    assert r[0] > 0
    assert 0.0 <= r[1] <= r[2] <= 1.0


def test_multimodal_decode_roundtrip(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = MM.build_media_table(spark, docs)
    dec = MM.decode_image_meta(media).collect()
    assert len(dec) == 50 and all(r["ok"] for r in dec)
    for r in dec:
        assert r["width"] == r["media_id"] % 64 + 16
        assert r["height"] == r["media_id"] % 48 + 16
    rs = MM.resize_plan(media)
    bad = rs.filter(
        (F.greatest("out_width", "out_height") > 32 + 1)
        | (F.least("out_width", "out_height") < 1)
    )
    assert bad.count() == 0


def test_multimodal_real_pixels(spark):
    """PPM payloads are REAL images: features equal numpy ground truth,
    and the nearest-neighbor resize emits parseable PPMs at the planned
    geometry."""
    import numpy as np

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = MM.build_media_table(spark, docs)

    feats = {r["media_id"]: r for r in MM.image_features(media).collect()}
    for mid, r in feats.items():
        w, h = mid % 64 + 16, mid % 48 + 16
        parsed = MM._parse_ppm(MM.ppm_image(mid, w, h))
        assert parsed == (w, h, len(f"P6\n{w} {h}\n255\n"))
        px = np.frombuffer(
            MM.ppm_image(mid, w, h), dtype=np.uint8, offset=parsed[2]
        ).reshape(-1, 3)
        want = px.mean(axis=0)
        assert abs(r["mean_r"] - want[0]) < 1e-3
        assert abs(r["mean_b"] - want[2]) < 1e-3

    plan = {r["media_id"]: r for r in MM.resize_plan(media, 24).collect()}
    for r in MM.resize_image(media, 24).collect():
        parsed = MM._parse_ppm(r["payload"])
        assert parsed is not None
        assert (parsed[0], parsed[1]) == (r["out_width"], r["out_height"])
        p = plan[r["media_id"]]
        assert (r["out_width"], r["out_height"]) == (p["out_width"], p["out_height"])


def test_multimodal_audio_and_video(spark):
    """WAV decode recovers sample-rate/duration and a sane RMS for the
    synthesized two-harmonic waveform; video frame sampling extracts
    real decodable PPM frames."""
    import math

    docs = load_table(spark, SF_SMOKE, "documents").limit(12)

    audio = MM.build_audio_table(spark, docs)
    for r in MM.decode_audio_meta(audio).collect():
        n = r["media_id"] % 5 * 2000 + 2000
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == n
        assert abs(r["duration_s"] - n / 8000) < 1e-3
        # RMS of 0.6 sin + 0.3 sin of a different harmonic ≈
        # sqrt(0.18 + 0.045); loose bound (finite window truncation)
        assert abs(r["rms"] - math.sqrt(0.6**2 / 2 + 0.3**2 / 2)) < 0.03

    video = MM.build_video_table(spark, docs, n_frames=9)
    frames = MM.frame_sample(video, every=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
        parsed = MM._parse_ppm(r["frame_payload"])
        assert parsed is not None
        assert parsed[0] == r["media_id"] % 16 + 8
    assert all(sorted(v) == [0, 3, 6] for v in by_id.values())
    assert len(by_id) == 12


def test_audio_spectral_features_recover_harmonics(spark):
    """The FFT features must recover the synthesized fundamental: each
    WAV is 0.6·sin(f1) + 0.3·sin(2·f1) with f1 = 110 + (id%40)·10 Hz, so
    dominant_hz == f1 within one FFT bin (8000/512 ≈ 15.6 Hz), the
    centroid sits between f1 and 2·f1, and band energies are a valid
    distribution."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    audio = MM.build_audio_table(spark, docs)
    rows = MM.audio_spectral_features(audio, n_fft=512, n_bands=8).collect()
    assert len(rows) == 10
    bin_hz = 8000 / 512
    for r in rows:
        f1 = 110.0 + (r["media_id"] % 40) * 10.0
        assert abs(r["dominant_hz"] - f1) <= bin_hz, (r["media_id"], f1, r["dominant_hz"])
        assert f1 * 0.8 < r["spectral_centroid"] < 2 * f1 * 1.2
        assert r["rolloff_85"] <= 2 * f1 + 3 * bin_hz
        # zero crossings of a sine ≈ 2·f per second (harmonic adds a few)
        assert f1 < r["zcr"] < 5 * f1
        assert abs(sum(r["band_energy"]) - 1.0) < 1e-4  # bands rounded to 6dp
        assert len(r["band_energy"]) == 8


def test_compressed_header_dims_no_imaging_lib():
    """PNG/GIF/JPEG dimensions parse from fixed header fields — no
    Pillow needed; pixel access for the same payloads hits the
    actionable optional-dep gate."""
    import struct as st

    import pytest

    png = b"\x89PNG\r\n\x1a\n" + st.pack(">I", 13) + b"IHDR" + st.pack(">II", 640, 480) + b"\x08\x02" + b"\x00" * 7
    gif = b"GIF89a" + st.pack("<HH", 320, 200) + b"\x00" * 4
    jpeg = (
        b"\xff\xd8\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0 (len incl. the 2 len bytes)
        + b"\xff\xc0" + st.pack(">H", 11) + b"\x08" + st.pack(">HH", 1080, 1920) + b"\x03" + b"\x00" * 2
    )
    assert MM._decode_dims(png) == (640, 480)
    assert MM._decode_dims(gif) == (320, 200)
    assert MM._decode_dims(jpeg) == (1920, 1080)
    assert MM._decode_dims(b"\x00garbage") is None
    for payload in (png, jpeg):
        with pytest.raises(NotImplementedError, match="Pillow"):
            MM._pixels(payload)


def test_text_repetition_bounds(spark):
    """Repetition fractions are valid probabilities, and a doc made of
    one repeated token maxes them out."""
    from clickhouse_learning_spark.queries_pipeline import text_repetition

    rows = text_repetition(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["top_bigram_share"] <= 1.0
        assert 0.0 <= r["dup_bigram_frac"] < 1.0
        assert 0.0 <= r["dup_trigram_frac"] < 1.0


def test_bm25_ranks_dense_and_term_docs_only(spark):
    """Every query returns ranks 1..k over docs that contain >=1 query
    term, ordered by non-increasing score."""
    from clickhouse_learning_spark.queries_pipeline import bm25_topk

    rows = bm25_topk(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["bm25"] for r in rs]
        assert all(a >= b - 1e-4 for a, b in zip(scores, scores[1:]))


def test_substring_duplication_detects_shared_runs(spark):
    """Docs sharing a verbatim 20-token run are flagged; fully unique
    docs score zero; a doc that IS the shared run scores 1.0."""
    from clickhouse_learning_spark.operators.dedup import substring_duplication

    para = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "brew quartz potions beneath the old stone bridge"
    )  # exactly 20 tokens
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + para),
            (2, para),
            (3, " ".join(f"unique{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in substring_duplication(docs, window_tokens=20).collect()}
    assert out[2].dup_fraction == 1.0  # the doc IS the shared run
    assert out[1].n_shared >= 1  # contains the run + unique prefix windows
    assert 0 < out[1].dup_fraction < 1
    assert out[3].n_shared == 0 and out[3].dup_fraction == 0.0


def test_png_decode_roundtrip_all_filters():
    """png_image → _png_decode must reproduce the exact PPM pixel array
    for every PNG filter type (0–4), plus gray/RGBA/palette variants
    and corrupt-payload rejection."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from clickhouse_learning_spark.operators import multimodal as MM

    for ft in range(5):
        png = MM.png_image(7, 20, 13, filter_type=ft)
        ref = MM._pixels(MM.ppm_image(7, 20, 13))
        got = MM._png_decode(png)
        assert got is not None and got.shape == (13, 20, 3), ft
        assert np.array_equal(got, ref), f"filter {ft}"
        # the generic _pixels entry point takes the native path too
        assert np.array_equal(MM._pixels(png), ref)

    # grayscale (color type 0): build by hand, expect channel replication
    w, h = 5, 4
    gray = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    lines = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    png_g = (
        b"\x89PNG\r\n\x1a\n"
        + MM._png_chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + MM._png_chunk(b"IDAT", _zlib.compress(lines))
        + MM._png_chunk(b"IEND", b"")
    )
    got_g = MM._png_decode(png_g)
    assert got_g.shape == (h, w, 3)
    assert np.array_equal(got_g[:, :, 0], gray)
    assert np.array_equal(got_g[:, :, 1], gray)

    # RGBA (color type 6): alpha dropped
    rgba = np.arange(w * h * 4, dtype=np.uint64) % 251
    rgba = rgba.astype(np.uint8).reshape(h, w * 4)
    lines = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    png_a = (
        b"\x89PNG\r\n\x1a\n"
        + MM._png_chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + MM._png_chunk(b"IDAT", _zlib.compress(lines))
        + MM._png_chunk(b"IEND", b"")
    )
    got_a = MM._png_decode(png_a)
    assert np.array_equal(got_a, rgba.reshape(h, w, 4)[:, :, :3])

    # palette (color type 3)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = (np.arange(w * h, dtype=np.uint8) % 3).reshape(h, w)
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png_p = (
        b"\x89PNG\r\n\x1a\n"
        + MM._png_chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + MM._png_chunk(b"PLTE", pal.tobytes())
        + MM._png_chunk(b"IDAT", _zlib.compress(lines))
        + MM._png_chunk(b"IEND", b"")
    )
    got_p = MM._png_decode(png_p)
    assert np.array_equal(got_p, pal[idx])

    # corrupt / unsupported → None (caller falls to the Pillow gate)
    assert MM._png_decode(b"\x89PNG\r\n\x1a\n" + b"junk") is None
    assert MM._png_decode(None) is None
    # 16-bit depth → None
    png_16 = (
        b"\x89PNG\r\n\x1a\n"
        + MM._png_chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM._png_decode(png_16) is None


def test_gif_decode_native():
    """_gif_decode: pure-python LZW + palette mapping must reproduce
    known pixels from a GIF assembled by an INDEPENDENT encoder written
    here (spec-faithful early-change width growth, sub-block splitting,
    interlace, local palette)."""
    import struct as _struct

    import numpy as np

    from clickhouse_learning_spark.operators import multimodal as MM

    def lzw_encode(indices, min_code):
        clear, end = 1 << min_code, (1 << min_code) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code, width = end + 1, min_code + 1
        out_bits = []

        def emit(code, w):
            out_bits.append((code, w))

        emit(clear, width)
        cur = bytes([indices[0]])
        for c in indices[1:]:
            ext = cur + bytes([c])
            if ext in table:
                cur = ext
                continue
            emit(table[cur], width)
            table[ext] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            cur = bytes([c])
        emit(table[cur], width)
        emit(end, width)
        big, pos = 0, 0
        for code, w in out_bits:
            big |= code << pos
            pos += w
        return big.to_bytes((pos + 7) // 8, "little")

    def make_gif(w, h, indices, palette, interlace=False, local=False):
        rows = np.asarray(indices, dtype=np.uint8).reshape(h, w)
        if interlace:
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            rows = rows[order]
        n = len(palette)
        pbits = max(1, (n - 1).bit_length()) - 1  # field stores bits-1
        pal_bytes = np.asarray(palette, dtype=np.uint8).tobytes()
        pal_bytes += b"\x00" * (3 * (2 << pbits) - len(pal_bytes))
        min_code = max(2, (n - 1).bit_length())
        data = lzw_encode(rows.reshape(-1).tolist(), min_code)
        blocks = b"".join(
            bytes([len(data[i : i + 255])]) + data[i : i + 255]
            for i in range(0, len(data), 255)
        ) + b"\x00"
        if local:
            head = (b"GIF89a" + _struct.pack("<HH", w, h) + bytes([0, 0, 0]))
            idesc = bytes([0x2C]) + _struct.pack("<HHHH", 0, 0, w, h) + bytes(
                [0x80 | (0x40 if interlace else 0) | pbits]
            ) + pal_bytes
        else:
            head = (
                b"GIF89a" + _struct.pack("<HH", w, h)
                + bytes([0x80 | pbits, 0, 0]) + pal_bytes
            )
            idesc = bytes([0x2C]) + _struct.pack("<HHHH", 0, 0, w, h) + bytes(
                [0x40 if interlace else 0]
            )
        # a GCE extension before the image exercises the skip path
        ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
        return head + ext + idesc + bytes([min_code]) + blocks + b"\x3B"

    pal = [(17 * i % 256, 31 * i % 256, 7 * i % 256) for i in range(16)]
    w, h = 40, 40  # big enough to split sub-blocks and grow code width
    idx = [(i * 7 + 3) % 16 for i in range(w * h)]
    expected = np.asarray(pal, dtype=np.uint8)[
        np.asarray(idx, dtype=np.uint8).reshape(h, w)
    ]

    plain = MM._gif_decode(make_gif(w, h, idx, pal))
    assert plain is not None and np.array_equal(plain, expected)

    inter = MM._gif_decode(make_gif(w, h, idx, pal, interlace=True))
    assert inter is not None and np.array_equal(inter, expected)

    local = MM._gif_decode(make_gif(w, h, idx, pal, local=True))
    assert local is not None and np.array_equal(local, expected)

    # the generic _pixels entry point takes the native path
    assert np.array_equal(MM._pixels(make_gif(w, h, idx, pal)), expected)

    # corrupt → None
    assert MM._gif_decode(b"GIF89a" + b"\x00" * 10) is None
    assert MM._gif_decode(None) is None


def test_jpeg_decode_native():
    """Baseline JPEG codec (operators/jpeg.py): encoder round-trip
    (flat exact, smooth gradient within quantization error) plus a
    HAND-ASSEMBLED golden stream — single 8×8 grayscale block, DC-only,
    flat-q=8 table, DC coef 5 → every pixel exactly 133 — which
    validates the decoder's marker walk, canonical Huffman build,
    EXTEND, dequant and IDCT independently of the encoder."""
    import struct as _struct

    import numpy as np

    from clickhouse_learning_spark.operators import jpeg as J
    from clickhouse_learning_spark.operators import multimodal as MM

    for val in ((128, 128, 128), (200, 30, 90)):
        img = np.full((24, 17, 3), val, dtype=np.uint8)
        dec = J.decode_baseline(J.encode_baseline(img, quality=90))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1, val

    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(xx * 4) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)
    enc = J.encode_baseline(img, quality=95)
    dec = J.decode_baseline(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
    # the generic _pixels entry point takes the native path
    assert np.array_equal(MM._pixels(enc), dec)

    # hand-assembled golden: DC table {3: len-3 code}, AC table
    # {EOB: len-2 code}; data bits 000|101|00 = 0x14; q all-8s
    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    qzz = bytes([8] * 64)
    golden = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qzz)
        + seg(0xC0, bytes([8]) + _struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes([0, 0, 1] + [0] * 13) + bytes([3]))
        + seg(0xC4, bytes([0x10]) + bytes([0, 1] + [0] * 14) + bytes([0x00]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x14])
        + b"\xff\xd9"
    )
    got = J.decode_baseline(golden)
    assert got is not None and got.shape == (8, 8, 3)
    assert np.all(got == 133), got[:2, :2, 0]

    # arithmetic-coded SOF9 decodes NATIVELY as of round 5
    # (tests/test_jparith.py pins it against the Huffman path); a
    # forged marker over Huffman entropy data is garbage-in and must
    # not crash — best-effort pixels or None, like any real decoder
    arith = golden.replace(bytes([0xFF, 0xC0]), bytes([0xFF, 0xC9]), 1)
    forged = J.decode_baseline(arith)
    assert forged is None or forged.dtype == np.uint8
    assert J.decode_baseline(b"\xff\xd8\xff\xe0junk") is None


def test_jpeg_restart_markers():
    """Restart intervals (DRI + RSTn): two hand-built DC-only MCUs
    separated by RST0; DC prediction must reset per segment, giving a
    flat 133 across both blocks."""
    import struct as _struct

    import numpy as np

    from clickhouse_learning_spark.operators import jpeg as J

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    golden = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([8] * 64))
        + seg(0xC0, bytes([8]) + _struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes([0, 0, 1] + [0] * 13) + bytes([3]))
        + seg(0xC4, bytes([0x10]) + bytes([0, 1] + [0] * 14) + bytes([0x00]))
        + seg(0xDD, _struct.pack(">H", 1))  # restart every MCU
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0x14])          # MCU 1: DC=+5, EOB
        + bytes([0xFF, 0xD0])    # RST0
        + bytes([0x14])          # MCU 2: DC=+5 from RESET pred
        + b"\xff\xd9"
    )
    got = J.decode_baseline(golden)
    assert got is not None and got.shape == (8, 16, 3)
    assert np.all(got == 133)


def test_semdedup_with_kmeans_centroids(spark):
    """SemDeDup production path: kmeans centroids -> assignment ->
    within-cell earlier-id drop rule. Laws checked against a NumPy
    replay: every row is assigned to its argmax-cosine centroid, and a
    row is dropped iff some lower-id same-cell row has cosine >= t."""
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = S.train_centroids(emb, n_centroids=6, refine_iters=2)
    cent_list = [(i, list(v)) for i, v in enumerate(cents)]
    out = D.semdedup(emb, cent_list, threshold=0.4).collect()
    got = {r["vec_id"]: (r["cell"], r["kept"]) for r in out}

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    cm = np.array([v for _, v in cent_list], dtype=np.float64)
    cm = cm / np.sqrt((cm * cm).sum(axis=1))[:, None]
    cell_ids = np.array([c for c, _ in cent_list])
    assign = cell_ids[np.argmax(mat @ cm.T, axis=1)]
    order = np.argsort(ids)
    bad = 0
    for pos in order:
        vid, cell = int(ids[pos]), int(assign[pos])
        earlier = (assign == cell) & (ids < ids[pos])
        want_kept = True
        if earlier.any():
            want_kept = float((mat[earlier] @ mat[pos]).max()) < 0.4
        if got[vid] != (cell, want_kept):
            bad += 1
    assert bad == 0, f"{bad} assignment/keep mismatches"
    # the fixture's planted near-dups must actually drop something
    assert any(not k for _, k in got.values())


def test_dsir_selects_target_like_docs(spark):
    """DSIR sanity laws: hashed features count unigrams+bigrams; docs
    written in the target 'dialect' outscore off-target docs; the
    selection cut is deterministic (weight desc, id asc)."""
    from clickhouse_learning_spark.operators import dsir as DS

    a_words = "alpha beta gamma delta epsilon"
    b_words = "zulu yankee xray whiskey victor"
    rows = [(i, f"{a_words} {a_words}") for i in range(20)]          # raw, A
    rows += [(100 + i, f"{b_words} {b_words}") for i in range(20)]   # raw, B
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(1000 + i, a_words) for i in range(10)], "doc_id long, text string"
    )
    sel = DS.dsir_select(raw, tgt, k=20, buckets=512).collect()
    assert len(sel) == 20
    assert all(r["doc_id"] < 100 for r in sel), "picked off-target docs"
    # identical docs -> identical weights -> id-ascending tie-break
    assert [r["doc_id"] for r in sel] == sorted(r["doc_id"] for r in sel)

    f = DS.hashed_ngram_features(
        spark.createDataFrame([(1, "x y x")], "doc_id long, text string"),
        buckets=1 << 20,
    ).collect()
    # grams: x, y, x, 'x y', 'y x' -> 4 distinct buckets w/ x counted twice
    assert sorted(r["cnt"] for r in f) == [1, 1, 1, 2]


def test_gopher_rules_boundaries(spark):
    """Rule boundaries on crafted docs: word-count bounds, alpha
    fraction, stopword minimum, symbol ratio."""
    from clickhouse_learning_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            # 0: 60 words incl. stopwords -> keep
            (0, "the a of " + " ".join(f"word{i}" for i in range(57))),
            # 1: too short (3 words)
            (1, "the a short"),
            # 2: numeric words -> alpha fraction fails; no stopwords
            (2, " ".join(str(i) for i in range(60))),
            # 3: symbol-heavy
            (3, "the a " + "# " * 58),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in gopher_rules(docs).collect()}
    assert r[0].keep and r[0].rule_words and r[0].rule_stopwords
    assert not r[1].rule_words and not r[1].keep
    assert not r[2].rule_alpha and not r[2].rule_stopwords
    assert not r[3].rule_symbols and not r[3].keep
    assert r[3].symbol_ratio > 0.9


def test_lexical_diversity_fold(spark):
    """The run-length fold against hand counts, including all-hapax and
    all-same extremes."""
    from clickhouse_learning_spark.operators.text import lexical_diversity

    docs = spark.createDataFrame(
        [
            (0, "a b b c c c"),  # n=6 types=3 hapax=1 max=3
            (1, "x y z"),  # all hapax
            (2, "q q q q"),  # one type
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in lexical_diversity(docs).collect()}
    assert (r[0].n_tokens, r[0].n_types) == (6, 3)
    assert r[0].hapax_frac == 0.3333 and r[0].top_share == 0.5
    assert r[1].type_token_ratio == 1.0 and r[1].hapax_frac == 1.0
    assert (r[2].n_types, r[2].top_share) == (1, 1.0)


def test_c4_clean_rules(spark):
    """C4 line/page rules on hand cases covering every rule branch."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators.text import c4_clean

    docs = spark.createDataFrame(
        [
            # kept lines + 3 sentences -> page kept
            (1, "one two three four five.\nsix seven eight nine ten!\n"
                "alpha beta gamma delta eps?\nshort no."),
            # javascript line dropped; page falls under 3 sentences
            (2, "one two three four five javascript.\n"
                "six seven eight nine ten.\nalpha beta gamma delta eps."),
            # no terminal punctuation anywhere -> nothing kept
            (3, "one two three four five six\nseven eight nine ten eleven"),
            # lorem ipsum survives line rules but kills the page
            (4, "lorem ipsum dolor sit amet one.\n"
                "six seven eight nine ten.\nalpha beta gamma delta eps."),
            # '{' in a kept line kills the page rule, not the line
            (5, "one two three four { five.\n"
                "six seven eight nine ten.\nalpha beta gamma delta eps."),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert rows[1]["n_lines_kept"] == 3 and rows[1]["keep_page"] is True
    assert rows[1]["n_sentences"] == 3
    assert rows[2]["n_lines_kept"] == 2 and rows[2]["keep_page"] is False
    assert rows[3]["n_lines_kept"] == 0 and rows[3]["cleaned_text"] == ""
    assert rows[4]["n_lines_kept"] == 3 and rows[4]["keep_page"] is False
    assert rows[5]["n_lines_kept"] == 3 and rows[5]["keep_page"] is False


def test_avi_container_dib_and_mjpg():
    """AVI RIFF walker: DIB frames repack to exact PPM (stride/flip/
    BGR handled); MJPG frames pass through as real JPEGs decodable by
    the native T.81 decoder and match a direct encode of the same
    pixels."""
    import numpy as np

    from clickhouse_learning_spark.operators import multimodal as MM
    from clickhouse_learning_spark.operators.jpeg import (
        decode_baseline,
        encode_baseline,
    )

    for codec in ("dib", "mjpg"):
        pay = MM.avi_video(7, 4, 13, 10, codec=codec)  # odd width: stride pad
        frames = MM._video_frames(pay)  # via the shared dispatcher
        assert frames is not None and len(frames) == 4
        for f_idx, frame in enumerate(frames):
            fid = 7 * 1000 + f_idx
            idx = np.arange(13 * 10 * 3, dtype=np.uint64)
            px = (
                (np.uint64(fid) * np.uint64(2654435761)
                 + idx * np.uint64(40503)) & np.uint64(0xFF)
            ).astype(np.uint8).reshape(10, 13, 3)
            if codec == "dib":
                assert frame == b"P6\n13 10\n255\n" + px.tobytes()
            else:
                got = decode_baseline(frame)
                want = decode_baseline(encode_baseline(px, quality=90))
                assert got is not None and np.array_equal(got, want)
    # garbage tolerance
    assert MM._avi_frames(b"RIFFxxxxAVI garbage") is None
    assert MM._avi_frames(b"not riff") is None
