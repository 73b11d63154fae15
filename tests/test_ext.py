"""Extension surfaces: multimodal plumbing, LSH recall vs exact
baselines, windowed-aggregation semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.ext.multimodal import (
    documents_as_media,
    extract_image_features,
    frame_sample_stub,
    repartition_for_media,
)
from lakehouse_file_format_compare_spark.operators import dedup as D
from lakehouse_file_format_compare_spark.operators import similarity as S
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS


def test_multimodal_features_deterministic(spark):
    docs = table(spark, SF_CORRECTNESS, "documents").limit(50)
    media = documents_as_media(docs)
    a = sorted(map(tuple, extract_image_features(media, fake_decode=True).collect()))
    b = sorted(map(tuple, extract_image_features(media, fake_decode=True).collect()))
    assert a == b
    assert len(a) == 50
    row = dict(zip(["media_id", "n_bytes", "content_sha256", "width", "height", "channels"], a[0]))
    assert row["n_bytes"] > 0 and len(row["content_sha256"]) == 64
    assert 64 <= row["width"] < 256 and 64 <= row["height"] < 256


def test_media_fixture_real_probe_and_sha(spark):
    """The committed media fixture (r6): the distributed REAL probe
    path must reproduce, for every row, the dimensions the local
    probe_image parse gives AND the exact hashlib sha256 of the
    payload — the value check the SQL oracle can't carry (DuckDB
    sha256 is VARCHAR-only)."""
    import hashlib

    import pyarrow.parquet as pq

    from lakehouse_file_format_compare_spark.ext.multimodal import probe_image
    from lakehouse_file_format_compare_spark.plans.ext_plans import MEDIA_FIXTURE

    expected = {}
    for r in pq.read_table(MEDIA_FIXTURE).to_pylist():
        blob = r["content"]
        w, h, c = probe_image(blob)
        expected[r["media_id"]] = (
            len(blob), hashlib.sha256(blob).hexdigest(), w, h, c
        )
    media = spark.read.parquet(MEDIA_FIXTURE)
    out = extract_image_features(media, fake_decode=False).collect()
    assert len(out) == len(expected) == 500
    for r in out:
        assert expected[r["media_id"]] == (
            r["n_bytes"], r["content_sha256"], r["width"], r["height"], r["channels"]
        ), r


def test_gif_lzw_encoder_is_valid(spark):
    """The fixture's GIFs are REAL: the from-scratch LZW encoder
    round-trips through an independent spec-appendix decoder on
    patterned and random streams (exercising several code-width
    bumps), and that decoder also decodes a canonical public-domain
    1x1 GIF payload — so encoder and decoder aren't just mutually
    wrong."""
    import importlib.util
    import os
    import random

    from lakehouse_file_format_compare_spark.plans.ext_plans import MEDIA_FIXTURE

    script = os.path.join(os.path.dirname(MEDIA_FIXTURE), "..", "scripts",
                          "build_media_fixture.py")
    spec = importlib.util.spec_from_file_location("bmf_lzw", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for w, h, mid in [(1, 1, 0), (4, 3, 5), (50, 45, 7)]:
        idx = [(x + y + mid) % 4 for y in range(h) for x in range(w)]
        assert mod.gif_lzw_decode(mod.gif_lzw_encode(idx, 2), 2) == idx
    rng = random.Random(42)
    for n in (100, 3000, 8000):  # 8000 random 2-bit symbols -> width bumps to 12
        idx = [rng.randrange(4) for _ in range(n)]
        assert mod.gif_lzw_decode(mod.gif_lzw_encode(idx, 2), 2) == idx
    # canonical 1x1 transparent GIF image data: sub-block [0x44, 0x01]
    # with min code size 2 decodes to exactly one index-0 pixel
    assert mod.gif_lzw_decode(bytes([0x44, 0x01]), 2) == [0]
    # and a generated GIF's stored pixel stream survives the full
    # container: strip header/LSD/palette/descriptor, reassemble
    # sub-blocks, decode, compare to the generator's pattern
    g = mod.make_gif(17, 9, 3)
    assert g[:6] == b"GIF89a" and g[-1:] == b"\x3b"
    data, pos = bytearray(), 6 + 7 + 12 + 10 + 1  # LSD + palette + descriptor + mcs
    while g[pos] != 0:
        ln = g[pos]
        data += g[pos + 1:pos + 1 + ln]
        pos += 1 + ln
    assert mod.gif_lzw_decode(bytes(data), 2) == [
        (x + y + 3) % 4 for y in range(9) for x in range(17)
    ]


def test_media_fixture_matches_builder(spark):
    """Drift guard (fintech-fixture pattern): re-running the builder's
    row generation must reproduce the committed bytes exactly, so the
    fixture and the script can't silently diverge. (Byte equality
    holds per zlib build; a zlib upgrade shows up here loudly rather
    than as a quiet oracle break.)"""
    import importlib.util
    import os

    import pyarrow.parquet as pq

    from lakehouse_file_format_compare_spark.plans.ext_plans import MEDIA_FIXTURE

    script = os.path.join(os.path.dirname(MEDIA_FIXTURE), "..", "scripts",
                          "build_media_fixture.py")
    spec = importlib.util.spec_from_file_location("build_media_fixture", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ids, _, contents, _ = mod.build_rows()
    committed = {r["media_id"]: r["content"] for r in pq.read_table(MEDIA_FIXTURE).to_pylist()}
    assert len(committed) == len(ids)
    for mid, blob in zip(ids, contents):
        assert committed[mid] == blob, f"media_id {mid} drifted"


def test_multimodal_real_decoder_is_stubbed(spark):
    import pytest

    from lakehouse_file_format_compare_spark.ext.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image", fake=False)


def test_media_repartition_by_bytes(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    media = documents_as_media(docs)
    out = repartition_for_media(media, target_partition_bytes=64 * 1024)
    assert out.rdd.getNumPartitions() >= 2


def test_frame_sampling_plumbing(spark):
    docs = table(spark, SF_CORRECTNESS, "documents").limit(5)
    frames = frame_sample_stub(documents_as_media(docs), every_n=1)
    counts = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in counts)


def test_minhash_lsh_recall_vs_exact(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    # verified-candidate design: approx ⊆ exact always; recall high
    assert approx <= exact
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_knn_lsh_recall_vs_bruteforce(spark):
    emb = table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_bruteforce(queries, emb, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_lsh(queries, emb, k=5, bits=6, tables=8, dim=64).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, f"multi-table LSH recall vs exact top-5: {recall}"


def test_knn_ivf_recall_vs_bruteforce(spark):
    emb = table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_bruteforce(queries, emb, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_ivf(queries, emb, k=5, n_lists=16, nprobe=6).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"IVF nprobe=6/16 recall vs exact top-5: {recall}"


def test_ivf_deterministic(spark):
    emb = table(spark, SF_CORRECTNESS, "embeddings")
    c1 = S.train_ivf_centroids(emb, n_lists=8, seed=5)
    c2 = S.train_ivf_centroids(emb, n_lists=8, seed=5)
    assert c1 == c2


def test_ivf_centroids_independent_of_partition_layout(spark):
    """Regression: a bare limit() sample made centroids depend on which
    partitions answered first — same data repartitioned must train
    identical centroids."""
    emb = table(spark, SF_CORRECTNESS, "embeddings")
    c1 = S.train_ivf_centroids(emb, n_lists=8, seed=5)
    c2 = S.train_ivf_centroids(emb.repartition(7), n_lists=8, seed=5)
    c3 = S.train_ivf_centroids(emb.repartition(1), n_lists=8, seed=5)
    assert c1 == c2 == c3


def test_approx_distinct_accuracy(spark):
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        approx_distinct,
        approx_distinct_raw,
    )

    for r in approx_distinct_raw(spark, SF_CORRECTNESS).collect():
        assert abs(r.approx_customers - r.exact_customers) / r.exact_customers < 0.05
    # driver-facing form pins the same bound as an in-row boolean
    assert all(r.approx_within_tolerance for r in approx_distinct(spark, SF_CORRECTNESS).collect())


def test_simhash_finds_exact_duplicates(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    # exact dups (identical normalized text) must be hamming-0 pairs
    exact_dup_pairs = {
        tuple(sorted((r.doc_id, r.canonical_id)))
        for r in D.exact_duplicates(docs).where(F.col("group_size") > 1).collect()
        if r.doc_id != r.canonical_id
    }
    sim_pairs = {
        (r.doc_a, r.doc_b): r.hamming for r in D.simhash_near_pairs(docs, max_hamming=0).collect()
    }
    for pair in exact_dup_pairs:
        assert pair in sim_pairs or (pair[1], pair[0]) in sim_pairs


def test_rolling_fingerprint_is_order_sensitive(spark):
    from lakehouse_file_format_compare_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma"),
         (4, "Alpha  Beta   Gamma")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.fp for r in df.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[1] == out[3], "identical text must fingerprint equal"
    assert out[1] == out[4], "whitespace/case normalization must apply"
    assert out[1] != out[2], "token order must matter"


def test_readme_customer_filter_oracle(spark):
    # demoted from the driver registry (50-row cap; slot went to
    # dedup_components) but the oracle compare stays pinned here
    from lakehouse_file_format_compare_spark.plans.ext_plans import (
        README_CUSTOMER_FILTER,
        readme_customer_filter,
    )

    from .oracle import compare

    ok, msg = compare(spark, SF_CORRECTNESS, readme_customer_filter, README_CUSTOMER_FILTER)
    assert ok, msg


def test_resize_images_plumbing(spark):
    from lakehouse_file_format_compare_spark.ext.multimodal import (
        documents_as_media,
        extract_image_features,
        resize_images,
    )

    docs = table(spark, SF_CORRECTNESS, "documents").limit(40)
    media = documents_as_media(docs)
    src = {r["media_id"]: (r["width"], r["height"])
           for r in extract_image_features(media, fake_decode=True).collect()}
    out = resize_images(media, max_side=100, fake_decode=True).collect()
    assert len(out) == 40
    for r in out:
        w0, h0 = src[r["media_id"]]
        assert max(r["width"], r["height"]) <= 100
        # aspect preserved within integer rounding
        if max(w0, h0) > 100:
            assert abs(r["width"] / r["height"] - w0 / h0) < 0.1
        else:
            assert (r["width"], r["height"]) == (w0, h0)
        assert r["content"] is not None  # binary out survives Arrow round-trip


def test_audio_features_and_chunking(spark):
    from lakehouse_file_format_compare_spark.ext.multimodal import (
        chunk_audio_stub,
        documents_as_media,
        extract_audio_features,
    )

    docs = table(spark, SF_CORRECTNESS, "documents").limit(40)
    media = documents_as_media(docs)
    feats = extract_audio_features(media, fake_decode=True).collect()
    assert len(feats) == 40
    for r in feats:
        assert r["duration_ms"] == r["n_bytes"] * 1000 // 32000
        assert r["sample_rate"] == 16000 and r["n_channels"] == 1

    chunks = chunk_audio_stub(media, chunk_ms=5).collect()
    per_media = {}
    for r in chunks:
        per_media.setdefault(r["media_id"], []).append((r["chunk_index"], r["chunk_start_ms"]))
    dur = {r["media_id"]: r["duration_ms"] for r in feats}
    for mid, cs in per_media.items():
        idxs = sorted(i for i, _ in cs)
        assert idxs == list(range(len(idxs)))  # contiguous chunk indices
        assert len(idxs) == max(-(-dur[mid] // 5), 1)  # ceil, min 1
        assert all(start == i * 5 for i, start in sorted(cs))


def test_minhash_hot_bucket_cap(spark):
    # 60 identical boilerplate docs (one hot bucket in EVERY band) +
    # 2 genuine near-dup docs. With the cap, boilerplate pairs are
    # skipped (bounded work) while the normal pair survives.
    boiler = [(i, "the same licence header repeated verbatim in many files " * 3)
              for i in range(60)]
    near = [
        (100, "a quick brown fox jumps over the lazy dog near the river bank today"),
        (101, "a quick brown fox jumps over the lazy dog near the river bank tonight"),
    ]
    docs = spark.createDataFrame(boiler + near, "doc_id long, text string")
    capped = D.minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=10)
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 60 and b < 60 for a, b in pairs), "hot bucket must be skipped"
    # uncapped finds the boilerplate cluster (the contrast that proves
    # the cap changed behavior, not the data)
    full = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert any(a < 60 and b < 60 for a, b in full)


def test_int8_quantization_roundtrip(spark):
    from lakehouse_file_format_compare_spark.functions.vectors import (
        cosine,
        dequantize_int8,
        quantize_int8,
    )

    emb = table(spark, SF_CORRECTNESS, "embeddings").limit(200)
    rt = emb.select(
        "vec_id",
        F.col("embedding").alias("orig"),
        dequantize_int8(quantize_int8(F.col("embedding"))).alias("rt"),
        quantize_int8(F.col("embedding")).alias("qv"),
    )
    checked = rt.select(
        "vec_id",
        cosine(F.col("orig"), F.col("rt")).alias("cos_sim"),
        F.aggregate(
            F.zip_with("orig", "rt", lambda a, b: F.abs(a.cast("double") - b.cast("double"))),
            F.lit(0.0), lambda acc, v: F.greatest(acc, v),
        ).alias("max_err"),
        (F.col("qv.scale") / 2 + 1e-12).alias("err_bound"),
        F.aggregate(
            F.transform("qv.q", lambda q: F.abs(q.cast("int"))), F.lit(0), lambda acc, v: F.greatest(acc, v)
        ).alias("max_q"),
    ).collect()
    for r in checked:
        assert r["max_q"] <= 127
        assert r["max_err"] <= r["err_bound"] * 1.0000001, (r["vec_id"], r["max_err"], r["err_bound"])
        assert r["cos_sim"] > 0.999


def test_int8_knn_recall_vs_float(spark):
    emb = table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.where(F.col("vec_id") % 20 == 0)
    K = 10
    base = {(r.query_id, r.neighbor_id) for r in S.knn_bruteforce(queries, emb, k=K).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in S.knn_bruteforce_int8(queries, emb, k=K).collect()}
    assert len(base) == len(quant)
    recall = len(base & quant) / len(base)
    assert recall >= 0.9, f"int8 recall@{K} = {recall:.3f}"


def make_png(width: int, height: int, rgb=(200, 30, 60)) -> bytes:
    """A REAL, fully valid RGB PNG built with stdlib zlib + crc32 —
    decodable by any conformant codec (PIL included), no image library
    needed to produce it."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * width for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_image_header_probe(spark):
    """Real (non-fake) image metadata works in THIS container: the
    stdlib header probe parses genuine PNG/GIF/BMP/JPEG bytes — no
    PIL needed — and the mapInPandas extractor's real path uses it.
    Unrecognized payloads still raise loudly (never a silent fake)."""
    import struct

    import pytest

    from lakehouse_file_format_compare_spark.ext.multimodal import (
        decode_image,
        extract_image_features,
        pil_available,
        probe_image,
        resize_images,
    )

    png = make_png(200, 100)
    assert probe_image(png) == (200, 100, 3)
    # decode_image real path: PIL when present, header probe otherwise
    # — both must agree on a valid PNG.
    assert decode_image(png, fake=False) == (200, 100, 3)
    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image", fake=False)

    # GIF89a logical screen descriptor (little-endian w,h); GIF is
    # palette-indexed -> 1 stored channel (PIL 'P' mode parity).
    gif = b"GIF89a" + struct.pack("<HH", 320, 240) + b"\xf7\x00\x00"
    assert probe_image(gif) == (320, 240, 1)
    # BMP: 'BM' + file header (14 bytes) + BITMAPINFOHEADER w,h at 18,
    # bit depth at 28; negative height means top-down — probe abs()s.
    bmp = (b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480)
           + struct.pack("<HH", 1, 24) + b"\x00" * 4)
    assert probe_image(bmp) == (640, 480, 3)
    bmp32 = (b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, 48)
             + struct.pack("<HH", 1, 32) + b"\x00" * 4)
    assert probe_image(bmp32) == (64, 48, 4)
    # JPEG: SOI, a spec-legal 0xFF fill byte, APP0 skipped by length,
    # SOF0 carries height,width,channels.
    jpg = (b"\xff\xd8" + b"\xff"
           + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
           + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
           + b"\x03" + b"\x00" * 10)
    assert probe_image(jpg) == (640, 480, 3)

    # Distributed real path on actual image bytes — green in this
    # container, PIL or not.
    rows = [(1, "image", bytearray(png), "mem://t/1"),
            (2, "image", bytearray(make_png(33, 77)), "mem://t/2")]
    if not pil_available():
        # header-only GIF: probe-parseable, but not a decodable payload
        # — only routed to the probe path (PIL would rightly reject it)
        rows.append((3, "image", bytearray(gif), "mem://t/3"))
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, content binary, source_uri string",
    )
    feats = {r["media_id"]: r for r in
             extract_image_features(media, fake_decode=False).collect()}
    assert (feats[1]["width"], feats[1]["height"], feats[1]["channels"]) == (200, 100, 3)
    assert (feats[2]["width"], feats[2]["height"]) == (33, 77)
    if not pil_available():
        # GIF dims come from the header even though no codec exists...
        assert (feats[3]["width"], feats[3]["height"], feats[3]["channels"]) == (320, 240, 1)
        return
    # ...and with PIL present, resize (true pixel decode) round-trips.
    resized = resize_images(media.where("media_id = 1"), max_side=50,
                            fake_decode=False).collect()
    assert max(resized[0]["width"], resized[0]["height"]) == 50


def test_audio_real_wav_probe(spark):
    """Real (non-fake) audio path: stdlib wave parses genuine PCM16
    RIFF payloads — duration/rate/channels come from the header, not
    the fake formula; non-RIFF bytes raise loudly."""
    import io
    import struct
    import wave

    import pytest

    from lakehouse_file_format_compare_spark.ext.multimodal import (
        extract_audio_features,
        probe_wav,
    )

    def make_wav(rate, channels, n_frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(struct.pack(
                f"<{n_frames * channels}h",
                *((i % 30000) - 15000 for i in range(n_frames * channels)),
            ))
        return buf.getvalue()

    cases = [(1, 8000, 1, 4000), (2, 44100, 2, 22050), (3, 16000, 1, 16000)]
    media = spark.createDataFrame(
        [(mid, "audio", bytearray(make_wav(r, c, n)), f"mem://wav/{mid}")
         for mid, r, c, n in cases],
        "media_id long, media_type string, content binary, source_uri string",
    )
    feats = {r["media_id"]: r for r in
             extract_audio_features(media, fake_decode=False).collect()}
    for mid, rate, channels, n_frames in cases:
        r = feats[mid]
        assert r["sample_rate"] == rate
        assert r["n_channels"] == channels
        assert r["duration_ms"] == n_frames * 1000 // rate
    # driver-side probe agrees with the distributed path
    blob = make_wav(8000, 1, 4000)
    assert probe_wav(blob) == (500, 8000, 1)
    with pytest.raises(NotImplementedError):
        probe_wav(b"\xffID3 not riff")


def test_encoding_noise_score(spark):
    """Mojibake detection: UTF-8-as-cp1252/Latin-1 digraphs, C1
    controls, and U+FFFD all count; clean prose scores 0. Cross-checked
    against DuckDB running the same RE2 pattern."""
    import duckdb

    from lakehouse_file_format_compare_spark.functions.text import (
        ENCODING_NOISE_RE,
        encoding_noise_count,
        encoding_noise_score,
    )

    rows = [
        (1, "clean plain prose with no artifacts"),
        (2, "cafÃ© menu"),                      # "café" double-encoded
        (3, "itâ€™s broken"),              # cp1252 right-quote mojibake
        (4, "bad byte � here � twice"),
        (5, "nbspÂ glued"),                     # Â + NBSP
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    from pyspark.sql import functions as FF

    got = {
        r["id"]: (r["c"], r["s"])
        for r in df.select(
            "id",
            encoding_noise_count(FF.col("text")).alias("c"),
            encoding_noise_score(FF.col("text")).alias("s"),
        ).collect()
    }
    assert got[1] == (0, 0.0)
    assert got[2][0] >= 1 and got[3][0] >= 1 and got[5][0] >= 1
    assert got[4][0] == 2
    assert got[6] == (0, 0.0)
    for i in (2, 3, 4, 5):
        assert got[i][1] > 0

    con = duckdb.connect()
    for i, text in rows:
        want = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, ENCODING_NOISE_RE]
        ).fetchone()[0]
        assert got[i][0] == want, (i, got[i][0], want)
    con.close()


def test_knn_pq_recall_vs_bruteforce(spark):
    """PQ + exact re-rank: recall pinned vs the float brute force;
    emitted cosines are exact (verified-candidate contract), and the
    codebooks/codes are deterministic."""
    import lakehouse_file_format_compare_spark.operators.similarity as SS

    emb = table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    K = 5
    exact = {}
    for r in SS.knn_bruteforce(queries, emb, k=K).collect():
        exact.setdefault(r.query_id, {})[r.neighbor_id] = r.cosine
    books = SS.train_pq_codebooks(emb, m=8, ks=16)
    assert books == SS.train_pq_codebooks(emb, m=8, ks=16)  # deterministic
    got = SS.knn_pq(queries, emb, codebooks=books, k=K, refine=4).collect()
    hit = sum(1 for r in got if r.neighbor_id in exact.get(r.query_id, {}))
    recall = hit / sum(len(v) for v in exact.values())
    assert recall >= 0.6, f"PQ recall@{K} = {recall:.3f}"
    # scores on true hits are the exact cosine, bit-for-bit
    for r in got:
        if r.neighbor_id in exact.get(r.query_id, {}):
            assert r.cosine == exact[r.query_id][r.neighbor_id]


def test_knn_pq_hot_path_is_jvm(spark):
    """Only the bounded query-side LUT/encode stages use Arrow; the
    |Q|x|C| ADC scan itself is a JVM aggregate (no Python eval above
    the cross join in the plan tree)."""
    import lakehouse_file_format_compare_spark.operators.similarity as SS

    emb = table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    plan = (
        SS.knn_pq(queries, emb, k=3)
        ._sc._jvm.PythonSQLUtils.explainString(
            SS.knn_pq(queries, emb, k=3)._jdf.queryExecution(), "formatted"
        )
    )
    # Arrow appears only for the per-row-bounded stages (query LUT +
    # corpus encode; each may print twice with subtree reuse) — never
    # row-at-a-time Python, and the ADC aggregate itself is codegen
    assert 1 <= plan.count("ArrowEvalPython") <= 4
    assert "BatchEvalPython" not in plan
    assert "aggregate(" in plan  # the ADC fold is a JVM higher-order fn


def test_knn_ivf_pq_recall_vs_bruteforce(spark):
    """The composed IVF-PQ path (probe lists, ADC-score inside them,
    exact re-rank): recall vs brute force with both dials at moderate
    settings; scores on true hits bit-equal to the float baseline."""
    import lakehouse_file_format_compare_spark.operators.similarity as SS

    emb = table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    K = 5
    exact = {}
    for r in SS.knn_bruteforce(queries, emb, k=K).collect():
        exact.setdefault(r.query_id, {})[r.neighbor_id] = r.cosine
    got = SS.knn_ivf_pq(queries, emb, k=K, n_lists=16, nprobe=6, refine=4).collect()
    hit = sum(1 for r in got if r.neighbor_id in exact.get(r.query_id, {}))
    recall = hit / sum(len(v) for v in exact.values())
    assert recall >= 0.5, f"IVF-PQ recall@{K} = {recall:.3f}"
    for r in got:
        if r.neighbor_id in exact.get(r.query_id, {}):
            assert r.cosine == exact[r.query_id][r.neighbor_id]
