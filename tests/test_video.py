"""Video container probes (ext/multimodal.py r9): REAL MP4 (ISO
BMFF box tree) and AVI (RIFF avih) metadata parsing with stdlib
struct, verified on spec-built fixtures with known ground truth —
the video analog of the PNG/GIF/BMP/WAV probe tests. Frame sampling
derives indices from PROBED frame counts, not payload size."""

from __future__ import annotations

import struct

import pytest

from lakehouse_file_format_compare_spark.ext.multimodal import (
    extract_video_features,
    frame_sample,
    probe_video,
)

# ---------------------------------------------------------------------------
# spec-built fixtures (ground truth known by construction)
# ---------------------------------------------------------------------------

_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mp4_trak(width: int, height: int, n_frames: int, handler: bytes) -> bytes:
    tkhd = _box(
        b"tkhd",
        bytes(4)                       # version/flags
        + struct.pack(">III", 0, 0, 1)  # ctime mtime track_id
        + bytes(4)                      # reserved
        + struct.pack(">I", 0)          # duration
        + bytes(8)                      # reserved
        + struct.pack(">HHHH", 0, 0, 0x0100, 0)  # layer/alt/volume/resv
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _box(
        b"mdhd",
        bytes(4) + struct.pack(">IIII", 0, 0, 1000, 0)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(
        b"hdlr",
        bytes(4) + bytes(4) + handler + bytes(12) + b"Handler\x00",
    )
    stts = _box(b"stts", bytes(4) + struct.pack(">III", 1, n_frames, 512))
    stsz = _box(b"stsz", bytes(4) + struct.pack(">II", 100, n_frames))
    stbl = _box(b"stbl", stts + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def build_mp4(
    width: int, height: int, n_frames: int,
    duration: int, timescale: int, with_audio_trak: bool = False,
) -> bytes:
    """Minimal but structurally valid ISO-BMFF file: ftyp + moov
    (mvhd + trak(tkhd + mdia(mdhd + hdlr + minf(stbl(stts + stsz)))))
    + mdat. Ground truth: duration_ms = duration*1000//timescale."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mvhd = _box(
        b"mvhd",
        bytes(4)                                     # version/flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)               # rate
        + struct.pack(">H", 0x0100) + bytes(10)       # volume + reserved
        + _MATRIX + bytes(24) + struct.pack(">I", 2),
    )
    traks = b""
    if with_audio_trak:  # audio FIRST: the probe must skip it
        traks += _mp4_trak(0, 0, 9999, b"soun")
    traks += _mp4_trak(width, height, n_frames, b"vide")
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", bytes(32))


def build_avi(
    width: int, height: int, n_frames: int, us_per_frame: int
) -> bytes:
    """Minimal RIFF AVI: LIST hdrl(avih) + LIST movi. Ground truth:
    duration_ms = n_frames*us_per_frame//1000."""
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# probe unit tests
# ---------------------------------------------------------------------------

def test_probe_mp4_exact():
    blob = build_mp4(1280, 720, 300, duration=10_000, timescale=1000)
    assert probe_video(blob) == ("mp4", 10_000, 1280, 720, 300)


def test_probe_mp4_skips_audio_trak():
    blob = build_mp4(640, 480, 120, duration=4_800, timescale=1200,
                     with_audio_trak=True)
    # duration 4800/1200 = 4s; video trak (NOT the audio one) wins
    assert probe_video(blob) == ("mp4", 4_000, 640, 480, 120)


def test_probe_mp4_v1_mvhd():
    # 64-bit duration variant: patch a v1 mvhd into the builder output
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mvhd = _box(
        b"mvhd",
        b"\x01" + bytes(3)
        + struct.pack(">QQIQ", 0, 0, 90_000, 90_000 * 7)  # 7 s at 90kHz
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100) + bytes(10)
        + _MATRIX + bytes(24) + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + _mp4_trak(320, 240, 42, b"vide"))
    assert probe_video(ftyp + moov) == ("mp4", 7_000, 320, 240, 42)


def test_probe_avi_exact():
    blob = build_avi(720, 576, 250, us_per_frame=40_000)  # 25 fps, 10 s
    assert probe_video(blob) == ("avi", 10_000, 720, 576, 250)


def test_probe_rejects_unknown_containers():
    with pytest.raises(NotImplementedError):
        probe_video(b"\x1a\x45\xdf\xa3" + bytes(64))  # matroska magic
    with pytest.raises(NotImplementedError):
        probe_video(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # wav, not avi
    with pytest.raises(NotImplementedError):
        probe_video(bytes(16))


# ---------------------------------------------------------------------------
# distributed path
# ---------------------------------------------------------------------------

def _media_frame(spark, blobs):
    return spark.createDataFrame(
        [(i, "video", bytearray(b), f"mem://video/{i}")
         for i, b in enumerate(blobs)],
        "media_id long, media_type string, content binary, source_uri string",
    )


def test_extract_video_features_real_probe_distributed(spark):
    import hashlib

    blobs = [
        build_mp4(1920, 1080, 600, duration=20_000, timescale=1000),
        build_avi(640, 360, 90, us_per_frame=33_333),
    ]
    media = _media_frame(spark, blobs).repartition(4)
    rows = {r["media_id"]: r for r in
            extract_video_features(media, fake_decode=False).collect()}
    assert rows[0]["container"] == "mp4"
    assert (rows[0]["duration_ms"], rows[0]["width"], rows[0]["height"],
            rows[0]["n_frames"]) == (20_000, 1920, 1080, 600)
    assert rows[1]["container"] == "avi"
    assert (rows[1]["duration_ms"], rows[1]["width"], rows[1]["height"],
            rows[1]["n_frames"]) == (90 * 33_333 // 1000, 640, 360, 90)
    for i, b in enumerate(blobs):
        assert rows[i]["n_bytes"] == len(b)
        assert rows[i]["content_sha256"] == hashlib.sha256(b).hexdigest()


def test_frame_sample_uses_probed_counts(spark):
    blob = build_mp4(320, 240, 100, duration=4_000, timescale=1000)
    media = _media_frame(spark, [blob])
    rows = sorted(
        (r["frame_index"], r["ts_ms"])
        for r in frame_sample(media, every_n=30, fake_decode=False).collect()
    )
    # 100 frames over 4000 ms -> 40 ms/frame; indices 0,30,60,90
    assert rows == [(0, 0), (30, 1200), (60, 2400), (90, 3600)]
    with pytest.raises(ValueError):
        frame_sample(media, every_n=0)


def test_fake_video_decode_is_deterministic(spark):
    media = _media_frame(spark, [b"not-a-container-%d" % i for i in range(8)])
    a = sorted(map(tuple, extract_video_features(media, fake_decode=True)
                   .collect()))
    b = sorted(map(tuple, extract_video_features(
        media.repartition(5), fake_decode=True).collect()))
    assert a == b and len(a) == 8
    # real probe on non-container bytes raises loudly, never fakes
    with pytest.raises(Exception):
        extract_video_features(media, fake_decode=False).collect()
