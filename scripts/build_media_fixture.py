"""Materialize fixtures/media_images.parquet: a committed corpus of
REAL image payloads (fully valid PNG and BMP files built with stdlib
``zlib``/``struct`` alone — decodable by any conformant codec) so the
``mm_image_features`` driver row exercises the REAL header probe
(ext/multimodal.py::probe_image) end to end, with a full DuckDB value
oracle that independently re-parses the same bytes (r5 verdict #2:
the one driver-visible multimodal row previously ran the fake
decoder).

The payloads are sf-independent (media bytes don't scale with the
TPC-H scale factor) and committed, mirroring the fintech silver
fixture pattern (scripts/build_fintech_fixtures.py): both engines
read identical bytes, so the comparison is two independent header
parsers over real files, not a formula both sides assume.

Kinds (media_id % 3):
  0 -> PNG, 8-bit RGB  (color type 2, 3 channels)
  1 -> PNG, 8-bit RGBA (color type 6, 4 channels)
  2 -> BMP, 24bpp bottom-up (3 channels)

Dimensions vary per row (coprime strides over id); pixel contents are
id-seeded so every sha256 differs. GIF/JPEG branches of the probe
remain covered by tests/test_ext.py::test_image_header_probe (a fully
valid GIF needs an LZW encoder and a fully valid JPEG a DCT encoder —
out of scope for an honest committed fixture).

Run from the repo root: python scripts/build_media_fixture.py
"""

from __future__ import annotations

import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

N_ROWS = 500
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media_images.parquet")


def make_png(width: int, height: int, media_id: int, rgba: bool) -> bytes:
    """Fully valid PNG (same construction as tests/test_ext.py::make_png,
    extended with the RGBA color type)."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    color_type = 6 if rgba else 2
    bpp = 4 if rgba else 3
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    rows = []
    for y in range(height):
        row = bytearray([0])  # filter type 0 (None)
        for x in range(width):
            row.append((x * 3 + y * 5 + media_id) % 256)
            row.append((x * 7 + y + media_id * 11) % 256)
            row.append((x + y * 13 + media_id * 17) % 256)
            if rgba:
                row.append((x * 2 + y * 3 + media_id * 5) % 256)
        rows.append(bytes(row))
    raw = b"".join(rows)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def make_bmp(width: int, height: int, media_id: int) -> bytes:
    """Fully valid 24bpp bottom-up BMP (BITMAPINFOHEADER)."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    pixel_data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up row order
        for x in range(width):
            pixel_data += bytes([
                (x + y * 13 + media_id * 17) % 256,   # B
                (x * 7 + y + media_id * 11) % 256,    # G
                (x * 3 + y * 5 + media_id) % 256,     # R
            ])
        pixel_data += b"\x00" * pad
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    file_size = 14 + 40 + len(pixel_data)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, 14 + 40)
    return header + info + bytes(pixel_data)


def build_rows() -> tuple[list[int], list[str], list[bytes], list[str]]:
    ids, types, contents, uris = [], [], [], []
    for media_id in range(1, N_ROWS + 1):
        w = 4 + (media_id * 7) % 47
        h = 3 + (media_id * 11) % 43
        kind = media_id % 3
        if kind == 0:
            blob = make_png(w, h, media_id, rgba=False)
            ext = "png"
        elif kind == 1:
            blob = make_png(w, h, media_id, rgba=True)
            ext = "png"
        else:
            blob = make_bmp(w, h, media_id)
            ext = "bmp"
        ids.append(media_id)
        types.append("image")
        contents.append(blob)
        uris.append(f"mem://media/{media_id}.{ext}")
    return ids, types, contents, uris


def main() -> None:
    ids, types, contents, uris = build_rows()
    table = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "content": pa.array(contents, pa.binary()),
        "source_uri": pa.array(uris, pa.string()),
    })
    out = os.path.abspath(OUT)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out, compression="zstd")
    total = sum(len(c) for c in contents)
    print(f"wrote {out}: {len(ids)} rows, {total} payload bytes")


if __name__ == "__main__":
    main()
