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

Kinds (media_id % 4):
  0 -> PNG, 8-bit RGB  (color type 2, 3 channels)
  1 -> PNG, 8-bit RGBA (color type 6, 4 channels)
  2 -> BMP, 24bpp bottom-up (3 channels)
  3 -> GIF89a, 4-color palette, REAL LZW-compressed pixels (1 stored
       channel) — the from-scratch spec LZW encoder below is
       validated by a decoder round-trip AND by decoding a canonical
       public-domain 1x1 GIF (tests/test_ext.py)

Dimensions vary per row (coprime strides over id); pixel contents are
id-seeded so every sha256 differs. The JPEG branch of the probe
remains covered by tests/test_ext.py::test_image_header_probe (a
fully valid JPEG needs a DCT entropy coder — out of scope for an
honest committed fixture).

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


def gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW (variable code width, LSB-first packing,
    clear/end codes). The width-bump rule mirrors the decoder's —
    both sides grow the table in lockstep, so the size increments
    align (verified by the round-trip and canonical-GIF tests in
    tests/test_ext.py)."""
    clear = 1 << min_code_size
    end_c = clear + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end_c + 1
    code_size = min_code_size + 1
    bitbuf = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    w: tuple = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the encoder's table is ONE entry ahead of the decoder's
            # (it adds on emit; the decoder adds on the NEXT read), so
            # its width bump lands at (1<<size)+1 where the decoder's
            # lands at 1<<size — aligning the read width of every code
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = (k,)
    if w:
        emit(table[w])
    emit(end_c)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Reference GIF-LZW decoder (spec appendix algorithm) — used by
    the tests to round-trip the encoder and to decode a canonical
    public-domain 1x1 GIF, establishing the encoder's validity
    without any image library."""
    clear = 1 << min_code_size
    end_c = clear + 1
    pos = 0

    def read_code(size: int) -> int:
        nonlocal pos
        v = 0
        for i in range(size):
            byte, bit = divmod(pos, 8)
            if byte >= len(data):
                return end_c
            v |= ((data[byte] >> bit) & 1) << i
            pos += 1
        return v

    table: dict[int, list[int]] = {}
    code_size = min_code_size + 1
    next_code = end_c + 1
    prev: list[int] | None = None
    out: list[int] = []
    while True:
        code = read_code(code_size)
        if code == clear:
            table = {i: [i] for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end_c + 1
            prev = None
            continue
        if code == end_c:
            return out
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
        elif code == next_code:
            entry = prev + [prev[0]]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > next {next_code}")
        if prev is not None and next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        out.extend(entry)
        prev = entry


def make_gif(width: int, height: int, media_id: int) -> bytes:
    """Fully valid GIF89a: 4-color global palette, one image block,
    REAL LZW-compressed pixel indices (encoder above), trailer."""
    palette = bytes([
        10, 20, 30,
        200, 60, 60,
        60, 200, 60,
        60, 60, 200,
    ])
    indices = [(x + y + media_id) % 4 for y in range(height) for x in range(width)]
    lzw = gif_lzw_encode(indices, min_code_size=2)
    # logical screen descriptor: GCT flag=1, color resolution=1, size
    # field=1 -> 2^(1+1)=4 entries
    packed = 0b1_001_0_001
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height) + bytes([packed, 0, 0])
    out += palette
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes([2])  # LZW min code size
    for i in range(0, len(lzw), 255):  # data sub-blocks
        block = lzw[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


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
        kind = media_id % 4
        if kind == 0:
            blob = make_png(w, h, media_id, rgba=False)
            ext = "png"
        elif kind == 1:
            blob = make_png(w, h, media_id, rgba=True)
            ext = "png"
        elif kind == 2:
            blob = make_bmp(w, h, media_id)
            ext = "bmp"
        else:
            blob = make_gif(w, h, media_id)
            ext = "gif"
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
