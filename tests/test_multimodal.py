"""Multimodal decode: the real PNG path (dependency-free decoder) and
the FAKEIMG1 test container, both through the pure core and the
mapInPandas plumbing."""

import struct
import zlib

import numpy as np
import pytest

from contessa_spark.operators.multimodal import (
    decode_image_bytes,
    decode_images,
    fake_image_bytes,
)


def _png_encode(pixels: np.ndarray, color_type: int, filters) -> bytes:
    """Minimal test-side PNG writer: 8-bit, non-interlaced; one filter
    type per scanline (exercises every unfilter branch)."""
    h, w = pixels.shape[0], pixels.shape[1]
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    flat = pixels.reshape(h, w * channels).astype(np.int64)

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int64)
    for y in range(h):
        line = flat[y]
        f = filters[y % len(filters)]
        raw.append(f)
        left = np.concatenate([np.zeros(channels, dtype=np.int64), line[:-channels]]) if w * channels > channels else np.zeros_like(line)
        upleft = np.concatenate([np.zeros(channels, dtype=np.int64), prev[:-channels]]) if w * channels > channels else np.zeros_like(line)
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = line - pred
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (6, 4)])
def test_png_decode_all_filters(color_type, channels):
    rng = np.random.RandomState(3 + color_type)
    px = rng.randint(0, 256, size=(7, 5, channels), dtype=np.uint8)
    payload = _png_encode(px, color_type, filters=[0, 1, 2, 3, 4])
    d = decode_image_bytes(payload)
    assert d["ok"]
    assert (d["width"], d["height"]) == (5, 7)
    assert d["mean_byte"] == int(px.astype(np.int64).sum() // px.size)


def test_png_unsupported_depth_returns_dims_only():
    # 16-bit image: dims from IHDR, no pixel stats
    ihdr = struct.pack(">IIBBBBB", 9, 4, 16, 0, 0, 0, 0)
    body = b"IHDR" + ihdr
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )
    d = decode_image_bytes(payload)
    assert d == {"width": 9, "height": 4, "mean_byte": None, "ok": True}


def test_fake_container_still_decodes():
    d = decode_image_bytes(fake_image_bytes(32, 16, 7))
    assert (d["width"], d["height"], d["mean_byte"], d["ok"]) == (32, 16, 7, True)


def test_unknown_format_raises():
    # TIFF is deliberately undecoded (library swap-in point)
    with pytest.raises(NotImplementedError):
        decode_image_bytes(b"II*\x00" + b"\x00" * 32)


def test_decode_images_spark_path_with_png(spark):
    rng = np.random.RandomState(9)
    rows = []
    for i in range(8):
        px = rng.randint(0, 256, size=(4 + i, 3 + i, 3), dtype=np.uint8)
        rows.append((i, bytearray(_png_encode(px, 2, filters=[0, 1, 2, 3, 4])),
                     int(px.astype(np.int64).sum() // px.size)))
    df = spark.createDataFrame(
        [(r[0], bytes(r[1])) for r in rows], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in decode_images(df).collect()}
    for i, _, mean in rows:
        assert out[i]["ok"]
        assert (out[i]["width"], out[i]["height"]) == (3 + i, 4 + i)
        assert out[i]["mean_byte"] == mean


def _jpeg_bytes(width: int, height: int, progressive: bool = False) -> bytes:
    """Minimal structurally-valid JPEG prefix: SOI, APP0/JFIF, DQT,
    SOF0 (or SOF2), then SOS + EOI. No real entropy data needed for a
    dims parse."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof = (
        struct.pack(">BHH", 8, height, width)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    marker = b"\xff\xc2" if progressive else b"\xff\xc0"

    def seg(m, body):
        return m + struct.pack(">H", len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(b"\xff\xe0", app0)
        + seg(b"\xff\xdb", dqt)
        + seg(marker, sof)
        + seg(b"\xff\xda", b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
        + b"\xff\xd9"
    )


@pytest.mark.parametrize("progressive", [False, True])
def test_jpeg_dims_decode(progressive):
    d = decode_image_bytes(_jpeg_bytes(640, 480, progressive))
    assert d == {"width": 640, "height": 480, "mean_byte": None, "ok": True}


def test_jpeg_truncated_is_not_ok():
    d = decode_image_bytes(_jpeg_bytes(640, 480)[:6])  # cut before SOF
    assert d["ok"] is False and d["width"] is None


def test_decode_images_contains_corrupt_payloads(spark):
    """One truncated PNG / short blob must yield ok=False rows, never
    fail the job (ADVICE r2: per-record error containment)."""
    good_png = _png_encode(
        np.arange(12, dtype=np.uint8).reshape(2, 2, 3), 2, filters=[0]
    )
    truncated_png = good_png[:-8]  # cut inside IDAT/IEND
    # IDAT inflates to 10 bytes where the 4x4 RGB scanlines need 52 —
    # a truncated pixel stream (raises inside _decode_png, contained)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    ib = b"IHDR" + ihdr
    db = b"IDAT" + zlib.compress(b"\x00" * 10)
    short_idat = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + ib + struct.pack(">I", zlib.crc32(ib) & 0xFFFFFFFF)
        + struct.pack(">I", len(db) - 4) + db + struct.pack(">I", zlib.crc32(db) & 0xFFFFFFFF)
    )
    rows = [
        (1, bytes(good_png)),
        (2, bytes(truncated_png)),
        (3, bytes(short_idat)),
        (4, None),
        (5, bytes(_jpeg_bytes(33, 44))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_images(df).collect()}
    assert out[1]["ok"] and out[1]["width"] == 2
    assert out[3]["ok"] is False
    assert out[4]["ok"] is False
    assert out[5]["ok"] and (out[5]["width"], out[5]["height"]) == (33, 44)


def test_png_bomb_guard_skips_pixel_inflation():
    """A tiny payload declaring gigapixel dims must return dims without
    inflating (decompression-bomb guard)."""
    from contessa_spark.operators.multimodal import MAX_PNG_RAW_BYTES

    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    body = b"IHDR" + ihdr
    idat_body = b"IDAT" + zlib.compress(b"\x00" * 1000)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        + struct.pack(">I", len(idat_body) - 4) + idat_body
        + struct.pack(">I", zlib.crc32(idat_body) & 0xFFFFFFFF)
    )
    assert 100_000 * (100_000 * 3 + 1) > MAX_PNG_RAW_BYTES
    d = decode_image_bytes(payload)
    assert d == {"width": 100_000, "height": 100_000, "mean_byte": None, "ok": True}


def test_wav_decode_real_bytes():
    from contessa_spark.operators.multimodal import decode_wav_bytes, fake_wav_bytes

    d = decode_wav_bytes(fake_wav_bytes(16000, 2, 50, seed=3))
    assert d["ok"]
    assert (d["sample_rate"], d["n_channels"], d["bits_per_sample"]) == (16000, 2, 16)
    assert d["n_frames"] == 50
    assert d["duration_ms"] == round(50 / 16000 * 1000, 6)
    expect_mean = sum(abs(((k * 37 + 3) % 2048) - 1024) for k in range(100)) / 100
    assert d["mean_abs"] == round(expect_mean, 6)

    # malformed inputs are not ok, never raise
    assert decode_wav_bytes(b"RIFFxxxx") == decode_wav_bytes(None)
    assert decode_wav_bytes(b"RIFF\x00\x00\x00\x00WAVE")["ok"] is False
    truncated = fake_wav_bytes(8000, 1, 20, seed=1)[:30]
    assert decode_wav_bytes(truncated)["ok"] is False


def test_decode_audio_spark_path(spark):
    import pandas as pd

    from contessa_spark.operators.multimodal import decode_audio, fake_wav_bytes

    rows = [(1, fake_wav_bytes(8000, 1, 10, seed=1)), (2, b"not a wav"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert out[1]["ok"] and out[1]["n_frames"] == 10
    assert out[2]["ok"] is False
    assert out[3]["ok"] is False


def test_mp4_decode_real_bytes():
    from contessa_spark.operators.multimodal import decode_mp4_bytes, fake_mp4_bytes

    d = decode_mp4_bytes(fake_mp4_bytes(640, 360, 2500, timescale=1000))
    assert d == {
        "width": 640, "height": 360, "duration_ms": round(2500 / 1000 * 1000, 6),
        "timescale": 1000, "ok": True,
    }
    # malformed: no moov, truncated boxes, None
    assert decode_mp4_bytes(b"\x00\x00\x00\x08ftyp")["ok"] is False
    assert decode_mp4_bytes(fake_mp4_bytes(1, 1, 1)[:20])["ok"] is False
    assert decode_mp4_bytes(None)["ok"] is False
    # a box whose declared size exceeds payload must not loop/crash
    bomb = b"\x00\xff\xff\xffmoov" + b"\x00" * 16
    assert decode_mp4_bytes(bomb)["ok"] is False


def test_decode_video_spark_path(spark):
    from contessa_spark.operators.multimodal import decode_video, fake_mp4_bytes

    rows = [(1, fake_mp4_bytes(320, 240, 1234)), (2, b"junk"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_video(df).collect()}
    assert out[1]["ok"] and (out[1]["width"], out[1]["height"]) == (320, 240)
    assert out[2]["ok"] is False and out[3]["ok"] is False


def test_resize_png_real_roundtrip():
    """Resize is a REAL kernel now: decode → nearest-neighbor → re-
    encode; output decodes to the target dims and exact sampled
    pixels."""
    from contessa_spark.operators.multimodal import resize_png_bytes

    rng = np.random.RandomState(21)
    px = rng.randint(0, 256, size=(8, 6, 3), dtype=np.uint8)
    payload = _png_encode(px, 2, filters=[0, 1, 2, 3, 4])
    out = resize_png_bytes(payload, 3, 4)
    d = decode_image_bytes(out)
    assert d["ok"] and (d["width"], d["height"]) == (3, 4)
    # exact nearest-neighbor expectation
    yi = (np.arange(4) * 8) // 4
    xi = (np.arange(3) * 6) // 3
    expect = px[yi][:, xi]
    assert d["mean_byte"] == int(expect.astype(np.int64).sum() // expect.size)

    with pytest.raises(ValueError):
        resize_png_bytes(b"not png", 2, 2)


def test_resize_images_spark_path(spark):
    from contessa_spark.operators.multimodal import resize_images

    rng = np.random.RandomState(22)
    good = _png_encode(rng.randint(0, 256, size=(10, 10, 3), dtype=np.uint8), 2, filters=[0])
    rows = [(1, bytes(good)), (2, b"junk"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert out[1]["ok"]
    d = decode_image_bytes(bytes(out[1]["payload"]))
    assert (d["width"], d["height"]) == (4, 4)
    assert out[2]["ok"] is False and out[2]["payload"] is None
    assert out[3]["ok"] is False


def _riff_webp(chunk_id: bytes, body: bytes) -> bytes:
    import struct

    inner = b"WEBP" + chunk_id + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        inner += b"\x00"
    return b"RIFF" + struct.pack("<I", len(inner)) + inner


def test_webp_lossy_dims():
    import struct

    from contessa_spark.operators.multimodal import decode_image_bytes

    body = b"\x00\x01\x02" + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    got = decode_image_bytes(_riff_webp(b"VP8 ", body))
    assert (got["width"], got["height"], got["ok"]) == (640, 480, True)


def test_webp_lossless_dims():
    import struct

    from contessa_spark.operators.multimodal import decode_image_bytes

    w, h = 1023, 257
    bits = (w - 1) | ((h - 1) << 14)
    body = b"\x2f" + struct.pack("<I", bits)
    got = decode_image_bytes(_riff_webp(b"VP8L", body))
    assert (got["width"], got["height"], got["ok"]) == (w, h, True)


def test_webp_extended_canvas_dims():
    from contessa_spark.operators.multimodal import decode_image_bytes

    w, h = 16384, 9000  # beyond the 14-bit lossy limit: uint24 canvas
    body = b"\x00\x00\x00\x00" + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    got = decode_image_bytes(_riff_webp(b"VP8X", body))
    assert (got["width"], got["height"], got["ok"]) == (w, h, True)


def test_webp_malformed_not_ok():
    from contessa_spark.operators.multimodal import decode_image_bytes

    # bad VP8 start code
    body = b"\x00\x01\x02" + b"\xff\xff\xff" + b"\x00\x00\x00\x00"
    assert decode_image_bytes(_riff_webp(b"VP8 ", body))["ok"] is False
    # RIFF but not WEBP form falls through to NotImplementedError
    import pytest
    import struct

    wav_ish = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    with pytest.raises(NotImplementedError):
        decode_image_bytes(wav_ish)


def test_gif_dims():
    import struct

    from contessa_spark.operators.multimodal import decode_image_bytes

    for sig in (b"GIF87a", b"GIF89a"):
        payload = sig + struct.pack("<HH", 320, 200) + b"\x00\x00"
        got = decode_image_bytes(payload)
        assert (got["width"], got["height"], got["ok"]) == (320, 200, True)
    assert decode_image_bytes(b"GIF89a\x01")["ok"] is False


def test_bmp_dims():
    import struct

    from contessa_spark.operators.multimodal import decode_image_bytes

    def bmp(hdr_size, w, h, fmt):
        body = struct.pack("<I", hdr_size) + struct.pack(fmt, w, h)
        return b"BM" + b"\x00" * 12 + body + b"\x00" * 8

    got = decode_image_bytes(bmp(40, 800, 600, "<ii"))
    assert (got["width"], got["height"], got["ok"]) == (800, 600, True)
    # top-down DIB: negative height reported as magnitude
    got = decode_image_bytes(bmp(40, 800, -600, "<ii"))
    assert (got["width"], got["height"], got["ok"]) == (800, 600, True)
    # legacy core header: uint16 fields
    got = decode_image_bytes(bmp(12, 64, 48, "<HH"))
    assert (got["width"], got["height"], got["ok"]) == (64, 48, True)
    assert decode_image_bytes(b"BM\x00\x00")["ok"] is False


def test_bmp_pixel_mean_real_bytes():
    """24-bit BI_RGB pixel statistics: mean over the 3·w pixel bytes
    per row, excluding the 4-byte row padding; other depths and
    truncated payloads fall back to dims-only."""
    import struct

    from contessa_spark.operators.multimodal import decode_image_bytes

    def bmp24(w, h, rows):
        # rows: list of h lists of 3*w pixel byte values (bottom-up)
        row_stride = ((24 * w + 31) // 32) * 4
        off_bits = 14 + 40
        header = (
            b"BM"
            + struct.pack("<I", off_bits + row_stride * abs(h))
            + b"\x00" * 4
            + struct.pack("<I", off_bits)
            + struct.pack("<I", 40)
            + struct.pack("<ii", w, h)
            + struct.pack("<HH", 1, 24)
            + struct.pack("<I", 0)  # BI_RGB
            + b"\x00" * 20
        )
        body = b""
        for r in rows:
            pix = bytes(r)
            body += pix + b"\x00" * (row_stride - len(pix))
        return header + body

    # 3x2 image: pixel bytes 10 and 250 alternating; padding bytes are
    # ZERO and must NOT drag the mean down
    rows = [[10] * 9, [250] * 9]
    got = decode_image_bytes(bmp24(3, 2, rows))
    assert (got["width"], got["height"], got["ok"]) == (3, 2, True)
    assert got["mean_byte"] == (10 * 9 + 250 * 9) // 18  # = 130

    # top-down (negative height): same mean
    got = decode_image_bytes(bmp24(3, -2, rows))
    assert got["mean_byte"] == 130 and got["height"] == 2

    # truncated pixel array: dims survive, mean does not
    full = bmp24(3, 2, rows)
    got = decode_image_bytes(full[:-5])
    assert (got["width"], got["height"], got["ok"]) == (3, 2, True)
    assert got["mean_byte"] is None


def _gif_bytes(w, h, indices, palette, min_code, local_ct=False,
               interlace=False, codes=None):
    """Minimal GIF89a builder (test-only). LZW data uses the
    clear-code-spam 'uncompressed' encoding at a FIXED code width —
    deliberately independent of the decoder's dictionary-growth logic —
    unless explicit ``codes`` are given (for hand-worked growth cases).
    ``palette``: list of (r, g, b)."""
    import struct

    n = len(palette)
    ct = b"".join(bytes(c) for c in palette)
    ct += b"\x00" * (3 * ((2 << ((n - 1).bit_length() - 1 if n > 1 else 0)) - n))
    ct_bits = max(1, (n - 1).bit_length()) - 1  # field = log2(size)-1
    head = b"GIF89a" + struct.pack("<HH", w, h)
    if local_ct:
        head += struct.pack("<BBB", 0x00, 0, 0)  # no GCT
        img_packed = 0x80 | (0x40 if interlace else 0) | ct_bits
        desc = b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, img_packed) + ct
    else:
        head += struct.pack("<BBB", 0x80 | ct_bits, 0, 0) + ct
        desc = b"\x2C" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
    if codes is None:
        clear, end = 1 << min_code, (1 << min_code) + 1
        period = (1 << min_code) - 2  # stay below the width-bump point
        codes = [clear]
        cnt = 0
        for ix in indices:
            if cnt == period:
                codes.append(clear)
                cnt = 0
            codes.append(ix)
            cnt += 1
        codes.append(end)
    acc = nb = 0
    data = bytearray()
    for c in codes:
        acc |= c << nb
        nb += min_code + 1
        while nb >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        data.append(acc & 0xFF)
    lzw = bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = bytes(data[i : i + 255])
        lzw += bytes([len(chunk)]) + chunk
    lzw += b"\x00"
    return head + desc + lzw + b"\x3B"


def test_gif_pixel_mean_golden_1x1():
    """The canonical 43-byte 1×1 white GIF (spec-packed LZW: CLEAR,
    index 0, END inside '44 01') must decode to mean_byte 255."""
    from contessa_spark.operators.multimodal import decode_image_bytes

    payload = bytes.fromhex(
        "47494638396101000100800000ffffff000000"
        "21f90401000000002c00000000010001000002024401003b"
    )
    got = decode_image_bytes(payload)
    assert (got["width"], got["height"], got["ok"]) == (1, 1, True)
    assert got["mean_byte"] == 255


def test_gif_pixel_mean_real_bytes():
    from contessa_spark.operators.multimodal import decode_image_bytes

    palette = [(0, 0, 0), (30, 60, 90), (200, 100, 0), (255, 255, 255)]
    # 4x3 image, indices with all four colors
    idx = [0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2]
    want = sum(sum(palette[i]) for i in idx) // (3 * len(idx))
    for local_ct in (False, True):
        for interlace in (False, True):  # pixel SET stats ignore order
            got = decode_image_bytes(
                _gif_bytes(4, 3, idx, palette, 2,
                           local_ct=local_ct, interlace=interlace)
            )
            assert (got["width"], got["height"], got["ok"]) == (4, 3, True)
            assert got["mean_byte"] == want, (local_ct, interlace)
    # extension blocks before the image descriptor are skipped
    p = _gif_bytes(4, 3, idx, palette, 2)
    with_ext = p[:13 + 12] + b"\x21\xf9\x04\x01\x00\x00\x00\x00" + p[13 + 12:]
    assert decode_image_bytes(with_ext)["mean_byte"] == want


def test_gif_lzw_dictionary_growth_hand_worked():
    """Hand-computed LZW for pixels [0,0,0,0] at min_code 2: codes
    CLEAR,0,6,0,END where 6 is the KwKwK case ('00' referenced as it
    is defined) — exercises dictionary growth, which the clear-spam
    builder path deliberately never does."""
    from contessa_spark.operators.multimodal import decode_image_bytes

    palette = [(10, 10, 10), (0, 0, 0), (0, 0, 0), (0, 0, 0)]
    payload = _gif_bytes(4, 1, None, palette, 2, codes=[4, 0, 6, 0, 5])
    got = decode_image_bytes(payload)
    assert (got["width"], got["height"], got["ok"]) == (4, 1, True)
    assert got["mean_byte"] == 10


def test_gif_pixel_path_degrades_to_dims_only():
    from contessa_spark.operators.multimodal import decode_image_bytes

    palette = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    idx = [0, 1, 2, 3]
    full = _gif_bytes(2, 2, idx, palette, 2)
    # truncated LZW stream: fewer pixels than w*h
    short = _gif_bytes(2, 2, idx[:2], palette, 2)
    got = decode_image_bytes(short)
    assert (got["width"], got["height"], got["ok"]) == (2, 2, True)
    assert got["mean_byte"] is None
    # no color table at all
    no_ct = full[:10] + b"\x00" + full[11:]          # clear GCT flag
    no_ct = no_ct[:13] + no_ct[13 + 12:]             # drop the table
    got = decode_image_bytes(no_ct)
    assert got["ok"] is True and got["mean_byte"] is None
    # header-only payload (legacy dims-only case)
    import struct
    hdr = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00"
    got = decode_image_bytes(hdr)
    assert (got["width"], got["height"], got["ok"]) == (320, 200, True)
    assert got["mean_byte"] is None


def _encode_baseline_jpeg_gray(block_values, blocks_x, restart_interval=0):
    """Minimal BASELINE JPEG encoder (test-only): one grayscale
    component, Q[0..63]=1, DC-only blocks (every AC = 0 → immediate
    EOB). ``block_values`` are the target mean pixel values per 8×8
    block in scan order; DC coefficient = 8·(v−128) exactly.

    DC Huffman: categories 0..11 as canonical 4-bit codes.
    AC Huffman: single symbol EOB=0x00 with code '0'.
    """
    import struct

    blocks_y = (len(block_values) + blocks_x - 1) // blocks_x
    w, h = blocks_x * 8, blocks_y * 8

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dht_dc = seg(0xC4, bytes([0x00] + dc_counts + list(range(12))))
    dht_ac = seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0x00]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    # DC category codes: canonical len-4 codes 0000..1011; AC EOB: '0'
    bits = []

    def put(code, nbits):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def flush():
        while len(bits) % 8:
            bits.append(1)  # pad with 1s per spec
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        bits.clear()
        return bytes(out)

    entropy = b""
    pred = 0
    for bi, v in enumerate(block_values):
        if restart_interval and bi and bi % restart_interval == 0:
            entropy += flush() + bytes([0xFF, 0xD0 + ((bi // restart_interval - 1) % 8)])
            pred = 0
        dc = 8 * (v - 128)
        diff = dc - pred
        pred = dc
        s = diff.bit_length() if diff > 0 else (-diff).bit_length()
        put(s, 4)  # category symbol s has canonical code s (4 bits)
        if s:
            mag = diff if diff > 0 else diff + (1 << s) - 1
            put(mag, s)
        put(0, 1)  # AC EOB
    entropy += flush()
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos + entropy + b"\xff\xd9"
    )


def _encode_progressive_jpeg_gray(
    block_values, blocks_x, al=1, refine=True, with_ac_scan=True,
    restart_interval=0, second_component=None,
):
    """Minimal PROGRESSIVE (SOF2) JPEG encoder (test-only), DC scans
    only: a first DC scan at successive-approximation ``Al``, a dummy
    AC scan (the decoder must SKIP it by marker search), and per-bit
    DC refinement scans down to Al=0 when ``refine``. With
    ``second_component`` a 2-component interleaved MCU walk is
    emitted (both 1×1 sampling)."""
    import struct

    comps = [(1, block_values)]
    if second_component is not None:
        comps.append((2, second_component))
    blocks_y = (len(block_values) + blocks_x - 1) // blocks_x
    w, h = blocks_x * 8, blocks_y * 8

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, _ in comps:
        sof_body += bytes([cid, 0x11, 0])
    sof = seg(0xC2, sof_body)
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dht_dc = seg(0xC4, bytes([0x00] + dc_counts + list(range(12))))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""

    bits = []

    def put(code, nbits):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def flush():
        while len(bits) % 8:
            bits.append(1)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        bits.clear()
        return bytes(out)

    def dc_of(v):
        return 8 * (v - 128)

    def sos_header(ss, se, ah, a_l):
        body = bytes([len(comps)])
        for cid, _ in comps:
            body += bytes([cid, 0x00])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | a_l]))

    # ---- first DC scan (Ah=0, Al=al): interleaved over comps per MCU
    first = sos_header(0, 0, 0, al)
    entropy = b""
    preds = {cid: 0 for cid, _ in comps}
    nblocks = len(block_values)
    for bi in range(nblocks):
        if restart_interval and bi and bi % restart_interval == 0:
            entropy += flush() + bytes(
                [0xFF, 0xD0 + ((bi // restart_interval - 1) % 8)]
            )
            preds = {cid: 0 for cid, _ in comps}
        for cid, vals in comps:
            s_val = dc_of(vals[bi]) >> al  # arithmetic point transform
            diff = s_val - preds[cid]
            preds[cid] = s_val
            s = diff.bit_length() if diff > 0 else (-diff).bit_length()
            put(s, 4)
            if s:
                mag = diff if diff > 0 else diff + (1 << s) - 1
                put(mag, s)
    first += entropy + flush()

    # ---- dummy AC scan the decoder must skip (no 0xFF bytes inside)
    ac = b""
    if with_ac_scan:
        ac = sos_header(1, 63, 0, 0) + b"\x5a\x12\x34\x00\x77"

    # ---- DC refinement scans: one raw bit per block per component
    refines = b""
    if refine:
        for bit_pos in range(al - 1, -1, -1):
            refines += sos_header(0, 0, bit_pos + 1, bit_pos)
            for bi in range(nblocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    refines += flush() + bytes(
                        [0xFF, 0xD0 + ((bi // restart_interval - 1) % 8)]
                    )
                for cid, vals in comps:
                    put((dc_of(vals[bi]) >> bit_pos) & 1, 1)
            refines += flush()

    return b"\xff\xd8" + dqt + sof + dht_dc + dri + first + ac + refines + b"\xff\xd9"


def test_jpeg_progressive_dc_mean():
    """Progressive JPEGs get real DC-mean statistics: first DC scan +
    successive-approximation refinements reconstruct the exact DC
    values; the dummy AC scan in between must be skipped."""
    from contessa_spark.operators.multimodal import decode_image_bytes

    got = decode_image_bytes(_encode_progressive_jpeg_gray([200, 200], 2))
    assert (got["width"], got["height"], got["ok"]) == (16, 8, True)
    assert got["mean_byte"] == 200

    # refinement actually matters: DC coefficients are 8*(v-128), so
    # bits 0-2 are always zero — Al must reach past bit 3 (parity of
    # v-128) before truncation changes anything. Al=4 with odd v-128:
    vals = [101, 203, 55, 250]
    full = decode_image_bytes(
        _encode_progressive_jpeg_gray(vals, 2, al=4, refine=True)
    )
    assert full["mean_byte"] == sum(vals) // len(vals)
    trunc = decode_image_bytes(
        _encode_progressive_jpeg_gray(vals, 2, al=4, refine=False)
    )
    want_trunc = sum(
        min(255.0, max(0.0, ((8 * (v - 128) >> 4) << 4) / 8.0 + 128.0))
        for v in vals
    ) / len(vals)
    assert trunc["mean_byte"] == int(want_trunc)
    assert trunc["mean_byte"] != full["mean_byte"]

    # deeper approximation: two refinement scans
    got = decode_image_bytes(
        _encode_progressive_jpeg_gray([37, 251, 129, 64], 2, al=2)
    )
    assert got["mean_byte"] == (37 + 251 + 129 + 64) // 4

    # restart markers inside progressive DC scans
    got = decode_image_bytes(
        _encode_progressive_jpeg_gray([10, 20, 30, 40], 2, restart_interval=2)
    )
    assert got["mean_byte"] == 25


def test_jpeg_progressive_two_component_interleaved():
    from contessa_spark.operators.multimodal import decode_image_bytes

    a, b = [100, 200], [50, 150]
    got = decode_image_bytes(
        _encode_progressive_jpeg_gray(a, 2, al=1, second_component=b)
    )
    assert (got["width"], got["height"], got["ok"]) == (16, 8, True)
    assert got["mean_byte"] == (sum(a) + sum(b)) // 4


def test_jpeg_dc_mean_baseline_real_entropy_decode():
    """Baseline JPEG pixel statistics are REAL now: the entropy-coded
    scan is Huffman-decoded and mean_byte comes from the DC terms
    (exact for DC-only blocks)."""
    from contessa_spark.operators.multimodal import decode_image_bytes

    # constant gray 200, 2x1 blocks (16x8)
    got = decode_image_bytes(_encode_baseline_jpeg_gray([200, 200], 2))
    assert (got["width"], got["height"], got["ok"]) == (16, 8, True)
    assert got["mean_byte"] == 200

    # two-level image: mean of block means
    got = decode_image_bytes(_encode_baseline_jpeg_gray([100, 200], 2))
    assert got["mean_byte"] == 150

    # negative-diff path + 4-block square
    got = decode_image_bytes(_encode_baseline_jpeg_gray([50, 250, 50, 250], 2))
    assert (got["width"], got["height"]) == (16, 16)
    assert got["mean_byte"] == 150

    # restart markers: DC predictions reset per interval
    got = decode_image_bytes(
        _encode_baseline_jpeg_gray([10, 20, 30, 40], 2, restart_interval=2)
    )
    assert got["mean_byte"] == 25

    # truncated entropy data: dims survive, mean contained to None
    full = _encode_baseline_jpeg_gray([100, 200], 2)
    got = decode_image_bytes(full[: len(full) - 4])
    assert got["ok"] is True and (got["width"], got["height"]) == (16, 8)
    assert got["mean_byte"] is None
