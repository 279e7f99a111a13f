"""Image IO round-trips: every format write_image emits must read back
bit-exactly through read_image (the read-back half of the reference's
save-then-reload display loop, Game.cpp:164-183)."""

import struct
import zlib

import numpy as np
import pytest

from win32_raytracer_tpu.io.image import (
    encode_png, read_image, read_png, write_image)


def _test_img(h=13, w=17, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ext", [".bmp", ".png", ".ppm"])
def test_write_read_roundtrip(ext, tmp_path):
    img = _test_img()
    path = str(tmp_path / f"rt{ext}")
    write_image(path, img)                 # native encoder when built
    np.testing.assert_array_equal(read_image(path), img)


def test_read_png_all_filters(tmp_path):
    """The reader must handle filtered scanlines (Sub/Up/Average/Paeth),
    not just this module's filter-0 output — synthesize one row of each
    filter type from a known image and check exact recovery."""
    img = _test_img(h=5, w=7, seed=9)
    h, w, _ = img.shape
    flat = img.reshape(h, w * 3).astype(np.int32)
    rows = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * 3, np.int32)
        enc = np.zeros(w * 3, np.int32)
        for x in range(w * 3):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    buf = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    path = tmp_path / "filtered.png"
    path.write_bytes(buf)
    np.testing.assert_array_equal(read_png(str(path)), img)


def test_read_png_rejects_unsupported(tmp_path):
    img = _test_img(h=3, w=3)
    buf = bytearray(encode_png(img))
    buf[8 + 8 + 9] = 6                     # IHDR color type -> RGBA
    # fix the IHDR crc so the reader reaches the format check
    ihdr = bytes(buf[8 + 4:8 + 4 + 4 + 13])
    buf[8 + 8 + 13:8 + 8 + 17] = struct.pack(
        ">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    path = tmp_path / "rgba.png"
    path.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="only 8-bit RGB"):
        read_png(str(path))


def test_read_image_rejects_garbage(tmp_path):
    path = tmp_path / "noise.bin"
    path.write_bytes(b"\x00\x01\x02\x03\x04\x05\x06\x07")
    with pytest.raises(ValueError, match="unrecognized"):
        read_image(str(path))
