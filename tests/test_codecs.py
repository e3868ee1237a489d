import numpy as np
import pytest

from newscrawler_ray import codecs


def _img(seed=0, h=32, w=48):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["ppm", "png"])
def test_lossless_roundtrip(fmt):
    img = _img()
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    np.testing.assert_array_equal(img, out)


def test_qnt_lossy_psnr_above_40():
    img = _img(1)
    out = codecs.decode(codecs.encode(img, "qnt"), "qnt")
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 40.0
    assert not np.array_equal(img, out)  # genuinely lossy


def test_psnr_identity_inf():
    img = _img(2)
    assert codecs.psnr(img, img) == float("inf")


def test_png_decode_handles_up_filter():
    # hand-build a 2x2 PNG using filter type 2 (Up) on the second row
    import struct
    import zlib

    img = np.array([[[10, 20, 30], [40, 50, 60]], [[15, 25, 35], [45, 55, 65]]], np.uint8)
    row0 = bytes([0]) + img[0].tobytes()
    delta = (img[1].astype(np.int32) - img[0].astype(np.int32)) % 256
    row1 = bytes([2]) + delta.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(row0 + row1))
        + codecs._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_phash_deterministic_and_near_dup_equal():
    a = _img(3)
    assert codecs.phash64(a) == codecs.phash64(a.copy())
    b = _img(4)
    assert codecs.phash64(a) != codecs.phash64(b)  # overwhelmingly likely
    # qnt-level noise should not move the average hash
    noisy = np.clip(a.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    ha, hn = np.uint64(codecs.phash64(a)), np.uint64(codecs.phash64(noisy))
    assert bin(int(ha ^ hn)).count("1") <= 6
