"""Pure numpy + stdlib image codecs for the image+caption payload table.

The input table (BASELINE.json ``input_hint``) carries encoded image bytes in
a ``binary`` column with a ``fmt`` tag. No Pillow / imageio in the sandbox,
so the codecs are self-contained:

  ``ppm`` — binary PPM (P6), lossless, zero-dependency.
  ``png`` — real PNG (8-bit RGB, zlib DEFLATE), lossless. Encoder always
            emits filter 0; decoder handles filter types 0-4.
  ``qnt`` — 6-bit/channel uniform quantization, lossy. Reconstruction error
            is bounded (step 4, midpoint reconstruction) so PSNR >= 40 dB,
            exercising the lossy branch of the per-row invariant
            (decoded-pixel PSNR>=40dB; see BASELINE.md correctness gate).

All functions take/return ``numpy.uint8`` arrays of shape ``(h, w, 3)``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens
    idx, tokens = 2, []
    while len(tokens) < 3:
        while idx < len(data) and data[idx : idx + 1].isspace():
            idx += 1
        if data[idx : idx + 1] == b"#":  # comment line
            idx = data.index(b"\n", idx) + 1
            continue
        start = idx
        while idx < len(data) and not data[idx : idx + 1].isspace():
            idx += 1
        tokens.append(int(data[start:idx]))
    idx += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=idx).reshape(
        h, w, 3
    )


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    idx = len(_PNG_SIG)
    w = h = None
    idat = b""
    while idx < len(data):
        (length,) = struct.unpack_from(">I", data, idx)
        tag = data[idx + 4 : idx + 8]
        payload = data[idx + 8 : idx + 8 + length]
        idx += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, w * 3), dtype=np.int32)
    bpp = 3
    for y in range(h):
        f = filters[y]
        cur = lines[y]
        prev = out[y - 1] if y > 0 else np.zeros(w * 3, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left-to-right scan
            row = out[y]
            for x in range(w * 3):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:
                    row[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    row[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pcv = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pcv) else (b if pb <= pcv else cc)
                    row[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------- QNT (lossy)

_QNT_MAGIC = b"QNT1"
_QNT_SHIFT = 2  # 6 bits/channel -> max abs error 2 -> PSNR ~ 46 dB


def encode_qnt(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    q = (img >> _QNT_SHIFT).astype(np.uint8)
    return _QNT_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qnt(data: bytes) -> np.ndarray:
    if not data.startswith(_QNT_MAGIC):
        raise ValueError("not QNT")
    w, h = struct.unpack_from(">II", data, 4)
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8)
    img = (q.astype(np.uint16) << _QNT_SHIFT) + (1 << (_QNT_SHIFT - 1))
    return np.minimum(img, 255).astype(np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------- WAV (audio)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """RIFF/WAVE, PCM 16-bit mono — real, zero-dependency audio codec."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 mono samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    idx = 12
    sample_rate = None
    samples = None
    while idx + 8 <= len(data):
        tag = data[idx : idx + 4]
        (size,) = struct.unpack_from("<I", data, idx + 4)
        body = data[idx + 8 : idx + 8 + size]
        if tag == b"fmt ":
            fmt_code, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM 16-bit mono supported")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        idx += 8 + size + (size & 1)
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sample_rate


# ---------------------------------------------------------------- RVID (video)

_RVID_MAGIC = b"RVD1"
_RVID_HDR = struct.Struct("<4sIHHH")  # magic, n_frames, h, w, fps


def encode_rvid(frames: np.ndarray, fps: int = 30) -> bytes:
    """Raw-video container: fixed header + concatenated RGB24 frames.

    The sandbox's ffmpeg stand-in (real mp4/webm decode stays behind the
    documented external-codec stub). Frames are stored uncompressed at
    fixed stride, so frame k lives at ``hdr + k*h*w*3`` — the seekable
    layout that lets frame sampling read ONLY the sampled frames, the
    property keyframe extraction relies on in real containers."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return _RVID_HDR.pack(_RVID_MAGIC, n, h, w, fps) + frames.tobytes()


def rvid_info(data: bytes) -> tuple[int, int, int, int]:
    """-> (n_frames, h, w, fps) from the header alone (no frame reads)."""
    magic, n, h, w, fps = _RVID_HDR.unpack_from(data)
    if magic != _RVID_MAGIC:
        raise ValueError("not an RVD1 stream")
    return n, h, w, fps


def decode_rvid_frames(data: bytes, idx: np.ndarray) -> np.ndarray:
    """Seek-decode only frames ``idx`` -> (len(idx), h, w, 3) uint8.

    A zero-copy view over the payload buffer, then one fancy-index gather
    of the requested frames — sampling cost is proportional to frames
    KEPT, not video length."""
    n, h, w, _ = rvid_info(data)
    idx = np.asarray(idx, dtype=np.int64)
    if idx.size and (idx.min() < 0 or idx.max() >= n):
        raise IndexError(f"frame index out of range 0..{n - 1}")
    all_frames = np.frombuffer(
        data, dtype=np.uint8, count=n * h * w * 3, offset=_RVID_HDR.size
    ).reshape(n, h, w, 3)
    return all_frames[idx]


def decode_rvid(data: bytes) -> tuple[np.ndarray, int]:
    """-> (frames (n,h,w,3) uint8, fps)."""
    n, _, _, fps = rvid_info(data)
    return decode_rvid_frames(data, np.arange(n, dtype=np.int64)), fps


# ---------------------------------------------------------------- dispatch

_ENCODERS = {"ppm": encode_ppm, "png": encode_png, "qnt": encode_qnt}
_DECODERS = {"ppm": decode_ppm, "png": decode_png, "qnt": decode_qnt}
LOSSLESS_FMTS = frozenset({"ppm", "png"})


def encode(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


# ---------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(img: np.ndarray) -> int:
    """Average-hash over an 8x8 block-mean downsample -> signed int64.

    Analog of the reference's exact-URL dedup key, lifted to image payloads
    (SURVEY.md D5): identical/near-identical pixels map to the same hash, so
    near-dup grouping is ``groupby('phash')``.
    """
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # block-mean resize to 8x8: pixel i -> block (i*8)//h, i.e. contiguous
    # runs starting at ceil(b*h/8) — reduceat over run starts (vectorized;
    # same partition and exact integer sums as an index-binned scatter)
    ys = (np.arange(8) * h + 7) // 8
    xs = (np.arange(8) * w + 7) // 8
    rows = np.add.reduceat(gray, ys, axis=0)
    small = np.add.reduceat(rows, xs, axis=1)
    counts = np.outer(
        np.diff(np.append(ys, h)), np.diff(np.append(xs, w))
    ).astype(np.float64)
    small /= np.maximum(counts, 1)
    bits = (small > small.mean()).flatten()
    val = np.sum(bits.astype(np.uint64) << np.arange(64, dtype=np.uint64))
    return int(val.astype(np.int64))


def phash64_batch(frames: np.ndarray) -> np.ndarray:
    """``phash64`` over a stack of same-shape frames ``(n, h, w, 3)`` ->
    int64[n], bit-identical to the scalar function per frame (same
    reduceat block partition, same mean threshold, same bit order) —
    the vectorized form frame sampling feeds, where every sampled frame
    of a video shares one shape."""
    n, h, w, _ = frames.shape
    gray = frames.astype(np.float64).mean(axis=3)
    ys = (np.arange(8) * h + 7) // 8
    xs = (np.arange(8) * w + 7) // 8
    rows = np.add.reduceat(gray, ys, axis=1)
    small = np.add.reduceat(rows, xs, axis=2)
    counts = np.outer(
        np.diff(np.append(ys, h)), np.diff(np.append(xs, w))
    ).astype(np.float64)
    small /= np.maximum(counts, 1)
    bits = small > small.mean(axis=(1, 2), keepdims=True)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    vals = (bits.reshape(n, 64).astype(np.uint64) * weights).sum(axis=1)
    return vals.astype(np.uint64).view(np.int64)
