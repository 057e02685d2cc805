"""Sample-data decode tests: WAV 16-bit PCM and 24-bit BMP round-trip
through decode_samples with no media library (the F10 de-stub). The
compressed formats (PNG/AVI) still raise — asserted so the stub boundary
is pinned."""

import struct

import numpy as np
import pytest

from pcompress_spark.analysis import multimodal as M


def test_wav_pcm_roundtrip_mono():
    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype="<i2")
    wav = M.build_wav(len(samples), samples.tobytes())
    out = M.decode_samples(wav)
    assert out.shape == (6, 1)
    assert np.array_equal(out.reshape(-1), samples)


def test_wav_pcm_truncated_payload_decodes_prefix():
    # declares 10 frames but carries only 7 bytes -> 3 whole frames
    samples = np.array([100, -200, 300], dtype="<i2")
    wav = M.build_wav(10, samples.tobytes() + b"\x7f")
    out = M.decode_samples(wav)
    assert np.array_equal(out.reshape(-1), samples)


def test_wav_pcm_stereo_frames():
    # hand-build a stereo fmt chunk: 2 channels, block_align 4
    pcm = np.array([[1, 2], [3, 4], [5, 6]], dtype="<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 16000 * 4, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out = M.decode_samples(wav)
    assert out.shape == (3, 2)
    assert np.array_equal(out, pcm)


def test_bmp_roundtrip_odd_width():
    # w=3 -> 9-byte rows padded to 12; exercises stride + BGR + flip
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    out = M.decode_samples(M.build_bmp(px))
    assert out.shape == (5, 3, 3)
    assert np.array_equal(out, px)


def test_compressed_formats_still_raise():
    png = M.build_png(8, 8, b"notrealidat")
    avi = M.build_avi(8, 8, 2, b"frames")
    for payload in (png, avi):
        with pytest.raises(NotImplementedError):
            M.decode_samples(payload)


def test_non_pcm_wav_raises():
    # fmt tag 3 (IEEE float) must refuse, not mis-decode
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 8) + b"\x00" * 8
    )
    with pytest.raises(NotImplementedError):
        M.decode_samples(wav)
