"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract is real and tested — schema, partition-preserving
`mapInPandas`, Arrow batch shapes, deterministic outputs. The actual media
decode (PIL/ffmpeg/soundfile) is NOT available in this container, so the
decode step is stubbed: `decode_features` computes deterministic
pseudo-features from the raw bytes (documented below), and `real_decode`
raises NotImplementedError until a media library is wired in. Swapping the
stub for a real decoder changes ONE function body, none of the plumbing.

Reference analog: the per-file-type content filters (PackJPG / WavPack /
PackPNM dispatch, /root/reference/archive/pc_arc_filter.c and
pcompress.c:207-402) — typed handling of opaque binary streams routed by
detected kind.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha_prefix string, "
    "width int, height int, n_frames int"
)


def real_decode(payload: bytes, kind: str) -> dict:
    """Real media decode — requires PIL/ffmpeg/soundfile, absent here."""
    raise NotImplementedError(
        "media decode libraries are not installed in this environment; "
        "decode_features uses the deterministic stub instead"
    )


def _stub_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake (width, height, n_frames) from byte length.

    Pure arithmetic on n_bytes so the DuckDB oracle can replicate it:
      width    = 32 + n_bytes % 608
      height   = 32 + (n_bytes * 7) % 448
      n_frames = 1 + n_bytes % 16
    """
    n = len(payload)
    return 32 + n % 608, 32 + (n * 7) % 448, 1 + n % 16


def decode_features(df: DataFrame, id_col: str, payload_col: str, kind_col) -> DataFrame:
    """(id, kind, payload binary) -> MEDIA_SCHEMA rows via mapInPandas.

    Partition-preserving (no shuffle); one Arrow batch in, one pandas frame
    out. sha_prefix is the first 16 hex chars of sha256(payload) — the
    identity key for media dedup, computed batch-side.
    """
    cols = df.select(
        F.col(id_col).alias("media_id"),
        kind_col.alias("kind"),
        F.col(payload_col).alias("payload"),
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [_stub_features(b if b is not None else b"") for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) if b is not None else 0 for b in payloads],
                    "sha_prefix": [
                        hashlib.sha256(b if b is not None else b"").hexdigest()[:16]
                        for b in payloads
                    ],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return cols.mapInPandas(_decode, schema=MEDIA_SCHEMA)
