"""Multimodal (image/audio/video) column plumbing — opaque binary payloads
with typed metadata, decoded/feature-extracted in actor-pool stages.

The container has no image/audio libraries, so the actual codec work is
STUBBED: ``DecodeImageBatch`` ships a deterministic fake decoder (stable
per-payload pseudo-features) and raises ``NotImplementedError`` when asked
for a real codec. Everything Ray-side — schema, batch sizing for large
binaries, actor signature, output layout — is real and tested, so swapping
in Pillow/librosa later touches only ``_decode_real``.

Batch-size guidance: multi-MB payloads need small ``batch_size`` (16-64) so
batch x concurrency stays inside worker heap (SURVEY.md §7.4 item 6).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "DecodeImageBatch", "FrameSampleBatch"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


class DecodeImageBatch:
    """Actor-pool decode/feature stage over binary image payloads.

    ``real=False`` (default): deterministic fake decode — 8 stable
    pseudo-features per payload derived from a blake2b digest, plus byte
    length and crc32. ``real=True``: raises NotImplementedError until a
    codec library exists in the environment.
    """

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "no image codec library in this environment; "
                "fake decode (real=False) exercises the full Ray plumbing"
            )
        self.real = real

    @staticmethod
    def _fake_features(payload: bytes) -> np.ndarray:
        d = hashlib.blake2b(payload, digest_size=32).digest()
        return (
            np.frombuffer(d, dtype=np.uint32).astype(np.float64)
            / np.float64(2**32)
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads = batch["payload"].tolist()
        feats = [self._fake_features(p) for p in payloads]
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].astype("int64").values,
                "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                "crc": pd.Series(
                    [zlib.crc32(p) for p in payloads], dtype="int64"
                ),
                "features": feats,  # list<double>[8]
            }
        )


class FrameSampleBatch:
    """Video frame-sampling plumbing: emits every ``stride``-th frame index
    with a per-frame payload slice digest (fake 'frame'); one output row per
    sampled frame — a flat_map-shaped expansion done batch-wise."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"media_id": [], "frame_no": [], "frame_digest": []}
        for mid, payload, n_frames in zip(
            batch["media_id"], batch["payload"], batch["n_frames"]
        ):
            for f in range(0, int(n_frames), self.stride):
                chunk = payload[f::max(1, int(n_frames))][:256]
                out["media_id"].append(int(mid))
                out["frame_no"].append(f)
                out["frame_digest"].append(
                    hashlib.blake2b(chunk, digest_size=8).hexdigest()
                )
        return pd.DataFrame(
            {
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "frame_no": pd.Series(out["frame_no"], dtype="int64"),
                "frame_digest": pd.Series(out["frame_digest"], dtype="object"),
            }
        )
