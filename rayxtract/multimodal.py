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
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_GEN_VERSION",
    "synthetic_media_batch",
    "media_corpus_root",
    "ensure_media_corpus",
    "DecodeImageBatch",
    "FrameSampleBatch",
    "ResizeImageBatch",
    "AudioFeatureBatch",
]

# bump when synthetic_media_batch output changes — the parquet cache key
MEDIA_GEN_VERSION = 1

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


def synthetic_media_batch(batch: pa.Table, seed: int = 5) -> pa.Table:
    """Deterministic media rows from an id column (map_batches over
    ``ray.data.range``): even ids get an "audio" clip (int16 PCM,
    seeded sine + noise), odd ids an "image" byte grid. Payload depends
    only on (seed, id) — parallelism-independent, like synth pages."""
    rows = []
    for mid in batch["id"].to_pylist():
        rng = np.random.RandomState(seed * 1_000_003 + mid)
        if mid % 2 == 0:
            n = int(rng.randint(2048, 16384))
            t = np.arange(n, dtype=np.float64)
            freq = rng.uniform(0.01, 0.2)
            sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.randn(n)
            pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
            rows.append(
                {"media_id": mid, "kind": "audio", "payload": pcm.tobytes(),
                 "width": 0, "height": 0, "n_frames": 0}
            )
        else:
            w = int(rng.randint(16, 96))
            h = int(rng.randint(16, 96))
            grid = rng.randint(0, 256, size=h * w).astype(np.uint8)
            rows.append(
                {"media_id": mid, "kind": "image", "payload": grid.tobytes(),
                 "width": w, "height": h, "n_frames": int(rng.randint(5, 40))}
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_corpus_root(n_media: int, seed: int = 5) -> str:
    """Cache path of the deterministic media corpus — the ONE place the
    cache key format lives (the DuckDB oracles resolve the same path
    through this function; duplicating the f-string would let the two
    sides silently diverge)."""
    from .synth import _CACHE_ROOT

    return os.path.join(
        _CACHE_ROOT, f"media_n{n_media}_s{seed}_v{MEDIA_GEN_VERSION}"
    )


def ensure_media_corpus(n_media: int, seed: int = 5) -> str:
    """Generate (once, cached) the deterministic media parquet dir — the
    SHARED input for the engine's media queries AND their DuckDB oracles
    (VERDICT r2 "What's missing" #4: oracle-able media plumbing needs both
    sides reading the same persisted table). Same tmp+marker+rename
    publish discipline as synth.ensure_corpus."""
    import shutil

    import ray.data

    root = media_corpus_root(n_media, seed)
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return root
    tmp = f"{root}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        ray.data.range(n_media, override_num_blocks=max(4, n_media // 500))
        .map_batches(
            lambda b: synthetic_media_batch(b, seed), batch_format="pyarrow"
        )
        .write_parquet(tmp)
    )
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, root)
    except OSError:  # lost a publish race — trust the winner
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(marker):
            raise RuntimeError(f"media corpus publish failed for {root}") from None
    return root


def _sql_parity_md5_obj(payload: bytes):
    """THE one definition of the DuckDB-parity digest recipe: DuckDB lacks
    md5(BLOB), but ``md5(hex(blob))`` exists — mirror it exactly
    (uppercase hex, then md5). Everything (features, payload_md5,
    resize grid digests) derives from this single helper."""
    return hashlib.md5(payload.hex().upper().encode("ascii"))


def sql_parity_md5(payload: bytes) -> str:
    return _sql_parity_md5_obj(payload).hexdigest()


class DecodeImageBatch:
    """Actor-pool decode/feature stage over binary image payloads.

    ``real=False`` (default): deterministic fake decode — 8 stable
    pseudo-features per payload derived from an md5 digest (md5 so the
    oracle side can recompute: DuckDB md5(hex(blob)) — VERDICT r2 next
    #5), plus byte length, crc32 and the SQL-parity md5 hex digest.
    ``real=True``: raises NotImplementedError until a codec library exists
    in the environment. ``id_col`` lets callers key by url instead of a
    synthetic media_id.
    """

    def __init__(self, real: bool = False, id_col: str = "media_id"):
        if real:
            raise NotImplementedError(
                "no image codec library in this environment; "
                "fake decode (real=False) exercises the full Ray plumbing"
            )
        self.real = real
        self.id_col = id_col

    @staticmethod
    def _md5(payload: bytes):
        return _sql_parity_md5_obj(payload)

    @classmethod
    def _fake_features(cls, payload: bytes) -> np.ndarray:
        return (
            np.frombuffer(cls._md5(payload).digest(), dtype=np.uint16)
            .astype(np.float64)
            / np.float64(2**16)
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads = batch["payload"].tolist()
        # ONE hex+md5 pass per payload (the hex string is 2x payload
        # bytes — doing it twice doubled the stage's transient allocation)
        digs = [self._md5(p) for p in payloads]
        feats = [
            np.frombuffer(d.digest(), dtype=np.uint16).astype(np.float64)
            / np.float64(2**16)
            for d in digs
        ]
        out = pd.DataFrame(
            {
                self.id_col: batch[self.id_col].values,
                "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                "crc": pd.Series(
                    [zlib.crc32(p) for p in payloads], dtype="int64"
                ),
                "payload_md5": pd.Series(
                    [d.hexdigest() for d in digs], dtype="object"
                ),
                "features": feats,  # list<double>[8]
            }
        )
        if self.id_col == "media_id":
            out["media_id"] = out["media_id"].astype("int64")
        return out


class ResizeImageBatch:
    """Actor-pool resize stage over raw byte-grid "images".

    The payload is interpreted as a row-major (height, width) uint8 grid
    (truncated/zero-padded to fit) and resampled nearest-neighbor to
    (target_h, target_w) — real vectorized array plumbing; only the
    container-format decode (PNG/JPEG) is environment-stubbed. Idempotence
    contract: resizing an already (target_h, target_w) grid is identity.
    Output: resized payload + new dims (MEDIA_SCHEMA-compatible columns).
    """

    def __init__(self, target_w: int = 32, target_h: int = 32, real: bool = False):
        if real:
            raise NotImplementedError(
                "no image codec library in this environment; raw byte-grid "
                "resize (real=False) exercises the full Ray plumbing"
            )
        self.tw = int(target_w)
        self.th = int(target_h)

    def _resize_one(self, payload: bytes, w: int, h: int) -> bytes:
        w = max(1, int(w))
        h = max(1, int(h))
        grid = np.zeros(h * w, dtype=np.uint8)
        src = np.frombuffer(payload[: h * w], dtype=np.uint8)
        grid[: len(src)] = src
        grid = grid.reshape(h, w)
        rows = (np.arange(self.th) * h) // self.th
        cols = (np.arange(self.tw) * w) // self.tw
        return grid[np.ix_(rows, cols)].tobytes()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        resized = [
            self._resize_one(p, w, h)
            for p, w, h in zip(batch["payload"], batch["width"], batch["height"])
        ]
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].astype("int64").values,
                "payload": pd.Series(resized, dtype="object"),
                "width": pd.Series([self.tw] * len(batch), dtype="int32"),
                "height": pd.Series([self.th] * len(batch), dtype="int32"),
            }
        )


class AudioFeatureBatch:
    """Actor-pool audio feature extraction over RAW PCM payloads — real
    DSP, not a stub: payloads are int16 little-endian mono PCM; per clip we
    frame the signal (``frame_len`` samples, no overlap) and compute
    per-frame RMS energy and zero-crossing rate, emitting clip-level
    aggregates plus the per-frame energy vector. Only a compressed-codec
    (mp3/ogg) decode would need an external library.
    """

    def __init__(self, frame_len: int = 512):
        self.frame_len = int(frame_len)

    def _features(self, payload: bytes) -> tuple[int, int, float, float, np.ndarray]:
        x = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2")
        n = len(x)
        if not n:
            return 0, 0, 0.0, 0.0, np.zeros(0, dtype=np.float64)
        xf = x.astype(np.float64) / 32768.0
        L = self.frame_len
        n_frames = max(1, n // L)
        trimmed = xf[: n_frames * L].reshape(n_frames, L)
        rms = np.sqrt((trimmed**2).mean(axis=1))
        zc = (np.diff(np.signbit(trimmed), axis=1) != 0).mean(axis=1)
        return n, n_frames, float(rms.mean()), float(zc.mean()), rms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"media_id": [], "n_samples": [], "n_frames": [],
               "rms_mean": [], "zcr_mean": [], "frame_rms": []}
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            n, n_fr, rms_m, zcr_m, rms = self._features(payload)
            out["media_id"].append(int(mid))
            out["n_samples"].append(n)
            out["n_frames"].append(n_fr)
            out["rms_mean"].append(rms_m)
            out["zcr_mean"].append(zcr_m)
            out["frame_rms"].append(rms)
        return pd.DataFrame(
            {
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                "n_frames": pd.Series(out["n_frames"], dtype="int64"),
                "rms_mean": pd.Series(out["rms_mean"], dtype="float64"),
                "zcr_mean": pd.Series(out["zcr_mean"], dtype="float64"),
                "frame_rms": out["frame_rms"],  # list<double> per clip
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
