"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns beside them (the Arrow-native replacement for the
reference's hex-sanitized binary handling, ``sanitizeData``,
``ethereum_service.go:317-325``, which is dropped — Arrow binary needs
no escaping).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the codec step is STUBBED: :class:`DecodeStage` does all the real
Ray-side work (actor-pool lifecycle, batch sizing for wide binary rows,
schema in/out) and calls a codec hook that is either the deterministic
fake (default — parses the fake payload header) or raises
``NotImplementedError`` when a real codec is requested. Swapping in a
real decoder is a one-function change; the distributed plumbing is
exercised by tests either way.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

_MAGIC = b"FAKEIMG1"


def make_fake_blob(seed_text: str, width: int, height: int) -> bytes:
    """Deterministic fake 'image': 16-byte header + pseudo-pixel bytes.
    Stands in for real media payloads in tests/benches."""
    import pandas as pd

    h = int(
        pd.util.hash_array(np.asarray([seed_text], dtype=object), categorize=False)[0]
    )
    rng = np.random.default_rng(h % (2**32))
    body = rng.integers(0, 256, size=min(width * height, 4096), dtype=np.uint8)
    return _MAGIC + struct.pack("<II", width, height) + body.tobytes()


def attach_blobs(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """documents → (id, blob, n_bytes): derive a deterministic binary
    payload per row (the fixture generator for multimodal pipelines)."""

    def gen(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        blobs = [
            make_fake_blob(x, 32 + (len(x) % 64), 32 + (len(x) % 48)) for x in texts
        ]
        return pa.table(
            {
                id_col: t[id_col],
                "blob": pa.array(blobs, type=pa.binary()),
                "n_bytes": pa.array([len(b) for b in blobs], type=pa.int64()),
            }
        )

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=1024)


class DecodeStage:
    """map_batches actor: decode binary payloads → typed metadata
    (+ optionally a feature vector). Codec state is 'loaded' once per
    actor in __init__ — the real-codec analog would open the model /
    library handle here.

    codec="fake"  → parse the fake header (deterministic, no deps)
    codec="pil" / "ffmpeg" / ... → NotImplementedError (not in container)
    """

    def __init__(self, codec: str = "fake", with_features: bool = False):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} requires media libraries not present in "
                "this environment; only the deterministic 'fake' codec runs here"
            )
        self.codec = codec
        self.with_features = with_features

    def _decode_one(self, blob: bytes) -> tuple[int, int, str]:
        if blob[:8] != _MAGIC:
            return -1, -1, "unknown"
        w, h = struct.unpack("<II", blob[8:16])
        return int(w), int(h), "fakeimg"

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs = t["blob"].to_pylist()
        meta = [self._decode_one(b) for b in blobs]
        cols = dict(zip(t.schema.names, t.columns))
        cols["width"] = pa.array([m[0] for m in meta], type=pa.int32())
        cols["height"] = pa.array([m[1] for m in meta], type=pa.int32())
        cols["format"] = pa.array([m[2] for m in meta], type=pa.string())
        if self.with_features:
            # stand-in feature extractor: mean/std of payload bytes
            feats = []
            for b in blobs:
                arr = np.frombuffer(b[16:], dtype=np.uint8).astype(np.float32)
                feats.append(
                    [float(arr.mean()), float(arr.std())] if arr.size else [0.0, 0.0]
                )
            cols["features"] = pa.array(feats, type=pa.list_(pa.float32()))
        return pa.table(cols)


def _mm_pool() -> tuple[int, int]:
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(4, ncpu))


class ResizeStage:
    """map_batches actor: image payload → resized payload + new dims.
    The real-codec analog would hold the decoder/encoder handles from
    __init__; the fake codec rewrites the header and subsamples the
    pseudo-pixel body deterministically. Output keeps the binary-column
    + typed-metadata layout so stages compose (decode → resize →
    feature-extract)."""

    def __init__(self, target_w: int, target_h: int, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} requires media libraries not present in "
                "this environment; only the deterministic 'fake' codec runs here"
            )
        self.tw, self.th = int(target_w), int(target_h)

    def _resize_one(self, blob: bytes) -> bytes:
        if blob[:8] != _MAGIC:
            return blob
        w, h = struct.unpack("<II", blob[8:16])
        body = np.frombuffer(blob[16:], dtype=np.uint8)
        n_out = min(self.tw * self.th, 4096)
        if body.size == 0:
            out = body
        else:
            # deterministic nearest-neighbor-ish subsample of the body
            ix = (np.arange(n_out, dtype=np.int64) * body.size) // max(1, n_out)
            out = body[np.clip(ix, 0, body.size - 1)]
        return _MAGIC + struct.pack("<II", self.tw, self.th) + out.tobytes()

    def __call__(self, t: pa.Table) -> pa.Table:
        blobs = [self._resize_one(b) for b in t["blob"].to_pylist()]
        cols = dict(zip(t.schema.names, t.columns))
        cols["blob"] = pa.array(blobs, type=pa.binary())
        cols["n_bytes"] = pa.array([len(b) for b in blobs], type=pa.int64())
        cols["width"] = pa.array(np.full(len(blobs), self.tw, dtype=np.int32))
        cols["height"] = pa.array(np.full(len(blobs), self.th, dtype=np.int32))
        return pa.table(cols)


def resize_pipeline(ds: rd.Dataset, target_w: int = 64, target_h: int = 64) -> rd.Dataset:
    return ds.map_batches(
        ResizeStage,
        fn_constructor_args=(target_w, target_h),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=_mm_pool(),
        num_cpus=1,
    )


class FrameSampleStage:
    """map_batches actor: 'video' payload → one row per sampled frame
    (flat_map shape: N input rows → N×k output rows). The fake codec
    treats the payload body as a stream of fixed-size frames and samples
    every ``stride``-th one; a real ffmpeg-based stage would keep the
    demuxer handle in __init__ and emit decoded frames the same way."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4,
                 max_frames: int = 8, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r} requires media libraries not present in "
                "this environment; only the deterministic 'fake' codec runs here"
            )
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(0).to_pylist()
        id_name = t.schema.names[0]
        out_id, out_frame, out_blob = [], [], []
        for rid, blob in zip(ids, t["blob"].to_pylist()):
            body = blob[16:] if blob[:8] == _MAGIC else blob
            n_frames = max(1, len(body) // self.frame_bytes)
            picked = list(range(0, n_frames, self.stride))[: self.max_frames]
            for f in picked:
                out_id.append(rid)
                out_frame.append(f)
                out_blob.append(body[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                id_name: pa.array(out_id, type=pa.int64()),
                "frame_no": pa.array(out_frame, type=pa.int64()),
                "frame": pa.array(out_blob, type=pa.binary()),
            }
        )


def frame_sample_pipeline(ds: rd.Dataset, stride: int = 4, max_frames: int = 8) -> rd.Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_args=(256, stride, max_frames),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=_mm_pool(),
        num_cpus=1,
    )


def decode_pipeline(ds: rd.Dataset, with_features: bool = False) -> rd.Dataset:
    """Standard multimodal decode shape: small batches (wide binary
    rows), bounded actor pool."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_args=("fake", with_features),
        batch_format="pyarrow",
        batch_size=256,  # binary payloads are wide — keep batches small
        concurrency=_mm_pool(),
        num_cpus=1,
    )
