"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature libraries are not in this container, so the codec step
is STUBBED behind a deterministic fake (``DecodeStub``) with the real
seam clearly marked (``mode="real"`` → NotImplementedError).  Everything
Ray-side is real and tested: the binary schema, small-batch actor-pool
sizing, the decode→feature actor signature, and the frame-explode output
layout.

Scale notes: binary payloads make rows wide — these stages default to
small ``batch_size`` so batch × concurrency fits the worker heap, and
stay in ``batch_format="pyarrow"`` end-to-end (binary columns round-trip
poorly through pandas).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON: {width,height,...} — typed metadata
    ]
)


def docs_to_blobs(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Deterministic fake media: each document's text bytes become an
    opaque payload (stands in for real image/audio bytes in tests)."""
    ids = batch.column(id_col)
    payloads = pa.array(
        [(t or "").encode("utf-8") for t in batch.column(text_col).to_pylist()],
        pa.binary(),
    )
    mtypes = pa.array(
        ["image" if int(i) % 2 == 0 else "audio" for i in ids.to_pylist()],
        pa.string(),
    )
    metas = pa.array(
        ['{"codec":"fake","v":1}'] * len(batch), pa.string()
    )
    return pa.Table.from_arrays(
        [pa.compute.cast(ids, pa.int64()), mtypes, payloads, metas],
        schema=MEDIA_SCHEMA,
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    Real deployment: ``__init__`` loads the codec / model (PIL, ffmpeg,
    CLIP, …) once per actor; ``__call__`` decodes a small Arrow batch and
    emits fixed-dim features.  Here the decode is a deterministic fake:
    feature = first ``dim`` bytes of sha256(payload), scaled to [0, 1).
    """

    def __init__(self, mode: str = "stub", dim: int = 8):
        if mode != "stub":
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg/torch, not present "
                "in this environment — plug the codec in here"
            )
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_bytes = pa.array([len(p or b"") for p in payloads], pa.int64())
        feats = []
        for p in payloads:
            digest = hashlib.sha256(p or b"").digest()
            feats.append(
                (np.frombuffer(digest[: self.dim], dtype=np.uint8) / 256.0).tolist()
            )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": n_bytes,
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def frame_sample(batch: pa.Table, frame_bytes: int = 64,
                 max_frames: int = 8) -> pa.Table:
    """Frame-sampling explode (video analogue): payload → up to
    ``max_frames`` fixed-stride chunks, one output row per frame.
    Output: (media_id, frame_idx, frame_hash)."""
    ids, fidx, fhash = [], [], []
    for mid, p in zip(
        batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
    ):
        p = p or b""
        n = max(1, min(max_frames, (len(p) + frame_bytes - 1) // frame_bytes))
        for i in range(n):
            chunk = p[i * frame_bytes : (i + 1) * frame_bytes]
            ids.append(mid)
            fidx.append(i)
            fhash.append(hashlib.md5(chunk).hexdigest()[:16])
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_hash": pa.array(fhash, pa.string()),
        }
    )


def media_pipeline(docs_ds, batch_size: int = 256, concurrency: int = 2):
    """documents → blobs → decode-stub features.  Small batches by design
    (binary payload × concurrency must fit the heap)."""
    blobs = docs_ds.map_batches(
        docs_to_blobs, batch_format="pyarrow", batch_size=batch_size
    )
    return blobs.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(mode="stub"),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
