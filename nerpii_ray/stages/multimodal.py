"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two codec paths:

* ``mode="stub"`` — deterministic fake features (sha256 bytes), the
  plumbing-only path for payload formats this container cannot decode
  (JPEG/MP3/H.264 need PIL/ffmpeg);
* ``mode="real"`` — from-scratch decoders for two real container
  formats implemented here with struct/numpy only: 24-bit uncompressed
  **BMP** (BITMAPINFOHEADER, bottom-up rows, BGR byte order, 4-byte row
  padding) and 16-bit PCM **WAV** (RIFF chunks).  ``encode_bmp`` /
  ``encode_wav`` are the test-fixture twins; ``decode_real_stats``
  emits exact integer channel/sample sums, so the decode is
  hash-oracle-able in SQL (queries.multimodal_decode_stats).

Scale notes: binary payloads make rows wide — these stages default to
small ``batch_size`` so batch × concurrency fits the worker heap, and
stay in ``batch_format="pyarrow"`` end-to-end (binary columns round-trip
poorly through pandas).
"""

from __future__ import annotations

import hashlib
import struct

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


# ---------------------------------------------------------------------------
# Real codecs, from scratch (no image/audio libraries in this container).
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, BI_RGB): rows bottom-up, pixels BGR, each row
    padded to a 4-byte boundary — the layout every real BMP reader must
    handle, so the decoder below is honestly exercised."""
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    # BGR, bottom-up, padded: one vectorized copy into the padded buffer
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_bytes] = rgb[::-1, :, ::-1].reshape(h, row_bytes)
    return header + info + body.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array.  Handles bottom-up AND top-down (negative height) rows, BGR
    order and 4-byte row padding; rejects compressed or non-24-bit
    files loudly rather than mis-decoding."""
    if data[:2] != b"BM":
        raise ValueError("decode_bmp: not a BMP (missing 'BM' magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"decode_bmp: unsupported header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"decode_bmp: only 24-bit BI_RGB supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    bgr = rows if top_down else rows[::-1]
    return bgr[:, :, ::-1].copy()


def encode_ppm(rgb: np.ndarray, comment: str | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a binary PPM (P6,
    maxval 255).  Optionally injects a ``#`` comment line into the
    header so the decoder's comment handling is honestly exercised."""
    h, w, _ = rgb.shape
    head = b"P6\n"
    if comment is not None:
        head += b"# " + comment.encode("ascii") + b"\n"
    head += f"{w} {h}\n255\n".encode("ascii")
    return head + rgb.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval ≤ 255) into an (h, w, 3) uint8
    RGB array.  Implements the real header grammar — any run of
    whitespace between tokens, ``#`` comments to end-of-line anywhere
    in the header, exactly ONE whitespace byte after maxval — and
    rejects P3/16-bit files loudly rather than mis-decoding."""
    if data[:2] != b"P6":
        raise ValueError("decode_ppm: not a binary PPM (missing 'P6')")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(data):
            raise ValueError("decode_ppm: truncated header")
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tok = data[start:pos]
        if not tok.isdigit():
            raise ValueError(f"decode_ppm: bad header token {tok!r}")
        vals.append(int(tok))
    w, h, maxv = vals
    if maxv != 255:
        raise ValueError(f"decode_ppm: only maxval 255 supported ({maxv})")
    pos += 1  # exactly one whitespace byte separates maxval from raster
    need = w * h * 3
    if len(data) - pos < need:
        raise ValueError("decode_ppm: truncated raster")
    body = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return body.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples as a mono RIFF/WAVE file."""
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple:
    """Decode a 16-bit PCM mono/stereo WAV: walks the RIFF chunk list
    (tolerating extra chunks like LIST before data, and fmt extensions),
    returns ``(sample_rate, samples int16 ndarray)``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE file")
    pos, rate, n_ch, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"decode_wav: only 16-bit PCM supported (fmt={audio_fmt}, "
                    f"bits={bits})"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("decode_wav: missing fmt or data chunk")
    return rate, np.frombuffer(pcm, dtype="<i2").copy()


class DecodeReal:
    """Actor-pool REAL decode stage: parses each payload with the
    from-scratch BMP/WAV codecs above and emits exact integer stats —
    (width, height, per-channel pixel sums) for images, (sample_rate,
    n_samples, sum of absolute amplitudes) for audio.  Integer sums make
    the decode bit-exact-checkable against a SQL replay of the fixture
    formula (queries.multimodal_decode_stats).  Setup-free today, but an
    actor pool by contract: a real deployment hangs model/codec state
    off ``__init__`` exactly here."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "media_id": [], "media_type": [], "width": [], "height": [],
            "sum_r": [], "sum_g": [], "sum_b": [], "sample_rate": [],
            "n_samples": [], "sum_abs": [],
        }
        for mid, mtype, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            out["media_id"].append(mid)
            out["media_type"].append(mtype)
            if mtype == "image":
                # container sniffing by magic — the real-world dispatch
                rgb = (
                    decode_ppm(payload)
                    if payload[:2] == b"P6"
                    else decode_bmp(payload)
                )
                s = rgb.astype(np.int64).sum(axis=(0, 1))
                out["width"].append(rgb.shape[1])
                out["height"].append(rgb.shape[0])
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
                out["sample_rate"].append(None)
                out["n_samples"].append(None)
                out["sum_abs"].append(None)
            elif mtype == "audio":
                rate, pcm = decode_wav(payload)
                out["width"].append(None)
                out["height"].append(None)
                out["sum_r"].append(None)
                out["sum_g"].append(None)
                out["sum_b"].append(None)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(pcm))
                out["sum_abs"].append(int(np.abs(pcm.astype(np.int64)).sum()))
            else:
                raise ValueError(f"DecodeReal: unknown media_type {mtype!r}")
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "media_type": pa.array(out["media_type"], pa.string()),
                "width": pa.array(out["width"], pa.int64()),
                "height": pa.array(out["height"], pa.int64()),
                "sum_r": pa.array(out["sum_r"], pa.int64()),
                "sum_g": pa.array(out["sum_g"], pa.int64()),
                "sum_b": pa.array(out["sum_b"], pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int64()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "sum_abs": pa.array(out["sum_abs"], pa.int64()),
            }
        )


def docs_to_real_blobs(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic REAL media fixture: each document id becomes an
    actual BMP image (even ids) or WAV clip (odd ids) whose pixel /
    sample values are closed-form functions of ``doc_id`` — so a SQL
    twin can replay the expected decode stats with pure arithmetic while
    the engine goes the long way through encode → container bytes →
    from-scratch decode.  Any header, stride, sign or byte-order bug in
    the codec breaks the hash."""
    ids, mtypes, payloads, metas = [], [], [], []
    for raw in batch.column(id_col).to_pylist():
        d = int(raw)
        ids.append(d)
        if d % 2 == 0:
            w, h = 4 + d % 5, 3 + d % 4
            x = np.arange(w, dtype=np.int64)[None, :, None]
            y = np.arange(h, dtype=np.int64)[:, None, None]
            coef = np.array([[7, 13, 31], [11, 17, 37], [13, 19, 41]],
                            dtype=np.int64)
            rgb = (
                (d * coef[:, 0] + x * coef[:, 1] + y * coef[:, 2]) % 256
            ).astype(np.uint8)
            mtypes.append("image")
            payloads.append(encode_bmp(rgb))
            metas.append(f'{{"codec":"bmp","w":{w},"h":{h}}}')
        else:
            n = 64 + d % 32
            i = np.arange(n, dtype=np.int64)
            pcm = ((d * 17 + i * 29) % 4096 - 2048).astype(np.int16)
            mtypes.append("audio")
            payloads.append(encode_wav(pcm, 8000))
            metas.append(f'{{"codec":"wav","n":{n},"rate":8000}}')
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(mtypes, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def docs_to_ppm_blobs(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic PPM fixture (the third from-scratch codec): every
    document id becomes a binary P6 image with a header COMMENT line
    (exercising the header grammar) whose pixels are closed-form in
    ``doc_id`` — channel c at (x, y) is (d·23 + x·5 + y·3 + c·77) % 256
    — so a SQL twin replays the decode stats with pure arithmetic."""
    ids, mtypes, payloads, metas = [], [], [], []
    for raw in batch.column(id_col).to_pylist():
        d = int(raw)
        ids.append(d)
        w, h = 3 + d % 6, 2 + d % 5
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        rgb = ((d * 23 + x * 5 + y * 3 + c * 77) % 256).astype(np.uint8)
        mtypes.append("image")
        payloads.append(encode_ppm(rgb, comment=f"fixture doc {d}"))
        metas.append(f'{{"codec":"ppm","w":{w},"h":{h}}}')
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(mtypes, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
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
        if mode == "real":
            # the formerly-stubbed seam: route to the from-scratch
            # BMP/WAV codec stage (same actor-pool contract)
            self._real = DecodeReal()
        elif mode == "stub":
            self._real = None
        else:
            raise ValueError(f"DecodeStub: unknown mode {mode!r}")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._real is not None:
            return self._real(batch)
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
