"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
sidecar metadata columns; decode / resize / feature-extract / frame-sample
run as actor-pool ``map_batches`` stages with SMALL batch sizes (binary
rows are wide — a batch x concurrency must fit worker heap).

The decode libraries (PIL / ffmpeg / soundfile) are NOT in this container,
so the codec boundary is stubbed: ``DecodeImageStage(real_decode=True)``
raises NotImplementedError, while the default deterministic fake decoder
derives pseudo-pixels from the payload hash — making the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) real and testable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cutwed_ray.stages.hashing import splitmix64

IMAGE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # "image/png", "audio/wav", ...
    ("width", pa.int32()),
    ("height", pa.int32()),
])

#: recommended map_batches kwargs for wide binary rows
BINARY_BATCH_KWARGS = dict(batch_size=64, batch_format="pyarrow")


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (for tests; no external data)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(payload_bytes) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["image/png"] * n, pa.string()),
        "width": pa.array(rng.randint(16, 64, n).astype(np.int32), pa.int32()),
        "height": pa.array(rng.randint(16, 64, n).astype(np.int32), pa.int32()),
    })


def synth_ppm_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL-image table: binary P6 PPM payloads (header +
    raw RGB raster — the uncompressed interchange format every image tool
    reads) with splitmix64-derived pixels.  Integer arithmetic only, so
    the payload bytes are bit-identical on any platform/CPU count.  Row 0
    carries a deliberately corrupt payload (bad magic) so the per-row
    ``decode_ok=False`` path is always exercised."""
    ids = np.arange(n, dtype=np.uint64)
    w = (8 + splitmix64(ids ^ np.uint64(seed)) % np.uint64(25)).astype(np.int64)
    h = (8 + splitmix64(ids ^ np.uint64(seed + 1)) % np.uint64(25)).astype(np.int64)
    payloads = []
    for i in range(n):
        wi, hi = int(w[i]), int(h[i])
        npix = wi * hi * 3
        j = np.arange(npix, dtype=np.uint64)
        px = (splitmix64((ids[i] << np.uint64(32)) ^ j)
              % np.uint64(256)).astype(np.uint8)
        if i == 0:
            payloads.append(b"NOTANIMAGE" + px.tobytes()[:64])
        else:
            payloads.append(b"P6\n%d %d\n255\n" % (wi, hi) + px.tobytes())
    return pa.table({
        "media_id": pa.array(ids.astype(np.int64), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["image/x-portable-pixmap"] * n, pa.string()),
        "width": pa.array(w.astype(np.int32), pa.int32()),
        "height": pa.array(h.astype(np.int32), pa.int32()),
    })


def decode_ppm(data: bytes) -> np.ndarray | None:
    """Numpy-only P6 PPM decoder: header parse (whitespace + ``#``
    comments per the netpbm spec, maxval <= 255) + a zero-copy
    ``frombuffer`` reshape of the raster.  Returns (h, w, 3) uint8, or
    None for anything malformed — the caller maps that to
    ``decode_ok=False``."""
    if len(data) < 11 or data[:2] != b"P6":
        return None
    vals: list[int] = []
    i, ln = 2, len(data)
    while len(vals) < 3 and i < ln:
        c = data[i]
        if c in b" \t\r\n":
            i += 1
        elif c in b"#":
            while i < ln and data[i] not in b"\n":
                i += 1
        elif 48 <= c <= 57:
            j = i
            while j < ln and 48 <= data[j] <= 57:
                j += 1
            vals.append(int(data[i:j]))
            i = j
        else:
            return None
    if len(vals) < 3 or i >= ln or data[i] not in b" \t\r\n":
        return None
    i += 1                                  # single whitespace after maxval
    w_, h_, maxval = vals
    if not (0 < w_ <= 1 << 15 and 0 < h_ <= 1 << 15 and 0 < maxval <= 255):
        return None
    need = w_ * h_ * 3
    if ln - i < need:
        return None
    return np.frombuffer(data, np.uint8, count=need, offset=i).reshape(h_, w_, 3)


def ppm_block_features(img: np.ndarray, side: int) -> np.ndarray:
    """(side*side,) float64 block-mean grayscale features in [0, 1]:
    integer channel+block sums (exact), ONE float64 division at the end —
    bit-deterministic across platforms."""
    h_, w_, _ = img.shape
    gray = img.astype(np.int64).sum(axis=2)           # 0..765 per pixel
    rb = (np.arange(h_, dtype=np.int64) * side) // h_
    cb = (np.arange(w_, dtype=np.int64) * side) // w_
    sums = np.zeros((side, side), dtype=np.int64)
    np.add.at(sums, (rb[:, None], cb[None, :]), gray)
    counts = np.outer(np.bincount(rb, minlength=side),
                      np.bincount(cb, minlength=side)).astype(np.int64)
    counts[counts == 0] = 1
    return (sums / (765.0 * counts)).reshape(-1)


def _try_import_pil():
    """Import-guarded codec probe: returns the PIL Image module or None.
    Kept as a function (not module-level) so actor workers probe their OWN
    environment — in a heterogeneous cluster only nodes with the library
    take the real-decode path."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


class DecodeImageStage:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    Real pipelines load the codec/model in ``__init__`` (once per actor).
    ``real_decode``:

    * ``False`` (default) — deterministic stub: the payload hash becomes a
      ``features: list<float64>`` of length ``feat_dim`` (plumbing-only,
      works everywhere).
    * ``True`` — decode with PIL (import-guarded): grayscale-resize to a
      sqrt(feat_dim) grid, normalized pixel means as features, per-row
      ``decode_ok=False`` (never a raised error) for undecodable payloads.
      Raises NotImplementedError at CONSTRUCTION when PIL is absent so a
      misconfigured cluster fails fast, not per batch.
    * ``"auto"`` — real decode where PIL exists, stub otherwise.
    """

    def __init__(self, feat_dim: int = 16, real_decode: bool | str = False):
        self.codec = "pil"
        if real_decode == "ppm":
            # numpy-only uncompressed decoder — REAL decode, no codec lib
            self.codec, real_decode = "ppm", True
        elif real_decode == "auto":
            real_decode = _try_import_pil() is not None
        if real_decode and self.codec == "pil" and _try_import_pil() is None:
            raise NotImplementedError(
                "real image decode requires PIL/libjpeg, not present in this "
                "container — use real_decode=False (stub), 'auto', or 'ppm' "
                "for uncompressed netpbm payloads")
        self.real_decode = bool(real_decode)
        self.feat_dim = feat_dim

    def _decode_real_ppm(self, payload: pa.BinaryArray, n: int):
        """P6 path: numpy header parse + raster reshape (decode_ppm),
        exact integer block sums -> float64 grid features.  Per-row by
        necessity (variable-size headers/rasters), but all pixel work is
        vectorized numpy per image; batch_size stays small per
        BINARY_BATCH_KWARGS."""
        side = max(1, int(round(self.feat_dim ** 0.5)))
        feats = np.zeros((n, self.feat_dim), dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            img = decode_ppm(payload[i].as_py())
            if img is None:
                continue
            f = ppm_block_features(img, side)
            feats[i, : min(self.feat_dim, f.shape[0])] = f[: self.feat_dim]
            ok[i] = True
        return feats, ok

    def _decode_real(self, payload: pa.BinaryArray, n: int):
        """PIL path: square grayscale thumbnail, mean-pixel features."""
        import io

        Image = _try_import_pil()
        side = max(1, int(round(self.feat_dim ** 0.5)))
        feats = np.zeros((n, self.feat_dim), dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):            # per-row by necessity: codecs are not
            try:                      # vectorizable; batch_size stays small
                img = Image.open(io.BytesIO(payload[i].as_py())).convert("L")
                img = img.resize((side, side))
                px = np.asarray(img, dtype=np.float64) / 255.0
                feats[i, : side * side] = px.reshape(-1)[: self.feat_dim]
                ok[i] = True
            except Exception:
                pass                  # undecodable row: decode_ok=False
        return feats, ok

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(t)
        if self.real_decode and self.codec == "ppm":
            feats, ok = self._decode_real_ppm(payload, n)
        elif self.real_decode:
            feats, ok = self._decode_real(payload, n)
        else:
            feats = np.empty((n, self.feat_dim), dtype=np.float64)
            buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8) if payload.buffers()[2] else np.zeros(0, np.uint8)
            offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
                payload.offset: payload.offset + n + 1].astype(np.int64)
            S = np.zeros(buf.shape[0] + 1, dtype=np.uint64)
            np.cumsum(buf.astype(np.uint64), out=S[1:])
            base = S[offs[1:]] - S[offs[:-1]]
            for k in range(self.feat_dim):
                feats[:, k] = (splitmix64(base ^ np.uint64(k * 0x9E37)) >> np.uint64(11)) * 2.0 ** -53
            ok = np.ones(n, dtype=bool)
        out = t.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1), pa.float64()),
                                              self.feat_dim),
        )
        return out.append_column("decode_ok", pa.array(ok, pa.bool_()))


class ResizeStage:
    """Stub resize: rewrites width/height metadata to the target box
    (aspect-preserving); payload untouched (a real stage would re-encode)."""

    def __init__(self, max_side: int = 32):
        self.max_side = max_side

    def __call__(self, t: pa.Table) -> pa.Table:
        w = t.column("width").to_numpy().astype(np.float64)
        h = t.column("height").to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        t = t.set_column(t.column_names.index("width"), "width",
                         pa.array(np.round(w * scale).astype(np.int32), pa.int32()))
        return t.set_column(t.column_names.index("height"), "height",
                            pa.array(np.round(h * scale).astype(np.int32), pa.int32()))


def frame_sample(t: pa.Table, every_n: int = 10) -> pa.Table:
    """Stub frame sampler for video rows: emits (media_id, frame_idx) rows
    as if sampling every ``every_n``-th frame of a payload-derived frame
    count (deterministic)."""
    mid = t.column("media_id").to_numpy()
    # fake frame count from payload size
    payload = t.column("payload")
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
        payload.offset: payload.offset + len(t) + 1].astype(np.int64)
    nframes = np.maximum((offs[1:] - offs[:-1]) // 256, 1)
    counts = (nframes + every_n - 1) // every_n
    rep = np.repeat(np.arange(len(t)), counts)
    frame_idx = (np.arange(rep.shape[0]) -
                 np.repeat(np.r_[0, np.cumsum(counts)[:-1]], counts)) * every_n
    return pa.table({
        "media_id": pa.array(mid[rep], pa.int64()),
        "frame_idx": pa.array(frame_idx, pa.int64()),
    })


# ------------------------------------------------------------- audio ----
def synth_audio_table(n: int, rate: int = 16_000) -> pa.Table:
    """Deterministic synthetic audio table: int16 little-endian PCM
    payloads of 8k-32k samples per row, derived row/sample-wise from
    splitmix64 — integer arithmetic only, so the table is bit-identical
    on any platform, block layout or CPU count (no RNG stream, no libm)."""
    ids = np.arange(n, dtype=np.uint64)
    n_samp = (8_000 + splitmix64(ids ^ np.uint64(0xA5A5)) % np.uint64(24_001)
              ).astype(np.int64)
    rep = np.repeat(ids, n_samp)
    base = np.repeat(np.cumsum(n_samp) - n_samp, n_samp)
    j = (np.arange(rep.shape[0], dtype=np.int64) - base).astype(np.uint64)
    h = splitmix64((rep << np.uint64(32)) ^ j)
    pcm = (h % np.uint64(65_536)).astype(np.int64) - 32_768
    buf = pcm.astype("<i2").tobytes()
    offs = np.concatenate(([0], np.cumsum(2 * n_samp)))
    if offs[-1] >= 2**31:
        raise ValueError(
            f"synth_audio_table: total payload {offs[-1]} B overflows "
            "binary()'s int32 offsets; shard the table or use large_binary")
    payloads = pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
         pa.py_buffer(buf)])
    return pa.table({
        "media_id": pa.array(ids.astype(np.int64), pa.int64()),
        "payload": payloads,
        "media_type": pa.array(["audio/pcm16"] * n, pa.string()),
        "sample_rate": pa.array(np.full(n, rate, np.int32), pa.int32()),
        "n_samples": pa.array(n_samp, pa.int64()),
    })


class AudioEnergyStage:
    """REAL audio decode + windowed DSP features, numpy-only (no codec
    libraries needed for raw PCM): each payload's int16 samples are viewed
    zero-copy from the Arrow binary data buffer, and per ``window``-sample
    window the stage emits EXACT int64 sufficient statistics — sum of
    squared samples (energy), peak |amplitude|, and the window's sample
    count — the standard VAD / loudness-gate features.

    Fully vectorized across the whole batch: one ``np.add.reduceat`` /
    ``np.maximum.reduceat`` over the concatenated sample buffer with
    per-window boundary indices (rows are contiguous in Arrow's data
    buffer, so segment boundaries cover every row with no per-row loop).
    Integer outputs only -> bit-deterministic, fixture-oracle-able.
    Batch sizing: BINARY_BATCH_KWARGS (wide binary rows).
    """

    def __init__(self, window: int = 1024):
        self.window = int(window)

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(t)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
            payload.offset: payload.offset + n + 1].astype(np.int64)
        data = payload.buffers()[2]
        pcm = (np.frombuffer(data, dtype="<i2", count=offs[-1] // 2)
               if data is not None and offs[-1] else
               np.zeros(0, dtype="<i2"))
        start = offs[:-1] // 2
        n_samp = (offs[1:] - offs[:-1]) // 2
        if (offs % 2).any():
            raise ValueError("pcm16 payload with odd byte length")
        w = self.window
        n_win = -(-n_samp // w)                      # 0 for empty payloads
        rep = np.repeat(np.arange(n, dtype=np.int64), n_win)
        base = np.repeat(np.cumsum(n_win) - n_win, n_win)
        wid = np.arange(rep.shape[0], dtype=np.int64) - base
        bounds = start[rep] + wid * w
        if bounds.shape[0] == 0:
            return pa.table({
                "media_id": pa.array([], pa.int64()),
                "window_id": pa.array([], pa.int64()),
                "n_in_window": pa.array([], pa.int64()),
                "energy": pa.array([], pa.int64()),
                "peak": pa.array([], pa.int64()),
            })
        x = pcm.astype(np.int64)
        seg_n = np.minimum(np.int64(w), n_samp[rep] - wid * w)
        energy = np.add.reduceat(x * x, bounds)
        peak = np.maximum.reduceat(np.abs(x), bounds)
        # reduceat's final segment runs to the buffer end; every other
        # segment ends at the next boundary — both equal the window edge
        # because rows are contiguous, EXCEPT a trailing gap can only
        # exist if a later row starts before this window's nominal end,
        # which contiguity rules out.
        mids = t.column("media_id").to_numpy().astype(np.int64)
        return pa.table({
            "media_id": pa.array(mids[rep], pa.int64()),
            "window_id": pa.array(wid, pa.int64()),
            "n_in_window": pa.array(seg_n, pa.int64()),
            "energy": pa.array(energy, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
        })
