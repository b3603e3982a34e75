"""Multimodal (image/audio/video) column plumbing.

Media ride along as opaque ``binary`` columns with typed metadata structs;
heavy per-item work (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched ``mapInPandas`` so bytes never round-trip through
row-at-a-time Python.

Codecs are import-gated: ``use_real_codecs=True`` uses Pillow when it is
installed (import-try at plan build, so missing codecs fail fast on the
driver, not mid-job on executors) and raises a clear error otherwise.
The default kernels are deterministic fakes — the Spark-side contract
(schemas, batch iteration, partitioning) is identical on both paths and
fully tested without any codec present. ffmpeg/torchaudio-style video and
audio decode stays honestly stubbed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _require_pil():
    """Import-try gate for the real image codec path."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError as exc:  # pragma: no cover - PIL absent in CI env
        raise NotImplementedError(
            "use_real_codecs=True requires Pillow (PIL), which is not "
            "installed in this environment. The deterministic fake kernel "
            "(use_real_codecs=False) exercises the identical Spark "
            "contract: schema, Arrow batching, partitioning."
        ) from exc

# Typed metadata struct carried next to every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder.

    Derives `dim` floats from the byte content so tests can assert exact
    values without any codec installed.
    """
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def _pil_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Real image kernel: decode with Pillow, emit a ``dim``-bucket
    grayscale intensity profile (decode + downsample — the shape a model
    embedding would take)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        row = img.convert("L").resize((dim, 1))
        return [p / 255.0 for p in row.getdata()]


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    dim: int = 8,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Feature-extract a binary image column via Arrow-batched mapInPandas.

    Each pandas batch holds whole blobs; nothing is collected to the driver
    and batches stream partition-local, so the operator scales with
    executors. ``use_real_codecs=True`` decodes with Pillow (import-gated
    on the driver so a missing codec fails fast); the default kernel is a
    deterministic fake over the same schema and batch shape.
    """
    if use_real_codecs:
        _require_pil()  # fail fast on the driver, not per-task
        decode = _pil_decode_features
    else:
        decode = _fake_decode_features

    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sha256": [
                        hashlib.sha256(b).hexdigest() for b in payloads
                    ],
                    "n_bytes": [len(b) for b in payloads],
                    "features": [
                        decode(bytes(b), dim) for b in payloads
                    ],
                }
            )

    return pruned.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def _require_av():
    """Import-try gate for the real video codec path (PyAV)."""
    try:
        import av  # noqa: F401

        return av
    except ImportError as exc:  # pragma: no cover - av absent in CI env
        raise NotImplementedError(
            "use_real_codecs=True requires PyAV (av), which is not "
            "installed in this environment. The deterministic fake kernel "
            "(use_real_codecs=False) exercises the identical Spark "
            "contract: schema, Arrow batching, 1→many fan-out."
        ) from exc


def _av_keyframes(payload: bytes) -> list[tuple[int, Optional[int], str]]:
    """Real video kernel: demux + decode ONLY keyframes (PyAV's
    ``skip_frame = "NONKEY"`` makes the decoder drop non-key packets, so
    cost scales with keyframe count, not frame count) and emit
    frame-accurate presentation timestamps: ``pts_ms = pts * time_base``
    straight from the container, no frame-rate arithmetic."""
    import io

    import av

    out = []
    with av.open(io.BytesIO(payload)) as container:
        stream = container.streams.video[0]
        stream.codec_context.skip_frame = "NONKEY"
        tb = stream.time_base
        for frame_no, frame in enumerate(container.decode(stream)):
            pts_ms = None
            if frame.pts is not None and tb is not None:
                pts_ms = int(frame.pts * tb * 1000)
            rgb = frame.to_ndarray(format="rgb24")
            out.append(
                (frame_no, pts_ms, hashlib.sha256(rgb.tobytes()).hexdigest())
            )
    return out


def _have_soundfile() -> bool:
    """True when the full-codec audio library is importable."""
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - absent in CI env
        return False


def _wav_decode_mono(payload: bytes):
    """Vendored RIFF/WAVE decoder (public WAV spec; stdlib struct +
    numpy — the audio twin of the vendored PNG lane): PCM 8/16/24/32
    bit and IEEE float32/64, any channel count (mono-mixed). Returns
    float64 samples on [-1, 1] — the same contract as the soundfile
    kernel, so the two real lanes are interchangeable for WAV bytes."""
    import struct

    import numpy as np

    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise NotImplementedError(
            "vendored audio decode handles RIFF/WAVE (PCM or IEEE "
            "float) only; install soundfile for other containers"
        )
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError(
            "vendored audio decode: WAV payload missing fmt/data chunk"
        )
    audio_format, n_ch, _rate, _byte_rate, _block, bits = fmt
    if n_ch < 1:
        raise NotImplementedError("vendored audio decode: zero channels")
    if audio_format == 1:  # integer PCM
        if bits == 8:  # unsigned per spec
            samples = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                - 128.0
            ) / 128.0
        elif bits == 16:
            samples = (
                np.frombuffer(data, dtype="<i2").astype(np.float64)
                / 32768.0
            )
        elif bits == 24:  # 3-byte little-endian two's complement
            usable = len(data) - (len(data) % 3)
            b = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, 3)
            raw = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            raw = np.where(raw >= 1 << 23, raw - (1 << 24), raw)
            samples = raw.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            samples = np.frombuffer(data, dtype="<i4").astype(
                np.float64
            ) / float(1 << 31)
        else:
            raise NotImplementedError(
                f"vendored audio decode: {bits}-bit PCM unsupported"
            )
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(
                f"vendored audio decode: {bits}-bit float unsupported"
            )
    else:
        raise NotImplementedError(
            f"vendored audio decode: WAV format tag {audio_format} "
            "unsupported (PCM=1 and IEEE float=3 only); install "
            "soundfile for compressed/extensible WAV"
        )
    usable = len(samples) - (len(samples) % n_ch)
    samples = samples[:usable]
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return np.ascontiguousarray(samples)


def _sf_decode_mono(payload: bytes):
    """Real audio kernel: decode with soundfile when installed (any
    libsndfile container), else the vendored RIFF/WAVE parser. Returns
    float64 mono samples on the decoder's [-1, 1] scale either way."""
    if not _have_soundfile():
        return _wav_decode_mono(bytes(payload))
    import io

    import numpy as np
    import soundfile as sf

    data, _sr = sf.read(io.BytesIO(payload), dtype="float64")
    if data.ndim > 1:
        data = data.mean(axis=1)
    return np.ascontiguousarray(data)


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("pts_ms", T.LongType(), True),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    every_n_bytes: int = 1024,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Frame-sample a binary video column: one row per sampled frame with
    a frame-accurate ``pts_ms`` timestamp.

    ``use_real_codecs=True`` demuxes + decodes KEYFRAMES with PyAV
    (import-gated at plan build so a missing codec fails fast on the
    driver); ``pts_ms`` is the keyframe's container presentation
    timestamp and ``frame_sha256`` hashes the decoded RGB plane. The
    fake kernel slices the byte stream every ``every_n_bytes`` over the
    SAME schema (``pts_ms`` = byte offset, a deterministic stand-in
    position). Output fan-out (1 → many rows) happens inside
    mapInPandas, so no exploded intermediate ever materializes
    driver-side.
    """
    if use_real_codecs:
        _require_av()  # fail fast on the driver, not per-task

    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_nos, out_pts, out_hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(payload)
                if use_real_codecs:
                    for frame_no, pts_ms, digest in _av_keyframes(data):
                        out_ids.append(doc_id)
                        out_nos.append(frame_no)
                        out_pts.append(pts_ms)
                        out_hashes.append(digest)
                    continue
                for frame_no, start in enumerate(
                    range(0, max(len(data), 1), every_n_bytes)
                ):
                    chunk = data[start : start + every_n_bytes]
                    out_ids.append(doc_id)
                    out_nos.append(frame_no)
                    out_pts.append(start)
                    out_hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "frame_no": out_nos,
                    "pts_ms": pd.array(out_pts, dtype="Int64"),
                    "frame_sha256": out_hashes,
                }
            )

    return pruned.mapInPandas(batches, schema=VIDEO_FRAMES_SCHEMA)


def sample_audio_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    window_samples: int = 1024,
    hop_samples: Optional[int] = None,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Window a binary audio column: one row per (overlapping) window.

    Completes the multimodal family (image features / video frames /
    audio windows). The deterministic fake kernel interprets the payload
    as raw 16-bit PCM — the windowing/hop mechanics, Arrow-batched
    1→many fan-out, and feature shape (per-window RMS energy + content
    hash) are the real plumbing either way. ``hop_samples`` defaults to
    ``window_samples``
    (no overlap); smaller hops give standard overlapping analysis
    windows. Windows shorter than ``window_samples`` at the tail are
    emitted (flagged by ``n_samples``) so no audio is silently dropped.

    ``use_real_codecs=True`` decodes with soundfile when installed (any
    libsndfile container) and otherwise falls back to a VENDORED
    RIFF/WAVE parser (PCM 8/16/24/32-bit + IEEE float32/64, public WAV
    spec — the audio twin of the vendored PNG image lane), so real WAV
    decode works in codec-less containers; non-WAV payloads then raise
    ``NotImplementedError`` naming soundfile. Samples are the decoded
    float stream (multi-channel mono-mixed), RMS is on the decoder's
    [-1, 1] scale, and the window hash covers the float64 sample bytes.
    """
    # `or` would turn an explicit hop_samples=0 into no-overlap windowing
    # instead of the ValueError below; only None means "default to window".
    hop = window_samples if hop_samples is None else hop_samples
    if hop <= 0 or window_samples <= 0:
        raise ValueError("window_samples and hop_samples must be positive")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("window_no", T.IntegerType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("rms", T.DoubleType(), False),
            T.StructField("window_sha256", T.StringType(), False),
        ]
    )
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ids, nos, ns, rms, hashes = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["blob"]):
                data = bytes(payload)
                if use_real_codecs:
                    samples = _sf_decode_mono(data)
                else:
                    usable = len(data) - (len(data) % 2)
                    samples = np.frombuffer(data[:usable], dtype="<i2")
                if len(samples) == 0:
                    samples = np.zeros(1, dtype=samples.dtype)
                for window_no, start in enumerate(
                    range(0, len(samples), hop)
                ):
                    win = samples[start : start + window_samples]
                    if len(win) == 0:
                        break
                    ids.append(doc_id)
                    nos.append(window_no)
                    ns.append(len(win))
                    rms.append(
                        float(np.sqrt(np.mean(win.astype("f8") ** 2)))
                    )
                    hashes.append(hashlib.sha256(win.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_no": nos,
                    "n_samples": ns,
                    "rms": rms,
                    "window_sha256": hashes,
                }
            )

    return pruned.mapInPandas(batches, schema=schema)


# ---------------------------------------------------------------------- #
# Perceptual image hashing + image near-dup dedup                         #
# ---------------------------------------------------------------------- #


def _phash_bits_from_gray(gray) -> int:
    """Classic 64-bit pHash over a 32x32 grayscale array (public
    algorithm: 2D DCT-II, keep the top-left 8x8 low-frequency block
    minus DC, bit = coefficient > median). DCT via an explicit numpy
    cosine basis — no scipy dependency."""
    import numpy as np

    n = 32
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct = basis @ gray.astype("float64") @ basis.T
    block = dct[:8, :8].flatten()[1:]  # drop the DC term
    med = np.median(block)
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    # fold into a signed 64-bit value (bit 63 unused: 63 coefficients)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _png_decode_gray(payload: bytes):
    """Vendored baseline-PNG decode to float64 grayscale — public PNG
    spec (RFC 2083) only: 8-bit, non-interlaced, color types 0/2/4/6,
    all five scanline filters (None/Sub/Up/Average/Paeth), zlib IDAT.
    Color converts with the ITU-R 601-2 luma weights. The real-codec
    lane's fallback when Pillow is absent (this container); palette,
    16-bit, interlaced, or non-PNG payloads raise with guidance."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "the vendored real-codec lane decodes baseline PNG only; "
            "install Pillow for other formats"
        )
    pos, idat = 8, bytearray()
    width = height = bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            (width, height, bit_depth, color_type, _c, _f, interlace
             ) = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if width is None or channels is None or bit_depth != 8 or interlace:
        raise NotImplementedError(
            "vendored PNG decode handles 8-bit non-interlaced "
            "gray/RGB(A) only; install Pillow for the rest"
        )
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rp = 0
    for y in range(height):
        ftype = raw[rp]
        rp += 1
        line = np.frombuffer(raw, np.uint8, count=stride, offset=rp).copy()
        rp += stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — vectorized (uint8 add wraps mod 256)
            line += prev
        elif ftype == 1:  # Sub — vectorized: recon[x] = raw[x] +
            # recon[x-bpp] is a running sum per channel lane, so the
            # row is a per-lane cumsum mod 256 (uint64 accumulation
            # cannot wrap below 2^56 pixels per row)
            line = (
                (line.reshape(width, channels)
                     .cumsum(axis=0, dtype=np.uint64) & 0xFF)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ftype == 3:  # Average — left-sequential recurrence; run it
            # on plain-int lists (numpy scalar indexing is ~10x slower
            # than list ints in this loop)
            ln = line.tolist()
            pv = prev.tolist()
            for i in range(stride):
                left = ln[i - channels] if i >= channels else 0
                ln[i] = (ln[i] + ((left + pv[i]) >> 1)) & 0xFF
            line = np.asarray(ln, dtype=np.uint8)
        elif ftype == 4:  # Paeth — same list-loop treatment
            ln = line.tolist()
            pv = prev.tolist()
            for i in range(stride):
                a = ln[i - channels] if i >= channels else 0
                b = pv[i]
                c = pv[i - channels] if i >= channels else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                ln[i] = (ln[i] + pr) & 0xFF
            line = np.asarray(ln, dtype=np.uint8)
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = line
        prev = line
    px = out.reshape(height, width, channels).astype("float64")
    if channels >= 3:
        return (
            px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
        ) / 1000.0
    return px[:, :, 0]  # gray / gray+alpha: luma channel


def _box_resize_32(gray):
    """Box-average downsample to 32x32 (deterministic; the vendored
    lane's resize — PIL's lane uses PIL's own resampler, so the two
    real kernels are each internally consistent but not bit-equal on
    non-32x32 inputs)."""
    import numpy as np

    h, w = gray.shape
    if (h, w) == (32, 32):
        return gray
    if h % 32 == 0 and w % 32 == 0:
        # integral ratio (the common power-of-two thumbnails):
        # vectorized block mean, no per-cell Python loop
        return gray.reshape(32, h // 32, 32, w // 32).mean(axis=(1, 3))
    ys = np.arange(33) * h // 32
    xs = np.arange(33) * w // 32
    out = np.empty((32, 32), dtype="float64")
    for i in range(32):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(32):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = gray[y0:y1, x0:x1].mean()
    return out


def _numpy_phash(payload: bytes) -> int:
    """Real-decode pHash without Pillow: vendored baseline-PNG decode +
    box resize + the SAME 32x32 DCT pipeline as the PIL kernel."""
    return _phash_bits_from_gray(
        _box_resize_32(_png_decode_gray(bytes(payload)))
    )


def _pil_phash(payload: bytes) -> int:
    import io

    import numpy as np

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        gray = np.asarray(
            img.convert("L").resize((32, 32)), dtype="float64"
        )
    return _phash_bits_from_gray(gray)


def _fake_phash(payload: bytes) -> int:
    """Deterministic codec-free stand-in: a 32x32 'image' derived from
    the byte content (sha256-seeded tile), run through the SAME DCT
    pipeline — the Spark-side plumbing, chunked self-join and hamming
    verify are fully real; only the decode is synthetic. Identical
    payloads collide exactly; unrelated payloads are ~random."""
    import numpy as np

    digest = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(
        int.from_bytes(digest[:4], "big", signed=False)
    )
    gray = rng.randint(0, 256, size=(32, 32))
    return _phash_bits_from_gray(gray)


def image_phash(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    use_real_codecs: bool = False,
) -> DataFrame:
    """64-bit perceptual hash per image blob: ``<id_col>, phash``.

    pHash survives re-encodes, resizes and mild edits (the transforms
    that defeat byte-level sha256 dedup of crawled images), so hamming
    distance on it is the standard image near-dup key. Real kernel
    decodes with Pillow when it is importable; without Pillow the
    real lane falls back to the VENDORED baseline-PNG decoder
    (:func:`_png_decode_gray` — full 8-bit non-interlaced PNG with all
    five filters, box-average resize, same DCT), so ``use_real_codecs``
    works on PNG corpora in codec-less containers and raises per
    non-PNG payload with install guidance. The default deterministic
    fake exercises the identical schema, batch shape and DCT path
    without any decode. One map-only Arrow stage.
    """
    if use_real_codecs:
        try:
            _require_pil()
            kern = _pil_phash
        except NotImplementedError:
            kern = _numpy_phash  # vendored baseline-PNG real lane
    else:
        kern = _fake_phash

    pruned = df.select(
        F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob")
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType, True),
            T.StructField("phash", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [kern(bytes(b)) for b in pdf["blob"]],
                }
            )

    return pruned.mapInPandas(batches, schema=schema)


def image_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    max_hamming: int = 6,
    chunks: "int | str" = "auto",
    use_real_codecs: bool = False,
    max_bucket_size: Optional[int] = 100_000,
    expand: str = "full",
) -> DataFrame:
    """Near-duplicate image pairs by pHash hamming distance.

    The image-side twin of ``simhash_dedup_pairs``: pHash signatures,
    then the SHARED Manku-style pigeonhole machinery
    (:func:`..dedup.hamming_pairs`) — identical signatures (blank or
    re-posted images, the degenerate hot case) collapse to one row
    before any join, candidates meet in a combination-keyed equi-join
    (never a cross join; ``max_hamming < chunks`` required for exact
    recall), oversized buckets are dropped by a counter, and survivors
    verify with ``bit_count(xor)``. Feed the pairs into
    :func:`..graph.connected_components` + an anti join for
    one-survivor-per-group dedup, exactly the text composition.

    Scale note: ``chunks="auto"`` (default) sizes the pigeonhole block
    count from the distinct-hash count (see
    :func:`..dedup.auto_chunk_count`; one eager count job on the
    persisted hash table). At ``max_hamming=6`` the widest affordable
    key is 24 bits (combination-table cap) — fine into the hundreds of
    millions of DISTINCT hashes thanks to the collapse + bucket guard,
    but a multi-billion-image corpus should lower ``max_hamming`` (3
    allows 40-bit keys) or pass ``expand="star"`` and a tighter
    ``max_bucket_size``.
    """
    if isinstance(chunks, int) and max_hamming >= chunks:
        raise ValueError(
            f"pigeonhole needs max_hamming < chunks; got {max_hamming} "
            f">= {chunks}"
        )
    from patito_spark.functions.cache import tracked_persist
    from patito_spark.operators.dedup import hamming_pairs

    sigs = tracked_persist(
        image_phash(
            df, id_col=id_col, blob_col=blob_col,
            use_real_codecs=use_real_codecs,
        )
    )
    return hamming_pairs(
        sigs, id_col="doc_id", sig_col="phash",
        max_hamming=max_hamming, chunks=chunks,
        max_bucket_size=max_bucket_size, expand=expand,
    )
