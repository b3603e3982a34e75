"""Multimodal plumbing tests (deterministic fake kernels, real Spark paths)."""

import hashlib

import pytest

from patito_spark.operators import multimodal


@pytest.fixture()
def blobs(spark):
    rows = [
        (1, b"\x89PNG fake image bytes one"),
        (2, b"\x89PNG fake image bytes two, longer payload " * 10),
        (3, b""),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, blob binary")


def test_extract_image_features(blobs):
    out = multimodal.extract_image_features(blobs, dim=8)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 3
    payload = b"\x89PNG fake image bytes one"
    assert rows[1].sha256 == hashlib.sha256(payload).hexdigest()
    assert rows[1].n_bytes == len(payload)
    assert len(rows[1].features) == 8
    assert all(0.0 <= f <= 1.0 for f in rows[1].features)
    # deterministic across runs
    again = {r.doc_id: r for r in multimodal.extract_image_features(blobs).collect()}
    assert again[2].features == rows[2].features


def test_sample_video_frames(blobs):
    out = multimodal.sample_video_frames(blobs, every_n_bytes=100)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_no, r.pts_ms))
    # doc 2 payload is ~440 bytes -> 5 frames at 100-byte stride;
    # fake-path pts_ms is the byte offset (deterministic position stand-in)
    assert sorted(by_doc[2]) == [(i, i * 100) for i in range(5)]
    assert by_doc[3] == [(0, 0)]  # empty payload still yields one frame


def _missing(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is None


def test_real_codecs_gate(blobs):
    """Missing codecs fail fast at plan build with a clear error naming
    the dependency; with the codec installed the gate admits the plan
    (the real-kernel smokes below cover that half)."""
    if _missing("PIL"):
        with pytest.raises(NotImplementedError, match="Pillow"):
            multimodal.extract_image_features(blobs, use_real_codecs=True)
    if _missing("av"):
        with pytest.raises(NotImplementedError, match="PyAV"):
            multimodal.sample_video_frames(blobs, use_real_codecs=True)
    # audio no longer gates at plan build: the vendored WAV lane decodes
    # RIFF/WAVE without soundfile; non-WAV payloads raise per-task
    # (TestAudioWindows covers both halves)


def test_real_codec_gate_is_import_try(spark):
    """use_real_codecs resolves the codec at plan build: with Pillow
    installed the kernel decodes; without it, a clear driver-side error."""
    from patito_spark.operators.multimodal import extract_image_features

    df = spark.createDataFrame([(1, bytearray(b"notanimage"))], "doc_id long, blob binary")
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            extract_image_features(df, use_real_codecs=True)
    else:
        out = extract_image_features(df, use_real_codecs=True)
        assert out.columns == ["doc_id", "sha256", "n_bytes", "features"]


# ---------------------------------------------------------------------- #
# binaryFile ingestion -> multimodal pipeline                             #
# ---------------------------------------------------------------------- #


def test_read_binary_files_roundtrip(spark, tmp_path):
    from patito_spark.sources import read_binary_files

    payloads = {
        "a.jpg": b"\xff\xd8fakejpeg",
        "b.png": b"\x89PNGfake",
        "notes.txt": b"hello",
    }
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    df = read_binary_files(str(tmp_path), spark=spark)
    rows = {r.file_name: r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, blob in payloads.items():
        assert bytes(rows[name].content) == blob
        assert rows[name].length == len(blob)
    assert rows["a.jpg"].file_ext == "jpg"
    assert rows["notes.txt"].file_ext == "txt"

    only_images = read_binary_files(str(tmp_path), glob="*.jpg", spark=spark)
    assert [r.file_name for r in only_images.collect()] == ["a.jpg"]


def test_read_binary_files_feeds_image_features(spark, tmp_path):
    """The binaryFile shape plugs straight into the multimodal operator."""
    from patito_spark.operators.multimodal import extract_image_features
    from patito_spark.sources import read_binary_files

    (tmp_path / "x.jpg").write_bytes(b"\xff\xd8" + b"z" * 30)
    df = read_binary_files(str(tmp_path), glob="*.jpg", spark=spark)
    from pyspark.sql import functions as F

    with_id = df.select(
        F.xxhash64("path").alias("doc_id"), df.content.alias("blob")
    )
    feats = extract_image_features(with_id)
    row = feats.first()
    assert row.n_bytes == 32
    assert len(row.features) == 8


class TestAudioWindows:
    def _blobs(self, spark):
        import numpy as np

        # doc 1: 2500 int16 samples (ramp); doc 2: 100 samples; doc 3: empty
        a = np.arange(2500, dtype="<i2").tobytes()
        b = (np.ones(100, dtype="<i2") * 1000).tobytes()
        return spark.createDataFrame(
            [(1, bytearray(a)), (2, bytearray(b)), (3, bytearray(b""))],
            "doc_id long, blob binary",
        )

    def test_window_fanout_and_tail(self, spark):
        from patito_spark.operators.multimodal import sample_audio_windows

        out = sample_audio_windows(self._blobs(spark), window_samples=1024)
        rows = {(r["doc_id"], r["window_no"]): r["n_samples"] for r in out.collect()}
        # doc 1: 2500 samples -> 1024, 1024, 452-tail
        assert rows[(1, 0)] == 1024 and rows[(1, 1)] == 1024 and rows[(1, 2)] == 452
        assert rows[(2, 0)] == 100          # short doc: single tail window
        assert rows[(3, 0)] == 1            # empty payload -> one zero sample
        assert len(rows) == 5

    def test_overlapping_hop(self, spark):
        from patito_spark.operators.multimodal import sample_audio_windows

        out = sample_audio_windows(
            self._blobs(spark), window_samples=1024, hop_samples=512
        )
        doc1 = [r for r in out.collect() if r["doc_id"] == 1]
        assert len(doc1) == 5  # starts 0,512,1024,1536,2048
        import math

        # constant-value doc: rms equals the value exactly
        doc2 = [r for r in out.collect() if r["doc_id"] == 2]
        assert all(math.isclose(r["rms"], 1000.0) for r in doc2)

    def test_real_lane_vendored_wav(self, spark):
        """use_real_codecs=True decodes genuine RIFF/WAVE bytes in this
        soundfile-less container via the vendored parser: PCM16 stereo
        mono-mixes and scales to [-1, 1]; float32 passes through; RMS
        matches a numpy reference to 1e-12."""
        import math
        import struct

        import numpy as np

        from patito_spark.operators.multimodal import sample_audio_windows

        def wav(fmt_tag, bits, n_ch, frames: np.ndarray) -> bytes:
            raw = frames.tobytes()
            fmt = struct.pack(
                "<HHIIHH", fmt_tag, n_ch, 8000,
                8000 * n_ch * bits // 8, n_ch * bits // 8, bits,
            )
            body = (
                b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw
            )
            return b"RIFF" + struct.pack("<I", len(body)) + body

        # PCM16 stereo: L = 8192, R = -8192 -> mono-mix 0.0 exactly;
        # then a second segment L = R = 16384 -> 0.5
        seg1 = np.tile(
            np.array([8192, -8192], dtype="<i2"), 64
        )  # 64 frames
        seg2 = np.tile(np.array([16384, 16384], dtype="<i2"), 64)
        pcm = wav(1, 16, 2, np.concatenate([seg1, seg2]))
        # float32 mono ramp
        ramp = np.linspace(-1, 1, 128).astype("<f4")
        flt = wav(3, 32, 1, ramp)
        blobs = spark.createDataFrame(
            [(1, bytearray(pcm)), (2, bytearray(flt))],
            "doc_id long, blob binary",
        )
        out = sample_audio_windows(
            blobs, window_samples=64, use_real_codecs=True
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        d1 = sorted(by_doc[1], key=lambda r: r.window_no)
        assert [r.n_samples for r in d1] == [64, 64]
        assert math.isclose(d1[0].rms, 0.0, abs_tol=1e-12)
        assert math.isclose(d1[1].rms, 0.5, rel_tol=1e-12)
        d2 = sorted(by_doc[2], key=lambda r: r.window_no)
        assert [r.n_samples for r in d2] == [64, 64]
        want = float(np.sqrt(np.mean(ramp.astype("f8")[:64] ** 2)))
        assert math.isclose(d2[0].rms, want, rel_tol=1e-12)

    def test_real_lane_non_wav_names_soundfile(self, spark):
        """A non-RIFF payload through the real lane fails naming the
        full-codec dependency (soundfile), not with a numpy error."""
        import pytest as _pytest

        from patito_spark.operators.multimodal import sample_audio_windows

        if not _missing("soundfile"):  # pragma: no cover - codec host
            _pytest.skip("soundfile installed; vendored lane not used")
        blobs = spark.createDataFrame(
            [(1, bytearray(b"OggS-not-a-wav-payload"))],
            "doc_id long, blob binary",
        )
        with _pytest.raises(Exception, match="soundfile"):
            sample_audio_windows(blobs, use_real_codecs=True).collect()

    def test_explicit_zero_hop_rejected(self, spark):
        """hop_samples=0 must hit the ValueError, not silently become
        no-overlap windowing (regression: `hop_samples or window_samples`
        swallowed the explicit 0)."""
        import pytest as _pytest

        from patito_spark.operators.multimodal import sample_audio_windows

        with _pytest.raises(ValueError, match="positive"):
            sample_audio_windows(
                self._blobs(spark), window_samples=1024, hop_samples=0
            )


class TestImagePhash:
    def _blobs(self, spark):
        rows = [
            (1, bytes(b"image-one-content")),
            (2, bytes(b"image-one-content")),        # exact byte dup of 1
            (3, bytes(b"image-three-different")),
            (4, bytes(b"image-four-other")),
        ]
        return spark.createDataFrame(rows, "doc_id long, blob binary")

    def test_phash_deterministic_and_schema(self, spark):
        from patito_spark.operators.multimodal import image_phash

        df = self._blobs(spark)
        h1 = {r.doc_id: r.phash for r in image_phash(df).collect()}
        h2 = {r.doc_id: r.phash for r in image_phash(df).collect()}
        assert h1 == h2
        assert h1[1] == h1[2]          # identical payloads collide
        assert h1[1] != h1[3] != h1[4]
        assert all(isinstance(v, int) for v in h1.values())

    def test_image_dedup_pairs_pigeonhole(self, spark):
        from patito_spark.functions.cache import release_caches
        from patito_spark.operators.multimodal import image_dedup_pairs

        try:
            pairs = image_dedup_pairs(self._blobs(spark), max_hamming=0)
            got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
            assert got == {(1, 2): 0}
        finally:
            release_caches()

    def test_image_dedup_pairs_hamming_ball(self, spark):
        """Signatures one bit apart meet through the chunked join; the
        pigeonhole is lossless for max_hamming < chunks."""
        from patito_spark.functions.cache import release_caches
        from patito_spark.operators.dedup import hamming_pairs

        sigs = spark.createDataFrame(
            [(1, 0b1010100), (2, 0b1010101), (3, 0b1010111), (4, -42)],
            "doc_id long, phash long",
        )
        try:
            got = {
                (r.id_a, r.id_b): r.hamming
                for r in hamming_pairs(
                    sigs, id_col="doc_id", sig_col="phash",
                    max_hamming=2, chunks=8,
                ).collect()
            }
            assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 2}
        finally:
            release_caches()

    def test_pigeonhole_contract_enforced(self, spark):
        from patito_spark.operators.multimodal import image_dedup_pairs

        with pytest.raises(ValueError, match="pigeonhole"):
            image_dedup_pairs(self._blobs(spark), max_hamming=8, chunks=8)

    def test_phash_components_compose(self, spark):
        """pairs -> connected_components -> anti join: the text dedup
        composition works unchanged on image pairs."""
        from pyspark.sql import functions as F

        from patito_spark.functions.cache import release_caches
        from patito_spark.operators.graph import connected_components
        from patito_spark.operators.multimodal import image_dedup_pairs

        df = self._blobs(spark)
        try:
            pairs = image_dedup_pairs(df, max_hamming=0)
            comp = connected_components(pairs, id_a="id_a", id_b="id_b")
            drop = comp.filter("node != component").select(
                F.col("node").alias("doc_id")
            )
            kept = df.join(drop, on="doc_id", how="left_anti")
            assert {r.doc_id for r in kept.collect()} == {1, 3, 4}
        finally:
            release_caches()


class TestRealCodecKernels:
    """Real-Pillow smokes (round-11 verdict #2/advice #6): run the
    import-gated kernels wherever Pillow exists; skip cleanly where it
    does not. The fake path shares the DCT pipeline, which bounds the
    risk — these pin the DECODE half."""

    @staticmethod
    def _png(img) -> bytes:
        import io

        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    @pytest.fixture()
    def pil(self):
        return pytest.importorskip("PIL.Image")

    def _gradient(self, pil, w=64, h=64, invert=False):
        img = pil.new("L", (w, h))
        img.putdata(
            [
                (255 - (x + y) * 255 // (w + h - 2))
                if invert
                else (x + y) * 255 // (w + h - 2)
                for y in range(h)
                for x in range(w)
            ]
        )
        return img

    def test_pil_phash_deterministic_and_resize_robust(self, pil):
        from patito_spark.operators.multimodal import _pil_phash

        g64 = self._png(self._gradient(pil))
        assert _pil_phash(g64) == _pil_phash(g64)
        # pHash's contract: a resize of the same content hashes nearby
        g128 = self._png(self._gradient(pil, w=128, h=128))
        d = bin(
            (_pil_phash(g64) ^ _pil_phash(g128)) & ((1 << 64) - 1)
        ).count("1")
        assert d <= 6
        # ...and unrelated content does not
        inv = self._png(self._gradient(pil, invert=True))
        d2 = bin(
            (_pil_phash(g64) ^ _pil_phash(inv)) & ((1 << 64) - 1)
        ).count("1")
        assert d2 > 6

    def test_pil_decode_features_known_answer(self, pil):
        from patito_spark.operators.multimodal import _pil_decode_features

        white = self._png(pil.new("L", (32, 32), color=255))
        black = self._png(pil.new("L", (32, 32), color=0))
        assert _pil_decode_features(white, dim=4) == [1.0] * 4
        assert _pil_decode_features(black, dim=4) == [0.0] * 4

    def test_real_codec_dedup_end_to_end(self, spark, pil):
        from patito_spark.functions.cache import release_caches
        from patito_spark.operators.multimodal import image_dedup_pairs

        g = self._png(self._gradient(pil))
        other = self._png(self._gradient(pil, invert=True))
        df = spark.createDataFrame(
            [(1, g), (2, g), (3, other)], "doc_id long, blob binary"
        )
        try:
            pairs = image_dedup_pairs(df, max_hamming=0, use_real_codecs=True)
            got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
            assert got == {(1, 2): 0}
        finally:
            release_caches()

    def test_vendored_png_decode_roundtrip(self):
        """The vendored baseline-PNG decoder recovers the exact pixels
        a stdlib writer encoded — filter types 0 (as written), and
        1/2/3/4 applied per the spec in-test."""
        import struct
        import zlib

        import numpy as np

        from patito_spark.operators.multimodal import _png_decode_gray

        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, size=(9, 11), dtype=np.uint8)

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        def png_gray(pixels, ftype):
            h, w = pixels.shape
            rows = bytearray()
            prev = np.zeros(w, dtype=np.int32)
            for y in range(h):
                line = pixels[y].astype(np.int32)
                if ftype == 0:
                    filt = line
                elif ftype == 1:  # Sub
                    left = np.concatenate(([0], line[:-1]))
                    filt = (line - left) % 256
                elif ftype == 2:  # Up
                    filt = (line - prev) % 256
                elif ftype == 3:  # Average
                    filt = np.empty(w, dtype=np.int32)
                    for i in range(w):
                        left = line[i - 1] if i else 0
                        filt[i] = (line[i] - ((left + prev[i]) >> 1)) % 256
                elif ftype == 4:  # Paeth
                    filt = np.empty(w, dtype=np.int32)
                    for i in range(w):
                        a = line[i - 1] if i else 0
                        b = prev[i]
                        c = prev[i - 1] if i else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = (
                            a if (pa <= pb and pa <= pc)
                            else (b if pb <= pc else c)
                        )
                        filt[i] = (line[i] - pr) % 256
                rows.append(ftype)
                rows.extend(int(v) for v in filt)
                prev = line
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(rows)))
                + chunk(b"IEND", b"")
            )

        for ftype in (0, 1, 2, 3, 4):
            got = _png_decode_gray(png_gray(px, ftype))
            assert np.array_equal(got, px.astype("float64")), ftype

        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="PNG"):
            _png_decode_gray(b"\xff\xd8\xffjpeg-ish")

    def test_vendored_png_decode_rgb_filters(self):
        """RGB rows exercise the channel-lane stride of every filter
        (Sub/Average/Paeth reference the pixel `bpp` bytes back, not 1
        byte back) — the vectorized Sub lane-cumsum in particular."""
        import struct
        import zlib

        import numpy as np

        from patito_spark.operators.multimodal import _png_decode_gray

        rng = np.random.RandomState(11)
        h, w, ch = 7, 5, 3
        px = rng.randint(0, 256, size=(h, w * ch), dtype=np.uint8)

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        def encode(ftype):
            rows = bytearray()
            prev = np.zeros(w * ch, dtype=np.int32)
            for y in range(h):
                line = px[y].astype(np.int32)
                filt = np.empty(w * ch, dtype=np.int32)
                for i in range(w * ch):
                    a = line[i - ch] if i >= ch else 0
                    b = prev[i]
                    c = prev[i - ch] if i >= ch else 0
                    if ftype == 0:
                        pred = 0
                    elif ftype == 1:
                        pred = a
                    elif ftype == 2:
                        pred = b
                    elif ftype == 3:
                        pred = (a + b) >> 1
                    else:  # Paeth
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = (
                            a if (pa <= pb and pa <= pc)
                            else (b if pb <= pc else c)
                        )
                    filt[i] = (line[i] - pred) % 256
                rows.append(ftype)
                rows.extend(int(v) for v in filt)
                prev = line
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(rows)))
                + chunk(b"IEND", b"")
            )

        rgb = px.reshape(h, w, ch).astype("float64")
        want = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587
                + rgb[:, :, 2] * 114) / 1000.0
        for ftype in (0, 1, 2, 3, 4):
            got = _png_decode_gray(encode(ftype))
            assert np.allclose(got, want), ftype

    def test_real_lane_works_without_pil_on_png(self, spark):
        """use_real_codecs=True in a Pillow-less container rides the
        vendored PNG decoder: byte-identical PNGs collide at hamming 0,
        a different image does not."""
        import struct
        import zlib

        import numpy as np

        from patito_spark.functions.cache import release_caches
        from patito_spark.operators.multimodal import image_dedup_pairs

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        def png(seed):
            rng = np.random.RandomState(seed)
            pxa = rng.randint(0, 256, size=(48, 48), dtype=np.uint8)
            rows = bytearray()
            for y in range(48):
                rows.append(0)
                rows.extend(int(v) for v in pxa[y])
            ihdr = struct.pack(">IIBBBBB", 48, 48, 8, 0, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(rows)))
                + chunk(b"IEND", b"")
            )

        g = png(1)
        df = spark.createDataFrame(
            [(1, g), (2, g), (3, png(2))], "doc_id long, blob binary"
        )
        try:
            pairs = image_dedup_pairs(df, max_hamming=0, use_real_codecs=True)
            got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
            assert got == {(1, 2): 0}
        finally:
            release_caches()

    def test_fake_path_needs_no_codec(self, spark):
        # guard: the default path must keep working with NO Pillow
        from patito_spark.operators.multimodal import image_phash

        df = spark.createDataFrame(
            [(1, b"payload")], "doc_id long, blob binary"
        )
        assert image_phash(df).count() == 1


class TestRealVideoAudioKernels:
    """Real-PyAV / real-soundfile smokes (round-12): run the import-gated
    video/audio kernels wherever the codec exists; skip cleanly where it
    does not (this container). Media are synthesized in-memory with the
    same library, so the tests are self-contained."""

    @pytest.fixture()
    def av(self):
        return pytest.importorskip("av")

    @pytest.fixture()
    def sf(self):
        return pytest.importorskip("soundfile")

    def _mpegts(self, av, n_frames=30, gop=10, w=64, h=64):
        import io

        import numpy as np

        buf = io.BytesIO()
        with av.open(buf, mode="w", format="mpegts") as container:
            stream = container.add_stream("mpeg4", rate=25)
            stream.width, stream.height = w, h
            stream.pix_fmt = "yuv420p"
            stream.codec_context.gop_size = gop
            for i in range(n_frames):
                arr = np.full((h, w, 3), (i * 8) % 256, dtype=np.uint8)
                frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
                for packet in stream.encode(frame):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
        return buf.getvalue()

    def test_av_keyframes_frame_accurate(self, spark, av):
        from patito_spark.operators.multimodal import sample_video_frames

        payload = self._mpegts(av)
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, blob binary"
        )
        rows = sorted(
            sample_video_frames(df, use_real_codecs=True).collect(),
            key=lambda r: r.frame_no,
        )
        # 30 frames at gop 10 -> 3 keyframes; pts strictly increasing and
        # ~400 ms apart (25 fps x 10-frame gop), straight off the container
        assert [r.frame_no for r in rows] == [0, 1, 2]
        pts = [r.pts_ms for r in rows]
        assert all(b > a for a, b in zip(pts, pts[1:]))
        assert all(300 <= b - a <= 500 for a, b in zip(pts, pts[1:]))
        assert all(len(r.frame_sha256) == 64 for r in rows)

    def test_soundfile_windows_known_rms(self, spark, sf):
        import io

        import numpy as np

        from patito_spark.operators.multimodal import sample_audio_windows

        samples = np.full(2048, 0.5, dtype="float64")
        buf = io.BytesIO()
        sf.write(buf, samples, 8000, format="WAV", subtype="DOUBLE")
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "doc_id long, blob binary"
        )
        rows = sample_audio_windows(
            df, window_samples=1024, use_real_codecs=True
        ).collect()
        assert len(rows) == 2
        assert all(r.n_samples == 1024 for r in rows)
        assert all(abs(r.rms - 0.5) < 1e-9 for r in rows)
