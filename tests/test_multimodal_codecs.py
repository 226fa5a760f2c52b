"""Real multimodal decode kernels: pure-numpy PPM/BMP/WAV codecs,
nearest-neighbor resize, P6-stream frame sampling — round-trips, known
patterns, and the explicit unsupported-codec failure mode."""

import numpy as np
import pytest

from linkgraph.text.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
    extract_media_features,
    resize_images,
    sample_frames,
    synth_decodable_media,
    synth_media,
    _resize_nearest,
    _split_ppm_stream,
)


# -- codec round-trips (no Spark) -------------------------------------------------


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_comments_and_errors():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n2 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + img.tobytes())
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n" + img.tobytes()[:-1])  # truncated


def test_bmp_roundtrip_with_padding():
    rng = np.random.default_rng(8)
    # width 13 → row stride 39 needs 1 pad byte; exercises the pad path
    img = rng.integers(0, 256, size=(5, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 60)  # bpp 0 / malformed header
    with pytest.raises(ValueError):
        decode_bmp(b"PNG garbage")


def test_wav_roundtrip_and_mono_mix():
    t = np.arange(800) / 8000.0
    s = 0.25 * np.sin(2 * np.pi * 440 * t)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert rate == 8000 and len(out) == 800
    assert np.max(np.abs(out - s)) < 1e-3  # 16-bit quantization only
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFFxxxxWAVE")  # missing chunks


def test_decode_image_dispatch():
    img = np.full((3, 3, 3), 9, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    with pytest.raises(ValueError, match="unsupported image codec"):
        decode_image(b"\x89PNG....")


def test_resize_nearest_pattern():
    # 4x4 checkerboard of 2x2 blocks → 2x2 keeps one pixel per block
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, 2:] = 255
    img[2:, :2] = 255
    small = _resize_nearest(img, 2, 2)
    assert small[0, 0, 0] == 0 and small[0, 1, 0] == 255
    assert small[1, 0, 0] == 255 and small[1, 1, 0] == 0
    # upscale is repetition
    big = _resize_nearest(small, 4, 4)
    assert big.shape == (4, 4, 3)


def test_split_ppm_stream():
    rng = np.random.default_rng(9)
    frames = [
        encode_ppm(rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8))
        for _ in range(5)
    ]
    got = _split_ppm_stream(b"".join(frames))
    assert got == frames
    with pytest.raises(ValueError):
        _split_ppm_stream(frames[0] + b"JUNK")


def test_split_ppm_stream_noncanonical_headers():
    # frame lengths come from the actual header — comments and extra
    # whitespace must not desync the stream walk
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    canonical = encode_ppm(img)
    commented = b"P6\n# a comment\n5 3\n255\n" + img.tobytes()
    frames = _split_ppm_stream(canonical + commented + canonical)
    assert len(frames) == 3
    assert np.array_equal(decode_ppm(frames[1]), img)
    with pytest.raises(ValueError):
        _split_ppm_stream(commented[:-4])  # truncated frame


# -- Spark-side transforms ----------------------------------------------------------


def test_resize_images_spark(spark):
    media = synth_decodable_media(spark, n=8).where("kind = 'image'")
    out = resize_images(media, width=6, height=4).collect()
    assert len(out) == 4
    for r in out:
        img = decode_ppm(bytes(r.payload))
        assert img.shape == (4, 6, 3)
        assert r.meta["w"] == "6" and r.meta["h"] == "4" and r.meta["codec"] == "ppm"


def test_resize_unsupported_codec_raises(spark):
    media = synth_media(spark, n=3).where("media_id = 0")
    with pytest.raises(Exception, match="unsupported image codec"):
        resize_images(media, 4, 4).collect()


def test_sample_frames_spark(spark):
    media = synth_decodable_media(spark, n=8).where("kind = 'video'")
    out = sample_frames(media, every_k=2).collect()
    assert len(out) == 2
    for r in out:
        frames = _split_ppm_stream(bytes(r.payload))
        assert len(frames) == 3  # 6 frames, every 2nd kept
        assert r.meta["n_frames"] == "3"


def test_real_features_decode_paths(spark):
    media = synth_decodable_media(spark, n=12)
    rows = extract_media_features(media, dim=8).collect()
    assert len(rows) == 12
    by_id = {r.media_id: r for r in rows}
    for r in rows:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-5
    # audio features are spectral: a pure tone concentrates energy in few
    # bands — the max band carries most of it
    audio = [r for r in rows if r.kind == "audio"]
    assert audio and all(max(r.feature) > 0.5 for r in audio)
    # determinism
    again = extract_media_features(synth_decodable_media(spark, n=12), dim=8).collect()
    assert {r.media_id: r.feature for r in again} == {
        r.media_id: r.feature for r in rows
    }
    # image features respond to content: an all-black PPM puts all mass
    # in the first luma bin
    from linkgraph.text.multimodal import _decode_features, encode_ppm as enc

    black = _decode_features(enc(np.zeros((4, 4, 3), dtype=np.uint8)), dim=8)
    assert black[0] == pytest.approx(1.0)


def test_opaque_fallback_unchanged(spark):
    # random-byte payloads (no magic) keep the byte-histogram contract
    rows = extract_media_features(synth_media(spark, n=6), dim=8).collect()
    assert all(abs(sum(r.feature) - 1.0) < 1e-5 for r in rows if r.n_bytes > 0)


# -- codec seam (VERDICT r3 #2) ------------------------------------------------


def _make_fake_jpeg_decode():
    """Deterministic stand-in for a Pillow JPEG decoder: a 4x4 RGB image
    whose pixels derive from the payload bytes after the JPEG SOI/APP0
    marker — so the test can prove the REAL payload bytes reached the
    executor-side decoder through the Arrow batch. Built as a CLOSURE
    (not a test-module top-level function) because that is the seam's
    contract: cloudpickle carries the registered decoder by value to
    executors that cannot import the registering module."""

    def _fake_jpeg_decode(payload: bytes) -> np.ndarray:
        body = np.frombuffer(payload[4:], dtype=np.uint8)
        return np.resize(body, 4 * 4 * 3).reshape(4, 4, 3)

    return _fake_jpeg_decode


_fake_jpeg_decode = _make_fake_jpeg_decode()


def _jpeg_shaped(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return b"\xff\xd8\xff\xe0" + rng.integers(0, 256, 64, dtype=np.uint8).tobytes()


def test_codec_seam_carries_jpeg_bytes_through_mapinpandas(spark):
    """register_image_codec at runtime on the driver → extract_media_features
    decodes JPEG-shaped payloads through the hook inside mapInPandas (luma
    histogram of the fake decode, not the byte-histogram fallback), while
    unregistered payloads keep the fallback untouched."""
    from linkgraph.text.multimodal import (
        MEDIA_SCHEMA,
        _byte_histogram,
        _decode_features,
        extract_media_features,
        register_image_codec,
        unregister_image_codec,
    )

    payloads = [_jpeg_shaped(s) for s in (1, 2, 3)]
    rows = [(i, "image", p, {"codec": "jpeg"}) for i, p in enumerate(payloads)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    # Before registration: JPEG magic is opaque → byte-histogram fallback.
    before = {
        r["media_id"]: r["feature"]
        for r in extract_media_features(media, dim=8).collect()
    }
    for i, p in enumerate(payloads):
        bh = _byte_histogram(p, 8)
        want = (bh / bh.sum()).tolist()
        assert np.allclose(before[i], want, atol=1e-6)

    register_image_codec(b"\xff\xd8", _fake_jpeg_decode)
    try:
        after = {
            r["media_id"]: r["feature"]
            for r in extract_media_features(media, dim=8).collect()
        }
        for i, p in enumerate(payloads):
            img = _fake_jpeg_decode(p).astype(np.float64)
            luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
            hist = np.histogram(luma, bins=8, range=(0, 256))[0].astype(np.float64)
            want = (hist / hist.sum()).tolist()
            assert np.allclose(after[i], want, atol=1e-6), i
            # and the hook really changed the answer vs the fallback
            assert not np.allclose(after[i], before[i], atol=1e-6)
    finally:
        unregister_image_codec(b"\xff\xd8")
    # registry restored → driver-side helper falls back again
    assert np.allclose(
        _decode_features(payloads[0], 8),
        np.array(before[0], dtype=np.float32),
        atol=1e-6,
    )


def test_codec_seam_resize_and_closure_snapshot(spark):
    """resize_images routes registered codecs through the same seam; and
    the registry snapshot is taken at PLAN time — a plan built while the
    codec was registered keeps working after unregistration (closure
    capture, the property that makes runtime registration executor-safe)."""
    from linkgraph.text.multimodal import (
        MEDIA_SCHEMA,
        decode_ppm,
        register_image_codec,
        resize_images,
        unregister_image_codec,
    )

    rows = [(0, "image", _jpeg_shaped(7), {"codec": "jpeg"})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    register_image_codec(b"\xff\xd8", _fake_jpeg_decode)
    try:
        plan = resize_images(media, width=2, height=2)
    finally:
        unregister_image_codec(b"\xff\xd8")
    out = plan.collect()  # executes AFTER unregistration
    img = decode_ppm(bytes(out[0]["payload"]))
    assert img.shape == (2, 2, 3)
    src = _fake_jpeg_decode(_jpeg_shaped(7))
    # nearest-neighbor on a 4x4 → rows/cols 0 and 2
    want = src[[0, 2]][:, [0, 2]]
    assert (img == want).all()
