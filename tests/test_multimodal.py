"""Multimodal binary-column plumbing tests (decode kernels stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rmlint_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    exact_asset_dupes,
    extract_features,
    synthetic_assets,
)


def test_decode_codec_formats_still_stubbed():
    # formats with no pure-numpy codec here (e.g. WebP images) keep
    # the honest NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPwebpbytes")
    # MPEG-1 Layer III decodes for real since r5: the zeroed-payload
    # metadata stub is a legal all-silence stream, not a refusal
    import numpy as np

    from rmlint_spark.operators.flac import encode_mp3_stub
    from rmlint_spark.operators.multimodal import decode_audio

    rate, pcm = decode_audio(encode_mp3_stub(3, bitrate_kbps=128, rate=44100))
    assert rate == 44100 and np.abs(pcm).max() == 0


def test_ppm_roundtrip_and_real_decode():
    import numpy as np

    from rmlint_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # decode_image dispatches P6 for real
    assert (decode_image(encode_ppm(img)) == img).all()
    # header comments are part of the grammar
    with_comment = b"P6\n# a comment\n9 5\n255\n" + img.tobytes()
    assert (decode_ppm(with_comment) == img).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n9 5\n255\n\x00\x01")  # truncated raster


def test_wav_roundtrip():
    import numpy as np

    from rmlint_spark.operators.multimodal import decode_wav, encode_wav

    t = np.arange(800)
    samples = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    rate, got = decode_wav(encode_wav(samples, rate=16000))
    assert rate == 16000
    assert (got == samples).all()


def test_ima_adpcm_wav_decode():
    """IMA/DVI ADPCM (WAVE fmt 0x11) — the real compressed-audio
    decode path: 4-bit predictive coding, lossy but spec-exact."""
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _ima_step,
        decode_wav,
        encode_wav,
        encode_wav_ima,
    )

    t = np.arange(4000)
    smooth = (1000 * np.sin(t / 20)).astype(np.int16)
    payload = encode_wav_ima(smooth, rate=8000)
    # ~4x smaller than PCM16 (headers amortized)
    assert len(payload) < len(encode_wav(smooth, rate=8000)) / 3.5
    rate, got = decode_wav(payload)
    assert rate == 8000
    # fact chunk trims final-block padding to the exact sample count
    assert len(got) == len(smooth)
    err = got.astype(np.float64) - smooth.astype(np.float64)
    snr = 10 * np.log10((smooth.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 35.0
    # decoder state transition matches the published tables:
    # from (pred=0, idx=0) step=7, nibble 0b0101 -> diff = 7>>3 +
    # (bit2: 7) + (bit0: 7>>2) = 0+7+1 = 8; index += index_table[5]=4
    assert _ima_step(0b0101, 0, 0) == (8, 4)
    from rmlint_spark.operators.multimodal import _IMA_STEPS

    step = _IMA_STEPS[10]
    pred, idx = _ima_step(0b1111, 100, 10)
    assert pred == 100 - (step + (step >> 1) + (step >> 2) + (step >> 3))
    assert idx == 10 + 8
    # malformed: step index > 88 in a block header must raise
    bad = bytearray(payload)
    data_at = payload.index(b"data") + 8
    bad[data_at + 2] = 120
    try:
        decode_wav(bytes(bad))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_g711_wav_decode():
    """G.711 mu-law / A-law (WAVE fmt 7 / 6): telephony log-PCM,
    decoded through vectorized 256-entry LUTs. Pinned to the ITU
    extrema and the standard two-zero-code property."""
    import struct

    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _alaw_lut,
        _ulaw_lut,
        decode_wav,
        encode_wav_ulaw,
    )

    ul, al = _ulaw_lut(), _alaw_lut()
    # ITU G.711 anchor points
    assert ul[0xFF] == 0 and ul[0x7F] == 0  # +0 and -0 both decode to 0
    assert ul[0x80] == 32124 and ul[0x00] == -32124
    assert al[0xD5] == 8 and al[0x55] == -8
    assert al[0xAA] == 32256 and al[0x2A] == -32256
    # mu-law roundtrip: exact length, high SNR on a speech-band sine
    t = np.arange(2000)
    s = (8000 * np.sin(t / 30)).astype(np.int16)
    rate, d = decode_wav(encode_wav_ulaw(s, rate=8000))
    assert rate == 8000 and len(d) == len(s)
    err = d.astype(np.float64) - s.astype(np.float64)
    snr = 10 * np.log10((s.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 35.0
    # encoder inverts the decode LUT on every level except -0 (folds to +0)
    payload = encode_wav_ulaw(ul.astype(np.int16))
    enc = np.frombuffer(payload[payload.index(b"data") + 8 :][:256], dtype=np.uint8)
    assert (enc == np.arange(256)).sum() == 255 and enc[0x7F] == 0xFF
    # A-law decode through the WAV chunk walk
    fmt = struct.pack("<HHIIHHH", 6, 1, 8000, 8000, 1, 8, 0)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 256) + bytes(range(256))
    r2, d2 = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert r2 == 8000 and (d2 == al).all()
    # A-law encoder inverts the LUT on ALL 256 codes (no dual zero)
    from rmlint_spark.operators.multimodal import encode_wav_alaw

    p2 = encode_wav_alaw(al.astype(np.int16))
    enc2 = np.frombuffer(p2[p2.index(b"data") + 8 :][:256], dtype=np.uint8)
    assert (enc2 == np.arange(256)).all()


def test_au_container_and_cross_container_companded_dedup():
    """Sun AU (.snd): real header + mu-law/PCM16-BE decode. G.711 is
    a deterministic code map, so the same clip mu-law'd into AU and
    WAV containers decodes bit-identically -> cross-container dedup
    extends to lossy-companded audio."""
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _features_for,
        decode_au,
        decode_wav,
        detect_format,
        encode_au,
        encode_wav_ulaw,
    )

    clip = (6000 * np.sin(np.arange(1600) / 11)).astype(np.int16)
    # PCM16-BE AU roundtrips exactly
    r, d = decode_au(encode_au(clip, rate=16000, encoding=3))
    assert r == 16000 and (d == clip).all()
    # mu-law AU decodes bit-identically to mu-law WAV of the same clip
    r_au, d_au = decode_au(encode_au(clip, rate=8000, encoding=1))
    r_wav, d_wav = decode_wav(encode_wav_ulaw(clip, rate=8000))
    assert (d_au == d_wav).all() and r_au == r_wav == 8000
    f_au = _features_for(encode_au(clip, rate=8000, encoding=1))
    f_wav = _features_for(encode_wav_ulaw(clip, rate=8000))
    assert (f_au == f_wav).all()
    assert detect_format(encode_au(clip)) == "au"
    # malformed: truncated header raises, not crashes downstream
    try:
        decode_au(b".snd\x00\x00")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_ima_adpcm_features_and_probe(spark):
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _features_for,
        encode_wav_ima,
        probe_audio,
        synthetic_audio_assets,
    )

    clip = (2000 * np.sin(np.arange(1600) / 9)).astype(np.int16)
    f = _features_for(encode_wav_ima(clip, rate=16000))
    assert f is not None and np.isfinite(f).all()
    rows = {
        r["asset_id"]: r
        for r in probe_audio(
            synthetic_audio_assets(spark, n=16, include_adpcm=True)
        ).collect()
    }
    adpcm = [r for r in rows.values() if r["container"] == "wav-adpcm"]
    assert {r["asset_id"] for r in adpcm} == {5, 13}
    for r in adpcm:
        assert r["bits_per_sample"] == 4 and r["bitrate_kbps"] == 64
        assert r["n_samples"] == 1600 and r["sample_rate"] == 16000


def test_real_image_features_reflect_pixels():
    import numpy as np

    from rmlint_spark.operators.multimodal import _features_for, encode_ppm

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 200
    blue = np.zeros((8, 8, 3), dtype=np.uint8)
    blue[:, :, 2] = 200
    f_red = _features_for(encode_ppm(red))
    f_blue = _features_for(encode_ppm(blue))
    # uniform images: zero std, zero gradients; channel means dominate
    assert f_red[0] > 0 and f_red[1] == 0 and f_red[2] == 0
    assert f_blue[2] > 0 and f_blue[0] == 0
    assert not np.allclose(f_red, f_blue)
    # deterministic
    assert (f_red == _features_for(encode_ppm(red))).all()


def test_real_audio_features_reflect_samples():
    import numpy as np

    from rmlint_spark.operators.multimodal import _features_for, encode_wav

    loud = (np.sin(np.linspace(0, 100, 1600)) * 30000).astype(np.int16)
    quiet = (np.sin(np.linspace(0, 100, 1600)) * 300).astype(np.int16)
    f_loud = _features_for(encode_wav(loud))
    f_quiet = _features_for(encode_wav(quiet))
    assert not np.allclose(f_loud, f_quiet)


def test_real_resize_nearest_neighbor(spark):
    import numpy as np

    from rmlint_spark.operators.multimodal import encode_ppm, resize_images

    # 4x4 image with distinct quadrant colors -> 2x2 picks one pixel
    # per quadrant
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = (255, 0, 0)
    img[:2, 2:] = (0, 255, 0)
    img[2:, :2] = (0, 0, 255)
    img[2:, 2:] = (255, 255, 0)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(img)), None, None, None, None)],
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    out = resize_images(assets, width=2, height=2).collect()
    thumb = np.frombuffer(bytes(out[0]["thumb"]), dtype=np.uint8).reshape(2, 2, 3)
    assert (thumb[0, 0] == (255, 0, 0)).all()
    assert (thumb[0, 1] == (0, 255, 0)).all()
    assert (thumb[1, 0] == (0, 0, 255)).all()
    assert (thumb[1, 1] == (255, 255, 0)).all()


def test_extract_features_decodes_real_payloads(spark):
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _features_for,
        encode_ppm,
        encode_wav,
    )

    img = np.full((6, 6, 3), 128, dtype=np.uint8)
    wav = encode_wav((np.arange(400) % 100 * 300 - 15000).astype(np.int16))
    assets = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_ppm(img)), None, None, None, None),
            (2, "audio", bytearray(wav), None, None, None, None),
        ],
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    rows = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    assert np.allclose(rows[1], _features_for(encode_ppm(img)), atol=1e-6)
    assert np.allclose(rows[2], _features_for(wav), atol=1e-6)


def test_feature_extraction_shapes_and_determinism(spark):
    assets = synthetic_assets(spark, n=60)
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    # determinism across partitioning
    rows2 = extract_features(assets.repartition(7)).collect()
    m1 = {r["asset_id"]: r["features"] for r in rows}
    m2 = {r["asset_id"]: r["features"] for r in rows2}
    assert m1 == m2
    # identical payloads -> identical features
    by_sha = {}
    for r in rows:
        by_sha.setdefault(r["payload_sha"], set()).add(tuple(r["features"]))
    assert all(len(v) == 1 for v in by_sha.values())


def test_exact_asset_dupes(spark):
    assets = synthetic_assets(spark, n=60)
    dupes = exact_asset_dupes(assets)
    rows = dupes.collect()
    # ids 0,10,20,30,40,50 share a payload
    dup_ids = {r["asset_id"] for r in rows}
    assert dup_ids == {0, 10, 20, 30, 40, 50}
    assert all(r["cluster_size"] == 6 for r in rows)


def test_resize_plumbing(spark):
    from rmlint_spark.operators.multimodal import resize_images

    assets = synthetic_assets(spark, n=30)
    out = resize_images(assets, width=8, height=4).collect()
    # only image rows (asset_id % 3 == 0), thumb exactly w*h*3 bytes
    assert {r["asset_id"] % 3 for r in out} == {0}
    assert all(len(r["thumb"]) == 8 * 4 * 3 for r in out)
    assert all((r["width"], r["height"]) == (8, 4) for r in out)
    # deterministic: identical payloads -> identical thumbs
    dup = {r["asset_id"]: bytes(r["thumb"]) for r in out}
    assert dup[0] == dup[30] if 30 in dup else True


def test_frame_sampling_plumbing(spark):
    from rmlint_spark.operators.multimodal import sample_frames

    assets = synthetic_assets(spark, n=30)
    frames = sample_frames(assets, every_ms=500).collect()
    # only video rows (asset_id % 3 == 2); frame count = duration // 500
    vids = {r["asset_id"] for r in frames}
    assert vids and all(a % 3 == 2 for a in vids)
    durations = {
        r["asset_id"]: r["duration_ms"]
        for r in assets.filter(F.col("kind") == "video").collect()
    }
    from collections import Counter

    per = Counter(r["asset_id"] for r in frames)
    assert all(per[a] == durations[a] // 500 for a in per)
    # timestamps stride by every_ms from 0
    first = sorted(r["t_ms"] for r in frames if r["asset_id"] == min(vids))
    assert first == list(range(0, durations[min(vids)] // 500 * 500, 500))


def test_malformed_magic_payloads_degrade_to_opaque():
    """ADVICE r3: magic-matching but malformed payloads used to raise
    struct.error / ZeroDivisionError out of the feature UDF and fail
    the whole job. The contract is 'malformed: treat as opaque bytes'
    — every such payload must produce the deterministic stand-in."""
    import struct

    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _fake_features,
        _features_for,
        decode_ppm,
        decode_wav,
    )

    # RIFF/WAVE with a truncated fmt chunk (struct.error before)
    trunc_fmt = b"RIFF" + struct.pack("<I", 20) + b"WAVEfmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    # rate=0 (ZeroDivisionError in _audio_features before)
    fmt0 = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    rate0 = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt " + struct.pack("<I", len(fmt0))
        + fmt0 + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    # zero-height P6 (ZeroDivisionError in _image_features before)
    zero_h = b"P6\n4 0\n255\n"
    # truncated P6 header (fields never complete)
    trunc_p6 = b"P6\n4"
    for payload in (trunc_fmt, rate0, zero_h, trunc_p6):
        got = _features_for(payload)
        want = _fake_features(payload)
        assert np.allclose(got, want), payload[:20]
    # the decoders themselves fail uniformly with ValueError
    with pytest.raises(ValueError):
        decode_wav(trunc_fmt)
    with pytest.raises(ValueError):
        decode_wav(rate0)
    with pytest.raises(ValueError):
        decode_ppm(zero_h)


def test_resize_malformed_p6_falls_back_to_stub(spark):
    """resize_images used to call decode_ppm unguarded: a truncated or
    zero-dim P6 payload crashed the resize job. It must now emit the
    deterministic stub block instead."""
    import hashlib

    from rmlint_spark.operators.multimodal import resize_images

    rows = [
        (1, "image", bytearray(b"P6\n4 0\n255\n"), None, None, None, None),
        (2, "image", bytearray(b"P6\n2 2\n255\n\x00\x01"), None, None, None, None),
    ]
    assets = spark.createDataFrame(
        rows,
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    out = {r["asset_id"]: bytes(r["thumb"]) for r in resize_images(assets, 8, 8).collect()}
    assert set(out) == {1, 2}
    for aid, payload in ((1, b"P6\n4 0\n255\n"), (2, b"P6\n2 2\n255\n\x00\x01")):
        digest = hashlib.sha256(payload).digest()
        want = (digest * (-(-192 // len(digest))))[:192]
        assert out[aid] == want


def test_pgm_pbm_roundtrip_and_features():
    """netpbm grayscale/bitmap decode (VERDICT r3 #7): P5 and P4
    round-trip through the pure-numpy codecs, feed the real image
    feature kernel, and malformed variants degrade to the stand-in."""
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _fake_features,
        _features_for,
        decode_pbm,
        decode_pgm,
        encode_pbm,
        encode_pgm,
    )

    rng = np.random.RandomState(5)
    gray = rng.randint(0, 256, size=(6, 11), dtype=np.uint8)
    rgb = decode_pgm(encode_pgm(gray))
    assert rgb.shape == (6, 11, 3)
    assert (rgb[:, :, 0] == gray).all() and (rgb[:, :, 2] == gray).all()
    assert (decode_image(encode_pgm(gray)) == rgb).all()

    bits = rng.randint(0, 2, size=(5, 13))  # width not a byte multiple
    bm = decode_pbm(encode_pbm(bits))
    assert bm.shape == (5, 13, 3)
    assert ((bm[:, :, 0] == 0) == (bits == 1)).all()  # 1 = black

    # real features differ from the opaque stand-in (the decode ran)
    f = _features_for(encode_pgm(gray))
    assert not np.allclose(f, _fake_features(encode_pgm(gray)))
    # malformed: truncated raster and zero-dim headers degrade
    for bad in (b"P5\n4 4\n255\n\x00", b"P4\n0 3\n", b"P5\n3 3\n128\n" + b"\x00" * 9):
        assert np.allclose(_features_for(bad), _fake_features(bad))


def test_aiff_roundtrip_and_features():
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _audio_features,
        _fake_features,
        _features_for,
        decode_aiff,
        decode_audio,
        encode_aiff,
        encode_wav,
    )

    t = np.arange(600)
    samples = (np.sin(2 * np.pi * 330 * t / 22050) * 15000).astype(np.int16)
    rate, got = decode_aiff(encode_aiff(samples, rate=22050))
    assert rate == 22050 and (got == samples).all()
    rate2, got2 = decode_audio(encode_aiff(samples, rate=22050))
    assert rate2 == 22050 and (got2 == samples).all()

    # the SAME audio content produces the SAME features from either
    # container (the features are of the samples, not the bytes)
    f_aiff = _features_for(encode_aiff(samples, rate=16000))
    f_wav = _features_for(encode_wav(samples, rate=16000))
    assert np.allclose(f_aiff, f_wav)
    assert np.allclose(f_aiff, _audio_features(16000, samples))

    # malformed AIFFs degrade to the stand-in
    for bad in (
        b"FORM\x00\x00\x00\x04AIFF",                       # no chunks
        b"FORM\x00\x00\x00\x10AIFFCOMM\x00\x00\x00\x04abcd",  # truncated COMM
    ):
        assert np.allclose(_features_for(bad), _fake_features(bad))


def test_resize_handles_pgm_and_pbm(spark):
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _resize_nn,
        decode_image,
        encode_pgm,
        resize_images,
    )

    rng = np.random.RandomState(9)
    gray = rng.randint(0, 256, size=(10, 7), dtype=np.uint8)
    payload = encode_pgm(gray)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload), None, None, None, None)],
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    (row,) = resize_images(assets, 4, 4).collect()
    want = _resize_nn(decode_image(payload), 4, 4).tobytes()
    assert bytes(row["thumb"]) == want


def test_png_roundtrip_all_filter_types():
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_ppm,
        _features_for,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    for ft in range(5):  # None, Sub, Up, Average, Paeth
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)
    # gradient image (the case where Sub/Paeth residuals actually shrink)
    grad = (np.arange(24 * 24 * 3, dtype=np.uint64) % 256).astype(np.uint8).reshape(24, 24, 3)
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(grad, filter_type=ft)), grad)
    # features are container-invariant: SAME pixels via PNG or PPM
    assert np.allclose(_features_for(encode_png(img)), _features_for(encode_ppm(img)))


def _png_raw(w, h, color, raster, plte=None, interlace=0, depth=8):
    """Test-local PNG builder for color types encode_png doesn't emit."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")


def test_png_color_types_gray_palette_alpha():
    import numpy as np

    from rmlint_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(11)
    # color 0: grayscale
    gray = rng.randint(0, 256, size=(5, 4), dtype=np.uint8)
    raster = b"".join(b"\x00" + row.tobytes() for row in gray)
    got = decode_png(_png_raw(4, 5, 0, raster))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    # color 3: palette
    plte = bytes(range(16 * 3))
    idx = rng.randint(0, 16, size=(3, 6), dtype=np.uint8)
    raster = b"".join(b"\x00" + row.tobytes() for row in idx)
    got = decode_png(_png_raw(6, 3, 3, raster, plte=plte))
    lut = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    assert np.array_equal(got, lut[idx])
    # color 4: gray+alpha (alpha dropped)
    ga = rng.randint(0, 256, size=(4, 3, 2), dtype=np.uint8)
    raster = b"".join(b"\x00" + row.tobytes() for row in ga)
    got = decode_png(_png_raw(3, 4, 4, raster))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))
    # color 6: RGBA (alpha dropped)
    rgba = rng.randint(0, 256, size=(4, 5, 4), dtype=np.uint8)
    raster = b"".join(b"\x00" + row.tobytes() for row in rgba)
    got = decode_png(_png_raw(5, 4, 6, raster))
    assert np.array_equal(got, rgba[:, :, :3])


def test_png_malformed_payloads_degrade():
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _fake_features,
        _features_for,
        decode_png,
        encode_png,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    flipped = bytearray(good)
    flipped[-20] ^= 0xFF  # corrupt inside IDAT -> CRC mismatch
    bads = [
        bytes(flipped),
        good[:30],                                        # truncated mid-chunk
        _png_raw(4, 4, 2, b"\x00" * (4 * (1 + 12)), interlace=1),  # Adam7
        _png_raw(4, 4, 2, b"\x00" * 10),                  # short raster
        _png_raw(2, 2, 3, b"\x00\x05\x05\x00\x05\x05", plte=b"\x00\x00\x00"),  # idx>palette
        _png_raw(2, 2, 2, b"\x09" + b"\x00" * 6 + b"\x00" * 7),  # bad filter type
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            decode_png(bad)
        assert np.allclose(_features_for(bad), _fake_features(bad))
    # zlib-corrupt IDAT with a VALID crc (recomputed) degrades too
    broken = _png_raw(4, 4, 2, b"")
    with pytest.raises(Exception):
        decode_png(broken)
    assert np.allclose(_features_for(broken), _fake_features(broken))


def test_y4m_roundtrip_and_colorspaces():
    import numpy as np

    from rmlint_spark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.RandomState(13)
    # Cmono: grayscale content round-trips EXACTLY
    gray = rng.randint(0, 256, size=(8, 10), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    fps, frames = decode_y4m(encode_y4m([rgb, 255 - rgb], fps=(2, 1), colorspace="Cmono"))
    assert fps == (2, 1) and len(frames) == 2
    assert np.array_equal(frames[0], rgb)
    assert np.array_equal(frames[1], 255 - rgb)
    # C444: BT.601 round-trip within quantization error
    ins = [rng.randint(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(3)]
    _, back = decode_y4m(encode_y4m(ins, colorspace="C444"))
    for a, b in zip(ins, back):
        assert np.abs(b.astype(int) - a.astype(int)).max() <= 4
    # C420 (half-res chroma, upsampled on decode)
    y = np.full((4, 6), 100, np.uint8)
    u = np.full((2, 3), 128, np.uint8)
    payload = (
        b"YUV4MPEG2 W6 H4 F25:1 C420jpeg\nFRAME\n"
        + y.tobytes() + u.tobytes() + u.tobytes()
    )
    _, fr = decode_y4m(payload)
    assert fr[0].shape == (4, 6, 3)
    assert np.abs(fr[0].astype(int) - 100).max() <= 1
    # malformed containers raise ValueError
    from rmlint_spark.operators.multimodal import _fake_features, _features_for

    for bad in (
        b"YUV4MPEG2 W6 H4\nFRAME\n" + b"\x00" * 5,   # truncated frame
        b"YUV4MPEG2 H4 F25:1\nFRAME\n",               # missing width
        b"YUV4MPEG2 W6 H4 C999\nFRAME\n",             # unknown colorspace
        b"YUV4MPEG2 W6 H4\nNOTAFRAME\n" + b"\x00" * 54,
    ):
        with pytest.raises(ValueError):
            decode_y4m(bad)
        assert np.allclose(_features_for(bad), _fake_features(bad))


def test_y4m_video_features_real():
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _fake_features,
        _features_for,
        encode_y4m,
    )

    rng = np.random.RandomState(17)
    frames = [rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(5)]
    vid = encode_y4m(frames, colorspace="C444")
    f = _features_for(vid)
    assert f.shape == (16,) and np.isclose(np.linalg.norm(f), 1.0, atol=1e-5)
    # real (pixel-derived), not the hash stand-in; deterministic
    assert not np.allclose(f, _fake_features(vid))
    assert np.array_equal(f, _features_for(vid))
    # same pixels, different frame-rate tag -> same features
    assert np.allclose(f, _features_for(encode_y4m(frames, fps=(30, 1), colorspace="C444")))


def test_sample_frames_decodes_real_y4m(spark):
    import hashlib

    import numpy as np

    from rmlint_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        sample_frames,
    )

    rng = np.random.RandomState(19)
    frames = [rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(4)]
    vid = encode_y4m(frames, fps=(2, 1), colorspace="Cmono")  # 4 frames @ 2fps = 2000ms
    schema = (
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long"
    )
    assets = spark.createDataFrame(
        [
            (1, "video", bytearray(vid), None, None, None, None),      # real decode
            (2, "video", bytearray(b"opaque-mp4"), None, None, None, 1000),  # stub
        ],
        schema,
    )
    rows = sample_frames(assets, every_ms=500).orderBy("asset_id", "frame_idx").collect()
    real = [r for r in rows if r["asset_id"] == 1]
    stub = [r for r in rows if r["asset_id"] == 2]
    # 2000ms duration FROM THE CONTAINER (metadata said None), 4 samples
    assert [r["t_ms"] for r in real] == [0, 500, 1000, 1500]
    decoded = decode_y4m(vid)[1]
    want = [hashlib.sha256(fr.tobytes()).hexdigest() for fr in decoded]
    assert [r["frame_sha"] for r in real] == want
    # stub path: duration from metadata, payload-derived shas
    assert [r["t_ms"] for r in stub] == [0, 500]
    assert stub[0]["frame_sha"] == hashlib.sha256(b"opaque-mp4" + b"0").hexdigest()


def test_resize_handles_png(spark):
    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _resize_nn,
        decode_png,
        encode_png,
        resize_images,
    )

    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, size=(11, 9, 3), dtype=np.uint8)
    payload = encode_png(img, filter_type=4)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload), None, None, None, None)],
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    (row,) = resize_images(assets, 5, 5).collect()
    assert bytes(row["thumb"]) == _resize_nn(decode_png(payload), 5, 5).tobytes()


def test_jpeg_roundtrip_and_modes():
    import numpy as np

    from rmlint_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(5)
    x = np.linspace(0, 255, 48)
    img = np.stack(
        [np.tile(x, (32, 1)), np.tile(x[::-1], (32, 1)), np.full((32, 48), 100.0)],
        axis=2,
    ).astype(np.uint8)
    # 4:4:4 at two qualities
    for q, tol in [(95, 6), (75, 16)]:
        back = decode_jpeg(encode_jpeg(img, quality=q))
        assert back.shape == img.shape
        assert np.abs(back.astype(int) - img.astype(int)).max() <= tol
    # 4:2:0 chroma subsampling (16-aligned dims: no pad-seam ringing)
    back = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 16
    # restart markers: RSTn every 3 MCUs, DC predictors reset
    back = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=3))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 6
    # q=100 quantizes near-losslessly even for noise
    noise = rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(back.astype(int) - noise.astype(int)).max() <= 3
    # odd dims + subsampling + DRI=1 (every MCU restarted)
    odd = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, quality=90, subsample=True, restart_interval=1)).shape == odd.shape
    # byte-deterministic encode
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)
    # decode_image dispatches JPEG for real
    assert np.array_equal(decode_image(encode_jpeg(img, 95)), decode_jpeg(encode_jpeg(img, 95)))


def test_jpeg_malformed_payloads_degrade():
    import numpy as np

    from rmlint_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from rmlint_spark.operators.multimodal import _fake_features, _features_for

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    good = encode_jpeg(img, quality=90)
    # flip the SOF0 marker to SOF2 (progressive): honest ValueError
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    bads = [
        good[:40],          # truncated mid-segment
        prog,               # progressive
        good[:-4],          # missing scan terminator/EOI
        b"\xff\xd8\xff\xd9",  # SOI+EOI, no scan
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            decode_jpeg(bad)
        assert np.allclose(_features_for(bad), _fake_features(bad))
    # the intact payload produces REAL pixel-derived features
    assert not np.allclose(_features_for(good), _fake_features(good))


def test_jpeg_features_and_resize_in_spark(spark):
    import numpy as np

    from rmlint_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from rmlint_spark.operators.multimodal import (
        _image_features,
        _resize_nn,
        extract_features,
        resize_images,
    )

    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quality=95)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload), None, None, None, None)],
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    (feat,) = extract_features(assets).collect()
    assert np.allclose(feat["features"], _image_features(decode_jpeg(payload)), atol=1e-6)
    (row,) = resize_images(assets, 4, 4).collect()
    assert bytes(row["thumb"]) == _resize_nn(decode_jpeg(payload), 4, 4).tobytes()


def test_mp4_parse_and_skeleton():
    import pytest as _pytest

    from rmlint_spark.operators.mp4 import (
        encode_mp4_skeleton,
        parse_mp4,
        sample_timestamps,
    )

    p = encode_mp4_skeleton(width=320, height=240, fps=(4, 1), n_frames=8)
    m = parse_mp4(p)
    assert m["brand"] == "isom" and m["duration_ms"] == 2000
    (tr,) = m["tracks"]
    assert (tr["kind"], tr["codec"], tr["width"], tr["height"]) == ("video", "avc1", 320, 240)
    assert tr["n_samples"] == 8
    # stts-derived presentation timestamps: 8 frames at 4 fps
    assert sample_timestamps(m) == [0, 250, 500, 750, 1000, 1250, 1500, 1750]
    for bad in (b"", b"\x00\x00\x00\x08ftyp", p[:40], p[:-10]):
        with _pytest.raises(ValueError):
            parse_mp4(bad)


def test_sample_frames_mp4_real_timing(spark):
    import hashlib

    from rmlint_spark.operators.mp4 import encode_mp4_skeleton
    from rmlint_spark.operators.multimodal import sample_frames

    vid = encode_mp4_skeleton(fps=(2, 1), n_frames=3)  # 1500 ms, frames at 0/500/1000
    assets = spark.createDataFrame(
        [(1, "video", bytearray(vid), None, None, None, 99999)],  # metadata LIES (99999ms)
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    rows = sample_frames(assets, every_ms=600).orderBy("frame_idx").collect()
    # duration 1500ms from the CONTAINER (not the lying metadata): t = 0, 600, 1200
    assert [r["t_ms"] for r in rows] == [0, 600, 1200]
    # t=600 falls in sample 1's interval [500, 1000), t=1200 in sample 2's
    assert rows[1]["frame_sha"] == hashlib.sha256(vid + b"#sample1").hexdigest()
    assert rows[2]["frame_sha"] == hashlib.sha256(vid + b"#sample2").hexdigest()


def test_probe_videos(spark):
    import numpy as np

    from rmlint_spark.operators.mp4 import encode_mp4_skeleton
    from rmlint_spark.operators.multimodal import encode_y4m, probe_videos

    y4m = encode_y4m(
        [np.zeros((6, 8, 3), dtype=np.uint8)] * 5, fps=(5, 1), colorspace="C444"
    )
    mp4 = encode_mp4_skeleton(width=640, height=360, fps=(30, 1), n_frames=90)
    schema = (
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long"
    )
    assets = spark.createDataFrame(
        [
            (1, "video", bytearray(y4m), None, None, None, None),
            (2, "video", bytearray(mp4), None, None, None, None),
            (3, "video", bytearray(b"opaque"), None, None, None, 1234),
            (4, "image", bytearray(b"not-a-video"), None, None, None, None),
        ],
        schema,
    )
    rows = {r["asset_id"]: r for r in probe_videos(assets).collect()}
    assert set(rows) == {1, 2, 3}  # image row filtered out
    assert rows[1]["container"] == "y4m"
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_frames"]) == (8, 6, 5)
    assert rows[1]["duration_ms"] == 1000
    assert rows[2]["container"] == "mp4/isom" and rows[2]["codec"] == "avc1"
    assert (rows[2]["width"], rows[2]["height"]) == (640, 360)
    assert rows[2]["duration_ms"] == 3000 and rows[2]["n_frames"] == 90
    assert rows[3]["container"] == "unknown" and rows[3]["duration_ms"] == 1234


def test_gif_roundtrip_interlace_lzw():
    import struct

    import numpy as np

    from rmlint_spark.operators.gif import (
        _INTERLACE_PASSES,
        _blocks,
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(20, 30))
    img = pal[idx]
    delays, frames = decode_gif(encode_gif(img))
    assert len(frames) == 1 and np.array_equal(frames[0], img)
    # animation with per-frame delays
    f2 = pal[(idx + 1) % 16]
    delays, frames = decode_gif(encode_gif([img, f2], delays_ms=[100, 250]))
    assert delays == [100, 250]
    assert np.array_equal(frames[0], img) and np.array_equal(frames[1], f2)
    # full 256-color palette exercises LZW dictionary growth to 12 bits
    pal256 = np.unique(rng.randint(0, 256, size=(256, 3), dtype=np.uint8), axis=0)
    big = pal256[rng.randint(0, len(pal256), size=(100, 120))]
    _, fr = decode_gif(encode_gif(big))
    assert np.array_equal(fr[0], big)
    # LZW kernel: repetitive input hits the KwKwK case and dict clears
    data = bytes([0, 1, 0, 0, 1, 1, 0, 0, 0, 1, 1, 1] * 500)
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data
    # 4-pass interlaced image (hand-built: rows permuted into pass order)
    h, w = 13, 7
    idx13 = rng.randint(0, 4, size=(h, w)).astype(np.uint8)
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)
    gif += pal4.tobytes()
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
    gif.append(2)
    gif += _blocks(_lzw_encode(idx13[order].tobytes(), 2))
    gif += b"\x3b"
    _, fr = decode_gif(bytes(gif))
    assert np.array_equal(fr[0], pal4[idx13])


def test_gif_animation_transparency_disposal():
    import struct

    import numpy as np

    from rmlint_spark.operators.gif import _blocks, _lzw_encode, decode_gif
    from rmlint_spark.operators.multimodal import _fake_features, _features_for

    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    gif2 = bytearray(b"GIF89a")
    gif2 += struct.pack("<HHBBB", 6, 6, 0x80 | 1, 3, 0)  # bg = palette idx 3
    gif2 += pal4.tobytes()
    # frame 1: full-screen red
    gif2 += b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 6, 0)
    gif2.append(2)
    gif2 += _blocks(_lzw_encode(bytes([1] * 36), 2))
    # frame 2: GCE (disposal=2, transparent idx 0, delay 50ms) + 4x4
    # patch at (1,1) with a 2x2 green core, transparent border
    gif2 += b"\x21\xf9\x04" + struct.pack("<BHB", (2 << 2) | 1, 5, 0) + b"\x00"
    gif2 += b"\x2c" + struct.pack("<HHHHB", 1, 1, 4, 4, 0)
    patch = np.zeros((4, 4), np.uint8)
    patch[1:3, 1:3] = 2
    gif2.append(2)
    gif2 += _blocks(_lzw_encode(patch.tobytes(), 2))
    gif2 += b"\x3b"
    delays, fr = decode_gif(bytes(gif2))
    assert delays == [0, 50]
    assert (fr[0] == [255, 0, 0]).all()
    assert np.array_equal(fr[1][2, 2], [0, 255, 0])   # patch core
    assert np.array_equal(fr[1][1, 1], [255, 0, 0])   # transparent: prior canvas
    assert np.array_equal(fr[1][0, 0], [255, 0, 0])   # outside patch rect
    # malformed GIFs degrade to opaque features
    for bad in (b"GIF89a", bytes(gif2)[:-5], bytes(gif2)[:20]):
        with pytest.raises(ValueError):
            decode_gif(bad)
        assert np.allclose(_features_for(bad), _fake_features(bad))
    # intact GIF -> real pixel-derived image features (of frame 1)
    assert not np.allclose(_features_for(bytes(gif2)), _fake_features(bytes(gif2)))


def test_sample_frames_and_probe_animated_gif(spark):
    import hashlib

    import numpy as np

    from rmlint_spark.operators.gif import decode_gif, encode_gif
    from rmlint_spark.operators.multimodal import probe_videos, sample_frames

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    rng = np.random.RandomState(31)
    frames = [pal[rng.randint(0, 2, size=(5, 5))] for _ in range(3)]
    gif = encode_gif(frames, delays_ms=[400, 400, 400])  # 1200ms timeline
    assets = spark.createDataFrame(
        [(1, "video", bytearray(gif), None, None, None, None)],
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    rows = sample_frames(assets, every_ms=500).orderBy("frame_idx").collect()
    # t = 0 (frame 0), 500 (frame 1: [400, 800)), 1000 (frame 2: [800, 1200))
    decoded = decode_gif(gif)[1]
    assert [r["t_ms"] for r in rows] == [0, 500, 1000]
    assert [r["frame_sha"] for r in rows] == [
        hashlib.sha256(decoded[i].tobytes()).hexdigest() for i in (0, 1, 2)
    ]
    (probe,) = probe_videos(assets).collect()
    assert probe["container"] == "gif" and probe["codec"] == "lzw"
    assert (probe["width"], probe["height"]) == (5, 5)
    assert probe["duration_ms"] == 1200 and probe["n_frames"] == 3


def test_cross_format_frame_dedup(spark):
    from rmlint_spark.operators.multimodal import sample_frames, synthetic_video_assets

    # asset 0 (Y4M) carries pool frames 0-3; asset 1 (GIF) carries 1-4:
    # three frames overlap, found purely by decoded-pixel identity
    assets = synthetic_video_assets(spark, n=2)
    frames = sample_frames(assets, every_ms=250).collect()
    shas = {}
    for r in frames:
        shas.setdefault(r["asset_id"], set()).add(r["frame_sha"])
    assert len(shas[0]) == 4 and len(shas[1]) == 4
    assert len(shas[0] & shas[1]) == 3  # cross-container duplicates


def test_jpeg_grayscale_single_component():
    import numpy as np

    from rmlint_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from rmlint_spark.operators.multimodal import _features_for, _fake_features

    x = np.linspace(0, 255, 24).astype(np.uint8)
    img = np.repeat(np.tile(x, (16, 1))[:, :, None], 3, axis=2)
    for dri in (0, 2):
        payload = encode_jpeg(img, quality=95, grayscale=True, restart_interval=dri)
        back = decode_jpeg(payload)
        assert back.shape == img.shape
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 8
    # real pixel-derived features for grayscale JPEGs too
    p = encode_jpeg(img, quality=95, grayscale=True)
    assert not np.allclose(_features_for(p), _fake_features(p))


def test_resource_bounds_on_crafted_headers():
    """Untrusted-input hardening: headers claiming huge outputs must
    raise ValueError BEFORE any allocation sized by them (degrade to
    opaque bytes), never OOM the executor — the engine decodes
    crawled bytes."""
    import struct
    import zlib

    import numpy as np

    from rmlint_spark.operators.gif import decode_gif
    from rmlint_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from rmlint_spark.operators.mp4 import encode_mp4_skeleton, parse_mp4
    from rmlint_spark.operators.multimodal import (
        _fake_features,
        _features_for,
        decode_png,
        decode_y4m,
    )

    # JPEG: rewrite the SOF dimensions of a valid payload to 65535^2
    good = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    sof = good.index(b"\xff\xc0")
    huge = (
        good[: sof + 5]
        + struct.pack(">HH", 65535, 65535)
        + good[sof + 9 :]
    )
    with pytest.raises(ValueError, match="exceed"):
        decode_jpeg(huge)

    # PNG: huge IHDR dims
    bomb_ihdr = _png_raw(60000, 60000, 2, zlib.compress(b"\x00") * 0 + b"\x00")
    with pytest.raises(ValueError, match="exceed"):
        decode_png(bomb_ihdr)
    # PNG: zip-bomb IDAT (plausible dims, inflated output larger than
    # the header-implied raster) is detected without full inflation
    w = h = 16
    bomb = _png_raw(w, h, 2, b"\x00" * (10 * h * (3 * w + 1)))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(bomb)

    # GIF: huge logical screen
    gif = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="exceed"):
        decode_gif(gif)

    # Y4M: huge frame dims
    with pytest.raises(ValueError, match="exceed"):
        decode_y4m(b"YUV4MPEG2 W99999 H99999 F25:1 C444\nFRAME\n")

    # MP4: stts run expanding to billions of samples
    mp4 = encode_mp4_skeleton(n_frames=4)
    stts_at = mp4.index(b"stts")
    crafted = (
        mp4[: stts_at + 12]
        + struct.pack(">II", 2**31, 1000)
        + mp4[stts_at + 20 :]
    )
    with pytest.raises(ValueError, match="exceed"):
        parse_mp4(crafted)

    # every guard degrades at the feature layer instead of failing
    for p in (huge, bomb, gif):
        assert np.allclose(_features_for(p), _fake_features(p))


def test_format_sniffing(spark):
    import numpy as np

    from rmlint_spark.operators.jpeg import encode_jpeg
    from rmlint_spark.operators.multimodal import (
        detect_format,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert detect_format(encode_ppm(img)) == "pnm"
    assert detect_format(encode_png(img)) == "png"
    assert detect_format(encode_jpeg(img)) == "jpeg"
    assert detect_format(encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    assert detect_format(b"") == "opaque"
    assert detect_format(None) == "opaque"
    # extract_features carries the sniffed format (mime-mismatch
    # detection: the asset CLAIMS octet-stream, the bytes are PNG)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(img)), "application/octet-stream",
          None, None, None)],
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    (row,) = extract_features(assets).collect()
    assert row["format"] == "png"


def test_bmp_roundtrip_and_variants():
    import struct

    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _fake_features,
        _features_for,
        decode_bmp,
        detect_format,
        encode_bmp,
    )

    rng = np.random.RandomState(41)
    # odd widths exercise the 4-byte row padding
    for shape in [(7, 5, 3), (8, 8, 3), (3, 11, 3), (1, 1, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert detect_format(encode_bmp(img)) == "bmp"
    # 32-bit BGRA, top-down (negative height): hand-built
    w, h = 4, 2
    px = rng.randint(0, 256, size=(h, w, 4), dtype=np.uint8)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, w * h * 4, 0, 0, 0, 0)
    bmp = b"BM" + struct.pack("<IHHI", 54 + w * h * 4, 0, 0, 54) + dib + px.tobytes()
    assert np.array_equal(decode_bmp(bmp), px[:, :, 2::-1])
    # malformed + unsupported variants degrade
    bads = [
        b"BMshort",
        encode_bmp(np.zeros((4, 4, 3), np.uint8))[:30],
        # RLE8 compression flag
        b"BM" + struct.pack("<IHHI", 60, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 1, 0, 0, 0, 0, 0) + b"\x00" * 6,
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            decode_bmp(bad)
        assert np.allclose(_features_for(bad), _fake_features(bad))


def test_tiff_roundtrip_packbits_and_byte_orders():
    import struct

    import numpy as np

    from rmlint_spark.operators.multimodal import (
        _fake_features,
        _features_for,
        _packbits_decode,
        _packbits_encode,
        decode_tiff,
        detect_format,
        encode_tiff,
    )

    rng = np.random.RandomState(43)
    for shape in [(6, 9, 3), (1, 1, 3), (16, 4, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(img)), img)
        assert np.array_equal(decode_tiff(encode_tiff(img, packbits=True)), img)
        assert np.array_equal(decode_image(encode_tiff(img)), img)
    assert detect_format(encode_tiff(img)) == "tiff"
    # PackBits kernel over arbitrary byte patterns
    for data in [b"", b"\x00" * 300, bytes(range(256)), b"aaabccccdde", rng.bytes(500)]:
        assert _packbits_decode(_packbits_encode(data), len(data)) == data
    # big-endian grayscale with WhiteIsZero photometric inversion
    h, w = 3, 5
    gray = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    entries = []

    def e(tag, type_, count, value):
        entries.append(struct.pack(">HHII", tag, type_, count, value))

    n = 8
    data_off = 8 + 2 + 12 * n + 4
    e(256, 4, 1, w); e(257, 4, 1, h)
    e(258, 3, 1, 8 << 16)       # SHORT inline values sit in the FIRST
    e(259, 3, 1, 1 << 16)       # bytes of the value field (big-endian)
    e(262, 3, 1, 0)             # WhiteIsZero
    e(273, 4, 1, data_off); e(277, 3, 1, 1 << 16); e(279, 4, 1, h * w)
    tif = (b"MM\x00*" + struct.pack(">I", 8) + struct.pack(">H", n)
           + b"".join(entries) + struct.pack(">I", 0) + gray.tobytes())
    assert np.array_equal(
        decode_tiff(tif), np.repeat((255 - gray)[:, :, None], 3, axis=2)
    )
    # malformed / unsupported degrade
    bads = [
        b"II*\x00\x08\x00\x00\x00",           # truncated IFD
        encode_tiff(np.zeros((4, 4, 3), np.uint8))[:40],
        encode_tiff(np.zeros((4, 4, 3), np.uint8)).replace(
            struct.pack("<HHII", 259, 3, 1, 1),
            struct.pack("<HHII", 259, 3, 1, 5), 1),  # LZW compression
    ]
    for bad in bads:
        with pytest.raises(ValueError):
            decode_tiff(bad)
        assert np.allclose(_features_for(bad), _fake_features(bad))


def test_flac_roundtrip_crc_and_subset_bounds():
    import numpy as np

    from rmlint_spark.operators.flac import (
        decode_flac,
        encode_flac,
        flac_streaminfo,
    )

    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32768, size=5000).astype(np.int16)
    p = encode_flac(s, rate=44100, block_size=1024)

    si = flac_streaminfo(p)
    assert (si["sample_rate"], si["channels"], si["bits_per_sample"]) == (44100, 1, 16)
    assert si["total_samples"] == 5000
    assert si["duration_ms"] == 5000 * 1000 // 44100

    rate, out = decode_flac(p)
    assert rate == 44100 and np.array_equal(out, s)

    # CRC-16 catches payload tampering; header CRC-8 catches header bits
    bad = bytearray(p)
    bad[60] ^= 0x01
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))

    # predictive subframe types are outside the honest subset
    import struct as _struct

    from rmlint_spark.operators.flac import _crc8, _crc16, _utf8_coded

    hdr = bytes([0xFF, 0xF8, 0x79, 0x90]) + _utf8_coded(0) + _struct.pack(">H", 0)
    hdr += bytes([_crc8(hdr)])
    frame = hdr + bytes([0b00010000, 0])  # FIXED order-0 subframe type
    frame += _struct.pack(">H", _crc16(frame))
    fixed = p[:46] + frame  # STREAMINFO (4+4+34=42)... keep real head
    with pytest.raises(ValueError):
        decode_flac(p[:42] + frame)


def test_flac_streaminfo_rejects_garbage():
    from rmlint_spark.operators.flac import flac_streaminfo

    for bad in (b"", b"fLaC", b"fLaX" + b"\x00" * 64, b"RIFF1234WAVE"):
        with pytest.raises(ValueError):
            flac_streaminfo(bad)


def test_mp3_metadata_walk():
    from rmlint_spark.operators.flac import encode_mp3_stub, mp3_metadata

    cbr = encode_mp3_stub(40, bitrate_kbps=128, rate=44100, id3_bytes=32)
    m = mp3_metadata(cbr)
    assert m["n_frames"] == 40 and m["id3v2"] and not m["vbr"]
    assert m["sample_rate"] == 44100 and m["channels"] == 1
    assert m["bitrate_kbps"] == 128
    assert abs(m["duration_ms"] - 40 * 1152 * 1000 / 44100) <= 1

    vbr = encode_mp3_stub(5, bitrate_kbps=128) + encode_mp3_stub(5, bitrate_kbps=320)
    mv = mp3_metadata(vbr)
    assert mv["vbr"] and mv["n_frames"] == 10
    assert mv["bitrate_kbps"] == (128 * 5 + 320 * 5) // 10

    with pytest.raises(ValueError):
        mp3_metadata(b"not audio at all")

    # truncated final frame: count only complete frames, don't raise
    trunc = encode_mp3_stub(3, bitrate_kbps=128)[:-50]
    assert mp3_metadata(trunc)["n_frames"] == 2


def test_probe_audio(spark):
    import numpy as np

    from rmlint_spark.operators.flac import encode_flac, encode_mp3_stub
    from rmlint_spark.operators.multimodal import (
        encode_aiff,
        encode_wav,
        probe_audio,
    )

    clip = np.arange(-800, 800, dtype=np.int16)  # 1600 samples
    schema = (
        "asset_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long"
    )
    assets = spark.createDataFrame(
        [
            (1, "audio", bytearray(encode_wav(clip, rate=16000)), None, None, None, None),
            (2, "audio", bytearray(encode_aiff(clip, rate=16000)), None, None, None, None),
            (3, "audio", bytearray(encode_flac(clip, rate=16000)), None, None, None, None),
            (4, "audio", bytearray(encode_mp3_stub(20, 192, 44100)), None, None, None, None),
            (5, "audio", bytearray(b"opaque bytes"), None, None, None, 777),
            (6, "image", bytearray(b"not audio"), None, None, None, None),
        ],
        schema,
    )
    rows = {r["asset_id"]: r for r in probe_audio(assets).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # image row filtered out
    for aid, container in ((1, "wav"), (2, "aiff"), (3, "flac")):
        r = rows[aid]
        assert r["container"] == container
        assert (r["sample_rate"], r["channels"], r["bits_per_sample"]) == (16000, 1, 16)
        assert r["n_samples"] == 1600 and r["duration_ms"] == 100
    assert rows[4]["container"] == "mp3" and rows[4]["bitrate_kbps"] == 192
    assert rows[4]["n_samples"] == 20  # frames for mp3
    assert rows[5]["container"] == "unknown" and rows[5]["duration_ms"] == 777


def test_cross_container_audio_dedup(spark):
    """The same PCM clip encoded as WAV, AIFF and FLAC (all lossless)
    must yield IDENTICAL feature vectors — duplicate audio found
    across container formats, the audio analog of the Y4M/GIF
    cross-format frame dedup."""
    from rmlint_spark.operators.multimodal import (
        extract_features,
        synthetic_audio_assets,
    )

    feats = (
        extract_features(synthetic_audio_assets(spark, n=24))
        .select("asset_id", "format", "features")
        .collect()
    )
    assert sorted({r["format"] for r in feats}) == ["aiff", "flac", "mp3", "wav"]
    by_clip: dict = {}
    for r in feats:
        by_clip.setdefault(r["asset_id"] % 8, []).append(r)
    checked = 0
    for members in by_clip.values():
        real = [tuple(m["features"]) for m in members if m["format"] != "mp3"]
        if len(real) >= 2:
            assert len(set(real)) == 1
            checked += 1
    assert checked >= 4


def test_flac_predictive_decode_fixed_lpc_partitions():
    """The decoder handles real FLAC compression, not just verbatim:
    FIXED/LPC predictors with Rice residuals roundtrip losslessly, and
    a hand-built frame exercises the 5-bit-parameter method, multiple
    partitions, and the raw-bits escape code."""
    import struct as _struct

    import numpy as np

    from rmlint_spark.operators.flac import (
        _BitWriter,
        _crc8,
        _crc16,
        _utf8_coded,
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(5)
    t = np.arange(9000)
    s = (2000 * np.sin(t / 25) + rng.randint(-30, 30, size=len(t))).astype(np.int16)
    wav_bytes = len(s) * 2
    fixed = encode_flac(s, predictor="fixed2", block_size=2048)
    assert len(fixed) < wav_bytes * 0.75  # real compression, not a wrapper
    for predictor in ("fixed2", "lpc2"):
        rate, out = decode_flac(encode_flac(s, predictor=predictor, block_size=2048))
        assert np.array_equal(out, s)

    # hand-built FIXED-order-1 frame: rice method 01 (5-bit params),
    # partition order 1, second partition escaped to raw 12-bit
    def zig(v):
        return (v << 1) if v >= 0 else ((-v << 1) - 1)

    blk = rng.randint(-500, 500, size=512).astype(np.int64)
    streaminfo = encode_flac(blk.astype(np.int16), rate=16000, block_size=512)[:42]
    w = _BitWriter()
    w.write(0b11111111111110, 14), w.write(0, 1), w.write(0, 1)
    w.write(0b0111, 4), w.write(5, 4)       # 16-bit blocksize field, 16 kHz
    w.write(0, 4), w.write(0b100, 3), w.write(0, 1)
    hdr = w.bytes() + _utf8_coded(0) + _struct.pack(">H", 511)
    hdr += bytes([_crc8(hdr)])
    b = _BitWriter()
    b.write(0, 1), b.write(0b001001, 6), b.write(0, 1)  # FIXED order 1
    b.write(int(blk[0]) & 0xFFFF, 16)
    res = (blk[1:] - blk[:-1]).tolist()
    b.write(0b01, 2), b.write(1, 4)         # method 01, 2 partitions
    b.write(4, 5)                           # partition 0: rice k=4
    for v in res[:255]:
        u = zig(v)
        b.write(0, u >> 4), b.write(1, 1), b.write(u & 15, 4)
    b.write(31, 5), b.write(12, 5)          # partition 1: escape, 12-bit raw
    for v in res[255:]:
        b.write(int(v) & 0xFFF, 12)
    b.pad_to_byte()
    frame = hdr + b.bytes()
    frame += _struct.pack(">H", _crc16(frame))
    rate, out = decode_flac(streaminfo + frame)
    assert np.array_equal(out, blk.astype(np.int16))


def test_mp3_metadata_mpeg2_walk():
    from rmlint_spark.operators.flac import encode_mp3_stub, mp3_metadata

    m = mp3_metadata(encode_mp3_stub(30, bitrate_kbps=64, rate=22050, version=2))
    assert m["n_frames"] == 30 and m["sample_rate"] == 22050
    assert m["bitrate_kbps"] == 64 and not m["vbr"]
    # MPEG-2 layer III = 576 samples/frame
    assert abs(m["duration_ms"] - 30 * 576 * 1000 / 22050) <= 1


def test_jpeg_zero_sampling_factor_is_valueerror():
    """ADVICE r4: a crafted 0 nibble in the SOF hv byte must raise the
    documented ValueError, not ZeroDivisionError at vmax // vs."""
    import numpy as np

    from rmlint_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    good = bytearray(encode_jpeg(img, quality=90))
    sof = bytes(good).index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) nc(1) [cid hv tq]*nc
    hv_off = sof + 11  # first component's hv byte
    for bad_hv in (0x10, 0x01, 0x00, 0x50, 0x15):  # 0 or >4 nibbles
        crafted = bytes(good[:hv_off]) + bytes([bad_hv]) + bytes(good[hv_off + 1 :])
        with pytest.raises(ValueError, match="sampling"):
            decode_jpeg(crafted)
