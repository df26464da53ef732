"""Property-based tests (hypothesis) for the pure codec/hash kernels.

These run WITHOUT Spark — the kernels are deterministic functions of
bytes, so roundtrip laws over random inputs are the strongest cheap
evidence they implement the formats, not just the fixed test vectors.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _img(draw, max_side=24, channels=3):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    data = draw(st.binary(min_size=h * w * channels, max_size=h * w * channels))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, channels)


images = st.composite(_img)()


@settings(max_examples=30, deadline=None)
@given(images, st.integers(0, 4))
def test_png_roundtrip_any_image_any_filter(img, ft):
    from rmlint_spark.operators.multimodal import decode_png, encode_png

    assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)


@settings(max_examples=20, deadline=None)
@given(images)
def test_jpeg_q100_bounded_error_and_determinism(img):
    from rmlint_spark.operators.jpeg import decode_jpeg, encode_jpeg

    payload = encode_jpeg(img, quality=100)
    assert payload == encode_jpeg(img, quality=100)
    back = decode_jpeg(payload)
    assert back.shape == img.shape
    # q=100 quantizers are all 1: error bounded by DCT rounding
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 4


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.integers(2, 8))
def test_gif_lzw_roundtrip_any_bytes(data, min_code):
    from rmlint_spark.operators.gif import _lzw_decode, _lzw_encode

    # LZW input symbols must fit the code size
    clipped = bytes(b % (1 << min_code) for b in data)
    assert _lzw_decode(_lzw_encode(clipped, min_code), min_code, len(clipped)) == clipped


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(1, 255), min_size=1, max_size=40), st.integers(1, 16))
def test_gif_palette_roundtrip(pixels, w):
    from rmlint_spark.operators.gif import decode_gif, encode_gif

    # build an image from a small palette; pad to a full rectangle
    h = -(-len(pixels) // w)
    idx = np.zeros(h * w, dtype=np.uint8)
    idx[: len(pixels)] = np.array(pixels, dtype=np.uint8) % 7
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
         [255, 255, 0], [0, 255, 255], [255, 0, 255]], dtype=np.uint8
    )
    img = pal[idx.reshape(h, w)]
    _, frames = decode_gif(encode_gif(img))
    assert np.array_equal(frames[0], img)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_wav_aiff_sample_roundtrip(data):
    from rmlint_spark.operators.multimodal import (
        decode_aiff,
        decode_wav,
        encode_aiff,
        encode_wav,
    )

    samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    r, got = decode_wav(encode_wav(samples, rate=8000))
    assert r == 8000 and np.array_equal(got, samples)
    r, got = decode_aiff(encode_aiff(samples, rate=44100))
    assert r == 44100 and np.array_equal(got, samples)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=2, max_size=4096))
def test_ima_adpcm_length_and_state_law(data):
    """IMA ADPCM decode(encode(x)): exact length (fact-chunk trim),
    int16 output, and determinism for arbitrary int16 input. Error is
    unbounded on adversarial steps (4-bit residual), so the property
    is structural, not SNR."""
    from rmlint_spark.operators.multimodal import decode_wav, encode_wav_ima

    samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    payload = encode_wav_ima(samples, rate=16000)
    assert payload == encode_wav_ima(samples, rate=16000)
    rate, got = decode_wav(payload)
    assert rate == 16000 and got.dtype == np.int16
    assert len(got) == len(samples)
    if len(samples):
        # block headers carry the predictor verbatim: sample 0 exact
        assert got[0] == samples[0]


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=2, max_size=2048))
def test_g711_companding_laws(data):
    """G.711 for arbitrary int16 input: mu-law decode(encode(x))
    equals per-sample LUT re-quantization (idempotent companding:
    encode(decode(encode(x))) == encode(x)), and A-law likewise."""
    from rmlint_spark.operators.multimodal import (
        decode_wav,
        encode_wav_alaw,
        encode_wav_ulaw,
    )

    samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    for enc in (encode_wav_ulaw, encode_wav_alaw):
        p1 = enc(samples, rate=8000)
        r, d1 = decode_wav(p1)
        assert r == 8000 and len(d1) == len(samples)
        # companding is idempotent: re-encoding the decoded signal
        # reproduces the same code stream byte-for-byte
        assert enc(d1, rate=8000) == p1


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=128))
def test_murmur_streaming_stability(data):
    # pure function: equal inputs -> equal 16-byte digests; a one-byte
    # change changes the digest (collision over 128 random bits at
    # these sizes would indicate a broken mixer)
    from rmlint_spark.functions.murmur import murmur3_x64_128

    d = murmur3_x64_128(data)
    assert len(d) == 16 and d == murmur3_x64_128(data)
    flipped = bytes([data[0] ^ 1]) + data[1:] if data else b"\x01"
    assert murmur3_x64_128(flipped) != d


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=60), min_size=1, max_size=4),
       st.integers(1, 30))
def test_mp4_skeleton_roundtrip_params(_unused, n_frames):
    from rmlint_spark.operators.mp4 import encode_mp4_skeleton, parse_mp4, sample_timestamps

    m = parse_mp4(encode_mp4_skeleton(fps=(10, 1), n_frames=n_frames))
    assert m["tracks"][0]["n_samples"] == n_frames
    ts = sample_timestamps(m)
    assert ts == [i * 100 for i in range(n_frames)]


@settings(max_examples=30, deadline=None)
@given(images)
def test_bmp_roundtrip_any_image(img):
    from rmlint_spark.operators.multimodal import decode_bmp, encode_bmp

    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=30, deadline=None)
@given(images, st.booleans())
def test_tiff_roundtrip_any_image(img, packbits):
    from rmlint_spark.operators.multimodal import decode_tiff, encode_tiff

    assert np.array_equal(decode_tiff(encode_tiff(img, packbits=packbits)), img)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_packbits_roundtrip_any_bytes(data):
    from rmlint_spark.operators.multimodal import _packbits_decode, _packbits_encode

    assert _packbits_decode(_packbits_encode(data), len(data)) == data


@settings(max_examples=25, deadline=None)
@given(images)
def test_format_sniff_matches_encoder(img):
    from rmlint_spark.operators.jpeg import encode_jpeg
    from rmlint_spark.operators.multimodal import (
        detect_format,
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_tiff,
    )

    for enc, fmt in [
        (encode_ppm, "pnm"), (encode_png, "png"), (encode_jpeg, "jpeg"),
        (encode_bmp, "bmp"), (encode_tiff, "tiff"),
    ]:
        assert detect_format(enc(img)) == fmt


@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
    st.sampled_from(["verbatim", "fixed2", "lpc2"]),
    st.sampled_from([192, 256, 4096]),
)
@settings(max_examples=40, deadline=None)
def test_flac_roundtrip_any_samples_any_predictor(vals, predictor, bs):
    from rmlint_spark.operators.flac import decode_flac, encode_flac

    s = np.array(vals, dtype=np.int16)
    rate, out = decode_flac(encode_flac(s, rate=16000, block_size=bs,
                                        predictor=predictor))
    assert rate == 16000 and np.array_equal(out, s)


@settings(max_examples=15, deadline=None)
@given(
    st.binary(min_size=400, max_size=6000),
    st.sampled_from([32, 128, 384]),
    st.sampled_from([1, 2]),
)
def test_mpeg_audio_encode_decode_total_on_random_pcm(raw, kbps, layer):
    """Any random int16 PCM encodes to a walkable spec-grammar stream
    that decodes without error to the frame-aligned sample count —
    and the encoder is deterministic."""
    from rmlint_spark.operators.flac import mp3_metadata
    from rmlint_spark.operators.mpeg_audio import (
        decode_mpeg_audio,
        encode_layer1,
        encode_layer2,
    )

    pcm = np.frombuffer(raw[: len(raw) // 2 * 2], dtype=np.int16)
    enc = encode_layer1 if layer == 1 else encode_layer2
    if layer == 1 and kbps == 384:
        kbps = 448  # 384 is a Layer II-only bitrate row
    payload = enc(pcm, rate=44100, bitrate_kbps=kbps)
    assert payload == enc(pcm, rate=44100, bitrate_kbps=kbps)
    spf = 384 if layer == 1 else 1152
    meta = mp3_metadata(payload)
    assert meta["layer"] == layer
    assert meta["n_frames"] == max(1, -(-len(pcm) // spf))
    rate, out = decode_mpeg_audio(payload)
    assert rate == 44100
    assert len(out) == meta["n_frames"] * spf
    assert out.dtype == np.int16
