"""MPEG-1 Layer I/II essence codec: filterbank PR, rate-distortion
monotonicity, grammar walk, cross-wrap dedup invariant, malformed
inputs.  (Reference hashes media as opaque bytes — this family exists
for the training-data multimodal lane, like the FLAC/ADPCM suites.)"""

from __future__ import annotations

import numpy as np
import pytest

from rmlint_spark.operators.flac import mp3_metadata
from rmlint_spark.operators.mpeg_audio import (
    BITRATES,
    decode_mpeg_audio,
    encode_layer1,
    encode_layer2,
    pqmf_analyze,
    pqmf_synthesize,
    wrap_id3,
)


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    n = min(len(ref), len(got)) - 600  # drop edge ring tail
    e = got[:n] - ref[:n]
    return float(10 * np.log10(np.sum(ref[:n] ** 2) / np.sum(e ** 2)))


def _music(n=44100, bandlimited=True, seed=7):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 44100.0
    noise = rng.randn(n + 64)
    if bandlimited:  # keep energy below Layer II's sblimit-27 cut
        noise = np.convolve(noise, np.ones(6) / 6, mode="same")
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1870 * t) + 0.08 * noise[:n])
    return np.clip(sig, -0.99, 0.99)


def test_pqmf_near_perfect_reconstruction():
    rng = np.random.RandomState(3)
    x = rng.randn(8192) * 0.3
    y = pqmf_synthesize(pqmf_analyze(x), len(x))
    assert _snr_db(x, y) > 55.0


def test_layer1_rate_distortion_monotone():
    sig = _music()
    snrs = []
    for kbps in (64, 128, 224, 448):
        rate, pcm = decode_mpeg_audio(encode_layer1(sig, 44100, kbps))
        assert rate == 44100
        snrs.append(_snr_db(sig, pcm.astype(np.float64) / 32768.0))
    assert snrs == sorted(snrs), f"SNR not monotone in bitrate: {snrs}"
    assert snrs[0] > 12.0
    assert snrs[-1] > 55.0  # near the filterbank's own floor


def test_layer2_rate_distortion_monotone():
    sig = _music()
    snrs = []
    for kbps in (64, 128, 384):
        rate, pcm = decode_mpeg_audio(encode_layer2(sig, 44100, kbps))
        assert rate == 44100
        snrs.append(_snr_db(sig, pcm.astype(np.float64) / 32768.0))
    assert snrs == sorted(snrs), f"SNR not monotone in bitrate: {snrs}"
    assert snrs[0] > 25.0
    assert snrs[1] > 32.0


def test_frame_grammar_walk_layer1_and_2():
    sig = _music(n=11520)
    b1 = encode_layer1(sig, 48000, 224)
    m1 = mp3_metadata(b1)
    assert m1["layer"] == 1 and m1["sample_rate"] == 48000
    assert m1["n_frames"] == -(-11520 // 384)
    assert m1["bitrate_kbps"] == 224 and not m1["vbr"]
    b2 = encode_layer2(sig, 44100, 192)
    m2 = mp3_metadata(b2)
    assert m2["layer"] == 2 and m2["n_frames"] == 10
    assert m2["duration_ms"] == int(round(10 * 1152 * 1000.0 / 44100))
    # frame lengths are exact: walk consumed every byte (no padding bytes
    # beyond the final frame)
    assert m1["id3v2"] is False
    m1b = mp3_metadata(wrap_id3(b1))
    assert m1b["id3v2"] is True and m1b["n_frames"] == m1["n_frames"]


def test_cross_wrap_dedup_invariant():
    """Same encoded stream, with and without an ID3 tag, decodes to
    IDENTICAL PCM — the multimodal cross-container dedup contract."""
    sig = _music(n=6000)
    stream = encode_layer2(sig, 44100, 128)
    r1, p1 = decode_mpeg_audio(stream)
    r2, p2 = decode_mpeg_audio(wrap_id3(stream, nbytes=200))
    assert r1 == r2 and np.array_equal(p1, p2)


def test_encode_deterministic():
    sig = _music(n=4000)
    assert encode_layer1(sig, 44100, 128) == encode_layer1(sig, 44100, 128)
    assert encode_layer2(sig, 44100, 128) == encode_layer2(sig, 44100, 128)


def test_layer3_is_honest_stub():
    from rmlint_spark.operators.flac import encode_mp3_stub

    with pytest.raises(NotImplementedError):
        decode_mpeg_audio(encode_mp3_stub(3, bitrate_kbps=128, rate=44100))


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        decode_mpeg_audio(b"plainly not audio")
    sig = _music(n=2000)
    b = encode_layer1(sig, 44100, 128)
    # forbidden allocation code 15 in the first subband: header is the
    # first 4 bytes, allocation nibbles follow immediately
    bad = bytearray(b)
    bad[4] |= 0xF0
    with pytest.raises(ValueError):
        decode_mpeg_audio(bytes(bad))
    with pytest.raises(ValueError):
        encode_layer1(sig, 44100, 999)
    with pytest.raises(ValueError):
        encode_layer2(sig, 22050, 128)  # MPEG-2 rate: not supported


def test_truncated_tail_frame_decodes_prefix():
    sig = _music(n=8000)
    b = encode_layer2(sig, 44100, 128)
    m = mp3_metadata(b)
    cut = b[: len(b) - 10]  # clip into the final frame
    rate, pcm = decode_mpeg_audio(cut)
    assert len(pcm) == (m["n_frames"] - 1) * 1152


def test_frame_budget_exact():
    """Every emitted frame is exactly the header-implied length, so an
    external walker steps the stream without resync heuristics."""
    sig = _music(n=12000)
    for enc, layer, kbps in ((encode_layer1, 1, 160), (encode_layer2, 2, 96)):
        b = enc(sig, 32000, kbps)
        if layer == 1:
            flen = (12 * kbps * 1000 // 32000) * 4
            spf = 384
        else:
            flen = 144 * kbps * 1000 // 32000
            spf = 1152
        assert len(b) == -(-12000 // spf) * flen


def test_bitrate_tables_cover_spec_rows():
    assert BITRATES[1][-1] == 448 and BITRATES[2][-1] == 384
    assert len(BITRATES[1]) == 15 and len(BITRATES[2]) == 15


def test_features_use_real_decode_for_layer2():
    """_features_for must route MPEG L1/L2 through the real decoder —
    the decoded-features path, not the opaque-bytes stand-in."""
    from rmlint_spark.operators.multimodal import (
        _audio_features,
        _fake_features,
        _features_for,
    )

    sig = _music(n=4000)
    stream = encode_layer2(sig, 44100, 128)
    got = _features_for(stream)
    want = _audio_features(*decode_mpeg_audio(stream))
    assert np.allclose(got, want)
    assert not np.allclose(got, _fake_features(stream))
