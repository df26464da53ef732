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
    encode_layer3,
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


def test_layer3_rate_distortion_monotone():
    sig = _music()
    snrs = []
    for kbps in (64, 128, 256):
        rate, pcm = decode_mpeg_audio(encode_layer3(sig, 44100, kbps))
        assert rate == 44100
        snrs.append(_snr_db(sig, pcm.astype(np.float64) / 32768.0))
    assert snrs == sorted(snrs), f"SNR not monotone in bitrate: {snrs}"
    assert snrs[0] > 20.0
    assert snrs[-1] > 35.0


def test_layer3_sparse_spectrum_near_filterbank_floor():
    # a pure tone concentrates spectral lines: the Huffman payload is
    # tiny, the global_gain loop accepts the finest quantization, and
    # the ESC (linbits) tables carry the large values — round-trip
    # lands at the pseudo-QMF's own ~65 dB floor
    from rmlint_spark.operators.mpeg_audio import _frame_len, _parse_l3_side

    tone = 0.9 * np.sin(2 * np.pi * 441 * np.arange(23040) / 44100.0)
    b = encode_layer3(tone, 44100, 256)
    assert _snr_db(tone, decode_mpeg_audio(b)[1] / 32768.0) > 55.0
    tables, flen, pos = set(), _frame_len(3, 256, 44100), 0
    while pos + flen <= len(b):
        for g in _parse_l3_side(b[pos + 4 : pos + 21])["granules"]:
            tables.update(g["tables"])
        pos += flen
    assert any(t >= 16 for t in tables), f"no ESC table exercised: {tables}"


def test_layer3_bit_reservoir_walks_and_caps():
    # quiet signal -> underfilled frames -> main_data_begin grows
    # frame over frame until the 511-byte stuffing cap
    from rmlint_spark.operators.mpeg_audio import _frame_len, _parse_l3_side

    sig = 0.001 * np.sin(2 * np.pi * 440 * np.arange(11520) / 44100.0)
    b = encode_layer3(sig, 44100, 128)
    begins, flen, pos = [], _frame_len(3, 128, 44100), 0
    while pos + flen <= len(b):
        begins.append(_parse_l3_side(b[pos + 4 : pos + 21])["main_data_begin"])
        pos += flen
    assert begins[0] == 0
    assert max(begins) > 0, "reservoir never engaged"
    assert max(begins) <= 511
    decode_mpeg_audio(b)  # and the reservoir walk decodes


def test_layer3_reservoir_underflow_raises():
    sig = _music(n=2304)
    b = bytearray(encode_layer3(sig, 44100, 128))
    # first side-info byte holds main_data_begin[8:1]; frame 0 claiming
    # reservoir bytes that don't exist must refuse, not alias
    b[4] = 0x01
    with pytest.raises(ValueError, match="reservoir underflow"):
        decode_mpeg_audio(bytes(b))


def test_layer3_zeroed_stub_is_legal_silence():
    from rmlint_spark.operators.flac import encode_mp3_stub

    rate, pcm = decode_mpeg_audio(encode_mp3_stub(3, bitrate_kbps=128, rate=44100))
    assert rate == 44100 and len(pcm) == 3 * 1152 - 576
    assert np.abs(pcm).max() == 0


def test_layer3_huffman_tables_prefix_free_and_deterministic():
    from rmlint_spark.operators.mpeg_audio import _L3_PAIR_DIMS, _l3_tables

    for t in list(_L3_PAIR_DIMS) + [-1, -2]:
        enc, dec, ml, n, lb = _l3_tables(t)
        codes = [(c, ln) for c, ln in enc if ln]
        assert len(set(codes)) == len(codes)
        # prefix-free: no code is a prefix of a longer one
        by_len = sorted(codes, key=lambda x: x[1])
        for i, (c1, l1) in enumerate(by_len):
            for c2, l2 in by_len[i + 1 :]:
                if l2 > l1:
                    assert (c2 >> (l2 - l1)) != c1, f"table {t} not prefix-free"
        # Kraft equality for the canonical tables (complete codes)
        if codes:
            assert abs(sum(2.0 ** -ln for _, ln in codes) - 1.0) < 1e-12
    # rebuilding from scratch gives identical assignments
    import importlib

    import rmlint_spark.operators.mpeg_audio as m

    before = {t: m._l3_tables(t)[0] for t in (1, 15, 24, -1)}
    m._L3_HUFF_CACHE.clear()
    assert {t: m._l3_tables(t)[0] for t in (1, 15, 24, -1)} == before
    importlib  # quiet linters


def test_layer3_scfsi_and_scalefactor_requantization():
    # white-box: hand-build one frame whose granule 0 transmits real
    # scalefactors (scalefac_compress=11 -> slen 3,1) and granule 1
    # scfsi-shares all four groups; a single spectral line at gain G
    # must come out 2^(-0.5*sf) quieter than the sf=0 stream
    from rmlint_spark.operators.flac import _BitReader, _BitWriter
    from rmlint_spark.operators.mpeg_audio import (
        _frame_len,
        _header,
        _l3_tables,
    )

    def one_frame(sf_val: int) -> bytes:
        enc, _, _, n, lb = _l3_tables(1)  # dims-2 table for value 1
        payloads = []
        for g in range(2):
            w = _BitWriter()
            if g == 0:
                for band in range(11):
                    w.write(sf_val, 3)          # slen1 = 3
                for band in range(11, 21):
                    w.write(0, 1)               # slen2 = 1
            code, ln = enc[1 * n + 1]           # pair (1, 1)
            w.write(code, ln)
            w.write(0, 1)                       # sign x: positive
            w.write(0, 1)                       # sign y: positive
            bits = w.nbits + 8 * len(w.buf)
            w.pad_to_byte()
            payloads.append((bits, w.bytes()))
        sw = _BitWriter()
        sw.write(0, 9)                          # main_data_begin
        sw.write(0, 5)
        for _ in range(4):
            sw.write(1, 1)                      # scfsi: share all groups
        for g, (bits, _) in enumerate(payloads):
            sw.write(bits, 12)
            sw.write(1, 9)                      # big_values = 1 pair
            sw.write(210, 8)                    # global_gain
            sw.write(11, 4)                     # scalefac_compress -> (3, 1)
            sw.write(0, 1)                      # long blocks
            for _ in range(3):
                sw.write(1, 5)                  # table 1 all regions
            sw.write(7, 4)
            sw.write(7, 3)
            sw.write(0, 1)                      # preflag
            sw.write(0, 1)                      # scalefac_scale (mult 0.5)
            sw.write(0, 1)                      # count1 table A
        side = sw.bytes()
        assert len(side) == 17
        mw = _BitWriter()
        for bits, payload in payloads:
            r = _BitReader(payload)
            left = bits
            while left > 0:
                take = min(16, left)
                mw.write(r.read(take), take)
                left -= take
        mw.pad_to_byte()
        flen = _frame_len(3, 128, 44100)
        frame = (_header(3, 128, 44100).to_bytes(4, "big") + side
                 + mw.bytes())
        return frame + b"\x00" * (flen - len(frame))

    _, loud = decode_mpeg_audio(one_frame(0))
    _, quiet = decode_mpeg_audio(one_frame(4))
    a_loud = float(np.abs(loud).max())
    a_quiet = float(np.abs(quiet).max())
    assert a_loud > 0
    # scalefactor 4 at multiplier 0.5 -> 2^-2 = 12 dB quieter, applied
    # to granule 1 as well through scfsi sharing
    assert abs(a_quiet / a_loud - 2.0 ** -2) < 0.02


def _transient_signal(n=23040):
    sig = 0.01 * np.sin(2 * np.pi * 300 * np.arange(n) / 44100.0)
    for pos in range(1000, n - 200, 2300):
        sig[pos:pos + 120] += (0.8 * np.sin(2 * np.pi * 2000
                                            * np.arange(120) / 44100.0)
                               * np.hanning(120))
    return np.clip(sig, -0.99, 0.99)


def _granule_block_types(b: bytes, kbps: int = 160) -> list[int]:
    from rmlint_spark.operators.mpeg_audio import _frame_len, _parse_l3_side

    bts, flen, pos = [], _frame_len(3, kbps, 44100), 0
    while pos + flen <= len(b):
        for g in _parse_l3_side(b[pos + 4 : pos + 21])["granules"]:
            bts.append(g.get("block_type", 0) if g["wsf"] else 0)
        pos += flen
    return bts


def test_layer3_short_blocks_on_transients():
    # clicks over a quiet tone: the encoder's attack detector switches
    # to short blocks with start/stop transition windows around them,
    # and the full window sequence round-trips through the 3x6 IMDCT
    sig = _transient_signal()
    b = encode_layer3(sig, 44100, 160)
    bts = set(_granule_block_types(b))
    assert bts == {0, 1, 2, 3}, f"window sequence incomplete: {bts}"
    rate, pcm = decode_mpeg_audio(b)
    assert _snr_db(sig, pcm.astype(np.float64) / 32768.0) > 40.0
    # steady music never switches
    assert set(_granule_block_types(encode_layer3(_music(n=11520),
                                                  44100, 160))) == {0}


def test_layer3_mixed_block_flag_refused():
    from rmlint_spark.operators.mpeg_audio import _frame_len, _parse_l3_side

    b = bytearray(encode_layer3(_transient_signal(), 44100, 160))
    flen, pos, target = _frame_len(3, 160, 44100), 0, None
    while pos + flen <= len(b):
        g0 = _parse_l3_side(bytes(b[pos + 4 : pos + 21]))["granules"][0]
        if g0["wsf"] and g0.get("block_type") == 2:
            target = pos
            break
        pos += flen
    assert target is not None, "no short granule 0 found"
    # granule 0's mixed_block_flag is side-info bit 54 (byte 6, 0x02)
    b[target + 4 + 6] |= 0x02
    with pytest.raises(ValueError, match="mixed-block"):
        decode_mpeg_audio(bytes(b))


def test_layer3_id3_wrap_invariant_and_deterministic():
    sig = _music(n=4608)
    b = encode_layer3(sig, 44100, 128)
    assert encode_layer3(sig, 44100, 128) == b
    _, p1 = decode_mpeg_audio(b)
    _, p2 = decode_mpeg_audio(wrap_id3(b))
    assert np.array_equal(p1, p2)


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


def test_mpeg2_lsf_layer1_roundtrip_and_metadata():
    # LSF Layer I: identical body grammar, half sample rates, its own
    # bitrate table (ISO 13818-3); LSF Layer II/III refuse cleanly
    from rmlint_spark.operators.flac import encode_mp3_stub, mp3_metadata

    rng = np.random.RandomState(7)
    t = np.arange(22050) / 22050.0
    noise = np.convolve(rng.randn(22050 + 8), np.ones(8) / 8, "same")
    sig = np.clip(0.5 * np.sin(2 * np.pi * 440 * t)
                  + 0.1 * noise[:22050], -0.99, 0.99)
    for rate, kbps in ((22050, 144), (24000, 192), (16000, 112)):
        b = encode_layer1(sig, rate, kbps)
        r, pcm = decode_mpeg_audio(b)
        assert r == rate
        assert _snr_db(sig, pcm.astype(np.float64) / 32768.0) > 50.0
        m = mp3_metadata(b)
        assert (m["sample_rate"], m["layer"], m["bitrate_kbps"]) == \
            (rate, 1, kbps)
    with pytest.raises(ValueError, match="LSF Layer II/III"):
        decode_mpeg_audio(encode_mp3_stub(2, bitrate_kbps=64,
                                          rate=22050, version=2))
    with pytest.raises(ValueError):
        encode_layer1(sig, 22050, 320)     # not in the LSF L1 table
