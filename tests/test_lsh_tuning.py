"""LSH band auto-tuning: S-curve math and the (bands, rows) optimizer
(driver-side config math — no Spark session needed)."""

import pytest

from rmlint_spark.config import DEFAULT
from rmlint_spark.operators.lsh import (
    band_threshold,
    lsh_collision_probability,
    optimal_band_config,
    tuned_config,
)


def test_s_curve_monotone_and_bounded():
    prev = -1.0
    for i in range(21):
        s = i / 20
        p = lsh_collision_probability(s, 16, 8)
        assert 0.0 <= p <= 1.0
        assert p >= prev
        prev = p
    assert lsh_collision_probability(0.0, 16, 8) == 0.0
    assert lsh_collision_probability(1.0, 16, 8) == 1.0


def test_optimal_rows_grow_with_threshold():
    rows = [optimal_band_config(t, 128)[1] for t in (0.2, 0.5, 0.7, 0.9)]
    assert rows == sorted(rows)
    assert rows[0] < rows[-1]


def test_optimal_tracks_effective_threshold():
    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = optimal_band_config(t, 128)
        assert b * r == 128
        assert abs(band_threshold(b, r) - t) < 0.2
        # the curve separates the two sides of the threshold (the
        # divisor grid of 128 is coarse, so the margin is ±0.25)
        assert lsh_collision_probability(min(t + 0.25, 0.99), b, r) > 0.85
        assert lsh_collision_probability(max(t - 0.25, 0.01), b, r) < 0.6


def test_fp_weight_biases_toward_fewer_bands():
    b_recall, _ = optimal_band_config(0.5, 128, fp_weight=0.1)
    b_precision, _ = optimal_band_config(0.5, 128, fp_weight=0.9)
    assert b_precision <= b_recall


def test_pinned_values_num_perm_128():
    # regression pins (independent check: datasketch-style integral
    # optimization over exact divisor splits lands here)
    assert optimal_band_config(0.7, 128) == (16, 8)
    assert optimal_band_config(0.5, 128) == (32, 4)
    assert optimal_band_config(0.9, 128) == (4, 32)


def test_tuned_config_keeps_divisibility_invariant():
    cfg = tuned_config(DEFAULT, threshold=0.8)
    # the SignatureConfig property asserts num_perm % bands == 0
    assert cfg.sig.bands * cfg.sig.rows_per_band == cfg.sig.num_perm
    # default threshold comes from the config itself, at the measured
    # recall-safe dedup weighting
    cfg2 = tuned_config(DEFAULT)
    b, _ = optimal_band_config(DEFAULT.jaccard_threshold,
                               DEFAULT.sig.num_perm, fp_weight=0.05)
    assert cfg2.sig.bands == b


def test_recall_safe_weighting_recovers_engine_default():
    """The measured decision rule (band_tuning_ab): at threshold 0.7
    / 128 perms, fp_weight 0.05 lands on the recall-padded (32, 4)
    the engine ships — band-stage recall 1.0 at every planted grade —
    while the balanced weighting's (16, 8) measured 0.771 at grade
    0.70."""
    assert optimal_band_config(0.7, 128, fp_weight=0.05) == (32, 4)
    assert tuned_config(DEFAULT).sig.bands == DEFAULT.sig.bands


def test_validation():
    with pytest.raises(ValueError, match="threshold"):
        optimal_band_config(0.0, 128)
    with pytest.raises(ValueError, match="num_perm"):
        optimal_band_config(0.5, 1)
    with pytest.raises(ValueError, match="fp_weight"):
        optimal_band_config(0.5, 128, fp_weight=1.5)
