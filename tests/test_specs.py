"""X6 spec-string parsing (reference grammar lib/cmdline.c:120-214)."""

import pytest

from rmlint_spark.specs import parse_clamp, parse_size, parse_size_range


def test_parse_size_units():
    assert parse_size("512") == 512
    assert parse_size("10K") == 10_000
    assert parse_size("4MB") == 4 * 2**20
    assert parse_size("1.5GiB") == int(1.5 * 2**30)
    with pytest.raises(ValueError):
        parse_size("10Q")
    with pytest.raises(ValueError):
        parse_size("abc")


def test_parse_size_range():
    assert parse_size_range("1K-1M") == (1000, 1_000_000)
    assert parse_size_range("-512") == (0, 512)
    assert parse_size_range("100-") == (100, None)
    assert parse_size_range("42") == (42, 42)
    with pytest.raises(ValueError):
        parse_size_range("1M-1K")


def test_parse_clamp():
    assert parse_clamp("0.3") == 0.3
    assert parse_clamp(".5") == 0.5
    assert parse_clamp("4K") == 4000
    # reference grammar: factor range is [0,1] INCLUSIVE and '%'
    # divides by 100 (rm_cmd_parse_clamp_factor, lib/cmdline.c:574-596)
    assert parse_clamp("1.0") == 1.0
    assert parse_clamp("30%") == 0.3
    assert parse_clamp("100%") == 1.0
    with pytest.raises(ValueError):
        parse_clamp("1.5")
    with pytest.raises(ValueError):
        parse_clamp("150%")


def test_parse_size_block_unit():
    # 'b' = 512-byte blocks (SIZE_FORMAT_TABLE, lib/cmdline.c:247)
    assert parse_size("1b") == 512
    assert parse_size("4b") == 2048
    assert parse_size("4c") == 4


def test_stamp_roundtrip(tmp_path):
    from rmlint_spark.sources.sinks import read_stamp, write_stamp

    p = str(tmp_path / "stamp")
    assert read_stamp(p) is None
    at = write_stamp(p, at=1700000000.25)
    assert at == 1700000000.25
    assert read_stamp(p) == 1700000000.25
