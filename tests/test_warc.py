"""WARC source: parser round-trip, gzip members, skip/truncation rules."""

import gzip

import pandas as pd

from rayxtract.warc import parse_warc_records, read_warc, warc_bytes

RECS = [
    {
        "url": "https://a.example/p/1",
        "warc_ts_us": 1_700_000_000_000_000,
        "html": b'<!DOCTYPE html><html><body><div class="content-body"><p>alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta </p></div></body></html>',
    },
    {
        "url": "https://b.example/p/2",
        "warc_ts_us": 1_700_000_060_000_000,
        "html": b'<!DOCTYPE html><html><body><div class="content-body"><p>omega beta gamma delta epsilon zeta eta theta omega beta gamma delta epsilon zeta eta theta omega beta gamma delta epsilon zeta eta theta omega beta gamma delta epsilon zeta eta theta omega beta gamma delta epsilon zeta eta theta omega beta gamma delta epsilon zeta eta theta omega beta gamma delta epsilon zeta eta theta omega beta gamma delta epsilon zeta eta theta </p></div></body></html>',
    },
]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        got = parse_warc_records(warc_bytes(RECS, gzip_members=gz))
        assert got == RECS, f"gzip_members={gz}"


def test_whole_file_gzip():
    got = parse_warc_records(gzip.compress(warc_bytes(RECS)))
    assert got == RECS


def test_non_response_records_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://a.example/p/1\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    buf = info + warc_bytes(RECS[:1]) + req + warc_bytes(RECS[1:])
    assert parse_warc_records(buf) == RECS


def test_truncated_trailing_record_dropped():
    full = warc_bytes(RECS)
    # cut into the middle of the second record's payload
    cut = full[: len(warc_bytes(RECS[:1])) + 80]
    assert parse_warc_records(cut) == RECS[:1]


def test_read_warc_dataset(ray_session, tmp_path):
    (tmp_path / "shard0.warc").write_bytes(warc_bytes(RECS))
    (tmp_path / "shard1.warc.gz").write_bytes(
        gzip.compress(warc_bytes([RECS[0] | {"url": "https://c.example/p/3"}]))
    )
    df = (
        read_warc([str(tmp_path / "shard0.warc"), str(tmp_path / "shard1.warc.gz")])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(df["url"]) == [
        "https://a.example/p/1",
        "https://b.example/p/2",
        "https://c.example/p/3",
    ]
    # PAGES_SCHEMA contract: timestamp[us] + text/lang present
    assert str(df["warc_ts"].dtype).startswith("datetime64")
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert bytes(df["html"][0]).startswith(b"<!DOCTYPE html>")


def test_damaged_record_skipped_not_fatal():
    """A corrupted Content-Length mid-shard loses THAT record only."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/x\r\n"
        b"WARC-Date: 2023-11-14T22:13:20Z\r\n"
        b"Content-Length: oops\r\n\r\njunk\r\n\r\n"
    )
    buf = warc_bytes(RECS[:1]) + bad + warc_bytes(RECS[1:])
    assert parse_warc_records(buf) == RECS


def test_unparseable_date_skipped_not_fatal():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/x\r\n"
        b"WARC-Date: not-a-date\r\n"
        b"Content-Length: 4\r\n\r\njunk\r\n\r\n"
    )
    buf = bad + warc_bytes(RECS)
    assert parse_warc_records(buf) == RECS


def test_fractional_date_and_unicode_url_roundtrip():
    recs = [
        RECS[0]
        | {"url": "https://exämple.com/p/ü", "warc_ts_us": 1_700_000_000_123_456}
    ]
    assert parse_warc_records(warc_bytes(recs)) == recs


def test_warc_feeds_extraction_pipeline(ray_session, tmp_path):
    """The advertised path: WARC -> write_parquet -> run_extraction."""
    from rayxtract.ops import ExtractConfig
    from rayxtract.pipeline import run_extraction

    (tmp_path / "s.warc").write_bytes(warc_bytes(RECS))
    pages_dir = str(tmp_path / "pages")
    read_warc([str(tmp_path / "s.warc")]).write_parquet(pages_dir)
    out = str(tmp_path / "out")
    report = run_extraction(pages_dir, out, ExtractConfig(), resume=False)
    assert report["rows"] == 2
    import ray.data

    df = ray.data.read_parquet(out).to_pandas().sort_values("url")
    assert df["text"].iloc[0].startswith("alpha beta")
    assert df["text"].iloc[1].startswith("omega beta")


def test_warc_roundtrip_property():
    """Property: arbitrary binary bodies — including ones embedding the
    record delimiter and 'WARC/' magic — round-trip exactly (the parser
    frames on Content-Length, never on content)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    body = st.binary(min_size=0, max_size=200)
    adversarial = st.sampled_from(
        [b"\r\n\r\nWARC/1.0\r\n", b"WARC/", b"\r\n\r\n", b"HTTP/1.1 200 OK"]
    )
    record = st.builds(
        lambda i, b, adv, us, uni: {
            "url": f"https://h{i}{uni}.example/p/{i}",
            "warc_ts_us": 1_700_000_000_000_000 + i * 1_000_000 + us,
            "html": adv + b + adv,
        },
        st.integers(0, 99),
        body,
        adversarial,
        st.integers(0, 999_999),  # sub-second microseconds
        st.sampled_from(["", "ä", "中"]),  # unicode in the url
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(record, min_size=0, max_size=5), st.booleans())
    def check(recs, gz):
        assert parse_warc_records(warc_bytes(recs, gzip_members=gz)) == recs

    check()
