"""End-to-end pipeline tests: golden byte-equality, dedup, resume.

These are the t3-layer tests from SURVEY.md §5 — the contract BASELINE.json
states: byte-identical extracted text per url, one row per url, output
independent of parallelism/blocks, resumable at partition granularity.
"""

import os
import shutil

import pandas as pd
import pytest

from rayxtract.ops import ExtractConfig
from rayxtract.pipeline import extraction_dataset, run_extraction


def _load_sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("url").reset_index(drop=True)


@pytest.fixture(scope="module")
def extracted(small_corpus, tmp_path_factory):
    pages_dir, golden_dir = small_corpus
    out = str(tmp_path_factory.mktemp("xout") / "extracted")
    cfg = ExtractConfig(n_partitions=16, batch_size=64, layout_concurrency=(1, 4))
    report = run_extraction(pages_dir, out, cfg, resume=False)
    return pages_dir, golden_dir, out, report


def _read_output(out):
    import ray.data

    df = ray.data.read_parquet(out).to_pandas()
    # hive-partition columns read back as strings
    df["partition_id"] = df["partition_id"].astype("int64")
    return df


def _read_golden(golden_dir):
    import ray.data

    return ray.data.read_parquet(golden_dir).to_pandas()


def test_byte_identical_text_per_url(extracted):
    _, golden_dir, out, _ = extracted
    got = _load_sorted(_read_output(out))
    exp = _load_sorted(_read_golden(golden_dir))
    assert len(got) == len(exp), "one output row per unique url"
    assert list(got["url"]) == list(exp["url"])
    mism = got["text"].values != exp["golden_text"].values
    assert not mism.any(), (
        f"{mism.sum()} text mismatches, e.g. url={got['url'][mism].iloc[0]!r}"
    )


def test_spans_match_golden(extracted):
    _, golden_dir, out, _ = extracted
    got = _load_sorted(_read_output(out))
    exp = _load_sorted(_read_golden(golden_dir))
    for g, e, url in zip(got["spans"], exp["golden_spans"], got["url"]):
        gl = [dict(s) for s in g]
        el = [dict(s) for s in e]
        assert gl == el, f"span mismatch for {url}"


def test_sentinel_and_metric_flags(extracted):
    _, golden_dir, out, report = extracted
    got = _load_sorted(_read_output(out))
    exp = _load_sorted(_read_golden(golden_dir))
    assert (got["is_ocr_fallback"].values == exp["expect_ocr_fallback"].values).all()
    assert (got["is_parse_failure"].values == exp["expect_parse_failure"].values).all()
    assert report["ocr_fallbacks"] == int(exp["expect_ocr_fallback"].sum())
    assert report["parse_failures"] == int(exp["expect_parse_failure"].sum())
    # failure rows carry the reference's sentinel, never get dropped
    fail = got[got["is_parse_failure"]]
    assert fail["text"].str.startswith("[ERRO: Não foi possível").all()


def test_dedup_keeps_latest_crawl(extracted):
    pages_dir, _, out, _ = extracted
    import ray.data

    pages = ray.data.read_parquet(pages_dir, columns=["url", "warc_ts"]).to_pandas()
    got = _read_output(out)
    latest = pages.groupby("url")["warc_ts"].max()
    merged = got.set_index("url")["warc_ts"]
    assert (merged.sort_index() == latest.sort_index()).all()
    # corpus really contains recrawls (idx % 20 == 7)
    assert len(pages) > len(got)


def test_manifests_fingerprint_output(extracted):
    _, _, out, _ = extracted
    from rayxtract import manifest as mf

    done = mf.completed_partitions(out)
    assert done, "manifests written"
    got = _read_output(out)
    for pid in done:
        m = mf.read_manifest(out, pid)
        part = got[got["partition_id"] == pid]
        assert m["rows"] == len(part)
        assert m["crc_sum"] == int(part["text_crc"].sum())


def test_resume_skips_completed_partitions(small_corpus, tmp_path):
    pages_dir, golden_dir, = small_corpus
    out = str(tmp_path / "resume_out")
    cfg = ExtractConfig(n_partitions=8, batch_size=64, layout_concurrency=(1, 2))
    run_extraction(pages_dir, out, cfg, resume=False)
    full = _load_sorted(_read_output(out))

    # simulate a killed run: drop two completed partitions + one partial dir
    from rayxtract import manifest as mf

    shutil.rmtree(mf.partition_dir(out, 0))
    shutil.rmtree(mf.partition_dir(out, 3))
    os.remove(os.path.join(mf.partition_dir(out, 5), mf.MANIFEST_NAME))

    report = run_extraction(pages_dir, out, cfg, resume=True)
    assert report["partitions_skipped_on_resume"] == 5
    assert 5 in report["partitions_wiped_incomplete"]
    resumed = _load_sorted(_read_output(out))
    pd.testing.assert_frame_equal(
        full[["url", "text", "n_chars"]], resumed[["url", "text", "n_chars"]]
    )


def test_output_independent_of_parallelism(small_corpus, tmp_path):
    """Same corpus, different batch/partition/concurrency config -> same bytes."""
    pages_dir, _ = small_corpus
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    run_extraction(
        pages_dir, a, ExtractConfig(n_partitions=4, batch_size=32, layout_concurrency=1),
        resume=False,
    )
    run_extraction(
        pages_dir, b, ExtractConfig(n_partitions=16, batch_size=256, layout_concurrency=(1, 4)),
        resume=False,
    )
    da = _load_sorted(_read_output(a))[["url", "text"]]
    db = _load_sorted(_read_output(b))[["url", "text"]]
    pd.testing.assert_frame_equal(da, db)


def test_lazy_dataset_streams(small_corpus):
    """extraction_dataset is lazy and consumable without full materialize."""
    pages_dir, _ = small_corpus
    ds = extraction_dataset(pages_dir, ExtractConfig(n_partitions=8, layout_concurrency=(1, 2)))
    n = 0
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        n += batch.num_rows
    assert n == 1000  # unique urls
