"""Text analysis over the pages corpus: language-ID accuracy vs labels."""


def test_pages_langid_accuracy(small_corpus):
    import ray.data

    from rayxtract.ops import ExtractConfig
    from rayxtract.pipeline import extraction_dataset
    from rayxtract.textops import LangIdBatch

    pages_dir, _ = small_corpus
    ds = extraction_dataset(pages_dir, ExtractConfig())
    df = (
        ds.map_batches(
            LangIdBatch, batch_format="pandas", batch_size=512, concurrency=2
        )
        .select_columns(["lang", "lang_pred", "is_parse_failure", "error"])
        .to_pandas()
    )
    ok = df[(~df["is_parse_failure"]) & (df["error"] == "")]
    acc = (ok["lang"] == ok["lang_pred"]).mean()
    assert acc >= 0.8, f"langid accuracy {acc:.3f}"
