"""CLI surface tests (in-process main() — the session fixture owns Ray)."""

import json

import pytest

from rayxtract.__main__ import main


@pytest.fixture(scope="module")
def cli_out(small_corpus, tmp_path_factory, capsys_factory=None):
    pages_dir, _ = small_corpus
    out = str(tmp_path_factory.mktemp("cli") / "out")
    return pages_dir, out


def test_cli_extract_and_status(cli_out, capsys):
    pages_dir, out = cli_out
    assert main(["extract", "--pages", pages_dir, "--out", out]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows"] == 1000

    assert main(["status", "--out", out, "--limit", "5"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    ts = [l["warc_ts"] for l in lines]
    assert ts == sorted(ts, reverse=True)


def test_cli_reextract_and_winners(cli_out, capsys):
    pages_dir, _ = cli_out
    assert main(["winners", "--pages", pages_dir]) == 0
    w = json.loads(capsys.readouterr().out.strip())
    assert len(w["winners"]) == 50 and not w["ties"]  # idx%20==7 recrawls

    url = sorted(w["winners"])[0]
    assert main(["reextract", "--pages", pages_dir, "--url", url]) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["url"] == url and rec["text"]
