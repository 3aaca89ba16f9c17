"""Unit tests for the DOM stripper and PDFL layout parser (no Ray needed)."""

import pytest

from rayxtract.dom import extract_main_content, normalize_ws
from rayxtract.layout import decode_pdfl, encode_pdfl, layout_text, parse_pdfl


def test_normalize_ws():
    assert normalize_ws("  a \t b\n\nc ") == "a b c"


def test_basic_extraction():
    html = (
        "<html><body><nav><a href='/'>home</a></nav>"
        "<div id='main'><p>This is the principal article content paragraph.</p>"
        "<p>And a second paragraph with enough characters to count.</p></div>"
        "<footer><a href='/x'>contact</a></footer></body></html>"
    )
    text, spans = extract_main_content(html)
    assert text == (
        "This is the principal article content paragraph.\n"
        "And a second paragraph with enough characters to count."
    )
    assert spans == [
        {"start": 0, "end": 48, "kind": "p"},
        {"start": 49, "end": 104, "kind": "p"},
    ]


def test_prunes_script_style_and_penalty_classes():
    html = (
        "<body><script>var x = 'not content at all, really quite long';</script>"
        "<div class='sidebar'><p>link farm text that is long enough to pass</p></div>"
        "<div class='comments'><p>a comment that is long enough to be a paragraph</p></div>"
        "<div><p>The only real content paragraph in this document body.</p></div></body>"
    )
    text, _ = extract_main_content(html)
    assert text == "The only real content paragraph in this document body."


def test_link_density_excludes_link_farms():
    html = (
        "<body><div><p><a href='/1'>one two three four five six seven eight nine ten</a></p>"
        "<p>Plain prose paragraph long enough to be selected as content.</p></div></body>"
    )
    text, _ = extract_main_content(html)
    assert text == "Plain prose paragraph long enough to be selected as content."


def test_short_paragraphs_excluded():
    html = "<body><div><p>too short</p><p>This paragraph easily clears the minimum character bar.</p></div></body>"
    text, _ = extract_main_content(html)
    assert text == "This paragraph easily clears the minimum character bar."


def test_best_container_wins():
    html = (
        "<body><div><p>Stray paragraph outside the main container, long enough.</p></div>"
        "<article><p>Main body paragraph number one, with plenty of characters, commas, and words.</p>"
        "<p>Main body paragraph number two, also comfortably long enough to score.</p>"
        "<p>Main body paragraph number three, pushing the container score higher.</p></article></body>"
    )
    text, _ = extract_main_content(html)
    assert text.startswith("Main body paragraph number one")
    assert "Stray paragraph" not in text


def test_malformed_unclosed_tags():
    html = (
        "<body><div class='c'><p>First unclosed paragraph that is long enough to count"
        "<p>Second paragraph also long enough to be selected here.</p>"
        "<footer><a>x</a></footer></body>"
    )
    text, _ = extract_main_content(html)
    assert text == (
        "First unclosed paragraph that is long enough to count\n"
        "Second paragraph also long enough to be selected here."
    )


def test_entities_unescaped():
    html = "<body><div><p>Rock &amp; roll paragraphs need enough characters to pass the bar.</p></div></body>"
    text, _ = extract_main_content(html)
    assert "Rock & roll" in text


def test_empty_returns_empty():
    assert extract_main_content("<body><nav><a>x</a></nav></body>") == ("", [])


# --- PDFL -----------------------------------------------------------------


def test_pdfl_roundtrip():
    pages = [
        [(10, 20, "hello"), (5, 20, "well"), (0, 40, "below")],
        [(0, 0, "page two")],
    ]
    data = encode_pdfl(pages)
    assert decode_pdfl(data) == pages
    text, spans = parse_pdfl(data)
    # within a page: sorted by (y, x), space-joined; pages joined by \n
    assert text == "well hello below\npage two"
    assert spans == [
        {"start": 0, "end": 16, "kind": "page"},
        {"start": 17, "end": 25, "kind": "page"},
    ]


def test_pdfl_truncation_raises():
    data = encode_pdfl([[(1, 1, "abc")]])
    with pytest.raises(ValueError):
        decode_pdfl(data[:-1])
    with pytest.raises(ValueError):
        decode_pdfl(b"NOPE" + data[4:])
    with pytest.raises(ValueError):
        decode_pdfl(data + b"x")


def test_layout_text_spec():
    # spec: runs sorted (y, x), space-joined; pages "\n"-joined; strip
    text, _ = layout_text([[(100, 5, "b"), (1, 5, "a"), (1, 2, "top")]])
    assert text == "top a b"


# --- regressions from code review ----------------------------------------


def test_penalty_tokens_not_substrings():
    # 'heading'/'shadow'/'download' must not be pruned; real penalty
    # tokens still are
    html = (
        "<body><div class='reading-content'>"
        "<p>Real content paragraph long enough to clear the minimum bar.</p>"
        "</div><div class='ad'><p>advertisement text long enough to be a paragraph</p></div></body>"
    )
    text, _ = extract_main_content(html)
    assert text == "Real content paragraph long enough to clear the minimum bar."


def test_uppercase_rawtext_close():
    html = (
        "<body><script>x</SCRIPT><div><p>First paragraph content long enough to count.</p>"
        "<script>y</script><p>Second paragraph content long enough as well.</p></div></body>"
    )
    fast = extract_main_content(html)
    std = extract_main_content(html, _use_stdlib_parser=True)
    assert fast == std
    assert "First paragraph" in fast[0] and "Second paragraph" in fast[0]


def test_layout_spans_with_empty_pages():
    text, spans = layout_text([[], [(0, 0, "hello")], []])
    assert text == "hello"
    for s in spans:
        assert 0 <= s["start"] <= s["end"] <= len(text)


def test_bom_prefixed_html():
    from rayxtract.ops import ExtractConfig, _extract_one, detect_type

    payload = "﻿<body><div><p>BOM page content paragraph long enough to extract.</p></div></body>".encode(
        "utf-8"
    )
    assert payload[:3] == b"\xef\xbb\xbf"
    assert detect_type(payload) == "html"
    _, text, _, _, fail, _, _ = _extract_one("u", payload, ExtractConfig())
    assert not fail
    assert text == "BOM page content paragraph long enough to extract."


def test_data_prefixed_attrs_not_penalized():
    # data-id / data-class / item-id are NOT 'class'/'id': the fast
    # tokenizer's lazy attr scan must agree with the stdlib path's exact
    # key match (ADVICE r1: \b matched the tail of hyphenated attrs).
    html = (
        "<body><div data-id='nav' data-class='menu' item-id='ads'>"
        "<p>Real article content that must survive attribute sniffing here.</p>"
        "</div><div class='nav'>"
        "<p>Penalized sidebar paragraph long enough to qualify as content.</p>"
        "</div></body>"
    )
    fast = extract_main_content(html)
    stdlib = extract_main_content(html, _use_stdlib_parser=True)
    assert fast == stdlib
    assert fast[0] == (
        "Real article content that must survive attribute sniffing here."
    )


def test_fast_parser_stdlib_agreement_on_adversarial_soup():
    """Seeded fuzz: the fast tokenizer agrees with the stdlib-parser
    reference on >= 99% of adversarial tag-soup inputs (round-3 tolerant-
    name work took this from ~90% to ~99.8%). Residual divergences are
    deep-soup constructs documented at _TAG_RE (quoted '>' in end-tag
    junk, quote-opening tag names swallowing doctypes)."""
    import random

    frags = [
        "<p>", "</p>", "<div>", "</div>", '<div class="ad">',
        "<p class='x>y'>",
        "hello world this is some longer content text, with punctuation, "
        "enough to score. ",
        "<", ">", "&amp;", "&", "&#65;", "<!-- comment -->",
        "<!doctype html>", "<script>var x = '<p>';</script>", "</script>",
        "<br/>", "<img src=x>", "<a href='u'>link</a>", "'", '"', "<b",
        "=", "</", "<-", "< p>", "</ div>", "<P>", "</P>", "<DiV>", "<p",
        "text<with<brackets", "<input value='a>b'>", "<article>",
        "</article>", "<td>", "</td>", "\n", "\t", "<p/>", "<x-custom>",
        "</x-custom>", "<em>emph</em>", "<12>", "<!>", "<?php ?>",
    ]
    rng = random.Random(42)
    n, div = 2000, 0
    for _ in range(n):
        s = "".join(rng.choice(frags) for _ in range(rng.randint(1, 60)))
        if extract_main_content(s) != extract_main_content(
            s, _use_stdlib_parser=True
        ):
            div += 1
    assert div / n <= 0.01, f"{div}/{n} divergences"


def test_selfclose_vs_unquoted_value_slash():
    """A trailing '/' that is the tail of an unquoted attribute value is
    NOT a self-close (stdlib semantics: <p a=/> opens a paragraph with
    a='/'; <br/>, <p a='v'/>, <p a=v /> do self-close)."""
    for html in (
        "<body><div><p a=/>Content paragraph long enough to extract fine.</p></div></body>",
        "<body><div><a href=/>x</a><p>Content paragraph long enough to extract fine.</p></div></body>",
        "<body><div><p a='v'/><p>Content paragraph long enough to extract fine.</p></div></body>",
        "<body><div><p a=v /><p>Content paragraph long enough to extract fine.</p></div></body>",
    ):
        fast = extract_main_content(html)
        stdlib = extract_main_content(html, _use_stdlib_parser=True)
        assert fast == stdlib, html
        assert "Content paragraph" in fast[0], html
