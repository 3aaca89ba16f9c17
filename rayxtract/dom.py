"""From-scratch DOM boilerplate stripper on stdlib ``html.parser``.

Readability-style main-content extraction: build a tag tree, prune
non-content tags and penalty-classed subtrees, score candidate paragraphs by
length + punctuation, aggregate scores into their nearest container element,
pick the best container, and emit its paragraphs joined with ``"\n"`` with a
final ``.strip()``.

The join/strip conventions (``"\n"`` between text units, strip the final
result, whitespace collapsed inside a unit) deliberately mirror the
reference's extraction conventions for PDF pages / DOCX paragraphs / Excel
rows (reference: utils.py:110,122,148,185-201) — those conventions are the
byte-identical contract this engine carries over to the HTML payload.

Pure per-row deterministic function: output depends only on the input bytes,
never on block boundaries, actor identity or parallelism (SURVEY.md §7.4).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["extract_main_content", "normalize_ws", "DomConfig"]

_WS_RE = re.compile(r"\s+")


def normalize_ws(s: str) -> str:
    """Collapse whitespace runs to single spaces and strip."""
    # " ".join(split()) == _WS_RE.sub(" ", s).strip() for all \s chars,
    # via C string machinery (~2.5x faster than the regex)
    return " ".join(s.split())


# Tags whose subtrees are never content.
PRUNE_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "iframe",
        "svg",
        "head",
        "button",
        "select",
        "option",
        "template",
        "object",
        "embed",
    }
)

# class/id tokens marking unlikely-content subtrees (readability's
# "unlikely candidates" idea, re-derived from scratch). Short ambiguous
# tokens (ad, ads, nav, menu) require token boundaries so 'heading',
# 'shadow', 'gradient', 'navigate-content' etc. don't prune real content;
# long distinctive stems match as substrings.
PENALTY_RE = re.compile(
    r"(?:^|[\s_-])(?:ad|ads|nav(?:bar|igation)?|menu)(?=$|[\s_-])"
    r"|advert|promo|banner|side-?bar|comment|share|social"
    r"|sponsor|related|widget|breadcrumb|cookie|popup|subscribe",
    re.IGNORECASE,
)

# Elements that can be elected as the main-content container.
CONTAINER_TAGS = frozenset({"article", "main", "section", "div", "body", "td"})

# Text units that become output blocks.
PARAGRAPH_TAGS = frozenset({"p", "blockquote", "pre"})

# Void elements — no closing tag.
VOID_TAGS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)

# Tags that implicitly close an open <p> (HTML5 paragraph auto-close subset —
# enough to survive the ~3% malformed pages with unclosed tags).
_P_CLOSERS = frozenset(
    {"p", "div", "section", "article", "aside", "footer", "header", "nav",
     "ul", "ol", "li", "table", "blockquote", "pre", "h1", "h2", "h3", "h4",
     "h5", "h6", "main", "form"}
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs, parent) -> None:
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # str (text) | _Node
        self.parent = parent


class _TreeBuilder(HTMLParser):
    """Tolerant tag-tree builder (auto-closes mismatched tags)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", (), None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.cur.children.append(_Node(tag, tuple(attrs), self.cur))
            return
        # implicit </p>
        if tag in _P_CLOSERS:
            node = self.cur
            while node is not self.root:
                if node.tag == "p":
                    self.cur = node.parent
                    break
                if node.tag in CONTAINER_TAGS or node.tag == "#root":
                    break
                node = node.parent
        child = _Node(tag, tuple(attrs), self.cur)
        self.cur.children.append(child)
        self.cur = child

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_Node(tag, tuple(attrs), self.cur))

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; ignore stray closers
        node = self.cur
        while node is not self.root:
            if node.tag == tag:
                self.cur = node.parent
                return
            node = node.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


# --------------------------------------------------------------------------
# fast tokenizer: same tree semantics as the HTMLParser builder (verified
# A/B on the synthetic corpus), ~4x faster. html.parser spends most time in
# its generic state machine; the page shapes here need only tags, text,
# comments, doctype and rawtext (script/style) handling.

# attr scan is GREEDY-linear (unquoted runs / quoted strings, no lazy
# backtracking): 2-3.5x faster than the lazy form on attr-heavy tags,
# equal semantics (a trailing '/' lands in the attr group and is split
# off in code as the self-close flag; unterminated quotes fail the match
# in both forms and fall to the stray-'<' path). Name charset mirrors
# html.parser's TOLERANT mode: a letter followed by anything but
# whitespace / '/' / '>' — so soup like `<p<td>` parses as one unknown
# element named "p<td" (exactly what the stdlib reference does), not as
# a paragraph with garbage attrs (quote characters in names included).
# `</ div>`-style space-after-slash end tags are accepted like the
# stdlib too. Known residual divergence from the stdlib (documented,
# adversarial-only): quoted '>' inside end-tag junk.
_TAG_RE = re.compile(
    r"<(?:(/)\s*)?([a-zA-Z][^\t\n\r\f />]*)"
    r"([^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*)>",
    re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_DECL_RE = re.compile(r"<![^>]*>", re.DOTALL)
_RAWTEXT = {"script", "style", "textarea"}
# case-insensitive close-tag scanners for rawtext content
_RAWTEXT_CLOSE = {t: re.compile(f"</{t}", re.IGNORECASE) for t in _RAWTEXT}

from html import unescape as _html_unescape  # noqa: E402


def _build_tree_fast(html: str) -> "_Node":
    """Tokenize + build the tag tree with the same implicit-close rules as
    _TreeBuilder (void tags, <p> auto-close, pop-to-match end tags)."""
    root = _Node("#root", (), None)
    cur = root
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt == -1:
            text = html[pos:]
            if text:
                cur.children.append(
                    _html_unescape(text) if "&" in text else text
                )
            break
        if lt > pos:
            text = html[pos:lt]
            cur.children.append(_html_unescape(text) if "&" in text else text)
        # dispatch on what follows '<'
        m = _TAG_RE.match(html, lt)
        if m is None:
            if html.startswith("<!--", lt):
                c = _COMMENT_RE.match(html, lt)
                pos = c.end() if c else n
                continue
            if html.startswith("<!", lt):
                d = _DECL_RE.match(html, lt)
                pos = d.end() if d else n
                continue
            if html.startswith("<?", lt):
                # processing instruction (<?php ... ?>) — dropped, like the
                # stdlib parser's unhandled handle_pi
                gt = html.find(">", lt)
                pos = (gt + 1) if gt != -1 else n
                continue
            if html.startswith("</", lt):
                # bogus end tag (</>, </-foo>, unmatched-name junk):
                # html.parser drops it as a bogus comment up to '>'
                gt = html.find(">", lt)
                if gt != -1:
                    pos = gt + 1
                    continue
            # stray '<' — treat as text (html.parser emits it as data too)
            cur.children.append("<")
            pos = lt + 1
            continue
        closing, name, rawattrs = m.groups()
        closing = closing or ""
        # trailing '/' is a SELF-CLOSE only when it cannot be the tail of
        # an unquoted attribute value — i.e. preceded by whitespace, a
        # quote, another '/', or nothing (probed stdlib semantics:
        # <br/> <p a='v'/> <p a=v /> <p //> self-close; <p a=/> and
        # <img src=x/> do NOT — the slash belongs to the value)
        if rawattrs.endswith("/") and (
            len(rawattrs) == 1 or rawattrs[-2] in " \t\n\r\f\"'/"
        ):
            selfclose = "/"
            rawattrs = rawattrs[:-1]
        else:
            selfclose = ""
        name = name.lower()
        pos = m.end()
        if closing:
            node = cur
            while node is not root:
                if node.tag == name:
                    cur = node.parent
                    break
                node = node.parent
            continue
        # keep the RAW attr text; penalty checks parse lazily (most tags'
        # attrs are never inspected)
        attrs = rawattrs if rawattrs and "=" in rawattrs else ()
        if name in VOID_TAGS or selfclose:
            cur.children.append(_Node(name, attrs, cur))
            continue
        if name in _P_CLOSERS:
            node = cur
            while node is not root:
                if node.tag == "p":
                    cur = node.parent
                    break
                if node.tag in CONTAINER_TAGS or node.tag == "#root":
                    break
                node = node.parent
        child = _Node(name, attrs, cur)
        cur.children.append(child)
        cur = child
        if name in _RAWTEXT:
            cm = _RAWTEXT_CLOSE[name].search(html, pos)
            close = cm.start() if cm else n
            if close > pos:
                child.children.append(html[pos:close])
            # skip past the closing tag
            gt = html.find(">", close)
            pos = (gt + 1) if gt != -1 else n
            cur = child.parent
    return root


class DomConfig:
    """Extraction thresholds (the engine's ExtractConfig surface,
    reference's env-knob analogue, reference: utils.py:19-23)."""

    __slots__ = ("min_par_chars", "max_link_density", "score_cap")

    def __init__(
        self,
        min_par_chars: int = 25,
        max_link_density: float = 0.33,
        score_cap: int = 500,
    ) -> None:
        self.min_par_chars = min_par_chars
        self.max_link_density = max_link_density
        self.score_cap = score_cap


_DEFAULT_CFG = DomConfig()


# (?<![\w-]) anchors the attribute NAME start: plain \b would also match the
# tail of data-id= / item-id= / data-class=, penalizing subtrees the
# stdlib-parser path (exact key match on 'class'/'id') keeps.
_CLASS_ID_RE = re.compile(
    r"(?<![\w-])(?:class|id)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE,
)


def _is_penalized(node: _Node) -> bool:
    attrs = node.attrs
    if isinstance(attrs, str):  # fast path: raw attribute text, parsed lazily
        if "class" not in attrs and "id" not in attrs:
            return False
        for m in _CLASS_ID_RE.finditer(attrs):
            v = m.group(1) or m.group(2) or m.group(3)
            if v and PENALTY_RE.search(v):
                return True
        return False
    for k, v in attrs:
        if v and k in ("class", "id") and PENALTY_RE.search(v):
            return True
    return False


def _collect_text(node: _Node, out: list, link_out: list, in_link: bool) -> None:
    for ch in node.children:
        if isinstance(ch, str):
            out.append(ch)
            if in_link:
                link_out.append(ch)
        else:
            if ch.tag in PRUNE_TAGS or _is_penalized(ch):
                continue
            _collect_text(ch, out, link_out, in_link or ch.tag == "a")


def _paragraph_text(node: _Node) -> tuple[str, float]:
    """(normalized text, link_density) of a candidate block."""
    pieces: list = []
    link_pieces: list = []
    _collect_text(node, pieces, link_pieces, False)
    text = normalize_ws("".join(pieces))
    if not text:
        return "", 0.0
    link_chars = len(normalize_ws("".join(link_pieces)))
    return text, link_chars / len(text)


def _nearest_container(node: _Node) -> _Node:
    p = node.parent
    while p is not None and p.tag not in CONTAINER_TAGS and p.tag != "#root":
        p = p.parent
    return p if p is not None else node


def extract_main_content(
    html: str, cfg: DomConfig = _DEFAULT_CFG, _use_stdlib_parser: bool = False
) -> tuple[str, list[dict]]:
    """Extract main-content text + spans from an HTML string.

    Returns ``(text, spans)`` where ``spans`` is a list of
    ``{"start": int, "end": int, "kind": "p"}`` char ranges into ``text``.
    Empty text means no content survived the heuristics (caller emits the
    reference's empty-extraction sentinel, reference: workers.py:70-75).

    ``_use_stdlib_parser`` forces the html.parser tree builder — the
    semantic reference implementation the fast tokenizer is A/B-tested
    against (tests/test_dom.py::test_fast_parser_matches_stdlib).
    """
    if _use_stdlib_parser:
        builder = _TreeBuilder()
        builder.feed(html)
        builder.close()
        root = builder.root
    else:
        root = _build_tree_fast(html)

    # Walk: collect candidate paragraphs with scores, grouped by container.
    candidates: list[tuple[_Node, str, float]] = []  # (container, text, score)
    order: dict[int, int] = {}

    def walk(node: _Node) -> None:
        for ch in node.children:
            if isinstance(ch, str):
                continue
            if ch.tag in PRUNE_TAGS or _is_penalized(ch):
                continue
            if ch.tag in PARAGRAPH_TAGS:
                text, link_density = _paragraph_text(ch)
                if (
                    len(text) >= cfg.min_par_chars
                    and link_density <= cfg.max_link_density
                ):
                    score = min(len(text), cfg.score_cap) / 100.0 + text.count(",")
                    container = _nearest_container(ch)
                    cid = id(container)
                    if cid not in order:
                        order[cid] = len(order)
                    candidates.append((container, text, score))
                # paragraphs never nest content paragraphs
                continue
            walk(ch)

    walk(root)
    if not candidates:
        return "", []

    # Elect best container: max total score, tie -> earliest in document order.
    totals: dict[int, float] = {}
    for container, _, score in candidates:
        totals[id(container)] = totals.get(id(container), 0.0) + score
    best = max(totals, key=lambda cid: (totals[cid], -order[cid]))

    blocks = [text for container, text, _ in candidates if id(container) == best]
    out_text = "\n".join(blocks).strip()
    spans: list[dict] = []
    pos = 0
    for b in blocks:
        spans.append({"start": pos, "end": pos + len(b), "kind": "p"})
        pos += len(b) + 1
    return out_text, spans
