"""Structured-field extraction + JSON formatting cascade.

Re-implements (from the SURVEY.md §2.2 semantic spec, NOT the code) the
reference's deterministic response formatter — the only part of its LLM
post-processing that is reproducible offline:

  * ``format_response`` — the 4-method cascade of
    ``format_llm_response`` (reference: utils.py:321-437): whole-string JSON
    parse; first valid non-greedy ``[.*?]`` / ``{.*?}`` regex match chosen by
    the template's leading char; template-key-driven field extraction;
    example-key-driven field extraction; fallback to the stripped original.
    JSON is serialized with ``ensure_ascii=False`` (non-ASCII preserved —
    part of the byte-level contract, reference: utils.py:391,403,422).
  * ``extract_value_from_text`` — ordered first-match regex cascade
    (reference: utils.py:439-474): key:value / key= forms, d/m/y dates,
    CNPJ-style ids (dotted and 14-digit), decimals, integers; trailing
    ``[,;.]`` stripped.

Exposed as a vectorizable ``map_batches`` stage over extracted text.
"""

from __future__ import annotations

import json
import re

import pandas as pd

__all__ = ["extract_value_from_text", "format_response", "FormatBatch"]

_ARRAY_RE = re.compile(r"\[.*?\]", re.DOTALL)
_OBJECT_RE = re.compile(r"\{.*?\}", re.DOTALL)
_TRAIL_RE = re.compile(r"[,;.]+$")


def _value_patterns(key: str) -> list[re.Pattern]:
    k = re.escape(key)
    return [
        re.compile(rf"{k}\s*:\s*([^\n,;]+)", re.IGNORECASE),
        re.compile(rf"{k}\s*=\s*([^\n,;]+)", re.IGNORECASE),
        re.compile(r"\b(\d{1,2}/\d{1,2}/\d{4})\b"),
        re.compile(r"\b(\d{1,2}/\d{1,2}/\d{2})\b"),
        re.compile(r"\b(\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2})\b"),
        re.compile(r"\b(\d{14})\b"),
        re.compile(r"\b(\d+[.,]\d+)\b"),
        re.compile(r"\b(\d+)\b"),
    ]


def extract_value_from_text(text: str, key: str) -> str:
    """First-match ordered regex cascade for one template key."""
    for pat in _value_patterns(key):
        m = pat.search(text)
        if m:
            return _TRAIL_RE.sub("", m.group(1).strip()).strip()
    return ""


def _template_keys(template: str) -> tuple[list[str], bool]:
    """(keys, is_array) from a JSON template like '[{"CNPJ": ""}]'."""
    try:
        obj = json.loads(template)
    except (json.JSONDecodeError, TypeError):
        return [], False
    if isinstance(obj, list):
        keys: list[str] = []
        for item in obj:
            if isinstance(item, dict):
                keys.extend(item.keys())
        return keys, True
    if isinstance(obj, dict):
        return list(obj.keys()), False
    return [], False


def format_response(
    response: str, template: str | None = None, example: str | None = None
) -> str:
    """4-method cascade; always returns a string (JSON or stripped original)."""
    response = (response or "").strip()

    # method 1: the whole response is valid JSON
    try:
        return json.dumps(json.loads(response), ensure_ascii=False)
    except (json.JSONDecodeError, TypeError):
        pass

    # method 2: first valid embedded JSON (array vs object chosen by the
    # template's leading char; both tried when no template)
    want_array = bool(template) and template.lstrip().startswith("[")
    pats = (
        [_ARRAY_RE, _OBJECT_RE]
        if (template is None or want_array)
        else [_OBJECT_RE, _ARRAY_RE]
    )
    for pat in pats[: 1 if template else 2]:
        for m in pat.finditer(response):
            try:
                return json.dumps(json.loads(m.group(0)), ensure_ascii=False)
            except json.JSONDecodeError:
                continue

    # method 3: template-key-driven extraction
    for source in (template, example):
        if not source:
            continue
        keys, is_array = _template_keys(source)
        if not keys:
            continue
        values = {k: extract_value_from_text(response, k) for k in keys}
        if any(values.values()):
            out = [values] if is_array else values
            return json.dumps(out, ensure_ascii=False)

    # method 4 fallback: stripped original
    return response


class FormatBatch:
    """map_batches stage: format a response/text column against a fixed
    template+example (pipeline-level config, like the reference's
    per-request Format-Response/Example headers, main.py:178-186)."""

    def __init__(self, template: str | None = None, example: str | None = None,
                 col: str = "text", out_col: str = "formatted"):
        self.template = template
        self.example = example
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = [
            format_response(t, self.template, self.example) for t in batch[self.col]
        ]
        return batch
