"""Structured-field extraction + JSON formatting cascade.

From-scratch re-implementation of the reference's deterministic response
formatter semantics (the only LLM post-processing that is reproducible
offline). Behavioral contract verified against the reference
(reference: utils.py:321-437 ``format_llm_response``, utils.py:439-474
``extract_value_from_text``):

  * method 1 — whole string parses as JSON -> return the ORIGINAL stripped
    string verbatim (no re-serialization; byte contract);
  * method 2 — only when a template exists: non-greedy DOTALL ``\\[.*?\\]``
    scan when the template is ``[...]``-shaped, ``\\{.*?\\}`` when
    ``{...}``-shaped; first substring that parses returns VERBATIM;
  * method 3 — template keys drive the regex value cascade; an array
    template yields a LIST OF SINGLE-KEY DICTS (one per found key), an
    object template one dict; serialized ``ensure_ascii=False``;
  * method 4 — same, driven by the example (array-of-objects form only);
  * fallback — the stripped original.

Value cascade (ordered, first pattern with any match wins, first match
taken): ``key: v`` / ``key = v`` capturing ``[^\\n,}]+``, d/m/y and y/m/d
dates with ``/-.`` separators, dotted CNPJ, 14-digit runs, decimals,
integers; trailing ``[,;.]`` stripped.
"""

from __future__ import annotations

import json
import re

import pandas as pd

__all__ = [
    "extract_value_from_text",
    "format_response",
    "FormatBatch",
    "build_prompt",
    "PromptBatch",
    "MockLlmBatch",
]

_ARRAY_RE = re.compile(r"\[.*?\]", re.DOTALL)
_OBJECT_RE = re.compile(r"\{.*?\}", re.DOTALL)
_TRAIL_RE = re.compile(r"[,;.]+$")


def _value_patterns(key: str) -> list[re.Pattern]:
    k = re.escape(key)
    return [
        re.compile(rf"{k}:\s*([^\n,}}]+)", re.IGNORECASE),
        re.compile(rf"{k}\s*:\s*([^\n,}}]+)", re.IGNORECASE),
        re.compile(rf"{k}\s*=\s*([^\n,}}]+)", re.IGNORECASE),
        re.compile(r"(\d{1,2}[/\-.]\d{1,2}[/\-.]\d{2,4})"),
        re.compile(r"(\d{2,4}[/\-.]\d{1,2}[/\-.]\d{1,2})"),
        re.compile(r"(\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2})"),
        re.compile(r"(\d{14})"),
        re.compile(r"(\d+[,.]\d+)"),
        re.compile(r"(\d+)"),
    ]


def extract_value_from_text(text: str, key: str) -> str:
    """First-match ordered regex cascade for one template key ("" if none)."""
    for pat in _value_patterns(key):
        matches = pat.findall(text)
        if matches:
            value = _TRAIL_RE.sub("", matches[0].strip())
            if value:
                return value
    return ""


def _keyed_extraction(response: str, source: str, allow_object: bool) -> str | None:
    """Methods 3/4: template/example-key-driven extraction."""
    try:
        obj = json.loads(source)
    except (json.JSONDecodeError, TypeError):
        return None
    if isinstance(obj, list) and obj and isinstance(obj[0], dict):
        found = []
        for key in obj[0].keys():
            value = extract_value_from_text(response, key)
            if value:
                found.append({key: value})
        if found:
            return json.dumps(found, ensure_ascii=False)
    elif allow_object and isinstance(obj, dict):
        found = {}
        for key in obj.keys():
            value = extract_value_from_text(response, key)
            if value:
                found[key] = value
        if found:
            return json.dumps(found, ensure_ascii=False)
    return None


def format_response(
    response: str, template: str | None = None, example: str | None = None
) -> str:
    """4-method cascade; always returns a string (JSON or stripped original)."""
    cleaned = (response or "").strip()

    # method 1: the whole response is valid JSON -> verbatim
    try:
        json.loads(cleaned)
        return cleaned
    except json.JSONDecodeError:
        pass

    # method 2: first valid embedded JSON, shape chosen by the template
    if template:
        t = template
        pat = None
        if t.startswith("[") and t.endswith("]"):
            pat = _ARRAY_RE
        elif t.startswith("{") and t.endswith("}"):
            pat = _OBJECT_RE
        if pat is not None:
            for m in pat.findall(cleaned):
                try:
                    json.loads(m)
                    return m
                except json.JSONDecodeError:
                    continue

    # method 3: template-key-driven extraction
    if template:
        out = _keyed_extraction(cleaned, template, allow_object=True)
        if out is not None:
            return out

    # method 4: example-driven fallback (array-of-objects form)
    if example:
        out = _keyed_extraction(cleaned, example, allow_object=False)
        if out is not None:
            return out

    return cleaned


_FMT_WITH_EXAMPLE = """

CRITICAL FORMATTING INSTRUCTIONS:
- You MUST respond ONLY with the exact JSON format specified below
- DO NOT include any explanations, introductions, or additional text
- DO NOT use markdown formatting or code blocks
- Respond with ONLY the JSON structure, nothing else
- Follow the exact pattern shown in the example

Required JSON Format: {template}
Example Response: {example}

Your response must be EXACTLY in this JSON format. No other text is allowed."""

_FMT_NO_EXAMPLE = """

CRITICAL FORMATTING INSTRUCTIONS:
- You MUST respond ONLY with the exact JSON format specified below
- DO NOT include any explanations, introductions, or additional text
- DO NOT use markdown formatting or code blocks
- Respond with ONLY the JSON structure, nothing else

Required JSON Format: {template}

Your response must be EXACTLY in this JSON format. No other text is allowed."""


def build_prompt(
    context: str,
    prompt: str,
    template: str | None = None,
    example: str | None = None,
) -> str:
    """Deterministic prompt assembly — byte-parity with the reference's
    3-variant template (template+example / template only / neither;
    reference: utils.py:239-271, duplicated for the second provider at
    utils.py:521-554). A pure string projection, exposed as a map_batches
    stage via PromptBatch."""
    if template and example:
        fmt = _FMT_WITH_EXAMPLE.format(template=template, example=example)
    elif template:
        fmt = _FMT_NO_EXAMPLE.format(template=template)
    else:
        fmt = ""
    return (
        f"Context: {context}\n\nQuestion: {prompt}{fmt}\n\n"
        "Based on the context provided above, extract the required "
        "information and respond ONLY in the specified JSON format. "
        "Do not include any explanations or additional text."
    )


class PromptBatch:
    """map_batches stage: build the LLM prompt column from extracted text
    (the reference's stage-2 preamble, workers.py:165-234, minus the
    network call — the deterministic, verifiable part)."""

    def __init__(self, prompt: str, template: str | None = None,
                 example: str | None = None, col: str = "text",
                 out_col: str = "full_prompt"):
        self.prompt = prompt
        self.template = template
        self.example = example
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = [
            build_prompt(t, self.prompt, self.template, self.example)
            for t in batch[self.col]
        ]
        return batch


class MockLlmBatch:
    """Deterministic offline stand-in for the reference's model call
    (stage 2 of the 3-stage chain, workers.py:165-320: prompt -> Ollama/
    Gemini -> format). The response is a pure function of the input text
    (``"The value is {len(text)}"``), so the full chain
    PromptBatch -> MockLlmBatch -> FormatBatch is reproducible and
    oracle-checkable end-to-end; a real deployment swaps this class for one
    holding a warm model client (same actor-pool seam)."""

    def __init__(self, col: str = "text", out_col: str = "response"):
        self.col = col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = [
            f"The value is {len(t)}" for t in batch[self.col]
        ]
        return batch


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
