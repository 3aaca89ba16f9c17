"""Byte-level tests for the prompt builder (reference utils.py:239-271)."""

from rayxtract.extract_fields import build_prompt


def test_prompt_no_template():
    out = build_prompt("CTX", "Q?")
    assert out == (
        "Context: CTX\n\nQuestion: Q?\n\n"
        "Based on the context provided above, extract the required "
        "information and respond ONLY in the specified JSON format. "
        "Do not include any explanations or additional text."
    )


def test_prompt_with_template_only():
    out = build_prompt("CTX", "Q?", template='[{"k": ""}]')
    assert "Required JSON Format: [{\"k\": \"\"}]" in out
    assert "Example Response:" not in out
    assert "Follow the exact pattern shown in the example" not in out
    assert out.startswith("Context: CTX\n\nQuestion: Q?\n\nCRITICAL")


def test_prompt_with_template_and_example():
    out = build_prompt("CTX", "Q?", template='[{"k": ""}]', example='[{"k": "v"}]')
    assert "Required JSON Format: [{\"k\": \"\"}]" in out
    assert "Example Response: [{\"k\": \"v\"}]" in out
    assert "Follow the exact pattern shown in the example" in out


def test_prompt_example_without_template_ignored():
    assert build_prompt("C", "Q", example="[1]") == build_prompt("C", "Q")
