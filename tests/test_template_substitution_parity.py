"""Template-literal ``${}`` substitution parity with the Go reference.

The reference's token loop (reader.go:420-434) special-cases only whole
``js.TemplateToken``s. A template WITH substitutions instead arrives as
TemplateStart/Middle/End tokens, which fall through to the ``default:``
branch (reader.go:458-461) and are written RAW into the candidate
buffer — the bare backtick bytes then always fail the caller's
``json.Valid`` gate, so the candidate is rejected and the Reader resumes
scanning one rune past the opening bracket, INCLUDING into the
template's interior bytes (the rescan is over raw input, with no memory
of template context).

Our lexer reaches the same rejection earlier (``${`` inside a template
lexes to ERROR, kernel/lexer.py), so the observable contract — which
objects are extracted, and from where scanning resumes — is identical.
These fixtures pin that equivalence; expected values are derived from
the reference source as analyzed above (no Go toolchain in this
environment). Three behaviors are covered:

1. rejection: a candidate containing a substitution template never
   extracts (the backtick bytes cannot form valid JSON);
2. resume offset: scanning continues at bracket+1, so later siblings
   still extract;
3. interior rescan: brackets INSIDE the failed template's substitution
   are re-scanned as raw input — ``[`${}`]`` really does extract ``{}``
   (the ``{}`` right after ``$``), and an object nested in a
   substitution is found on the second pass.
"""

import pytest

from jsonextract_spark.kernel.scanner import extract_objects_str

# (input, expected extraction sequence) — see module docstring for the
# derivation of each expectation from reader.go's token loop.
TEMPLATE_SUBSTITUTION_CASES = [
    # plain rejection: substitution template inside the only candidate
    ('{a:`x${1}`}', []),
    # unterminated substitution (nested template never closes)
    ('[`${`]', []),
    # resume: the candidate after the rejected one still extracts
    ('{a:`x${1}`} {"b":2}', ['{"b":2}']),
    ('{a:`x${1}`}{"c":3}', ['{"c":3}']),
    # interior rescan: the `{}` directly after `$` is a valid candidate
    # on the second pass (both engines rescan raw bytes at bracket+1)
    ('[`${}`]', ['{}']),
    # interior rescan: object nested inside the substitution expression
    ('{a:`${ {"x":1} }`}', ['{"x":1}']),
    # interior rescan rejects `{x}` (marshals to {"x"} -> invalid), then
    # finds the trailing array
    ('{k:`a${x}b`, q: 1} [2]', ['[2]']),
    # control group: templates WITHOUT substitutions keep extracting
    # via the whole-TemplateToken marshal path (reader.go:420-434)
    ('[`plain template`]', ['["plain template"]']),
    ('[`a{b`]', ['["a{b"]']),
]


@pytest.mark.parametrize("case_idx",
                         range(len(TEMPLATE_SUBSTITUTION_CASES)))
def test_template_substitution_parity(case_idx):
    text, want = TEMPLATE_SUBSTITUTION_CASES[case_idx]
    assert extract_objects_str(text) == want


def test_template_substitution_mixed_page():
    """A page mixing all three behaviors extracts exactly the survivors,
    in callback order."""
    page = ('<script>var a = {broken: `x${1}`};'
            'var b = {"ok": 1};'
            'var c = [`fine`];'
            'var d = {nested: `${ [7] }`};</script>')
    assert extract_objects_str(page) == ['{"ok":1}', '["fine"]', '[7]']
