"""Grammar-directed fuzzing of the extraction kernel.

THIRTEEN generator families here (family 14 — hostile bytes for the
sitemap and WARC parsers — lives in test_untrusted_bytes_fuzz.py),
each with an exact oracle that needs no Go binary — the first three below, plus comments/templates, regex
literals, limit-prefix, bracket soup (all r4), number-literal
decimalization and identifier-value mapping (both r5), string escape
sequences across both quote styles, object-key dispatch (both r6),
multi-byte UTF-8 boundaries against a transcribed rune-loop
oracle (r7), and the Objects-layer dispatch against an independent
recursive-walk oracle (r8; see the section comments):

* STRICT-JSON EMBED — hypothesis generates arbitrary JSON values,
  embeds their ``json.dumps`` renderings between brace-free garbage,
  and every embedded object must be found, in order, SEMANTICALLY
  intact (``json.loads(extracted) == original``).
* JS-LITERAL EMBED — objects rendered in the JavaScript notations the
  reference accepts (unquoted identifier keys, single-quoted strings),
  checked for validity (every output parses as strict JSON) and for the
  FIXPOINT property: extraction output is in normal form, so
  re-extracting an output reproduces it byte-for-byte.
* ARBITRARY BYTES — anything at all must never crash the scanner, and
  whatever comes out must still be valid JSON.

These complement the 95-case golden corpus (exact reference fixtures):
the corpus pins known tricky cases; the grammar fuzz searches the
neighborhood the corpus never wrote down.
"""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonextract_spark.kernel import extract_objects

# garbage alphabet: no { [ " ' ` (cannot open or extend a candidate)
_GARBAGE = st.text(
    alphabet=" abcdefgXYZ0123456789.,;:!?()<>=+-*&^%$#@~|\n\t",
    max_size=30)

_KEY = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_SCALAR = (st.none() | st.booleans()
           | st.integers(-10**12, 10**12)
           | st.text(st.characters(blacklist_categories=("Cs",)),
                     max_size=16))
_JSON_VALUE = st.recursive(
    _SCALAR,
    lambda kids: (st.lists(kids, max_size=4)
                  | st.dictionaries(_KEY, kids, max_size=4)),
    max_leaves=10)
_TOP = (st.dictionaries(_KEY, _JSON_VALUE, max_size=4)
        | st.lists(_JSON_VALUE, min_size=1, max_size=4))


@settings(max_examples=150, deadline=None)
@given(objs=st.lists(_TOP, min_size=1, max_size=4),
       seps=st.lists(_GARBAGE, min_size=5, max_size=5))
def test_embedded_strict_json_found_in_order(objs, seps):
    page = seps[0]
    for o, sep in zip(objs, seps[1:]):
        page += json.dumps(o) + sep
    out = extract_objects(page.encode("utf-8"))
    assert len(out) == len(objs), page
    for got, want in zip(out, objs):
        assert json.loads(got) == want


def _js_render(value) -> str:
    """Render a JSON value in the reference-accepted JS notation:
    unquoted identifier keys, single-quoted strings."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, str):
        return "'" + value.replace("\\", "\\\\").replace("'", "\\'") \
            + "'"
    if isinstance(value, list):
        return "[" + ", ".join(_js_render(v) for v in value) + "]"
    return "{" + ", ".join(f"{k}: {_js_render(v)}"
                           for k, v in value.items()) + "}"


_JS_STR = st.text(alphabet=string.ascii_letters + string.digits + " '",
                  max_size=12)
_JS_VALUE = st.recursive(
    st.none() | st.booleans() | st.integers(-10**9, 10**9) | _JS_STR,
    lambda kids: (st.lists(kids, max_size=3)
                  | st.dictionaries(_KEY, kids, max_size=3)),
    max_leaves=8)


@settings(max_examples=150, deadline=None)
@given(objs=st.lists(st.dictionaries(_KEY, _JS_VALUE, min_size=1,
                                     max_size=3),
                     min_size=1, max_size=3),
       seps=st.lists(_GARBAGE, min_size=4, max_size=4))
def test_js_literals_valid_json_and_fixpoint(objs, seps):
    page = seps[0]
    for o, sep in zip(objs, seps[1:]):
        page += _js_render(o) + sep
    out = extract_objects(page.encode("utf-8"))
    assert len(out) == len(objs), page
    for got, want in zip(out, objs):
        assert json.loads(got) == want       # JS notation -> same value
        # normal form: extracting an extraction output reproduces it
        again = extract_objects(b"noise " + got + b" tail")
        assert again == [got]


_COMMENT_TEXT = st.text(alphabet=string.ascii_letters + " .,!", max_size=8)
# no backticks/backslashes in the alphabet, and min_size=1: an EMPTY
# template (``) is rejected by the scanner (reference parity), so the
# generator must not produce one
_TPL_TEXT = st.text(alphabet=string.ascii_letters + " \n\t'\"",
                    min_size=1, max_size=12)


@settings(max_examples=150, deadline=None)
@given(kvs=st.lists(st.tuples(_KEY, st.integers(-999, 999) | _TPL_TEXT),
                    min_size=1, max_size=4, unique_by=lambda kv: kv[0]),
       comments=st.lists(st.tuples(st.booleans(), _COMMENT_TEXT),
                         min_size=4, max_size=4),
       sep=_GARBAGE)
def test_comments_and_templates_strip_to_values(kvs, comments, sep):
    """JS comments between members vanish from the output, and
    template-literal strings (no ``${}``) come through as plain JSON
    strings with identical content — the fuzz analogue of the corpus's
    comment/template cases."""
    parts = []
    for i, (k, v) in enumerate(kvs):
        block, text = comments[i % len(comments)]
        comment = f"/* {text} */" if block else f"// {text}\n"
        rendered = str(v) if isinstance(v, int) else "`" + v + "`"
        parts.append(f"{k}: {comment} {rendered}")
    page = sep + "{" + ", ".join(parts) + "}" + sep
    out = extract_objects(page.encode("utf-8"))
    assert len(out) == 1, page
    got = json.loads(out[0])
    assert got == dict(kvs)


# regex bodies: no '/' (terminator), no '\\' (escape semantics covered
# by golden cases), no '[' ']' (an unbalanced class makes the closing
# '/' literal), and never starting with '*' ('/*' is a block comment)
_REGEX_BODY = st.text(
    alphabet=string.ascii_letters + string.digits + "+?()|. ^$",
    min_size=1, max_size=10).filter(lambda s: not s.startswith("*"))
_REGEX_FLAGS = st.sampled_from(["", "g", "i", "gi", "gim"])


@settings(max_examples=150, deadline=None)
@given(items=st.lists(st.tuples(_KEY, _REGEX_BODY, _REGEX_FLAGS),
                      min_size=1, max_size=3,
                      unique_by=lambda t: t[0]),
       sep=_GARBAGE)
def test_regex_literals_become_their_source_string(items, sep):
    """A regex literal value turns into a JSON string of its FULL
    source text — slashes and flags included (scalar transform C6)."""
    page = (sep + "{"
            + ", ".join(f"{k}: /{b}/{f}" for k, b, f in items)
            + "}" + sep)
    out = extract_objects(page.encode("utf-8"))
    assert len(out) == 1, page
    assert json.loads(out[0]) == {k: f"/{b}/{f}" for k, b, f in items}


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_arbitrary_bytes_never_crash(data):
    for obj in extract_objects(data):
        json.loads(obj)


@settings(max_examples=100, deadline=None)
@given(objs=st.lists(_TOP, min_size=1, max_size=4),
       seps=st.lists(_GARBAGE, min_size=5, max_size=5),
       k=st.integers(1, 4))
def test_limit_is_a_prefix_of_full_extraction(objs, seps, k):
    """``limit=k`` must return exactly the first k objects of the full
    extraction (the reader's early-stop path takes a different exit
    but must not change what was already emitted)."""
    page = seps[0]
    for o, sep in zip(objs, seps[1:]):
        page += json.dumps(o) + sep
    data = page.encode("utf-8")
    full = extract_objects(data)
    assert extract_objects(data, limit=k) == full[:k]


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="{}[]'\"`,:0 ab\\\n", max_size=60))
def test_bracket_soup_never_crashes_outputs_valid(text):
    """Dense candidate-opening soup (the adversarial alphabet IS the
    scanner's control characters) — outputs must still be valid JSON
    and extraction must terminate."""
    for obj in extract_objects(text.encode("utf-8")):
        json.loads(obj)


# -- number-literal family ---------------------------------------------------
#
# JS number notations -> JSON decimalization parity (transformNumber,
# reader.go:441-507): hex/octal/binary literals (any prefix case, with
# sign) decimalize via uint64 parsing; decimal BigInts drop the 'n'
# suffix; '+' signs vanish; trailing-dot floats gain a '0'; everything
# else passes through. The oracle below recomputes the expected text
# INDEPENDENTLY with Python int parsing. Out-of-scope by pinned design
# (lexer rejects, matching reference notes/fixtures): numeric
# separators '1_000', legacy octal '012', hex BigInt '0x5n'
# (reader_test.go:309-310).

_RADIX = [(16, ("0x", "0X"), "0123456789abcdefABCDEF"),
          (8, ("0o", "0O"), "01234567"),
          (2, ("0b", "0B"), "01")]
_SIGNS = st.sampled_from(["", "+", "-"])
_INTPART = (st.just("0")
            | st.builds(lambda h, t: h + t,
                        st.sampled_from("123456789"),
                        st.text(alphabet="0123456789", max_size=18)))


@st.composite
def _number_case(draw):
    """-> (literal_text, expected_decimal_text | None==object dropped)."""
    kind = draw(st.sampled_from(
        ["radix", "bigint", "float", "traildot", "plain"]))
    sign = draw(_SIGNS)
    keep = "-" if sign == "-" else ""
    if kind == "radix":
        base, prefixes, alpha = draw(st.sampled_from(_RADIX))
        digits = draw(st.text(alphabet=alpha, min_size=1, max_size=20))
        lit = sign + draw(st.sampled_from(prefixes)) + digits
        val = int(digits, base)
        if val > 2**64 - 1:
            # transformNumber passes the un-decimalizable literal
            # through; json.Valid then rejects the whole object
            return lit, None
        return lit, keep + str(val)
    if kind == "bigint":
        digits = draw(_INTPART)
        return sign + digits + "n", keep + digits
    if kind == "plain":
        digits = draw(_INTPART)
        return sign + digits, keep + digits
    intpart = draw(_INTPART)
    if kind == "traildot":
        return sign + intpart + ".", keep + intpart + ".0"
    frac = draw(st.text(alphabet="0123456789", max_size=6))
    exp = ""
    if draw(st.booleans()) or not frac:
        exp = (draw(st.sampled_from("eE"))
               + draw(st.sampled_from(["", "+", "-"]))
               + draw(st.text(alphabet="0123456789", min_size=1,
                              max_size=3)))
    body = intpart + ("." + frac if frac else "") + exp
    return sign + body, keep + body


@settings(max_examples=200, deadline=None)
@given(objs=st.lists(st.lists(st.tuples(_KEY, _number_case()),
                              min_size=1, max_size=3),
                     min_size=1, max_size=3),
       seps=st.lists(_GARBAGE, min_size=4, max_size=4))
def test_number_literals_decimalize_like_reference(objs, seps):
    page = seps[0]
    expected = []
    for kvs, sep in zip(objs, seps[1:]):
        page += ("{" + ", ".join(f"{k}: {lit}"
                                 for k, (lit, _) in kvs) + "}") + sep
        if all(dec is not None for _k, (_l, dec) in kvs):
            # duplicate keys: the scanner emits all pairs (Go marshal
            # of the raw buffer) — keep last-write expectation simple
            # by only asserting the byte form, which preserves order
            expected.append(
                "{" + ",".join(f'"{k}":{dec}'
                               for k, (_l, dec) in kvs) + "}")
    out = extract_objects(page.encode("utf-8"))
    assert [o.decode() for o in out] == expected, page
    for o in out:
        json.loads(o)  # every emission is strict JSON


# -- keyword / identifier-value family ---------------------------------------
#
# Identifier VALUES (reader.go:318-338): the five reserved keywords map
# to JSON spellings (true/false/null, undefined->null, NaN->null) with
# a leading written '+'/'-' truncated for keywords only (the "-NaN"
# case, reader.go:322-326); any OTHER identifier value is json.Marshal
# quoted into a string — and a sign before a quoted string survives as
# '-"x"', which json.Valid rejects, dropping the object.

_KEYWORDS = {"true": "true", "false": "false", "null": "null",
             "undefined": "null", "NaN": "null"}
_IDENT = st.builds(
    lambda h, t: h + t,
    st.sampled_from(string.ascii_letters + "_$"),
    st.text(alphabet=string.ascii_letters + string.digits + "_$",
            max_size=10)).filter(lambda s: s not in _KEYWORDS)


@st.composite
def _ident_case(draw):
    """-> (value_text, expected_json_text | None==object dropped)."""
    sign = draw(st.sampled_from(["", "+", "-"]))
    if draw(st.booleans()):
        kw = draw(st.sampled_from(sorted(_KEYWORDS)))
        # sign truncation applies to keyword identifiers only
        return sign + kw, _KEYWORDS[kw]
    ident = draw(_IDENT)
    if sign:
        # '-' + '"ident"' is invalid JSON -> whole object rejected
        return sign + ident, None
    return ident, '"' + ident + '"'


@settings(max_examples=200, deadline=None)
@given(objs=st.lists(st.lists(st.tuples(_KEY, _ident_case()),
                              min_size=1, max_size=3),
                     min_size=1, max_size=3),
       seps=st.lists(_GARBAGE, min_size=4, max_size=4))
def test_identifier_values_map_like_reference(objs, seps):
    page = seps[0]
    expected = []
    for kvs, sep in zip(objs, seps[1:]):
        page += ("{" + ", ".join(f"{k}: {lit}"
                                 for k, (lit, _) in kvs) + "}") + sep
        if all(exp is not None for _k, (_l, exp) in kvs):
            expected.append(
                "{" + ",".join(f'"{k}":{exp}'
                               for k, (_l, exp) in kvs) + "}")
    out = extract_objects(page.encode("utf-8"))
    assert [o.decode() for o in out] == expected, page
    for o in out:
        json.loads(o)


# -- object-key family (r6) ---------------------------------------------------
#
# KEYS go through the exact same token dispatch as values — the
# reference's loop is position-independent (reader.go:318-338 ident
# handling, :404-409 strings): a reserved-keyword key maps to its
# JSON spelling (true/false/null — a non-string key, so json.Valid
# drops the whole object), every other identifier key is
# Marshal-quoted into a string, quoted keys take the string paths
# (single-quoted rewritten, double-quoted verbatim), and a leading
# sign before a key invalidates the object whether it survives (-a ->
# -"a") or is truncated (the keyword rule: -true -> true, still not a
# string key).

@st.composite
def _key_case(draw):
    """-> (key_text, expected_json_key | None==object dropped)."""
    kind = draw(st.sampled_from(["ident", "keyword", "signed",
                                 "squote", "dquote"]))
    if kind == "keyword":
        return draw(st.sampled_from(sorted(_KEYWORDS))), None
    if kind == "signed":
        sign = draw(st.sampled_from("+-"))
        base = draw(_IDENT | st.sampled_from(sorted(_KEYWORDS)))
        return sign + base, None
    if kind == "ident":
        k = draw(_IDENT)
        return k, '"' + k + '"'
    inner = draw(st.text(alphabet=string.ascii_lowercase + "_ ",
                         max_size=8))
    if kind == "squote":
        return "'" + inner + "'", '"' + inner + '"'
    return '"' + inner + '"', '"' + inner + '"'


@settings(max_examples=200, deadline=None)
@given(objs=st.lists(st.lists(_key_case(), min_size=1, max_size=3),
                     min_size=1, max_size=3),
       seps=st.lists(_GARBAGE, min_size=4, max_size=4))
def test_object_keys_dispatch_like_values(objs, seps):
    page = seps[0]
    expected = []
    for keys, sep in zip(objs, seps[1:]):
        page += ("{" + ", ".join(f"{k}: {i}"
                                 for i, (k, _) in enumerate(keys))
                 + "}") + sep
        if all(ek is not None for _k, ek in keys):
            expected.append(
                "{" + ",".join(f"{ek}:{i}"
                               for i, (_k, ek) in enumerate(keys))
                + "}")
    out = extract_objects(page.encode("utf-8"))
    assert [o.decode() for o in out] == expected, page
    for o in out:
        json.loads(o)


# -- string escape-sequence family (r6) ---------------------------------------
#
# Quoted-string VALUES split into two byte paths (SURVEY §4.3.1):
# double-quoted tokens are copied VERBATIM (reader.go:404-409 via the
# default write), single-quoted tokens go through the three-rule
# rewrite ' -> ", " -> \", \' -> ' (reader.go:255-263) — in BOTH paths
# every other escape sequence passes through untouched, so JS-only
# escapes (\x41, \v, \0, octal \101, \u{...} code points, \<newline>
# continuations, \' inside a DOUBLE-quoted string) survive into the
# buffer and json.Valid then rejects the whole object. The oracle is
# an independent regex-alternation reimplementation of the rewrite
# table plus Python's own strict JSON parser as the validity gate.

_ESC_ATOMS = ["\\n", "\\t", "\\r", "\\b", "\\f", "\\v", "\\0",
              "\\x41", "\\x4", "\\u0041", "\\u00e9", "\\uBEEF",
              "\\u004", "\\u{41}", "\\u{1F600}", "\\101", "\\8",
              "\\\\", "\\'", "\\\"", "\\/", "\\a", "\\ ", "\\\n"]
# plain runs: no quotes, no { [ (they would seed rescan candidates
# after a rejected object), no backslash (atoms own the escapes)
_PLAIN_ATOMS = ["a", "Zz", "0 9", "!?", ".,", ";:", "<>", "&", "~",
                "=", "-"]


def _oracle_quote_convert(tok: str) -> str:
    """Independent reimplementation of the reference's quote rewrite
    (reader.go:255-263, 404-409) as a single regex alternation — the
    kernel uses a byte state machine (scanner.single_quote_replace);
    left-to-right first-match regex scanning reproduces the same
    single-pass semantics (e.g. the backslash of '\\\\'' is consumed
    as a plain byte, so the following \\' still rewrites)."""
    if tok[0] == '"':
        return tok
    import re

    return re.sub(
        r"\\'|[\'\"]",
        lambda m: {"\\'": "'", "'": '"', '"': '\\"'}[m.group(0)],
        tok)


@st.composite
def _escape_string_case(draw):
    """-> (token_text, converted_text) for a quoted string value."""
    q = draw(st.sampled_from(["'", '"']))
    atoms = _ESC_ATOMS + _PLAIN_ATOMS + [('"' if q == "'" else "'")]
    content = "".join(draw(st.lists(st.sampled_from(atoms),
                                    max_size=8)))
    tok = q + content + q
    return tok, _oracle_quote_convert(tok)


@settings(max_examples=250, deadline=None)
@given(objs=st.lists(st.lists(st.tuples(_KEY, _escape_string_case()),
                              min_size=1, max_size=3),
                     min_size=1, max_size=3),
       seps=st.lists(_GARBAGE, min_size=4, max_size=4))
def test_string_escapes_convert_like_reference(objs, seps):
    page = seps[0]
    expected = []
    for kvs, sep in zip(objs, seps[1:]):
        page += ("{" + ", ".join(f"{k}: {tok}"
                                 for k, (tok, _) in kvs) + "}") + sep
        cand = ("{" + ",".join(f'"{k}":{conv}'
                               for k, (_t, conv) in kvs) + "}")
        try:
            json.loads(cand)  # strict: the json.Valid stand-in
            expected.append(cand)
        except ValueError:
            pass  # JS-only escape survived into the buffer -> dropped
    out = extract_objects(page.encode("utf-8"))
    assert [o.decode() for o in out] == expected, page
    for o in out:
        json.loads(o)


# ---------------------------------------------------------------------------
# FAMILY 12 (r7): MULTI-BYTE UTF-8 BOUNDARIES — rune-loop oracle
#
# Upstream reads RUNES (reader.go:57,88): candidates start at a
# '{'/'[' rune and resume offsets count runes. Our scanner indexes
# BYTES (scanner.py:219-264), relying on two facts: ASCII brackets can
# never occur inside a multi-byte UTF-8 sequence, and read_js_object's
# read_input_bytes always lands on a rune boundary. The oracle below
# IS the upstream rune loop, transcribed: scan runes, run the
# converter on the UTF-8 suffix, advance by the RUNE length of the
# consumed prefix — decoded STRICTLY, so a mid-rune landing raises
# and fails the test instead of silently resyncing. Byte loop and
# rune loop must extract identical bytes on any valid-UTF-8 input.

from jsonextract_spark.kernel.gojson import json_valid
from jsonextract_spark.kernel.scanner import read_js_object

# multi-byte-heavy separators: emoji (4-byte), CJK (3-byte), Latin-1
# supplement (2-byte), LineSeparator/ParagraphSeparator, BOM, NBSP,
# math alphanumerics (4-byte) — no { [ " ' ` so they can't open or
# extend a candidate
_MB_SEP = st.text(
    alphabet=["\U0001F30D", "\U0001F600", "中", "文", "é",
              "«", "»", " ", " ", "﻿",
              " ", "\U0001D54A", "ت", " ", "x", "\n"],
    max_size=12)
_MB_TEXT = st.text(st.characters(blacklist_categories=("Cs",)),
                   max_size=10)
_MB_TOP = st.dictionaries(_KEY, _MB_TEXT | st.integers(-10**6, 10**6),
                          min_size=1, max_size=4)


def _rune_loop_extract(text: str, limit: int | None = None):
    """reader.go's rune loop, transcribed as the oracle."""
    out = []
    i, n = 0, len(text)
    while i < n:
        cands = [k for k in (text.find("{", i), text.find("[", i))
                 if k >= 0]
        if not cands:
            break
        i = min(cands)
        sub = text[i:].encode("utf-8")
        msg, nread, _ = read_js_object(sub, 0)
        if msg is not None and json_valid(msg):
            out.append(bytes(msg))
            if limit is not None and len(out) >= limit:
                return out
            consumed = sub[:nread].decode("utf-8") if nread > 0 else ""
            i += max(len(consumed), 1)
        else:
            i += 1           # one RUNE (the opening bracket is ASCII)
    return out


@settings(max_examples=150, deadline=None)
@given(objs=st.lists(_MB_TOP, min_size=1, max_size=4),
       seps=st.lists(_MB_SEP, min_size=5, max_size=5))
def test_multibyte_embed_matches_rune_loop(objs, seps):
    """Strict-JSON objects with multi-byte keys/values, embedded
    between multi-byte junk (BOM, U+2028/2029, emoji): the byte-index
    scanner equals the transcribed rune loop byte-for-byte, and every
    embedded object is recovered in order, semantically intact."""
    doc = seps[0]
    for o, s in zip(objs, seps[1:]):
        doc += json.dumps(o, ensure_ascii=False) + s
    got = extract_objects(doc.encode("utf-8"))
    assert got == _rune_loop_extract(doc)
    assert [json.loads(g) for g in got] == objs


@settings(max_examples=150, deadline=None)
@given(objs=st.lists(st.lists(st.tuples(_KEY, _MB_TEXT), min_size=1,
                              max_size=3), min_size=1, max_size=3),
       seps=st.lists(_MB_SEP, min_size=4, max_size=4))
def test_multibyte_js_notation_matches_rune_loop(objs, seps):
    """JS notation (unquoted keys, single-quoted strings) carrying
    multi-byte content — including U+2028/U+2029 inside the quotes,
    where the lexer's LineTerminator handling decides accept/reject:
    whatever it decides, byte loop and rune loop must agree, outputs
    must be valid JSON, and extraction must be a fixpoint."""
    doc = seps[0]
    for kvs, s in zip(objs, seps[1:]):
        body = ", ".join(
            "%s: '%s'" % (k, v.replace("\\", "").replace("'", ""))
            for k, v in kvs)
        doc += "{" + body + "}" + s
    data = doc.encode("utf-8")
    got = extract_objects(data)
    assert got == _rune_loop_extract(doc)
    for g in got:
        json.loads(g)                        # validity
        assert extract_objects(g) == [g]     # fixpoint


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=200), k=st.integers(1, 3))
def test_arbitrary_unicode_matches_rune_loop(text, k):
    """ANY valid-UTF-8 text — brackets, quotes, backticks and all:
    byte loop == rune loop, with and without a limit (the limited run
    must be a prefix and the rune advance must still land on rune
    boundaries while candidates abort mid-way)."""
    data = text.encode("utf-8")
    full = extract_objects(data)
    assert full == _rune_loop_extract(text)
    assert extract_objects(data, limit=k) == \
        _rune_loop_extract(text, limit=k) == full[:k]


# -- Objects-layer dispatch family (r8, family 13) ----------------------------
# Random nested forests (dicts allow DUPLICATE keys via pair lists —
# json.dumps can't emit them) + random option sets, checked against an
# independent recursive-walk oracle transcribed from the reference
# semantics (objects.go:80-151): arrays recurse without matching,
# objects dispatch to the FIRST unsatisfied option whose keys are all
# present, children walk in sorted-key order (last-wins for duplicate
# keys, like Go's json.Unmarshal into a map), satisfying the LAST
# option aborts the whole scan mid-walk, and an unsatisfied required
# option raises (objects.go:155-166).

_OPT_KEYPOOL = ["k0", "k1", "k2", "k3", "k4"]

_FOREST_SCALAR = (st.none() | st.booleans() | st.integers(-99, 99)
                  | st.text(string.ascii_lowercase, max_size=4))
_FOREST_VALUE = st.recursive(
    _FOREST_SCALAR,
    lambda kids: (
        st.lists(kids, max_size=3)
        | st.lists(st.tuples(st.sampled_from(_OPT_KEYPOOL), kids),
                   max_size=4).map(lambda pairs: ("OBJ", pairs))),
    max_leaves=14)
_FOREST_TOP = st.lists(
    st.lists(st.tuples(st.sampled_from(_OPT_KEYPOOL), _FOREST_VALUE),
             max_size=4).map(lambda pairs: ("OBJ", pairs))
    | st.lists(_FOREST_VALUE, min_size=1, max_size=3),
    min_size=1, max_size=3)
_OPTIONS = st.lists(
    st.tuples(st.lists(st.sampled_from(_OPT_KEYPOOL), max_size=3,
                       unique=True),
              st.integers(1, 3) | st.none(),     # limit (None = collect)
              st.booleans()),                    # required
    min_size=1, max_size=3)


def _forest_dumps(v) -> str:
    """Serialize the pair-list forest to JSON text, PRESERVING
    duplicate keys (the dispatch layer must see last-wins)."""
    if isinstance(v, tuple) and v and v[0] == "OBJ":
        inner = ", ".join(f"{json.dumps(k)}: {_forest_dumps(x)}"
                          for k, x in v[1])
        return "{" + inner + "}"
    if isinstance(v, list):
        return "[" + ", ".join(_forest_dumps(x) for x in v) + "]"
    return json.dumps(v)


def _oracle_walk(v, options, satisfied, matches):
    """Independent transcription of objects.go keyFunc. Returns False
    to abort the whole scan (all options satisfied)."""
    if isinstance(v, list):
        for child in v:
            if not _oracle_walk(child, options, satisfied, matches):
                return False
        return True
    if not (isinstance(v, tuple) and v and v[0] == "OBJ"):
        return True
    m = {}
    for k, x in v[1]:          # duplicate keys: LAST wins
        m[k] = x
    for i, (keys, limit, _req) in enumerate(options):
        if i in satisfied:
            continue
        if all(k in m for k in keys):
            matches[i].append(("OBJ", list(m.items())))
            if limit is not None and len(matches[i]) >= limit:
                satisfied.add(i)
                if len(satisfied) == len(options):
                    return False
            break              # first matching option only
    for k in sorted(m):
        if not _oracle_walk(m[k], options, satisfied, matches):
            return False
    return True


def _canon(v):
    """Canonical python value for comparison: pair-list objects ->
    last-wins dicts, recursively."""
    if isinstance(v, tuple) and v and v[0] == "OBJ":
        return {k: _canon(x) for k, x in v[1]}
    if isinstance(v, list):
        return [_canon(x) for x in v]
    return v


@settings(max_examples=250, deadline=None)
@given(forest=_FOREST_TOP, opts=_OPTIONS)
def test_objects_dispatch_matches_reference_walk(forest, opts):
    from jsonextract_spark.kernel.objects import (CallbackNeverCalled,
                                                  ObjectOption,
                                                  match_objects)

    values = [_forest_dumps(v) for v in forest]
    options = [ObjectOption(keys=tuple(keys), limit=limit,
                            required=req)
               for keys, limit, req in opts]

    satisfied: set = set()
    matches = {i: [] for i in range(len(opts))}
    for v in forest:
        if not _oracle_walk(v, opts, satisfied, matches):
            break
    want_raise = len(satisfied) != len(opts) and any(
        req and i not in satisfied
        for i, (_, _, req) in enumerate(opts))

    if want_raise:
        try:
            match_objects(values, options)
        except CallbackNeverCalled:
            pass
        else:
            raise AssertionError("expected CallbackNeverCalled")
    else:
        match_objects(values, options)
    for i, opt in enumerate(options):
        got = [json.loads(raw) for raw in opt.matches]
        want = [_canon(v) for v in matches[i]]
        assert got == want, (i, got, want)
