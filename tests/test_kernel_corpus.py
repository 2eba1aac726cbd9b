"""Byte-identical extraction: the ported golden corpus.

Mirrors TestReader / TestCallback (/root/reference/reader_test.go:20-56)
and Test_transformNumber (:936-1037).
"""

import json

import pytest

from jsonextract_spark.kernel.scanner import (
    extract_objects,
    extract_objects_str,
    transform_number,
)
from jsonextract_spark.kernel.gojson import json_valid, marshal_string

from tests.golden_corpus import CASES, STRUCTURAL_CASES, TRANSFORM_NUMBER_CASES


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_reader_golden(case_idx):
    arg, want = CASES[case_idx]
    got = extract_objects_str(arg)
    assert got == want, f"case {case_idx}: input {arg[:80]!r}"


@pytest.mark.parametrize("case_idx", range(len(STRUCTURAL_CASES)))
def test_reader_structural(case_idx):
    arg, want = STRUCTURAL_CASES[case_idx]
    assert extract_objects_str(arg) == want


def test_callback_order_and_count():
    # Callback order == list order is intrinsic; pin the ErrStop emulation
    # (reader_test.go:69-84): stop after 2 of 5.
    assert extract_objects_str("{}{}{}{}{}", limit=2) == ["{}", "{}"]


def test_bytes_roundtrip_identity():
    # Outputs must be exactly the bytes a Go callback would receive.
    out = extract_objects("{key: 7., arr:[5.0, 5.,]}".encode())
    assert out == [b'{"key":7.0,"arr":[5.0,5.0]}']


def test_one_byte_reader_equivalent():
    # 2500 empty objects (reader_test.go:121-130)
    out = extract_objects(b"{}" * 2500)
    assert len(out) == 2500 and set(out) == {b"{}"}


@pytest.mark.parametrize("arg,want", TRANSFORM_NUMBER_CASES)
def test_transform_number(arg, want):
    got = transform_number(arg.encode())
    assert got == want.encode()
    assert json_valid(got)
    got_neg = transform_number(b"-" + arg.encode())
    assert got_neg == b"-" + want.encode()
    assert json_valid(got_neg)
    got_plus = transform_number(b"+" + arg.encode())
    assert got_plus == want.encode()
    assert json_valid(got_plus)


def test_expectations():
    # TestExpectations (reader_test.go:151-174)
    assert not json_valid("")
    assert json.loads("null") is None


def test_go_marshal_string_escaping():
    # Go json.Marshal HTML-escapes < > & and U+2028/U+2029, lowercase hex.
    assert marshal_string("<a&b>") == '"\\u003ca\\u0026b\\u003e"'
    assert marshal_string("  ") == '"\\u2028\\u2029"'
    assert marshal_string("\x01\n\t\r\"\\") == '"\\u0001\\n\\t\\r\\"\\\\"'
    assert marshal_string("\x7f") == '"\x7f"'  # DEL stays raw, like Go


def test_marshal_path_html_escaping_is_selective():
    # Template literals and regexes go through the Marshal path (HTML
    # escaping ON); quoted strings are byte-copied (escaping OFF) — the
    # same split as the reference (reader.go:332,350,428 vs :403-414).
    assert extract_objects_str("[`a&b`]") == ['["a\\u0026b"]']
    assert extract_objects_str("[/a&b/]") == ['["/a\\u0026b/"]']
    assert extract_objects_str("{'a&b': 1}") == ['{"a&b":1}']
    assert extract_objects_str("{aatb: '&'}") == ['{"aatb":"&"}']


def test_json_valid_parity():
    assert json_valid('{"a": 1e999}')           # huge floats fine
    assert json_valid("[" + "9" * 100 + "]")     # huge ints fine
    assert not json_valid("[NaN]")
    assert not json_valid("[Infinity]")
    assert not json_valid("[-Infinity]")
    assert not json_valid("[01]")                # leading zero
    assert not json_valid("[1.]")                # bare trailing dot
    assert not json_valid("{} {}")               # trailing data
    assert json_valid('  {"a":[1,2,3]}  ')


def test_invalid_utf8_advances_one_byte():
    # Go's ReadRune yields U+FFFD size=1 on invalid bytes; a bracket right
    # after a bad lead byte must still be found (regression).
    assert extract_objects(b"\xff\xfe{a:1}\x80[2,3]\xff") == [
        b'{"a":1}', b"[2,3]"]
    assert extract_objects(b"\xe2\x28[1]") == [b"[1]"]
