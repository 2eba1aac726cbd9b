"""Property-based kernel tests (hypothesis) + unicode edge cases."""

import json

from hypothesis import given, settings, strategies as st

from jsonextract_spark.kernel.scanner import extract_objects, extract_objects_str
from jsonextract_spark.kernel.gojson import json_valid

# text that looks like scraped web junk: JS-ish fragments, brackets,
# quotes, numbers, unicode
_junk = st.lists(
    st.sampled_from(
        list("{}[]:,'\"`/\\+-.0123456789abcxyz $_\n\t")
        + ["NaN", "null", "undefined", "true", "0x1f", "//", "/*", "*/",
           "€", "漢", " ", "😀"]),
    min_size=0, max_size=80,
).map("".join)


@settings(max_examples=400, deadline=None)
@given(_junk)
def test_every_emitted_value_is_strict_json(doc):
    for v in extract_objects_str(doc):
        parsed = json.loads(v)  # must parse
        assert v[0] in "[{"
        assert isinstance(parsed, (dict, list))


@settings(max_examples=200, deadline=None)
@given(_junk)
def test_deterministic(doc):
    assert extract_objects_str(doc) == extract_objects_str(doc)


@settings(max_examples=200, deadline=None)
@given(_junk, st.integers(min_value=1, max_value=4))
def test_limit_is_prefix(doc, k):
    full = extract_objects_str(doc)
    assert extract_objects_str(doc, limit=k) == full[:k]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=120))
def test_arbitrary_bytes_never_crash(data):
    for v in extract_objects(data):
        assert json_valid(v)


def test_unicode_edges():
    # multibyte chars straddling candidates
    assert extract_objects_str("漢字{a: 1}漢字[2]") == ['{"a":1}', "[2]"]
    # U+2028 raw inside a double-quoted string is legal JS and JSON
    assert extract_objects_str('{"k": "a b"}') == ['{"k": "a b"}'] \
        or extract_objects_str('{"k": "a b"}') == ['{"k":"a b"}']
    # U+2028 is a line terminator outside strings (ignored like \n)
    assert extract_objects_str("[1, 2]") == ["[1,2]"]
    # emoji in keys via single quotes and in template values
    assert extract_objects_str("{'😀': `🎉`}") == ['{"😀":"🎉"}']
    # unicode identifier as unquoted key (marshal path)
    assert extract_objects_str("{é: 1}") == ['{"é":1}']
    # line comment terminated by U+2028, then a real value
    assert extract_objects_str("[// c 1]") == ["[1]"]


def test_whitespace_unicode_between_tokens():
    # NBSP and ideographic space are JS whitespace
    assert extract_objects_str("[1, 　2]") == ["[1,2]"]


@given(st.lists(st.one_of(st.none(),
                          st.text(alphabet=st.characters(
                              codec="utf-8", categories=("L", "N", "Z")),
                              max_size=80)),
                min_size=1, max_size=20),
       st.integers(min_value=1, max_value=19))
@settings(max_examples=60, deadline=None)
def test_simhash_batch_partition_invariant(texts, cut):
    """SimHash signatures must be a function of each text alone — never
    of which other rows shared the Arrow batch (regression guard for
    padded-matrix hashing picking up the batch's longest token)."""
    import pandas as pd

    from jsonextract_spark.datapipe.dedup import _simhash_batch

    cut = min(cut, len(texts))
    whole = list(_simhash_batch(pd.Series(texts, dtype=object)))
    parts = (list(_simhash_batch(pd.Series(texts[:cut], dtype=object))) +
             list(_simhash_batch(pd.Series(texts[cut:], dtype=object)))
             if texts[cut:] else
             list(_simhash_batch(pd.Series(texts[:cut], dtype=object))))
    assert whole == parts


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
@settings(max_examples=60, deadline=None)
def test_minhash_signature_deterministic(doc):
    """MinHash signatures are pure per-document functions."""
    from jsonextract_spark.datapipe.dedup import _minhash_sig

    assert _minhash_sig(doc) == _minhash_sig(doc)
    assert len(_minhash_sig(doc)) == 64
