"""Scan loop + JS→JSON candidate conversion (the extraction kernel).

Reimplements the observable semantics of the reference's ``Reader`` /
``readJSObject`` (/root/reference/reader.go:48-123, 271-471) over an
in-memory byte string instead of an ``io.Reader`` + backtracking buffer:

* forward scan for ``{`` / ``[``; attempt a candidate at each;
* on failure (lex error or invalid JSON) resume exactly one rune past the
  opening bracket (reader.go:83-92);
* on success resume ``readInputBytes`` bytes past the opening bracket
  (reader.go:94-99). ``readInputBytes`` is the sum of *token text* lengths
  — crucially, a regex literal only contributes the length of its leading
  ``/`` or ``/=`` token because upstream re-lexes the body after the byte
  count was already taken (reader.go:307-311 vs 339-355). This undercount
  is observable (the tail of an object containing a long regex gets
  re-scanned) and is reproduced bit-for-bit.

Candidate conversion mirrors the upstream token dispatch exactly,
including the quirk that ``lastByte`` tracks the last byte of the token
*variable* (reassigned on marshal paths, untouched on the map /
single-quote paths — reader.go:463).
"""

from __future__ import annotations

from jsonextract_spark.kernel import lexer as L
from jsonextract_spark.kernel.gojson import (
    json_valid,
    marshal_string_bytes,
    parse_uint_base0,
)

# Identifier keywords with fixed JSON spellings (reader.go:244-253).
_IDENT_MAP = {
    b"true": b"true",
    b"false": b"false",
    b"null": b"null",
    b"undefined": b"null",
    b"NaN": b"null",
}

_OPEN_OBJECT = 0x7B  # {
_OPEN_ARRAY = 0x5B   # [
_MATCHING = {_OPEN_OBJECT: 0x7D, _OPEN_ARRAY: 0x5D}

_PLUS = 0x2B
_MINUS = 0x2D
_COMMA = 0x2C
_QUOTE_S = 0x27
_QUOTE_D = 0x22


def transform_number(number: bytes) -> bytes:
    """Port of ``transformNumber`` (reader.go:479-507): decimalize hex/oct/
    bin/legacy-octal/underscore literals via uint64 parsing; fix trailing
    dots; pass anything else through unchanged."""
    out = b""
    if number[:1] == b"+":
        number = number[1:]
    elif number[:1] == b"-":
        number = number[1:]
        out = b"-"
    # fast path: a plain decimal uint64 without leading zero is its own
    # decimalization (leading zeros mean legacy octal in base-0 parsing)
    if (number.isdigit() and not number.startswith(b"0")
            and len(number) <= 19):
        return out + number
    v = parse_uint_base0(number.decode("latin-1"))
    if v is None:
        if number[-1:] == b"." and number.find(b".") == len(number) - 1:
            return out + number + b"0"
        return out + number
    return out + str(v).encode()


def single_quote_replace(tok: bytes) -> bytes:
    """Single-pass ``'``→``"``, ``"``→``\\"``, ``\\'``→``'`` over the whole
    token incl. quotes (reader.go:255-263, 404-409)."""
    # fast path: with no '"' and no "\\'" in the token, the only rule
    # that can fire is '->" — one C-speed replace (the common case for
    # web-page single-quoted strings)
    if tok.find(_QUOTE_D) < 0 and tok.find(b"\\'") < 0:
        return tok.replace(b"'", b'"')
    out = bytearray()
    i, n = 0, len(tok)
    while i < n:
        c = tok[i]
        if c == 0x5C and i + 1 < n and tok[i + 1] == _QUOTE_S:
            out.append(_QUOTE_S)
            i += 2
        elif c == _QUOTE_S:
            out.append(_QUOTE_D)
            i += 1
        elif c == _QUOTE_D:
            out += b'\\"'
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _template_unescape(inner: bytes) -> bytes:
    r"""Template content transform: backslash-backtick becomes backtick
    (reader.go:265-269)."""
    return inner.replace(b"\\`", b"`")


def read_js_object(data: bytes, start: int):
    """Convert one candidate starting at ``data[start]`` (a ``{`` or ``[``).

    Returns ``(buf_bytes_or_None, read_input_bytes, attempted_bytes)``;
    ``None`` means a hard lex/convert error (upstream's non-EOF error
    return, reader.go:470). ``attempted_bytes`` is how far the lexer got —
    used only for the engine-level work budget, not for resume offsets.
    The caller must still validate ``buf`` as JSON (reader.go:83).
    """
    lx = L.Lexer(data, start)
    buf = bytearray()
    first = data[start]
    closer = _MATCHING[first]
    level = 0
    read_bytes = 0
    last_byte = -1          # last byte of the previous token's text variable
    last_was_numeric = False

    while True:
        kind, text = lx.next()
        if kind == L.ERROR:
            return None, 0, lx.pos - start
        if kind == L.EOF:
            # io.EOF is a soft stop: return what we have (reader.go:467-469)
            return bytes(buf), read_bytes, lx.pos - start

        read_bytes += len(text)

        if kind == L.IGNORE:
            continue  # not seen as last token/byte (reader.go:314-317)

        if kind == L.IDENT:
            mapped = _IDENT_MAP.get(text)
            if mapped is not None:
                # -NaN / +NaN → drop the sign byte already written
                # (reader.go:322-327)
                if last_byte == _PLUS or last_byte == _MINUS:
                    del buf[-1:]
                buf += mapped
                # NOTE: text stays the raw identifier (lastByte = e.g. 'N')
            else:
                text = marshal_string_bytes(text)  # unquoted key → string
                buf += text

        elif kind == L.DIV:
            rkind, rtext = lx.regexp(text)
            if rkind != L.REGEX:
                return None, 0, lx.pos - start
            # readInputBytes got only len('/' or '/=') — upstream quirk.
            text = marshal_string_bytes(rtext)
            buf += text

        elif kind == L.PUNCT:
            if len(text) > 1:
                return None, 0, lx.pos - start  # reader.go:357-360
            c = text[0]
            if c == _OPEN_OBJECT or c == _OPEN_ARRAY:
                if c == first:
                    level += 1
                if last_byte == _OPEN_OBJECT and c == _OPEN_OBJECT:
                    return None, 0, lx.pos - start  # '{' after '{' (reader.go:368-371)
                buf.append(c)
            elif c == 0x7D or c == 0x5D:
                if c == closer:
                    level -= 1
                if last_byte == _COMMA:
                    del buf[-1:]  # trailing comma (reader.go:379-384)
                buf.append(c)
                if level == 0:
                    return bytes(buf), read_bytes, lx.pos - start
            elif c == _PLUS:
                if 0x30 <= last_byte <= 0x39:
                    return None, 0, lx.pos - start  # '3+3' (reader.go:392-396)
                buf.append(c)
            else:
                buf += text

        elif kind == L.STRING:
            if text[0] == _QUOTE_S:
                buf += single_quote_replace(text)
                # text NOT reassigned: lastByte stays the closing quote "'"
            elif text[0] == _QUOTE_D:
                buf += text
            else:
                return None, 0, lx.pos - start

        elif kind == L.TEMPLATE:
            if len(text) <= 2:
                return None, 0, lx.pos - start  # reader.go:421-423
            text = marshal_string_bytes(_template_unescape(text[1:-1]))
            buf += text

        elif kind == L.NUMBER:
            if last_was_numeric:
                return None, 0, lx.pos - start  # number after number (reader.go:435-438)
            if last_byte == _PLUS:
                del buf[-1:]  # '+5' → '5' (reader.go:443-446)
            if text[-1:] == b"n" and text[:-1].isdigit():
                text = text[:-1]  # decimal BigInt (reader.go:448-452)
            text = transform_number(text)
            buf += text

        else:  # pragma: no cover — no other kinds are produced
            buf += text

        last_byte = text[-1] if text else -1
        last_was_numeric = kind == L.NUMBER



def extract_objects(data: bytes, limit: int | None = None,
                    work_budget: int | None = None) -> list[bytes]:
    """Port of ``Reader`` (reader.go:48-123): every JSON/JS object or array
    in ``data``, normalized to strict JSON bytes, in document order.

    ``limit`` emulates a callback returning ``ErrStop`` after N values.

    ``work_budget`` is an engine-level safety valve with no reference
    counterpart: repeated unclosed brackets make the scan O(n²) (a
    documented upstream pathology, reference README.md:95). The budget
    bounds the total bytes tokenized across all candidate attempts; when
    exhausted the rest of the document is skipped. ``None`` (the default)
    is exact reference behavior; the Spark UDF layer passes a budget so
    one adversarial page cannot stall an executor core.
    """
    out: list[bytes] = []
    i, n = 0, len(data)
    work = 0
    find = data.find
    while i < n:
        # Jump to the next opening bracket at C speed. Equivalent to the
        # reference's rune-by-rune scan because '{'/'[' are ASCII and can
        # never occur inside a multi-byte UTF-8 sequence.
        io = find(b"{", i)
        ia = find(b"[", i)
        if io < 0:
            if ia < 0:
                break
            i = ia
        elif ia < 0:
            i = io
        else:
            i = io if io < ia else ia

        msg, nread, attempted = read_js_object(data, i)
        work += attempted
        if msg is not None and json_valid(msg):
            out.append(msg)
            if limit is not None and len(out) >= limit:
                return out
            i += nread if nread > 0 else 1
        else:
            i += 1  # skip exactly the opening bracket (one rune)
        if work_budget is not None and work > work_budget:
            break
    return out


def extract_objects_str(text: str, limit: int | None = None,
                        work_budget: int | None = None) -> list[str]:
    """String-in/string-out wrapper used by the Arrow UDFs."""
    return [
        m.decode("utf-8", "replace")
        for m in extract_objects(text.encode("utf-8"), limit, work_budget)
    ]
