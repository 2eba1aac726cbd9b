"""Byte-level JavaScript tokenizer for the extraction kernel.

Re-creates the token-boundary behavior the reference relies on from its JS
lexer dependency (``tdewolff/parse/v2/js``; see /root/reference/reader.go:14,
277) for every construct exercised by the golden fixture corpus
(/root/reference/reader_test.go:220-729). This is an original state-machine
implementation over ``bytes``; only the *observable token boundaries* are
matched, not the upstream code.

Token kinds
-----------
IGNORE    whitespace / line terminators / comments (reader.go:473-475)
IDENT     identifiers AND keywords (both take the identifier path upstream)
PUNCT     punctuator, maximal munch; text longer than 1 byte is rejected by
          the scanner (reader.go:357-360)
DIV       '/' or '/=' — scanner re-lexes as regex (reader.go:339-344)
STRING    quoted string incl. quotes (single or double)
TEMPLATE  `template literal` incl. backticks
NUMBER    numeric literal; .is_int marks plain-integer tokens (optionally
          with a BigInt 'n' suffix) which the scanner strips
          (reader.go:448-452)
ERROR     lexing failed (bad number, unterminated string, '@', ...)
EOF       end of input (maps to Go's io.EOF success path, reader.go:467)

Documented upstream non-features we reproduce as ERROR (reference
README.md:96-98): numeric separators (``2_175``) and leading-zero integers.
Template literals containing ``${`` substitutions are treated as ERROR:
upstream emits split template tokens (TemplateStart/Middle/End) that
fall through reader.go:458-461's default raw-write and always fail the
json.Valid gate, so both engines reject the candidate and resume one
rune past its opening bracket — pinned, including the resume-into-
template-interior behavior, by tests/test_template_substitution_parity.py.
"""

from __future__ import annotations

import re

# C-speed scanners for the hot ASCII paths. Semantics are identical to
# the explicit loops below (which remain the fallback for non-ASCII);
# the golden corpus pins the token boundaries.
_WS_RE = re.compile(rb"[ \t\v\f\r\n]+")
_IDENT_RE = re.compile(rb"[A-Za-z_$][A-Za-z0-9_$]*")
_LINE_COMMENT_RE = re.compile(rb"//[^\r\n]*")
_DQ_STRING_RE = re.compile(rb'"(?:[^"\\\r\n]|\\\r\n|\\.)*"', re.DOTALL)
_SQ_STRING_RE = re.compile(rb"'(?:[^'\\\r\n]|\\\r\n|\\.)*'", re.DOTALL)

IGNORE = 0
IDENT = 1
PUNCT = 2
DIV = 3
STRING = 4
TEMPLATE = 5
NUMBER = 6
ERROR = 7
EOF = 8
REGEX = 9

_WS_ASCII = frozenset(b" \t\v\f")
# Unicode whitespace / line terminators the JS spec ignores. We decode only
# when we see a >=0x80 lead byte, so the ASCII hot path stays byte-only.
_WS_UNI = frozenset(" ﻿       "
                    "       　")
_LT_UNI = frozenset("  ")

_PUNCT_3_4 = (b">>>=", b"===", b"!==", b"**=", b"<<=", b">>=", b">>>", b"...",
              b"&&=", b"||=", b"??=")
_PUNCT_2 = (b"=>", b"==", b"!=", b"<=", b">=", b"++", b"--", b"&&", b"||",
            b"??", b"?.", b"+=", b"-=", b"*=", b"%=", b"&=", b"|=", b"^=",
            b"<<", b">>", b"**")
_PUNCT_1 = frozenset(b"{}[]();,<>+-*%&|^!~?:=.")

# first byte -> multi-char punctuators (longest first); most punctuation
# in real JSON data ({}[],:;) starts none, so the common case is a
# single dict miss instead of 31 startswith probes.
_PUNCT_MULTI: dict[int, tuple[bytes, ...]] = {}
for _p in _PUNCT_3_4 + _PUNCT_2:
    _PUNCT_MULTI.setdefault(_p[0], ())
for _b in list(_PUNCT_MULTI):
    _PUNCT_MULTI[_b] = tuple(sorted(
        (p for p in _PUNCT_3_4 + _PUNCT_2 if p[0] == _b),
        key=len, reverse=True))

_HEX = frozenset(b"0123456789abcdefABCDEF")
_DEC = frozenset(b"0123456789")
_OCT = frozenset(b"01234567")
_BIN = frozenset(b"01")

_IDENT_START_ASCII = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_$")
_IDENT_CONT_ASCII = _IDENT_START_ASCII | _DEC


def _utf8_len(b0: int) -> int:
    if b0 < 0x80:
        return 1
    if b0 < 0xC0:
        return 1  # stray continuation byte; consume one
    if b0 < 0xE0:
        return 2
    if b0 < 0xF0:
        return 3
    return 4


class Lexer:
    """Tokenizes ``data[pos:]``; the scanner drives it token by token."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.n = len(data)

    # -- helpers ---------------------------------------------------------
    def _rune_at(self, i: int):
        """Decode one rune starting at byte i -> (char, byte_len)."""
        d = self.data
        ln = _utf8_len(d[i])
        chunk = d[i:i + ln]
        try:
            ch = chunk.decode("utf-8")
        except UnicodeDecodeError:
            return "�", 1
        if len(ch) != 1:
            return "�", 1
        return ch, ln

    # -- token scanners --------------------------------------------------
    def next(self):
        """Return (kind, text_bytes). ERROR/EOF carry b''/consumed text."""
        d, i, n = self.data, self.pos, self.n
        if i >= n:
            return EOF, b""
        b0 = d[i]

        # whitespace / line terminators (grouped; only length is observable)
        if b0 in _WS_ASCII or b0 == 0x0A or b0 == 0x0D:
            j = _WS_RE.match(d, i).end()
            if j >= n or d[j] < 0x80:
                self.pos = j
                return IGNORE, d[i:j]
            while j < n:
                c = d[j]
                if c in _WS_ASCII or c == 0x0A or c == 0x0D:
                    j += 1
                elif c >= 0x80:
                    ch, ln = self._rune_at(j)
                    if ch in _WS_UNI or ch in _LT_UNI:
                        j += ln
                    else:
                        break
                else:
                    break
            self.pos = j
            return IGNORE, d[i:j]
        if b0 >= 0x80:
            ch, ln = self._rune_at(i)
            if ch in _WS_UNI or ch in _LT_UNI:
                j = i + ln
                while j < n:
                    c = d[j]
                    if c in _WS_ASCII or c == 0x0A or c == 0x0D:
                        j += 1
                    elif c >= 0x80:
                        ch2, ln2 = self._rune_at(j)
                        if ch2 in _WS_UNI or ch2 in _LT_UNI:
                            j += ln2
                        else:
                            break
                    else:
                        break
                self.pos = j
                return IGNORE, d[i:j]
            if ch.isalpha():
                return self._ident(i)
            return ERROR, b""

        # comments
        if b0 == 0x2F:  # '/'
            if i + 1 < n and d[i + 1] == 0x2F:  # //
                text = _LINE_COMMENT_RE.match(d, i).group()
                # U+2028/U+2029 also terminate a line comment
                for lt in (b"\xe2\x80\xa8", b"\xe2\x80\xa9"):
                    p = text.find(lt)
                    if p >= 0:
                        text = text[:p]
                self.pos = i + len(text)
                return IGNORE, text
            if i + 1 < n and d[i + 1] == 0x2A:  # /*
                j = d.find(b"*/", i + 2)
                if j < 0:
                    return ERROR, b""  # unterminated block comment
                self.pos = j + 2
                return IGNORE, d[i:j + 2]
            # '/' or '/=' — potential regex; scanner decides
            if i + 1 < n and d[i + 1] == 0x3D:
                self.pos = i + 2
                return DIV, d[i:i + 2]
            self.pos = i + 1
            return DIV, d[i:i + 1]

        # strings
        if b0 == 0x22 or b0 == 0x27:  # " '
            return self._string(i, b0)
        if b0 == 0x60:  # `
            return self._template(i)

        # numbers
        if b0 in _DEC:
            return self._number(i)
        if b0 == 0x2E and i + 1 < n and d[i + 1] in _DEC:  # .5
            return self._number(i)

        # identifiers / keywords
        if b0 in _IDENT_START_ASCII:
            return self._ident(i)

        # punctuators (maximal munch via first-byte dispatch)
        multi = _PUNCT_MULTI.get(b0)
        if multi is not None:
            for p in multi:
                if d.startswith(p, i):
                    self.pos = i + len(p)
                    return PUNCT, p
        if b0 in _PUNCT_1:
            self.pos = i + 1
            return PUNCT, d[i:i + 1]

        return ERROR, b""

    def _ident(self, i: int):
        d, n = self.data, self.n
        m = _IDENT_RE.match(d, i)
        if m is not None:
            j = m.end()
            if j >= n or d[j] < 0x80:
                self.pos = j
                return IDENT, d[i:j]
        j = i
        while j < n:
            c = d[j]
            if c in _IDENT_CONT_ASCII:
                j += 1
            elif c >= 0x80:
                ch, ln = self._rune_at(j)
                if ch.isalnum() or ch in "‌‍":
                    j += ln
                else:
                    break
            else:
                break
        self.pos = j
        return IDENT, d[i:j]

    def _string(self, i: int, quote: int):
        d, n = self.data, self.n
        m = (_DQ_STRING_RE if quote == 0x22 else _SQ_STRING_RE).match(d, i)
        if m is not None:
            self.pos = m.end()
            return STRING, m.group()
        j = i + 1
        while j < n:
            c = d[j]
            if c == quote:
                self.pos = j + 1
                return STRING, d[i:j + 1]
            if c == 0x5C:  # backslash: escape consumes next rune (or CRLF)
                if j + 1 >= n:
                    return ERROR, b""
                if d[j + 1] == 0x0D and j + 2 < n and d[j + 2] == 0x0A:
                    j += 3
                elif d[j + 1] >= 0x80:
                    _, ln = self._rune_at(j + 1)
                    j += 1 + ln
                else:
                    j += 2
                continue
            if c == 0x0A or c == 0x0D:
                return ERROR, b""  # unterminated (raw line terminator)
            if c >= 0x80:
                ch, ln = self._rune_at(j)
                j += ln  # raw U+2028/U+2029 are legal in JS strings
            else:
                j += 1
        return ERROR, b""  # EOF inside string

    def _template(self, i: int):
        d, n = self.data, self.n
        j = i + 1
        while j < n:
            c = d[j]
            if c == 0x60:
                self.pos = j + 1
                return TEMPLATE, d[i:j + 1]
            if c == 0x5C:
                if j + 1 >= n:
                    return ERROR, b""
                if d[j + 1] >= 0x80:
                    _, ln = self._rune_at(j + 1)
                    j += 1 + ln
                else:
                    j += 2
                continue
            if c == 0x24 and j + 1 < n and d[j + 1] == 0x7B:  # ${ substitution
                return ERROR, b""
            j += 1
        return ERROR, b""  # unterminated template (fuzz case "[`")

    def _number(self, i: int):
        d, n = self.data, self.n
        j = i
        is_int = True
        if d[j] == 0x30 and j + 1 < n and d[j + 1] in (0x78, 0x58, 0x6F,
                                                       0x4F, 0x62, 0x42):
            # 0x / 0o / 0b literal
            marker = d[j + 1]
            digits = _HEX if marker in (0x78, 0x58) else (
                _OCT if marker in (0x6F, 0x4F) else _BIN)
            j += 2
            k = j
            while k < n and d[k] in digits:
                k += 1
            if k == j:
                return ERROR, b""
            if k < n and d[k] == 0x5F:  # underscore separator: unsupported
                return ERROR, b""
            # BigInt suffix on non-decimal literals: keep 'n' in the text;
            # the scanner does NOT strip it for these, so the candidate is
            # rejected downstream — matching the reference's note that
            # hex BigInts don't survive (reader_test.go:309).
            if k < n and d[k] == 0x6E:
                k += 1
            self.pos = k
            tok = d[i:k]
            return NUMBER, tok
        # decimal
        if d[j] == 0x30 and j + 1 < n and d[j + 1] in _DEC:
            return ERROR, b""  # leading-zero integer: unsupported upstream
        while j < n and d[j] in _DEC:
            j += 1
        if j < n and d[j] == 0x5F:
            return ERROR, b""  # numeric separator: unsupported upstream
        if j < n and d[j] == 0x6E and j > i:  # BigInt '123n'
            self.pos = j + 1
            tok = d[i:j + 1]
            return NUMBER, tok
        if j < n and d[j] == 0x2E:  # fraction (possibly trailing-dot "1.")
            is_int = False
            j += 1
            while j < n and d[j] in _DEC:
                j += 1
            if j < n and d[j] == 0x5F:
                return ERROR, b""
        if j < n and (d[j] == 0x65 or d[j] == 0x45):  # exponent
            k = j + 1
            if k < n and (d[k] == 0x2B or d[k] == 0x2D):
                k += 1
            if k < n and d[k] in _DEC:
                is_int = False
                k += 1
                while k < n and d[k] in _DEC:
                    k += 1
                if k < n and d[k] == 0x5F:
                    return ERROR, b""
                j = k
            # else: 'e' belongs to a following identifier (e.g. "5e" -> 5, e)
        self.pos = j
        tok = d[i:j]
        if not tok:
            return ERROR, b""
        return NUMBER, tok

    def regexp(self, div_text: bytes):
        """Re-lex from the position of a just-returned DIV token as a regex
        literal (mirrors upstream ``lex.RegExp()``, used at reader.go:342).

        Returns (REGEX, full_text) on success with the lexer advanced past
        the flags, or (ERROR, b"") leaving position unspecified.
        """
        d, n = self.data, self.n
        start = self.pos - len(div_text)  # back to the '/'
        j = start + 1
        # A '/=' token means the regex body starts with '='; it is already
        # part of the body, so just continue scanning from after the '/'.
        in_class = False
        terminated = False
        while j < n:
            c = d[j]
            if c == 0x5C:
                if j + 1 >= n:
                    return ERROR, b""
                nxt = d[j + 1]
                if nxt == 0x0A or nxt == 0x0D:
                    return ERROR, b""
                if nxt >= 0x80:
                    ch, ln = self._rune_at(j + 1)
                    if ch in _LT_UNI:
                        return ERROR, b""
                    j += 1 + ln
                else:
                    j += 2
                continue
            if c == 0x0A or c == 0x0D:
                return ERROR, b""
            if c >= 0x80:
                ch, ln = self._rune_at(j)
                if ch in _LT_UNI:
                    return ERROR, b""
                j += ln
                continue
            if in_class:
                if c == 0x5D:
                    in_class = False
                j += 1
                continue
            if c == 0x5B:
                in_class = True
                j += 1
                continue
            if c == 0x2F:
                terminated = True
                j += 1
                break
            j += 1
        if not terminated:
            return ERROR, b""
        if j == start + 2 and not in_class:
            # "//" would be a line comment, not an empty regex
            return ERROR, b""
        # flags: ASCII letters
        while j < n and ((0x61 <= d[j] <= 0x7A) or (0x41 <= d[j] <= 0x5A)):
            j += 1
        self.pos = j
        return REGEX, d[start:j]
