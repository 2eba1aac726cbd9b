"""Key-filter query layer over extracted values.

Reimplements the reference ``Objects`` semantics
(/root/reference/objects.go:59-169):

* every extracted top-level value is walked recursively;
* arrays recurse into elements but never match themselves (objects.go:69);
* objects are dispatched to the FIRST unsatisfied option whose ``keys``
  are all present (objects.go:104-131), then recursion descends into the
  values in SORTED-KEY order for determinism (objects.go:133-147);
* a callback may return ``ERR_STOP`` → that option is satisfied and never
  called again; once every option is satisfied the whole scan stops
  (objects.go:111-123);
* a ``required`` option that was never satisfied raises
  ``CallbackNeverCalled`` (objects.go:55-57, 155-166).

Matched payloads are the RAW byte spans of the (already normalized) JSON
— same bytes the reference hands its callbacks via ``rawMessageNoCopy``
(objects.go:171-186). Duplicate keys collapse last-wins, like Go's
``json.Unmarshal`` into a map.
"""

from __future__ import annotations

import json as _json
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

ERR_STOP = object()


class CallbackNeverCalled(Exception):
    """Raised when a required option's callback never returned ERR_STOP."""


@dataclass
class ObjectOption:
    keys: Sequence[str] = ()
    callback: Optional[Callable[[str], object]] = None
    required: bool = False
    # Declarative alternative to a callback for the vectorized path:
    # collect matches; ERR_STOP is implied after `limit` matches.
    limit: Optional[int] = None
    matches: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# Raw-span JSON walker. Inputs are scanner outputs (valid JSON), so this
# parser is trusting: it only needs value spans and object key maps.
# ---------------------------------------------------------------------------

_WS = " \t\n\r"


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in _WS:
        i += 1
    return i


def _scan_string(s: str, i: int) -> int:
    """i at opening quote; returns index past closing quote."""
    i += 1
    while True:
        c = s[i]
        if c == "\\":
            i += 2
        elif c == '"':
            return i + 1
        else:
            i += 1


def _scan_value(s: str, i: int):
    """Parse the value at i → (node, end). node is
    ('obj', start, end, {key: child}) | ('arr', start, end, [children]) |
    ('scalar', start, end, None)."""
    i = _skip_ws(s, i)
    start = i
    c = s[i]
    if c == "{":
        members = {}
        i = _skip_ws(s, i + 1)
        if s[i] == "}":
            return ("obj", start, i + 1, members), i + 1
        while True:
            i = _skip_ws(s, i)
            kend = _scan_string(s, i)
            key = _json.loads(s[i:kend])
            i = _skip_ws(s, kend)
            i += 1  # ':'
            child, i = _scan_value(s, i)
            members[key] = child  # duplicate keys: last wins
            i = _skip_ws(s, i)
            if s[i] == ",":
                i += 1
                continue
            return ("obj", start, i + 1, members), i + 1  # '}'
    if c == "[":
        elems = []
        i = _skip_ws(s, i + 1)
        if s[i] == "]":
            return ("arr", start, i + 1, elems), i + 1
        while True:
            child, i = _scan_value(s, i)
            elems.append(child)
            i = _skip_ws(s, i)
            if s[i] == ",":
                i += 1
                continue
            return ("arr", start, i + 1, elems), i + 1  # ']'
    if c == '"':
        end = _scan_string(s, i)
        return ("scalar", start, end, None), end
    # number / true / false / null
    end = i
    n = len(s)
    while end < n and s[end] not in ",}] \t\n\r":
        end += 1
    return ("scalar", start, end, None), end


class _Stop(Exception):
    pass


class _Abort(Exception):
    def __init__(self, err):
        self.err = err


def _walk(node, s: str, options: Sequence[ObjectOption], satisfied: set):
    kind, start, end, payload = node
    if kind == "arr":
        for child in payload:
            _walk(child, s, options, satisfied)
    elif kind == "obj":
        for idx, opt in enumerate(options):
            if idx in satisfied:
                continue
            if all(k in payload for k in opt.keys):
                raw = s[start:end]
                stop = False
                if opt.callback is not None:
                    res = opt.callback(raw)
                    if res is ERR_STOP:
                        stop = True
                    elif res is not None:
                        raise _Abort(res)
                else:
                    opt.matches.append(raw)
                    if opt.limit is not None and len(opt.matches) >= opt.limit:
                        stop = True
                if stop:
                    satisfied.add(idx)
                    if len(satisfied) == len(options):
                        raise _Stop()
                break  # first matching option only (objects.go:128-130)
        for key in sorted(payload):
            _walk(payload[key], s, options, satisfied)


def match_objects(values: Sequence[str], options: Sequence[ObjectOption]):
    """Run the Objects dispatch over already-extracted values.

    Returns the options list (with ``matches`` populated for declarative
    options). Raises CallbackNeverCalled per required-semantics.
    """
    satisfied: set = set()
    try:
        for v in values:
            if not v:
                continue
            if v[0] in "[{":
                node, _ = _scan_value(v, 0)
                _walk(node, v, options, satisfied)
    except _Stop:
        return options
    except _Abort as a:
        raise a.err if isinstance(a.err, BaseException) else RuntimeError(a.err)

    if len(satisfied) != len(options):
        for idx, opt in enumerate(options):
            if opt.required and idx not in satisfied:
                raise CallbackNeverCalled()
    return options


def extract_and_match(data: bytes, options: Sequence[ObjectOption]):
    """Reference ``Objects(r, o)`` end-to-end: scan + dispatch."""
    from jsonextract_spark.kernel.scanner import extract_objects

    values = [m.decode("utf-8", "replace") for m in extract_objects(data)]
    return match_objects(values, options)
