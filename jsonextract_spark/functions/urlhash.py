"""URL canonicalization and MurmurHash3 fingerprints.

The seen-set stores ``murmur3_64(canonicalize_url(url))`` (BASELINE.json
north_star: "partitioned cuckoo-filter URL-seen set with canonicalized
murmur3 URL hashes"). Both functions are deterministic, dependency-free
and safe to call inside Arrow-batched pandas UDFs.

MurmurHash3 x64 128-bit is implemented from Austin Appleby's public
domain algorithm; we return the low 64 bits as a signed int64 (Spark
LongType). When the C ``mmh3`` wheel is importable, ``murmur3_64``
automatically dispatches to ``mmh3.hash64`` (bit-compatible: seed 0,
x64 variant, signed low word) — the pure-Python path is the fallback,
and ``tests`` assert the two agree on reference vectors whenever mmh3
is present.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

try:
    import mmh3 as _mmh3
except ImportError:          # pure-Python fallback below
    _mmh3 = None

_MASK = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3_x64_128 (public domain algorithm), returns (h1, h2)."""
    n = len(data)
    nblocks = n // 16
    h1 = h2 = seed & _MASK

    for i in range(nblocks):
        off = i * 16
        k1 = int.from_bytes(data[off:off + 8], "little")
        k2 = int.from_bytes(data[off + 8:off + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK

    tail = data[nblocks * 16:]
    k1 = k2 = 0
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1

    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def murmur3_64_py(s: str, seed: int = 0) -> int:
    """Low 64 bits of murmur3_x64_128 as signed int64 (Spark LongType)."""
    h1, _ = murmur3_x64_128(s.encode("utf-8"), seed)
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


if _mmh3 is not None:
    def murmur3_64(s: str, seed: int = 0) -> int:
        """C fast path: mmh3.hash64 is MurmurHash3_x64_128's (h1, h2) as
        signed int64 — identical bits to murmur3_64_py."""
        return _mmh3.hash64(s.encode("utf-8"), seed, True)[0]
else:
    murmur3_64 = murmur3_64_py


_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
# Unreserved characters that must never stay percent-encoded (RFC 3986 §2.3)
_UNRESERVED = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
               "0123456789-._~")


def _norm_path(path: str) -> str:
    """Remove dot segments (RFC 3986 §5.2.4) and collapse empty segments."""
    if not path:
        return "/"
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "." or seg == "":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    norm = "/" + "/".join(out)
    if path.endswith("/") and norm != "/":
        norm += "/"
    return norm


def _norm_pct(s: str) -> str:
    """Percent-encoding normalization that preserves identity: decode a
    %XX escape only when it encodes an unreserved character (RFC 3986
    §2.3/§6.2.2.2); uppercase the hex of everything else. Reserved chars
    like %2F stay encoded — decoding them would change the URL."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n:
            hx = s[i + 1:i + 3]
            try:
                val = int(hx, 16)
            except ValueError:
                out.append(c)
                i += 1
                continue
            ch = chr(val)
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hx.upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def canonicalize_url(url: str) -> str | None:
    """Deterministic crawl canonicalization:

    * lowercase scheme and host; strip a trailing dot on the host
    * drop fragments and default ports; strip leading 'www.' is NOT done
      (it changes identity); strip userinfo
    * remove dot segments, collapse ``//`` in the path, '' path -> '/'
    * re-encode path/query minimally: unreserved chars decoded, spaces as
      %20, stable otherwise

    Returns None for non-http(s)/relative/garbage URLs (callers filter).
    """
    if not url:
        return None
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return None
    port = None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _norm_path(_norm_pct(parts.path))
    query = parts.query
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str | None:
    try:
        h = urlsplit(url).hostname
        return h.lower().rstrip(".") if h else None
    except ValueError:
        return None
