"""Pure-Python Punycode codec (RFC 3492, the public spec) + IDN host
helpers.

A web corpus' host column carries internationalized domains in their
ASCII-compatible ``xn--`` form; language/geo enrichment and human-facing
readouts want the Unicode form, and dedup wants BOTH spellings of a host
to land on one canonical key.  The stdlib 'punycode' codec exists, but its
decoder accepts some out-of-spec inputs silently — this implementation
raises on every malformed case, and the tests cross-check round trips
against the stdlib and the RFC's own sample vectors.

Only the Punycode layer of IDNA is implemented (bootstring transcoding).
The IDNA2008 mapping/normalization tables (UTS #46) are a Unicode-data
dependency out of scope for a from-scratch engine — labels are lowercased
only, which matches how hostnames already arrive from the crawler."""

from __future__ import annotations

BASE = 36
TMIN = 1
TMAX = 26
SKEW = 38
DAMP = 700
INITIAL_BIAS = 72
INITIAL_N = 128


def _adapt(delta: int, num_points: int, first_time: bool) -> int:
    delta //= DAMP if first_time else 2
    delta += delta // num_points
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:
        delta //= BASE - TMIN
        k += BASE
    return k + (((BASE - TMIN + 1) * delta) // (delta + SKEW))


def _digit_char(d: int) -> str:
    return chr(d + 97) if d < 26 else chr(d - 26 + 48)  # a-z, 0-9


def _digit_value(ch: str) -> int:
    o = ord(ch)
    if 97 <= o <= 122:  # a-z
        return o - 97
    if 65 <= o <= 90:  # A-Z
        return o - 65
    if 48 <= o <= 57:  # 0-9
        return o - 48 + 26
    raise ValueError(f"invalid punycode digit: {ch!r}")


def punycode_encode(s: str) -> str:
    basic = [c for c in s if ord(c) < 128]
    out = list(basic)
    if basic:
        out.append("-")
    n = INITIAL_N
    delta = 0
    bias = INITIAL_BIAS
    h = len(basic)
    total = len(s)
    first = True
    while h < total:
        m = min(ord(c) for c in s if ord(c) >= n)
        delta += (m - n) * (h + 1)
        n = m
        for c in s:
            cp = ord(c)
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = BASE
                while True:
                    t = TMIN if k <= bias else (TMAX if k >= bias + TMAX else k - bias)
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (BASE - t)))
                    q = (q - t) // (BASE - t)
                    k += BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, first)
                first = False
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(s: str) -> str:
    last_dash = s.rfind("-")
    if last_dash > 0:
        output = list(s[:last_dash])
        ext = s[last_dash + 1 :]
    else:
        output = []
        ext = s[1:] if last_dash == 0 else s
    for c in output:
        if ord(c) >= 128:
            raise ValueError("non-basic code point before delimiter")
    n = INITIAL_N
    i = 0
    bias = INITIAL_BIAS
    pos = 0
    first = True
    while pos < len(ext):
        old_i = i
        w = 1
        k = BASE
        while True:
            if pos >= len(ext):
                raise ValueError("truncated punycode variable-length integer")
            digit = _digit_value(ext[pos])
            pos += 1
            i += digit * w
            t = TMIN if k <= bias else (TMAX if k >= bias + TMAX else k - bias)
            if digit < t:
                break
            w *= BASE - t
            k += BASE
            if i > 0x10FFFF * 1000:  # overflow guard far beyond any valid input
                raise ValueError("punycode integer overflow")
        bias = _adapt(i - old_i, len(output) + 1, first)
        first = False
        n += i // (len(output) + 1)
        if n > 0x10FFFF or 0xD800 <= n <= 0xDFFF:
            # surrogates are not scalar values: chr() would accept them but
            # the string could never serialize (Arrow/UTF-8 reject
            # surrogates), crashing the task instead of keeping the
            # malformed label verbatim as idn_decode_host promises
            raise ValueError("code point out of range")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def idn_decode_host(host: str) -> str:
    """Lowercase a dotted hostname and decode every ``xn--`` label.
    Malformed labels are kept verbatim (a crawler-grade corpus contains
    garbage hosts; dropping rows on decode failure would skew counts)."""
    labels = host.lower().split(".")
    out = []
    for lab in labels:
        if lab.startswith("xn--"):
            try:
                out.append(punycode_decode(lab[4:]))
            except ValueError:
                out.append(lab)
        else:
            out.append(lab)
    return ".".join(out)


def idn_encode_host(host: str) -> str:
    """Lowercase and encode every non-ASCII label to its ``xn--`` form."""
    labels = host.lower().split(".")
    out = []
    for lab in labels:
        if any(ord(c) >= 128 for c in lab):
            out.append("xn--" + punycode_encode(lab))
        else:
            out.append(lab)
    return ".".join(out)
