"""Rolling-hash document fingerprinting (winnowing-style).

Polynomial rolling hash over character windows with winnowing selection —
the standard document-fingerprint scheme for plagiarism/near-dup detection.
Deterministic, pure-integer math.
"""

from __future__ import annotations

_BASE = 257
_MOD = (1 << 61) - 1


def rolling_hashes(text: str, k: int = 8) -> list[int]:
    """Hash of every k-gram of ``text`` (polynomial rolling hash)."""
    n = len(text)
    if n < k:
        return []
    h = 0
    pow_k = pow(_BASE, k - 1, _MOD)
    out = []
    for i, ch in enumerate(text):
        h = (h * _BASE + ord(ch)) % _MOD
        if i >= k:
            h = (h - ord(text[i - k]) * pow_k * _BASE) % _MOD
        if i >= k - 1:
            out.append(h)
    return out


def winnow(hashes: list[int], w: int = 4) -> list[int]:
    """Winnowing: min hash of every window of w consecutive k-gram hashes,
    deduplicated on consecutive repeats (Schleimer et al., SIGMOD'03)."""
    if not hashes:
        return []
    if len(hashes) <= w:
        return [min(hashes)]
    out: list[int] = []
    last = None
    for i in range(len(hashes) - w + 1):
        m = min(hashes[i : i + w])
        if m != last:
            out.append(m)
            last = m
    return out


def fingerprint(text: str, k: int = 8, w: int = 4) -> list[int]:
    return winnow(rolling_hashes(text, k=k), w=w)
