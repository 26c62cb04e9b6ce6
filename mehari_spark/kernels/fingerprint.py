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


def winnow_with_pos(hashes: list[int], w: int = 4) -> list[tuple[int, int]]:
    """Position-aware winnowing: (gram_index, hash) of the selected
    fingerprint per window (rightmost minimum — the Schleimer et al.
    'robust winnowing' tie-break), deduplicated on repeated selections.

    Positions are 0-based indexes into ``hashes`` (gram start offsets),
    so a cross-document posting index can verify and extend the actual
    matched span. Guarantee: any shared substring of length >= w + k - 1
    selects at least one identical (hash, in-span) fingerprint in both
    documents."""
    n = len(hashes)
    if n == 0:
        return []
    if n <= w:
        m = min(hashes)
        # rightmost minimum
        return [(n - 1 - hashes[::-1].index(m), m)]
    out: list[tuple[int, int]] = []
    last = -1
    for i in range(n - w + 1):
        win = hashes[i : i + w]
        m = min(win)
        j = i + (w - 1 - win[::-1].index(m))  # rightmost min position
        if j != last:
            out.append((j, m))
            last = j
    return out


def fingerprint_postings(text: str, k: int = 8, w: int = 4) -> list[tuple[int, int]]:
    """(char_pos_1based, hash) postings of the winnowed fingerprints —
    the inverted-index payload for cross-document span matching."""
    return [(i + 1, h) for i, h in winnow_with_pos(rolling_hashes(text, k=k), w=w)]
