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
    the inverted-index payload for cross-document span matching.

    Golden scalar reference for the vectorized ``posting_arrays`` (the
    production path): same u64-wraparound hash, same rightmost-min
    winnow — tests assert element equality."""
    return [
        (i + 1, h - (1 << 64) if h >= (1 << 63) else h)  # signed-int64 view
        for i, h in winnow_with_pos(rolling_hashes_u64(text, k=k), w=w)
    ]


# ---------------------------------------------------------------------------
# vectorized posting kernel (the 100 TB hot path): uint64-wraparound
# polynomial hash — base 257 is odd, hence invertible mod 2^64, so every
# k-gram hash is a prefix-difference times a power, all computable with
# numpy cumulative ops (no per-character python loop). The pure-python
# loop above measured ~3.5 s for a 5000-doc/300k-posting scan; this path
# exists because token/posting throughput IS the pipeline's unit cost.
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402

_INV_BASE = pow(_BASE, -1, 1 << 64)  # modular inverse of 257 mod 2^64


def rolling_hashes_u64(text: str, k: int) -> list[int]:
    """Scalar u64-wraparound twin of ``rolling_hashes`` (same recurrence,
    modulus 2^64 instead of the prime) — the golden reference the
    vectorized kernel is asserted against."""
    n = len(text)
    if n < k:
        return []
    mask = (1 << 64) - 1
    pow_k = pow(_BASE, k, 1 << 64)
    h = 0
    out = []
    for i, ch in enumerate(text):
        h = (h * _BASE + ord(ch)) & mask
        if i >= k:
            h = (h - ord(text[i - k]) * pow_k) & mask
        if i >= k - 1:
            out.append(h)
    return out


def gram_hashes_np(text: str, k: int) -> np.ndarray:
    """uint64 hash of every k-gram, fully vectorized: code points via a
    utf-32 reinterpret, prefix sums of c_t * invB^t, gram = prefix
    difference re-based by B^(i+k-1). All ops wrap mod 2^64 (numpy C
    semantics on uint64)."""
    n = len(text)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    base = np.uint64(_BASE)
    inv = np.uint64(_INV_BASE)
    with np.errstate(over="ignore"):
        ivp = np.empty(n, dtype=np.uint64)
        ivp[0] = np.uint64(1)
        if n > 1:
            np.multiply.accumulate(
                np.full(n - 1, inv, dtype=np.uint64), out=ivp[1:]
            )
        q = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(codes * ivp, out=q[1:], dtype=np.uint64)
        # rebase factor B^(i+k-1) for gram start i = 0..n-k
        pows = np.empty(n - k + 1, dtype=np.uint64)
        pows[0] = np.uint64(pow(_BASE, k - 1, 1 << 64))
        if n - k > 0:
            np.multiply.accumulate(
                np.full(n - k, base, dtype=np.uint64), out=pows[1:]
            )
            pows[1:] = pows[1:] * pows[0]
        return (q[k:] - q[: n - k + 1]) * pows


def winnow_with_pos_np(hashes: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized rightmost-min winnowing over a uint64 hash array:
    (positions, hashes) of the selected fingerprints — identical
    selections to ``winnow_with_pos``."""
    n = hashes.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    if n <= w:
        rev = hashes[::-1]
        j = n - 1 - int(np.argmin(rev))
        return np.array([j], dtype=np.int64), hashes[j : j + 1]
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost minimum per window: argmin over the reversed window
    j = (
        np.arange(n - w + 1, dtype=np.int64)
        + (w - 1)
        - np.argmin(win[:, ::-1], axis=1)
    )
    keep = np.empty(j.shape[0], dtype=bool)
    keep[0] = True
    keep[1:] = j[1:] != j[:-1]
    sel = j[keep]
    return sel, hashes[sel]


def posting_arrays(text: str, k: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``fingerprint_postings``: (1-based char positions int64,
    signed-int64 hash view) — the arrays the Arrow posting scan emits."""
    pos, h = winnow_with_pos_np(gram_hashes_np(text, k), w)
    return pos + 1, h.astype(np.int64)
