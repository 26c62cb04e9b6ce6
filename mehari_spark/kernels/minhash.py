"""MinHash signatures + LSH banding (numpy-vectorized, deterministic).

Used for (a) near-duplicate detection over documents and (b) blocking in
entity linking. The banding trick: two sets with Jaccard ~s collide in at
least one band with probability 1-(1-s^r)^b. All hashing is explicit
(xxhash-free, splitmix64-style) so signatures are reproducible across
executors and sessions — the same determinism discipline as mehari's
byte-ordered key encodings (/root/reference/mehari/src/db/keys.rs:144-163).
"""

from __future__ import annotations

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public-domain splitmix64 constants).

    uint64 wrap-around is intentional; numpy overflow warnings suppressed.
    """
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        return x ^ (x >> np.uint64(31))


def hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hash per token (FNV-1a over utf-8, then mixed)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    fnv_offset, fnv_prime, mask = 0xCBF29CE484222325, 0x100000001B3, (1 << 64) - 1
    for i, tok in enumerate(tokens):
        h = fnv_offset
        for b in tok.encode("utf-8"):
            h = ((h ^ b) * fnv_prime) & mask
        out[i] = h
    return _splitmix64(out)


def perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameters for the universal-hash permutations, seeded."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(
    token_hashes: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm minhash values for one set of token hashes."""
    if token_hashes.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n_tokens) universal hashes mod Mersenne prime, min over tokens;
    # uint64 wrap in the product is fine — still a deterministic mixing family
    with np.errstate(over="ignore"):
        h = (
            a[:, None] * (token_hashes[None, :] & _MERSENNE) + b[:, None]
        ) % _MERSENNE
    return h.min(axis=1)


def signatures_batch(
    tok_sets: list[set],
    memo: dict[str, int],
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """MinHash signatures for a whole batch of token SETS at once.

    One (num_perm, total_tokens) universal-hash pass over the batch's
    concatenated token hashes + ``np.minimum.reduceat`` per document
    segment — bit-identical to calling :func:`minhash_signature` per
    document (same permutation values, min over the same set; min is
    order-independent), but the modulo pass and the min run as two
    vectorized ops instead of one small numpy call per document. Empty
    documents get the uint64-max sentinel signature, as before."""
    num_perm = a.shape[0]
    n = len(tok_sets)
    lens = np.fromiter((len(s) for s in tok_sets), dtype=np.int64, count=n)
    total = int(lens.sum())
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if total == 0:
        return sigs
    th = np.fromiter(
        (memo[t] for s in tok_sets for t in s), dtype=np.uint64, count=total
    )
    with np.errstate(over="ignore"):
        h = (a[:, None] * (th[None, :] & _MERSENNE) + b[:, None]) % _MERSENNE
    nonempty = lens > 0
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nonempty]
    # reduceat segments must start in-bounds; empty docs keep the sentinel
    sigs[nonempty] = np.minimum.reduceat(h, starts, axis=1).T
    return sigs


def band_keys_matrix(signatures: np.ndarray, bands: int) -> np.ndarray:
    """Band bucket keys for a whole BATCH of signatures at once.

    ``signatures``: (n_docs, num_perm) uint64 -> (n_docs, bands) int64.
    Bit-identical to the scalar ``band_keys`` fold (same chain
    acc = splitmix64(acc ^ v) over the band's rows, band index salted into
    the seed), but the fold loop runs ``rows`` vectorized steps over all
    docs x bands instead of n_docs x num_perm Python-level scalar mixes."""
    n, num_perm = signatures.shape
    rows = num_perm // bands
    # (n, bands, rows): row-major chunks per band
    chunks = signatures[:, : bands * rows].reshape(n, bands, rows)
    acc = np.broadcast_to(
        np.arange(1, bands + 1, dtype=np.uint64), (n, bands)
    ).copy()
    for r in range(rows):
        acc = _splitmix64(acc ^ chunks[:, :, r])
    return (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def band_keys(signature: np.ndarray, bands: int) -> list[int]:
    """One stable 63-bit bucket key per band (band index salted in)."""
    return band_keys_matrix(
        np.asarray(signature, dtype=np.uint64)[None, :], bands
    )[0].tolist()


def shingles(text: str, n: int = 3) -> list[str]:
    """Character n-gram shingles."""
    if len(text) < n:
        return [text] if text else []
    return [text[i : i + n] for i in range(len(text) - n + 1)]
