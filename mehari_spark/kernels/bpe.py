"""Byte-pair-encoding tokenizer: deterministic training + encoding.

Real BPE (Sennrich et al. 2016), not a regex approximation: training
iteratively merges the most frequent adjacent symbol pair across the
word-frequency table; encoding replays the learned merges in rank order
per word. Token accounting is the #1 unit of an LLM data pipeline, so
the merges table is a first-class, reproducible artifact: trained once
from the corpus by ``mehari_spark.datagen.build_bpe_assets``, stored in
``mehari_spark/resources/``, and regenerated + compared in tests.

Everything here is pure python and deterministic (ties broken by count
DESC then pair ASC) — it is both the golden reference the Spark kernel
(operators/bpe.py) is asserted against and the trainer that produced the
checked-in assets. Reference kernel shape: the per-record Rust annotator
(/root/reference/mehari-python/src/lib.rs:297-380).
"""

from __future__ import annotations

from collections import Counter

END = "</w>"  # end-of-word symbol: merges can capture word endings


def pretokenize(text: str | None) -> list[str]:
    """Whitespace pre-tokenization — the corpus is space-separated; a
    production byte-level tokenizer would use the GPT-2 split regex here,
    the merge machinery is identical."""
    return [w for w in (text or "").split(" ") if w]


def word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += freq
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge every non-overlapping occurrence of ``pair``, left to right."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(texts: list[str | None], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from the corpus word-frequency table.

    Deterministic: the merged pair each round is the (count DESC, pair
    ASC) winner, so equal corpora always yield identical tables."""
    word_freq: Counter = Counter()
    for t in texts:
        word_freq.update(pretokenize(t))
    vocab: dict[tuple[str, ...], int] = {
        word_symbols(w): f for w, f in word_freq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(syms, best): f for syms, f in vocab.items()}
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Apply the learned merges to one word: repeatedly merge the
    best-ranked (lowest rank) adjacent pair until none applies."""
    syms = word_symbols(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        syms = _merge_word(syms, best)
    return syms


def encode(
    text: str | None,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Token list for ``text``. ``cache`` memoizes per-word encodings —
    natural-language word frequency is Zipfian, so a small cache removes
    almost all merge loops (what production tokenizers do)."""
    out: list[str] = []
    for w in pretokenize(text):
        enc = cache.get(w) if cache is not None else None
        if enc is None:
            enc = encode_word(w, ranks)
            if cache is not None:
                cache[w] = enc
        out.extend(enc)
    return out


def merges_to_ranks(
    merges: list[tuple[str, str]] | list[list[str]]
) -> dict[tuple[str, str], int]:
    return {(a, b): i for i, (a, b) in enumerate(merges)}


def token_count(text: str | None, ranks, cache=None) -> int:
    return len(encode(text, ranks, cache))
