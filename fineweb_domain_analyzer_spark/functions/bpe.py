"""Byte-pair-encoding tokenizer: train, encode, and count — for real.

The token-budget operators (q59 token-budget cut, q69 sequence packing,
q16 token stats) need token counts; the whitespace + BPE-ish regex
estimators are cheap but approximate. This module is an actual BPE
(Sennrich et al. 2016 / the GPT-2 merge loop): a committed merge table
(``artifacts/bpe_merges.txt``, trained deterministically on the test
corpus by ``scripts/make_bpe_fixture.py``) is applied greedily
lowest-rank-first per word, yielding exact token ids, counts, and an
order-proof bigint checksum per document.

Pre-tokenization is the repo-wide convention — whitespace splits of
``trim(lower(text))`` (the q23 perplexity / DSIR tokenizer) — so BPE
counts are comparable with every other token-based operator. Each word
is encoded as its characters with ``</w>`` appended to the final one
(the Sennrich end-of-word convention), then merges apply in rank order.

Scale shape: the merge table is a few KB and rides the UDF CLOSURE —
no file shipping, no per-task reload; encoding is an Arrow-batched
pandas UDF with a per-batch word cache (web text repeats words heavily,
so the amortized cost per token is a dict hit); the output columns are
exact integers, so downstream aggregation is partition-order-proof.

Not SQL-expressible (the merge loop is iterative), so the q75 oracle
joins the corpus-derived fixture ``artifacts/bpe_tokens.parquet`` on
``md5(text)`` — the zlib-ratio pattern (merged.py q13): the fixture is
generated from the same pure functions this module exports, and the
pure functions are themselves differential-tested by hand-computed
examples in tests/test_bpe.py.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ARTIFACTS = Path(__file__).resolve().parent.parent / "artifacts"
MERGES_PATH = ARTIFACTS / "bpe_merges.txt"
VOCAB_PATH = ARTIFACTS / "bpe_vocab.txt"

END = "</w>"


def pretokenize(text: str | None) -> list[str]:
    """Whitespace words of trim(lower(text)) — the q23 convention."""
    if not text:
        return []
    return [w for w in text.lower().strip().split() if w]


def word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: chars, with </w> glued to the last."""
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + END,)


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training: repeatedly merge the most frequent adjacent
    symbol pair; ties break on the lexicographically smallest pair, so
    training is fully deterministic for a given corpus."""
    vocab: dict[tuple[str, ...], int] = {
        word_symbols(w): c for w, c in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best_cnt = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_cnt)
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def build_vocab(
    word_freqs: dict[str, int], merges: list[tuple[str, str]]
) -> list[str]:
    """Deterministic id space: sorted base symbols seen in training,
    then each merge's output token in merge order."""
    base: set[str] = set()
    for w in word_freqs:
        base.update(word_symbols(w))
    return sorted(base) + [a + b for a, b in merges]


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """GPT-2 merge loop: apply the present pair with the LOWEST rank,
    repeat until no mergeable pair remains."""
    syms = list(word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def encode_text(
    text: str | None,
    ranks: dict[tuple[str, str], int],
    ids: dict[str, int],
    cache: dict[str, tuple[tuple[str, ...], list[int]]] | None = None,
) -> tuple[int, int]:
    """(n_tokens, checksum) for one document; checksum is the exact
    bigint sum of token ids (unknown symbols — characters never seen in
    training — contribute id -1), so any engine that replays the merge
    table reproduces it bit-for-bit regardless of partitioning."""
    n = 0
    total = 0
    for w in pretokenize(text):
        hit = cache.get(w) if cache is not None else None
        if hit is None:
            toks = encode_word(w, ranks)
            tok_ids = [ids.get(t, -1) for t in toks]
            hit = (toks, tok_ids)
            if cache is not None:
                cache[w] = hit
        n += len(hit[0])
        total += sum(hit[1])
    return n, total


def load_merges(path: str | Path = MERGES_PATH) -> list[tuple[str, str]]:
    """Read a merge table in either this repo's TSV or the Hugging Face
    ``merges.txt`` convention (space-separated pair per line, optional
    ``#version`` header) — per line: split on tab when present, else on
    the single space. Rank is line order in both conventions."""
    out: list[tuple[str, str]] = []
    for line in Path(path).read_text(encoding="utf-8").splitlines():
        if not line or line.startswith("#"):
            continue
        sep = "\t" if "\t" in line else " "
        a, b = line.split(sep)
        out.append((a, b))
    return out


def load_vocab(path: str | Path = VOCAB_PATH) -> list[str]:
    return Path(path).read_text(encoding="utf-8").splitlines()


def with_bpe_stats(
    df: DataFrame,
    text_col: str = "text",
    *,
    merges_path: str | Path = MERGES_PATH,
    vocab_path: str | Path = VOCAB_PATH,
    n_col: str = "bpe_n_tokens",
    sum_col: str = "bpe_checksum",
) -> DataFrame:
    """Add exact BPE token count + id-sum checksum columns.

    The merge table is loaded ONCE on the driver and rides the closure
    (a few KB — cheaper and simpler than addFile shipping); each Arrow
    batch shares a word cache, so repeated words cost a dict lookup."""
    merges = load_merges(merges_path)
    ranks = {pair: i for i, pair in enumerate(merges)}
    ids = {tok: i for i, tok in enumerate(load_vocab(vocab_path))}

    @F.pandas_udf("struct<n: bigint, chk: bigint>")
    def _stats(texts: pd.Series) -> pd.DataFrame:
        cache: dict[str, tuple[tuple[str, ...], list[int]]] = {}
        ns: list[int] = []
        chks: list[int] = []
        for t in texts:
            n, chk = encode_text(
                t if isinstance(t, str) else None, ranks, ids, cache
            )
            ns.append(n)
            chks.append(chk)
        return pd.DataFrame({"n": ns, "chk": chks})

    stats = _stats(F.col(text_col))
    return df.withColumn(n_col, stats["n"]).withColumn(sum_col, stats["chk"])
