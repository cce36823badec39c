"""Pure-Python readers (and fixture writers) for the two real model
formats the quality operators consume: fastText supervised ``.bin``
and ARPA n-gram ``.arpa``.

Why this exists: the executors in many deployments (and this sandbox)
do not have the ``fasttext`` / ``kenlm`` C++ wheels installed, yet the
artifacts a curation team ships ARE real-format files. These readers
parse the genuine on-disk formats — byte layouts taken from the public
fastText sources (``src/fasttext.cc`` ``signModel``/``saveModel``,
``src/args.cc`` ``Args::save``, ``src/dictionary.cc``
``Dictionary::save``, ``src/densematrix.cc`` ``DenseMatrix::save``)
and the published ARPA format — so a file written by the real trainer
loads here unmodified, and a fixture written here loads in the real
libraries. The scope is deliberately narrow and loud: fastText support
covers non-quantized supervised softmax models with ``wordNgrams=1``
and no subword buckets (the standard langid shape); anything else
raises with the exact unsupported field named.

Reference analog: none — the reference (fineweb_analyzer.py) has no
model scoring; this is north-rule quality_filter surface.

Inference semantics mirrored from fastText for the supported shape:
tokens split on the ASCII whitespace set fastText uses
(``space \\n \\t \\v \\f \\r``), an EOS token ``</s>`` appended per
line (``Dictionary::getLine``), unknown tokens skipped (no subword
buckets), hidden = mean of known-token input vectors, scores =
output-matrix @ hidden, label = argmax (first-max on ties — note the
C++ heap may order exact ties differently; fixtures avoid score ties
except the degenerate all-zero case, which this reader pins to the
first label).
"""

from __future__ import annotations

import re
import struct

import numpy as np
import pandas as pd

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12
_LOSS_SOFTMAX = 3
_MODEL_SUP = 3
_EOS = "</s>"
_LABEL_PREFIX = "__label__"
# fastText Dictionary::readWord delimiters (space \n \t \v \f \r \0)
_FT_SPLIT = re.compile("[ \n\t\x0b\x0c\r\x00]+")


def ft_tokenize(text: str) -> list[str]:
    """fastText line tokenization: ASCII-whitespace split + EOS."""
    return [t for t in _FT_SPLIT.split(text) if t] + [_EOS]


# ---------------------------------------------------------------------------
# fastText supervised .bin
# ---------------------------------------------------------------------------


def write_fasttext_supervised(
    path: str,
    words: list[str],
    word_vectors: np.ndarray,
    labels: list[str],
    output_matrix: np.ndarray,
) -> None:
    """Write a genuine fastText supervised ``.bin`` (magic 793712314,
    version 12, softmax loss, no buckets/subwords/quantization) that
    ``fasttext.load_model`` would accept. ``words`` should include
    ``</s>`` (appended automatically if absent, with a zero vector).
    ``labels`` are bare names; the ``__label__`` prefix is added."""
    dim = int(word_vectors.shape[1])
    if output_matrix.shape != (len(labels), dim):
        raise ValueError("output_matrix must be (n_labels, dim)")
    if _EOS not in words:
        words = list(words) + [_EOS]
        word_vectors = np.vstack([word_vectors, np.zeros((1, dim), "f")])
    if len(words) != word_vectors.shape[0]:
        raise ValueError("one vector per word required")
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        # Args::save — 12 int32 + 1 double
        f.write(
            struct.pack(
                "<12id",
                dim,  # dim
                5,  # ws
                5,  # epoch
                1,  # minCount
                5,  # neg
                1,  # wordNgrams
                _LOSS_SOFTMAX,  # loss
                _MODEL_SUP,  # model
                0,  # bucket
                0,  # minn
                0,  # maxn
                100,  # lrUpdateRate
                1e-4,  # t
            )
        )
        # Dictionary::save — words first, then labels; pruneidx_size=-1
        entries = [(w, 2, 0) for w in words] + [
            (_LABEL_PREFIX + l, 1, 1) for l in labels
        ]
        f.write(
            struct.pack(
                "<iiiqq",
                len(entries),
                len(words),
                len(labels),
                sum(c for _, c, _ in entries),
                -1,
            )
        )
        for word, count, etype in entries:
            f.write(word.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", count, etype))
        f.write(b"\x00")  # quant_ = false
        f.write(struct.pack("<qq", len(words), dim))
        f.write(np.ascontiguousarray(word_vectors, "<f4").tobytes())
        f.write(b"\x00")  # qout_ = false
        f.write(struct.pack("<qq", len(labels), dim))
        f.write(np.ascontiguousarray(output_matrix, "<f4").tobytes())


class PureFastTextSupervised:
    """Pure-Python loader/scorer for the fastText ``.bin`` shape above.
    Same ``predict_batch`` interface as the ``_FastTextLangID`` wrapper
    over the real library."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            buf = f.read()
        off = 0

        def take(fmt: str):
            nonlocal off
            vals = struct.unpack_from(fmt, buf, off)
            off += struct.calcsize(fmt)
            return vals

        magic, version = take("<ii")
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"not a fastText model (magic {magic})")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText version {version}")
        (
            dim,
            _ws,
            _epoch,
            _minc,
            _neg,
            wng,
            loss,
            model,
            bucket,
            minn,
            maxn,
            _lru,
        ) = take("<12i")
        take("<d")  # t
        if model != _MODEL_SUP:
            raise ValueError(f"only supervised models supported (model={model})")
        if loss != _LOSS_SOFTMAX:
            raise ValueError(f"only softmax loss supported (loss={loss})")
        if wng != 1 or bucket != 0 or minn != 0 or maxn != 0:
            raise ValueError(
                "only wordNgrams=1, bucket=0, no-subword models supported "
                f"(wordNgrams={wng} bucket={bucket} minn={minn} maxn={maxn})"
            )
        size, nwords, nlabels, _ntokens, pruneidx_size = take("<iiiqq")
        self.word_id: dict[str, int] = {}
        self.labels: list[str] = []
        for i in range(size):
            end = buf.index(b"\x00", off)
            word = buf[off:end].decode("utf-8")
            off = end + 1
            _count, etype = take("<qb")
            if etype == 0:
                self.word_id[word] = i
            else:
                self.labels.append(word.removeprefix(_LABEL_PREFIX))
        if nwords != len(self.word_id) or nlabels != len(self.labels):
            raise ValueError("dictionary counts disagree with entry types")
        if pruneidx_size > 0:
            raise ValueError("pruned dictionaries not supported")
        (quant,) = take("<b")
        if quant:
            raise ValueError("quantized models not supported")
        m, n = take("<qq")
        self.input = np.frombuffer(buf, "<f4", m * n, off).reshape(m, n)
        off += m * n * 4
        (qout,) = take("<b")
        if qout:
            raise ValueError("quantized output not supported")
        m, n = take("<qq")
        self.output = np.frombuffer(buf, "<f4", m * n, off).reshape(m, n)
        if n != dim or self.output.shape[0] != nlabels:
            raise ValueError("output matrix shape disagrees with args/dict")
        self.dim = dim

    def predict_one(self, text: str | None) -> str | None:
        if text is None:
            return None
        ids = [self.word_id[t] for t in ft_tokenize(text) if t in self.word_id]
        if not ids:  # cannot happen when </s> is in vocab, but be safe
            return self.labels[0]
        hidden = self.input[ids].mean(axis=0)
        return self.labels[int(np.argmax(self.output @ hidden))]

    def predict_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(self.predict_one)


# ---------------------------------------------------------------------------
# ARPA n-gram LM
# ---------------------------------------------------------------------------


def write_arpa(path: str, ngrams: dict[int, dict[tuple[str, ...], tuple]]) -> None:
    """Write an ARPA file. ``ngrams[n]`` maps word tuples to either
    ``(log10p,)`` or ``(log10p, log10backoff)``."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for n in sorted(ngrams):
            f.write(f"ngram {n}={len(ngrams[n])}\n")
        for n in sorted(ngrams):
            f.write(f"\n\\{n}-grams:\n")
            for words, vals in ngrams[n].items():
                parts = [f"{vals[0]}", " ".join(words)]
                if len(vals) > 1:
                    parts.append(f"{vals[1]}")
                f.write("\t".join(parts) + "\n")
        f.write("\n\\end\\\n")


class ArpaLM:
    """Pure-Python ARPA backoff LM with KenLM-compatible scoring:
    ``<s>`` seeds the context unscored, ``</s>`` is scored, OOV words
    map to ``<unk>``, and ``perplexity(t) = 10**(-score/(n_words+1))``
    (the same denominator the kenlm Python wrapper uses)."""

    def __init__(self, path: str):
        self.probs: dict[tuple[str, ...], float] = {}
        self.backoffs: dict[tuple[str, ...], float] = {}
        self.order = 0
        section = 0
        with open(path, encoding="utf-8") as f:
            for raw in f:
                line = raw.strip()
                if not line or line == "\\data\\" or line.startswith("ngram "):
                    continue
                m = re.fullmatch(r"\\(\d+)-grams:", line)
                if m:
                    section = int(m.group(1))
                    self.order = max(self.order, section)
                    continue
                if line == "\\end\\":
                    break
                if not section:
                    continue
                parts = line.split()
                logp = float(parts[0])
                words = tuple(parts[1 : 1 + section])
                self.probs[words] = logp
                if len(parts) > 1 + section:
                    self.backoffs[words] = float(parts[1 + section])
        if ("<unk>",) not in self.probs:
            raise ValueError("ARPA model must define <unk>")

    def _logp(self, context: tuple[str, ...], w: str) -> float:
        """log10 p(w | context) with standard backoff recursion."""
        if (w,) not in self.probs:
            w = "<unk>"
        while True:
            gram = context + (w,)
            if gram in self.probs:
                return self.probs[gram]
            if not context:
                return self.probs[(w,)]
            penalty = self.backoffs.get(context, 0.0)
            context = context[1:]
            if penalty:
                return penalty + self._logp(context, w)

    def score(self, text: str) -> float:
        """Full-sentence log10 score incl. BOS context and scored EOS.
        OOV words enter the context as ``<unk>`` (KenLM state semantics)."""
        words = [t for t in _FT_SPLIT.split(text) if t]
        # context is truncated to the last order-1 words every step —
        # only those are ever read, and growing the tuple unboundedly
        # would make scoring O(n^2) in document length
        ctx_len = self.order - 1
        total, context = 0.0, ("<s>",) if ctx_len > 0 else ()
        for w in words + ["</s>"]:
            if (w,) not in self.probs:
                w = "<unk>"
            total += self._logp(context, w)
            if ctx_len > 0:
                context = (context + (w,))[-ctx_len:]
        return total

    def perplexity(self, t: str | None) -> float | None:
        if t is None:
            return None
        n = len([x for x in _FT_SPLIT.split(t) if x])
        return 10.0 ** (-self.score(t) / (n + 1))


def sniff_model_format(path: str) -> str:
    """'fasttext-bin' | 'arpa' | 'unknown' from the leading bytes."""
    with open(path, "rb") as f:
        head = f.read(64)
    if len(head) >= 4 and struct.unpack("<i", head[:4])[0] == FASTTEXT_MAGIC:
        return "fasttext-bin"
    if head.lstrip()[:6] == b"\\data\\":
        return "arpa"
    return "unknown"
