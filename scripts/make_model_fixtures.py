"""Regenerate the committed real-format model fixtures under
fineweb_domain_analyzer_spark/artifacts/. Deterministic: hand-chosen
weights, no RNG, byte-stable output.

Design notes (mirrored by the q62/q63 oracle SQL in queries.py):

* ``langid_marker.bin`` — genuine fastText supervised .bin. dim=3,
  one-hot marker-word embeddings, identity output matrix, so the
  predicted label is exactly argmax over per-label marker-word counts
  (first-max tie-break), which DuckDB can mirror with list_filter
  counts + a CASE ladder.
* ``tiny_unigram.arpa`` — order-1 ARPA LM. Every log10 prob is a
  dyadic rational (multiple of 1/16) so the per-document sums are
  exact in float64 in both engines and the rounded perplexity is
  bit-stable.
* ``tiny_bigram.arpa`` — order-2 ARPA LM with backoff weights, used
  by unit tests to pin the backoff recursion by hand; not oracle-bound.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fineweb_domain_analyzer_spark.functions.model_formats import (
    write_arpa,
    write_fasttext_supervised,
)

ART = os.path.join(
    os.path.dirname(__file__), "..", "fineweb_domain_analyzer_spark", "artifacts"
)

LANGID_MARKERS = {
    "db": ["table", "scan", "join", "merge"],
    "flow": ["stream", "batch", "window", "spark"],
    "gen": ["the", "a", "data", "row"],
}

UNIGRAM_LOGP = {
    "the": -0.5,
    "a": -0.75,
    "data": -1.0,
    "stream": -1.125,
    "join": -1.25,
    "table": -1.5,
    "scan": -1.75,
    "merge": -2.0,
}
UNK_LOGP = -2.5
EOS_LOGP = -1.0


def main() -> None:
    os.makedirs(ART, exist_ok=True)

    labels = list(LANGID_MARKERS)
    words, vecs = [], []
    for i, lab in enumerate(labels):
        for w in LANGID_MARKERS[lab]:
            words.append(w)
            v = np.zeros(len(labels), "f")
            v[i] = 1.0
            vecs.append(v)
    write_fasttext_supervised(
        os.path.join(ART, "langid_marker.bin"),
        words,
        np.array(vecs, "f"),
        labels,
        np.eye(len(labels), dtype="f"),
    )

    uni = {(w,): (p,) for w, p in UNIGRAM_LOGP.items()}
    uni[("<unk>",)] = (UNK_LOGP,)
    uni[("<s>",)] = (-99.0,)
    uni[("</s>",)] = (EOS_LOGP,)
    write_arpa(os.path.join(ART, "tiny_unigram.arpa"), {1: uni})

    bi_uni = {
        ("<s>",): (-99.0, -0.5),
        ("</s>",): (-1.0,),
        ("<unk>",): (-2.5,),
        ("the",): (-0.5, -0.25),
        ("data",): (-1.0, -0.125),
        ("join",): (-1.5,),
    }
    bi_bi = {
        ("<s>", "the"): (-0.25,),
        ("the", "data"): (-0.375,),
        ("data", "</s>"): (-0.5,),
        ("the", "join"): (-0.75,),
    }
    write_arpa(os.path.join(ART, "tiny_bigram.arpa"), {1: bi_uni, 2: bi_bi})

    for f in ("langid_marker.bin", "tiny_unigram.arpa", "tiny_bigram.arpa"):
        p = os.path.join(ART, f)
        print(f, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
