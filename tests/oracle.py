"""Brute-force BM25 oracle in pure python/pandas — the tests' ground truth.

Mirrors FIXTURES.md §3: never touches engine code paths except the shared
formula constants. Tokenization re-implements the documented spec
independently (regex), so a tokenizer bug can't cancel out.
"""

from __future__ import annotations

import math
import re

CAMEL = re.compile(r"([a-z0-9])([A-Z])")
SPLIT = re.compile(r"[^a-z0-9_]+")
K1, B = 1.2, 0.75


def tokenize_py(text: str) -> list[str]:
    spaced = CAMEL.sub(r"\1 \2", text)
    return [t for t in SPLIT.split(spaced.lower()) if t]


def bm25_topk_py(docs: dict[int, str], query: str, k: int) -> list[tuple[int, float]]:
    """docs: doc_id -> content. Returns [(doc_id, rounded_score)] ranked."""
    toks = {d: tokenize_py(c) for d, c in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n if n else 0.0
    dfreq: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    qtoks = tokenize_py(query)
    qtf: dict[str, int] = {}
    for t in qtoks:
        qtf[t] = qtf.get(t, 0) + 1
    scores: dict[int, float] = {}
    for d, tlist in toks.items():
        dl = len(tlist)
        s = 0.0
        matched = False
        for term, qw in qtf.items():
            if term not in dfreq:
                continue
            tf = tlist.count(term)
            if tf == 0:
                continue
            matched = True
            idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            s += qw * idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        if matched:
            scores[d] = round(s, 6)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
