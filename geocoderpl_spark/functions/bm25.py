"""BM25 scoring math — single source of truth for both engine paths.

Variant: Lucene-style non-negative idf,
  idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
  tfnorm(t, d)  = tf * (k1 + 1) / (tf + k1 * (1 - b + b * doclen / avgdl))
  score(q, d)   = sum_t idf(t) * tfnorm(t, d)
with k1 = 1.2, b = 0.75 (BASELINE.json north_star).

Both the Spark column expressions and the numpy kernel below compute the
same formula; the DuckDB oracle SQL in ``__spark_entry__.py`` mirrors it
symbol for symbol. Scores are rounded to ``SCORE_DECIMALS`` before ranking
in every path so rank order is immune to float-summation-order noise
(SURVEY.md §7.4 risk #1; reference analog: tolerance-based asserts,
``src/test.py:50``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6


def idf_col(df_col: Column, n_docs: Column | int) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log(1.0 + (n - df_col + 0.5) / (df_col + 0.5))


def tfnorm_col(tf_col: Column, doclen_col: Column, avgdl: Column | float) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    return (tf_col * (K1 + 1.0)) / (tf_col + K1 * (1.0 - B + B * doclen_col / a))


def idf_np(df: np.ndarray, n_docs: int) -> np.ndarray:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tfnorm_np(tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
    return (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * doclen / avgdl))
