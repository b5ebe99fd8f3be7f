"""DuckDB-oracle coverage for every ``q_*`` implementation NOT in the
driver gate registry (VERDICT r05 #3).

The r5 gate consolidation dropped five queries from ``queries()`` /
``oracle_sql()`` to fit the harness's 50-entry cap, which left their
implementations with zero automated verification. This test is the oracle
dict "kept for exactly this purpose": it DISCOVERS the ungated set by
diffing the module's ``q_*`` functions against ``queries()`` — so a future
consolidation cannot silently orphan a query surface (the discovery
assertion fails until an oracle is added here) — and checks each one
row-for-row against DuckDB at sf0.001, with the same normalization the
driver-simulation script (scripts/check_oracle.py) uses.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _ungated_oracles() -> dict[str, str]:
    """Oracle SQL for the consolidated-away gates — text identical to the
    pre-consolidation ``oracle_sql()`` entries (recovered from the r4
    registry), composed from the entry module's live SQL building blocks
    so tokenizer-spec changes can never drift the two apart."""
    toks = entry._duck_toks("text")
    phrase_values = ", ".join(
        f"({i}, '{t}')" for i, t in entry.PHRASE_QUERIES
    )
    return {
        "fts_bm25_topk_docs": entry._BM25_CORE + entry._BM25_DOCS_FINAL,
        "fts_phrase_match": f"""
WITH tokd AS (SELECT doc_id, {toks} AS toks FROM documents),
p(query_id, phrase_text) AS (VALUES {phrase_values}),
pt AS (
  SELECT query_id, {entry._duck_toks('phrase_text')} AS ptoks FROM p
  WHERE len({entry._duck_toks('phrase_text')}) > 0
),
counted AS (
  SELECT pt.query_id, t.doc_id,
         len(list_filter(generate_series(1, len(t.toks) - len(pt.ptoks) + 1),
             i -> list_slice(t.toks, i, i + len(pt.ptoks) - 1) = pt.ptoks)) AS n_matches
  FROM tokd t CROSS JOIN pt
),
ranked AS (
  SELECT query_id, doc_id, n_matches,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_matches DESC, doc_id) AS rnk
  FROM counted WHERE n_matches > 0
)
SELECT query_id, rnk::INT AS rank, doc_id, n_matches::INT AS n_matches
FROM ranked WHERE rnk <= 10
""",
        "rel_shipping_priority": """
SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
  SELECT l_orderkey,
         (sum(l_extendedprice::DECIMAL(18,2)
              * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))))::DOUBLE AS revenue,
         o_orderdate, o_orderpriority
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15'
    AND l_shipdate > TIMESTAMP '1995-03-15'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
        "rel_order_priority": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= TIMESTAMP '1995-07-01'
                AND l_shipdate < TIMESTAMP '1996-01-01')
GROUP BY o_orderpriority
""",
        "rel_running_window": """
SELECT o_custkey, o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders
FROM orders
""",
    }


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Same normalization as scripts/check_oracle.py."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
        elif pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _ungated_names() -> list[str]:
    gated = set(entry.queries())
    return sorted(
        n[2:] for n in dir(entry) if n.startswith("q_") and n[2:] not in gated
    )


def test_no_query_surface_is_orphaned():
    """Every q_* outside the gate registry must have an oracle HERE —
    a consolidation that orphans a new surface fails this immediately."""
    assert set(_ungated_names()) == set(_ungated_oracles())


@pytest.mark.parametrize("name", sorted(_ungated_oracles()))
def test_ungated_query_matches_duckdb(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    got = _normalize(getattr(entry, f"q_{name}")(spark, SF_DIR).toPandas())
    exp = _normalize(con.sql(_ungated_oracles()[name]).df())
    assert list(got.columns) == list(exp.columns), name
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, obj=name)
