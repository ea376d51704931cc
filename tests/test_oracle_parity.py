"""Driver-contract parity: every oracle_sql() entry must match its Ray
query value-for-value on the sf0.001 tables (the same comparison the
external driver runs at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df


def test_all_oracles_match(ray_session, duck):
    import __ray_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert oracles, "oracle_sql() is empty"
    assert set(oracles) <= set(queries), "oracle without a query"

    failures = []
    for name, sql in oracles.items():
        # dump-backed oracles (synth-corpus docs, serial-oracle linkage
        # tables, seeded-LSH expected outputs) are all written for the
        # driver's sf0.01 comparison — run those queries at sf0.01 so both
        # sides see the same corpus size
        sf = "/root/testdata/sf0.01" if "/tmp/graft_" in sql else SF
        res = queries[name](sf)
        df = _normalize(res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res))
        odf = _normalize(duck.sql(sql).df())
        if df.shape != odf.shape or list(df.columns) != list(odf.columns):
            failures.append(f"{name}: shape/cols {df.shape}{list(df.columns)} vs {odf.shape}{list(odf.columns)}")
            continue
        for c in df.columns:
            ok = (
                (df[c].fillna(-1) - odf[c].fillna(-1)).abs().max() <= 1e-9
                if df[c].dtype.kind in "fiu"
                else df[c].astype(str).equals(odf[c].astype(str))
            )
            if not ok:
                failures.append(f"{name}: column {c} differs")
    assert not failures, failures


def test_float_first_sort_columns_bit_exact(ray_session, duck):
    """The driver sorts rows on ALL columns BEFORE rounding floats; queries
    whose float column alphabetically precedes their unique key (lm_score's
    avg_logprob, q_events_sliding's n_events/sum_value tie chains) therefore
    need the float values BIT-identical across engines, not just within
    1e-9 — a 1-ulp Arrow-vs-DuckDB rounding skew reorders tied rows and
    fails the hash.  Run at sf0.01 where ties actually occur."""
    import __ray_entry__ as entry_mod

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    cases = {
        "lm_score": (["doc_id"], "avg_logprob"),
        "q_events_sliding": (["window_start", "event_type"], "sum_value"),
        "dedup_embedding_cosine": (["vec_a", "vec_b"], "max(cos)"),
        "dedup_embedding_exact": (["vec_a", "vec_b"], "cos"),
        "q_sessionize": (["user_id", "session_no"], "sum_value"),
    }
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name, (keys, float_col) in cases.items():
        a = queries[name](sf).to_pandas().sort_values(keys).reset_index(drop=True)
        b = con.sql(oracles[name]).df().sort_values(keys).reset_index(drop=True)
        av = a[float_col].to_numpy()
        bv = b[float_col].to_numpy()
        assert (av.view("int64") == bv.view("int64")).all(), name
