"""Local mirror of the driver's correctness gate: run each query's Ray
pipeline AND its DuckDB oracle on the same parquet tables, compare
row count + schema + order-insensitive values. Used by tests and for
pre-flight debugging; the real gate is the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def oracle_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """The dtype class the driver's value-hash can distinguish: a float
    column renders 9000.0 where an int column renders 9000, so int-vs-float
    drift between engine and oracle hash-mismatches even when values are
    numerically equal (r04's q65).  bool renders True/False, datetimes
    render with sub-second precision; everything else stringifies."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(
    name: str,
    ray_df: pd.DataFrame,
    sql_df: pd.DataFrame,
    strict_dtypes: bool = False,
) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"cols: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if strict_dtypes:
        # Mirror the driver's hash, which sees rendered values BEFORE any
        # canonicalization: flag class drift even when values match.
        for c in sorted(ray_df.columns):
            ka, kb = _dtype_class(ray_df[c]), _dtype_class(sql_df[c])
            if ka != kb:
                problems.append(
                    f"col {c}: dtype class drift ray={ka}({ray_df[c].dtype}) "
                    f"sql={kb}({sql_df[c].dtype}) — driver hash would differ"
                )
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                if not np.allclose(a[c], b[c], rtol=0, atol=0, equal_nan=True):
                    bad = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                    problems.append(f"col {c}: {int(bad.sum())} value diffs (e.g. {a[c][bad].head(2).tolist()} vs {b[c][bad].head(2).tolist()})")
            else:
                neq = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                if neq.any():
                    problems.append(f"col {c}: {int(neq.sum())} diffs (e.g. {a[c][neq].head(2).tolist()} vs {b[c][neq].head(2).tolist()})")
    return problems


def check_all(
    sf_dir: str,
    only: list[str] | None = None,
    strict_dtypes: bool = False,
) -> dict[str, list[str]]:
    from .queries import ORACLE_SQL, QUERIES

    con = oracle_connect(sf_dir)
    out: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLE_SQL:
            continue
        ray_df = to_pandas(fn(sf_dir))
        sql_df = con.execute(ORACLE_SQL[name]).fetchdf()
        out[name] = compare(name, ray_df, sql_df, strict_dtypes=strict_dtypes)
    return out
