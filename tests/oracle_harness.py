"""Local replica of the driver's DuckDB-oracle comparison.

Runs each registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count + column names +
order-insensitive values (columns sorted by name, rows sorted by their
full normalized tuple — same idea as the driver's value hash).
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full repr: we promise bit-identical floats, so no tolerance
        return repr(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return str(v)


def normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted_cols, out


def compare_query(spark, name: str, fn, oracle: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass).

    Fails loudly if the oracle emits a HUGEINT/DECIMAL column: DBAPI
    ``fetchall()`` returns Python ints for HUGEINT, so this harness
    CANNOT reproduce the driver's normalizer on those types (the r07
    five-red blind spot) — refusing is the only honest behavior.
    """
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    con = duck_con(sf_dir)
    rel = con.sql(oracle)
    hazard = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    if hazard:
        con.close()
        return [
            f"{name}: oracle emits HUGEINT/DECIMAL columns {hazard} — "
            "the driver's value hash renders these differently from "
            "int64 and this harness cannot see it (VERDICT r07); "
            "CAST(... AS BIGINT) in the oracle SQL"
        ]
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]
    con.close()

    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"{name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"{name}: rowcount spark={len(srows)} oracle={len(orows)}")
    _, s_norm = normalize(scols, srows)
    _, o_norm = normalize(ocols, orows)
    if s_norm != o_norm:
        diffs = 0
        for a, b in zip(s_norm, o_norm):
            if a != b:
                diffs += 1
                if diffs <= 3:
                    problems.append(f"{name}: row diff\n  spark : {a}\n  oracle: {b}")
        extra = abs(len(s_norm) - len(o_norm))
        if diffs or extra:
            problems.append(f"{name}: {diffs} differing rows, {extra} extra")
    return problems
