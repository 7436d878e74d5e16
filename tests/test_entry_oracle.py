"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf0.01 parquet, compare row count + schema + values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 4)
                if math.isclose(v, 0.0, abs_tol=1e-12):
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.fixture(scope="module")
def duck():
    return _duck(SF)


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    if name not in os_:
        # rows-only contract for non-SQL-expressible ops: runs, has a
        # stable schema, and both runs agree
        df1 = qs[name](spark, SF)
        rows1 = df1.collect()
        rows2 = qs[name](spark, SF).collect()
        assert sorted(map(str, rows1)) == sorted(map(str, rows2))
        return
    sdf = qs[name](spark, SF)
    cols = sorted(sdf.columns)
    srows = [r.asDict() for r in sdf.collect()]
    ores = duck.execute(os_[name]).fetch_arrow_table().to_pylist()
    ocols = sorted(ores[0].keys()) if ores else cols
    assert cols == ocols, f"{name}: column mismatch {cols} vs {ocols}"
    a = _norm(srows, cols)
    b = _norm(ores, cols)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    assert a == b, f"{name}: values differ\n spark: {a[:5]}\n duck : {b[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    # the driver gate requires a non-empty flagship result
    assert len(rows) > 0 and "doc_id" in df.columns and "score" in df.columns
