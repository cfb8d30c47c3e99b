"""Value-level parity: every alert builder vs its independent DuckDB oracle.

The Spark side runs the builder exactly as the framework would (pre-normalization
output); the DuckDB side re-derives the reference semantics from tests/duck_oracles.py
over the SAME fixture parquet.  Rows are compared order-insensitively, cell-exact,
including the sha1 alert keys — this pins the window/anti-join rewrites AND the key
serialization contract (SURVEY §7 risk register)."""

from __future__ import annotations

import pytest

from alertas_spark.framework import engine
from alertas_spark.testing import oracles as duck_oracles
from tools.verify_local import compare


@pytest.fixture(scope="module")
def duck(mprj_warehouse):
    con = duck_oracles.connect(mprj_warehouse)
    yield con
    con.close()


@pytest.mark.parametrize("sigla", sorted(duck_oracles.ORACLES))
def test_alert_matches_oracle(ctx, duck, sigla):
    spark_df = engine.registry()[sigla].builder(ctx)
    oracle_cols = duck.sql(duck_oracles.ORACLES[sigla]).columns
    got = spark_df.select(*oracle_cols).toPandas()
    want = duck.sql(duck_oracles.ORACLES[sigla]).df()
    problems = [p for p in compare(sigla, got, want)
                if not p.startswith("dtype note")]  # ns vs us timestamps are equal
    assert not problems, f"{sigla}: rows={len(got)} vs {len(want)}; {problems[:5]}"
    assert len(got) > 0, f"{sigla}: oracle comparison is vacuous (0 rows)"
