"""Pin the JSON coercion seam (the r7 driver red).

``json_props_typed_extract`` went driver-red in r7 because the local fixtures
carried only plain-integer ``$.k`` payloads while the driver's regenerated
events contained non-integer-typed values — and Spark's ``from_json`` (strict)
disagrees with a naive coercive CAST oracle on exactly those shapes.

These tests make the divergence reproducible locally:

* an **adversarial events fixture** containing every payload shape the two
  engines could disagree on (quoted ints, floats, float-typed integers,
  booleans, overflow, arrays, null, missing key, malformed JSON, NULL props);
* per-shape pins of the exact Spark semantics for BOTH extraction tiers
  (``from_json`` strict; ``try_variant_get`` coercive) — so a Spark upgrade
  that shifts either coercion table fails loudly here;
* full query-vs-oracle runs of both declared queries over the adversarial
  fixture through the same compare as tools/verify_local.py — the check the
  driver's regenerated fixtures perform, now in CI.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# (payload, from_json-strict expectation, try_variant_get-coercive expectation)
PAYLOADS = [
    ('{"k": 12}', 12, 12),
    ('{"k": -5}', -5, -5),
    ('{"k": 9223372036854775807}', 9223372036854775807, 9223372036854775807),
    ('{"k": "12"}', None, 12),                  # quoted int: strict NULLs, variant casts
    ('{"k": " 12 "}', None, 12),                # variant's string cast trims
    ('{"k": "+12"}', None, 12),
    ('{"k": "012"}', None, 12),
    ('{"k": "3.7"}', None, None),               # non-integral string: both NULL
    ('{"k": "abc"}', None, None),
    ('{"k": "9223372036854775808"}', None, None),   # string overflow
    ('{"k": 3.7}', None, 3),                    # double: variant truncates toward zero
    ('{"k": -3.7}', None, -3),                  # toward zero, not floor(-3.7) = -4
    ('{"k": 2.5}', None, 2),                    # truncation, not banker's rounding
    ('{"k": 3.0}', None, 3),                    # float-TYPED integer is still not int-typed
    ('{"k": -0.5}', None, 0),
    ('{"k": 1e3}', None, 1000),
    ('{"k": 9.0e18}', None, 9000000000000000000),
    ('{"k": 9.3e18}', None, None),              # double beyond int64: both NULL
    ('{"k": -9.3e18}', None, None),
    ('{"k": 99999999999999999999}', None, None),    # decimal beyond int64
    ('{"k": 18446744073709551615}', None, None),    # uint64 band above int64 max
    ('{"k": true}', None, 1),                   # bool: strict NULLs, variant 1/0
    ('{"k": false}', None, 0),
    ('{"k": [1]}', None, None),
    # whitespace/control-char trim seam (ADVICE r8): Spark's string→bigint cast
    # trims codepoints <= U+0020 only — tab/newline/VT/US trim, NBSP (U+00A0)
    # and thin space (U+2009) do NOT; interior control chars kill the cast; a
    # LITERAL (unescaped) control char inside a JSON string is invalid JSON for
    # both try_parse_json and json_valid.
    ('{"k": "\\t12"}', None, 12),               # escaped tab, leading
    ('{"k": "12\\n"}', None, 12),               # escaped newline, trailing
    ('{"k": "\\r\\n 12 \\t"}', None, 12),       # mixed pad both sides
    ('{"k": "\\u000b12"}', None, 12),           # vertical tab <= 0x20
    ('{"k": "\\u001f12"}', None, 12),           # unit separator <= 0x20
    ('{"k": " 12"}', None, None),          # literal NBSP: NOT trimmed
    ('{"k": "\\u00a012"}', None, None),         # escaped NBSP: NOT trimmed
    ('{"k": "\\u200912"}', None, None),         # thin space: NOT trimmed
    ('{"k": "1\\t2"}', None, None),             # interior tab: cast fails
    ('{"k": "\t12"}', None, None),              # literal raw tab: invalid JSON
    ('{"k": null}', None, None),
    ('{"x": 1}', None, None),                   # key absent
    ('not json', None, None),                   # malformed: try_parse_json → NULL row
    ('', None, None),
    (None, None, None),
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    """events.parquet with one row per adversarial payload plus normal bulk rows,
    spread over several event_types so the group-by has real structure."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adversarial_sf")
    types = ["click", "view", "error"]
    rows = []
    for i, (props, _, _) in enumerate(PAYLOADS):
        rows.append((i, 1_700_000_000_000_000 + i * 60_000_000, i % 7,
                     types[i % 3], float(i), props))
    for i in range(len(PAYLOADS), len(PAYLOADS) + 40):  # plain-int background rows
        rows.append((i, 1_700_000_000_000_000 + i * 60_000_000, i % 7,
                     types[i % 3], float(i), '{"k": %d}' % (i * 3 - 50)))
    # Three values in ONE group summing to 23822014728487422455 (> 2^64),
    # chosen so DuckDB's direct HUGEINT→DOUBLE cast mis-rounds by exactly one
    # ulp (0x1.4a98cc2e5d9dcp+64 vs the correctly-rounded ...dd) — the seam
    # ADVICE r9 flagged; the oracle must route SUM(k) through VARCHAR.
    base = len(PAYLOADS) + 40
    for j, kv in enumerate([9223372036854775807, 9223372036854775807,
                            5375270654777870841]):
        i = base + j
        rows.append((i, 1_700_000_000_000_000 + i * 60_000_000, i % 7,
                     "hugesum", float(i), '{"k": %d}' % kv))
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_from_json_strict_per_shape(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(p,) for p, _, _ in PAYLOADS], "props string")
    got = [r.k for r in
           df.select(F.from_json("props", "k bigint")["k"].alias("k")).collect()]
    assert got == [e for _, e, _ in PAYLOADS]


def test_try_variant_get_coercion_per_shape(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(p,) for p, _, _ in PAYLOADS], "props string")
    got = [r.k for r in
           df.select(F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
                     .alias("k")).collect()]
    assert got == [e for _, _, e in PAYLOADS]


def test_duckdb_mirrors_match_spark_per_shape(adversarial_dir):
    """The two oracle CASE expressions reproduce Spark's per-shape tables exactly."""
    from alertas_spark.plans.semistructured import STRICT_K, VARIANT_K

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{adversarial_dir}/events.parquet'")
    rows = con.execute(
        f"SELECT props, {STRICT_K} AS s, {VARIANT_K} AS v FROM events "
        f"WHERE event_id < {len(PAYLOADS)} ORDER BY event_id").fetchall()
    for (props, strict_got, variant_got), (p, strict_exp, variant_exp) in zip(
            rows, PAYLOADS):
        assert strict_got == strict_exp, (props, strict_got, strict_exp)
        assert variant_got == variant_exp, (props, variant_got, variant_exp)


@pytest.mark.parametrize("name", ["json_props_typed_extract",
                                  "json_props_variant_buckets"])
def test_query_matches_oracle_on_adversarial_fixture(spark, adversarial_dir, name):
    """End-to-end: declared query vs its DuckDB oracle over the adversarial
    fixture, using verify_local's exact compare — the driver's check, locally."""
    from alertas_spark.registry import load_all
    from tools.verify_local import compare

    q = load_all()[name]
    sdf = q.builder(spark, adversarial_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{adversarial_dir}/events.parquet'")
    odf = con.execute(q.oracle).df()
    problems = [p for p in compare(name, sdf, odf) if not p.startswith("dtype note")]
    assert problems == [], problems
    assert len(sdf) > 0
