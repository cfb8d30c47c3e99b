"""Fixture-realism sweep: every oracle-bearing query over documents / events /
embeddings, run against a fixture augmented with the value-type / NULL /
empty-payload edge cases the two engines could disagree on.

Motivation (r7 postmortem): ``json_props_typed_extract`` shipped green against
local fixtures whose ``$.k`` was 100% integer-typed, then went driver-red when
the regenerated fixtures carried non-integer payloads.  The generalized lesson:
any query whose semantics touch a value-type seam (JSON coercion, NaN/±0.0
ordering, NULL propagation, empty strings) can pass a bland fixture and fail an
adversarial one.  This file IS the adversarial one, wired through the same
exact compare as tools/verify_local.py.

Adversarial rows are APPENDED to the sf0.001 tables (ids far above the base
range), so base-row behavior is unchanged and failures implicate the new
shapes.  ASCII-only text is kept deliberately — the byte-vs-char oracle
equivalence is a documented fixture contract pinned by
test_multimodal.py::test_fixture_text_is_ascii.
"""

from __future__ import annotations

import inspect
import math
import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")

_ADV_DOCS = [
    # (text, lang, source) — doc_id assigned sequentially; n_chars = len(text)
    ("", "en", "web"),                       # empty document
    ("   ", "en", "web"),                    # whitespace-only
    ("\n\n\n", "en", "books"),               # newlines only
    ("!!! ??? ... ;;;", "en", "web"),        # punctuation-only
    ("a", "en", "wiki"),                     # single char
    ("12345 67890 12345", "en", "web"),      # digits only
    ("spam " * 500, "en", "web"),            # one token repeated (rep. score)
    ("the the the the the and and and", "en", "web"),   # stopword-saturated
    ("word\ttab\tseparated\ttokens", "de", "web"),      # tabs
    ("Mixed CASE Text With Some Longer Tokens Here", None, "web"),  # NULL lang
    ("another plain document body", "en", None),        # NULL source
]

_ADV_EVENTS = [
    # (event_type, value, props) — mixed JSON payload shapes + numeric edges
    ("click", 1.5, '{"k": "12"}'),
    ("view", 2.5, '{"k": 3.7}'),
    ("purchase", -1.0, '{"k": true}'),
    ("click", 0.0, '{"k": [1]}'),
    ("error", -0.0, '{"k": null}'),
    ("view", float("nan"), '{"k": 7}'),
    ("signup", float("inf"), 'not json'),
    ("error", float("-inf"), '{"k": 2}'),
    # large-but-in-contract magnitudes (the decimal contract documents its
    # accumulation domain; 1e308 would overflow ANY decimal on both engines)
    ("click", 1e15, '{"x": 1}'),
    ("view", -1e15, '{"k": -3}'),
    ("view", 3.25, None),
    (None, 4.5, '{"k": 9}'),                 # NULL event_type
    ("purchase", None, '{"k": "abc"}'),      # NULL value
]


def _adv_embedding(kind: str, dim: int) -> list[float]:
    base = [(i % 7) * 0.125 - 0.375 for i in range(dim)]
    if kind == "zero":
        return [0.0] * dim                   # zero norm: cosine undefined
    if kind == "negzero":
        return [-0.0] * dim
    if kind == "nan":
        v = list(base)
        v[3] = float("nan")
        return v
    if kind == "tiny":
        return [1e-30] * dim                 # denormal-adjacent norm
    return base


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("adversarial_fixture"))
    for t in TABLES:
        if t not in ("documents", "events", "embeddings"):
            os.symlink(os.path.join(SF, f"{t}.parquet"),
                       os.path.join(out, f"{t}.parquet"))

    base_docs = pq.read_table(os.path.join(SF, "documents.parquet"))
    next_id = 10_000_000
    add = pa.table({
        "doc_id": pa.array(range(next_id, next_id + len(_ADV_DOCS)), pa.int64()),
        "text": pa.array([d[0] for d in _ADV_DOCS], pa.string()),
        "lang": pa.array([d[1] for d in _ADV_DOCS], pa.string()),
        "source": pa.array([d[2] for d in _ADV_DOCS], pa.string()),
        "n_chars": pa.array([len(d[0]) for d in _ADV_DOCS], pa.int64()),
    })
    pq.write_table(pa.concat_tables([base_docs, add.cast(base_docs.schema)]),
                   os.path.join(out, "documents.parquet"))

    base_ev = pq.read_table(os.path.join(SF, "events.parquet"))
    ts_type = base_ev.schema.field("ts").type
    t0 = 1_704_067_200_000_000  # 2024-01-01 in µs
    add = pa.table({
        "event_id": pa.array(range(next_id, next_id + len(_ADV_EVENTS)),
                             pa.int64()),
        "ts": pa.array([t0 + i * 90_000_000 for i in range(len(_ADV_EVENTS))],
                       pa.timestamp("us")).cast(ts_type),
        "user_id": pa.array([9_000_000 + i % 3 for i in
                             range(len(_ADV_EVENTS))], pa.int64()),
        "event_type": pa.array([e[0] for e in _ADV_EVENTS], pa.string()),
        "value": pa.array([e[1] for e in _ADV_EVENTS], pa.float64()),
        "props": pa.array([e[2] for e in _ADV_EVENTS], pa.string()),
    })
    pq.write_table(pa.concat_tables([base_ev, add.cast(base_ev.schema)]),
                   os.path.join(out, "events.parquet"))

    base_emb = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    dim = len(base_emb.column("embedding")[0])
    kinds = ["zero", "negzero", "nan", "tiny", "plain"]
    add = pa.table({
        "vec_id": pa.array(range(next_id, next_id + len(kinds)), pa.int64()),
        "embedding": pa.array([_adv_embedding(k, dim) for k in kinds],
                              pa.list_(pa.float32())),
        "label": pa.array([None, 1, 2, 3, None], pa.int32()),
    })
    pq.write_table(pa.concat_tables([base_emb, add.cast(base_emb.schema)]),
                   os.path.join(out, "embeddings.parquet"))
    return out


def _affected() -> list[str]:
    """Every oracle-bearing declared query whose builder module loads one of
    the augmented tables (module-level match deliberately over-includes —
    extra coverage, same fixture)."""
    from alertas_spark.registry import load_all

    names = []
    for name, q in load_all().items():
        if q.oracle is None:
            continue
        try:
            mod_src = inspect.getsource(inspect.getmodule(q.builder))
        except Exception:
            continue
        if any(f'"{t}"' in mod_src for t in ("documents", "events",
                                             "embeddings")):
            names.append(name)
    return sorted(names)


@pytest.mark.parametrize("name", _affected())
def test_query_matches_oracle_on_adversarial_fixture(spark, adv_dir, name):
    from alertas_spark.operators import memo
    from alertas_spark.registry import load_all
    from tools.verify_local import compare

    memo.clear()
    q = load_all()[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{adv_dir}/{t}.parquet'")
    sdf = q.builder(spark, adv_dir).toPandas()
    odf = con.execute(q.oracle).df()
    problems = [p for p in compare(name, sdf, odf)
                if not p.startswith("dtype note")]
    assert problems == [], problems
