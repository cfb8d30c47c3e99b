"""Guard the driver's 50-query correctness window composition.

The driver harness oracle-checks the FIRST 50 registry entries.  These tests pin
the invariant that the window holds the product surface — every alert, every
streaming query, every extension operator that is not an explicitly-demoted
redundant sibling — so a future module addition can't silently push a unique
capability out of driver coverage.
"""

from __future__ import annotations

WINDOW = 50


def _names():
    from alertas_spark.registry import load_all

    return list(load_all())


def test_all_alerts_and_streaming_in_window():
    from alertas_spark.registry import REGISTRY

    names = _names()
    window = set(names[:WINDOW])
    alerts = [n for n in names if n.startswith("alerta_")]
    streaming = [n for n in names
                 if n.startswith("streaming_") and not REGISTRY[n].late]
    assert len(alerts) == 20
    assert set(alerts) <= window
    assert set(streaming) <= window


def test_non_late_operator_queries_in_window():
    from alertas_spark.registry import REGISTRY, load_all

    names = list(load_all())
    window = set(names[:WINDOW])
    # every non-late query from an operators/streaming/alert module must be inside
    micros = {n for n, q in REGISTRY.items()
              if q.builder.__module__.startswith("alertas_spark.plans")
              and not n.startswith("alerta_")}
    out_of_window = [n for n in names[WINDOW:]
                     if n not in micros and not REGISTRY[n].late]
    assert out_of_window == [], (
        f"unique operator queries pushed past the driver window: {out_of_window}")


def test_late_queries_all_carry_oracles_and_reasons():
    from alertas_spark.registry import REGISTRY, load_all

    load_all()
    late = [n for n, q in REGISTRY.items() if q.late]
    # late demotion is only for redundant-coverage siblings; they must still be
    # oracle-checked locally (no silent weakening to rows-only)
    assert all(REGISTRY[n].oracle for n in late), late
