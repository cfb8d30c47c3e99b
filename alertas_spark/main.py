"""CLI entry point — run the nightly alert batch.

≙ /root/reference/src/alertas/main.py:7-32 + alertas.sh: parse options, build the
session, run the registry, publish, write the types table.  Differences: schema names
bind to a warehouse directory (or any Spark catalog on a cluster), the clock is
injectable (``--as-of``), and the alert subset is selectable.

    python -m alertas_spark.main --warehouse /path/wh --as-of 2024-04-15
    python -m alertas_spark.main --warehouse /path/wh --alerts VADF,GATE,PRCR
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys
import time


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True,
                   help="root dir: tables at <warehouse>/<schema>/<table>.parquet")
    p.add_argument("--as-of", default=None,
                   help="logical 'today' (YYYY-MM-DD); defaults to the wall clock "
                        "like the reference")
    p.add_argument("--alerts", default=None,
                   help="comma-separated siglas (default: the 16 production alerts)")
    p.add_argument("--prescricao-limiar", type=int, default=90,
                   help="PRCR near-prescription threshold in days (≙ main.py:59)")
    p.add_argument("--abr1-all-months", action="store_true",
                   help="fire ABR1 every month (≙ the reference's dev-schema branch)")
    p.add_argument("--master", default=None, help="Spark master override")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from alertas_spark.framework import engine
    from alertas_spark.framework.context import AlertContext
    from alertas_spark.session import get_spark

    as_of = (dt.date.fromisoformat(args.as_of) if args.as_of else dt.date.today())
    spark = get_spark("alertas-batch", master=args.master)
    ctx = AlertContext(
        spark=spark, warehouse=args.warehouse, as_of=as_of,
        prescricao_limiar=args.prescricao_limiar,
        abr1_all_months=args.abr1_all_months,
    )
    siglas = tuple(args.alerts.split(",")) if args.alerts else engine.ACTIVE
    t0 = time.time()
    timings = engine.run_all(ctx, siglas=siglas)
    engine.generate_types_table(ctx)
    slowest = max(timings, key=timings.get) if timings else "n/a"
    print(f"alertas: {len(siglas)} alerts published in {time.time() - t0:.1f}s "
          f"(as_of={as_of}; slowest phase: {slowest} {timings.get(slowest, 0):.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
