"""Per-entry wall-clock sweep over EVERY registry entry (r12 VERDICT
next #9: the scan audit flags plan shape only; this surfaces wall-clock
stragglers the plan audit can't see).

One warm-up + one timed warm run per entry via the noop sink, cache
cleared between entries (same isolation as bench.py). Writes a CSV
(name,sec,rows_estimated=no — just name,sec) sorted slowest-first.

Usage: python tools/time_all.py [sf_dir] [out_csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from movie_data_transformer_spark.registry import spark_queries
    from movie_data_transformer_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "TIMING_SWEEP.csv"
    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    rows: list[tuple[str, float]] = []
    for name, fn in qs.items():
        spark.catalog.clearCache()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rows.append((name, round(time.time() - t0, 3)))
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            print(f"ERR {name}: {str(exc)[:120]}", file=sys.stderr)
            rows.append((name, -1.0))
    rows.sort(key=lambda r: -r[1])
    with open(out, "w") as f:
        f.write("query,warm_sec\n")
        for name, sec in rows:
            f.write(f"{name},{sec}\n")
    print(f"wrote {out}: {len(rows)} entries, total "
          f"{sum(s for _, s in rows if s > 0):.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
