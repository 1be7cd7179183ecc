"""Two-parallelism scaling run (the BASELINE.json north-rule evidence).

The rule demands >=0.8 throughput scaling efficiency between N and 4N
executors.  No real cluster exists in this sandbox, so the sanctioned
stand-in is the same engine job at two local parallelism levels
(local[8] vs local[32]) over the SAME corpus:

    efficiency = (throughput_4N / throughput_N) / 4

Each level runs in its own subprocess (fresh JVM, no warm-cache
crosstalk); shuffle partitions scale with cores like executor count
would on a cluster.  Results go to stdout as JSON and are recorded in
BASELINE.md.

Usage:  python tools/bench_scaling.py [--rows 400000]
        python tools/bench_scaling.py --single <cores> --rows N   (internal)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_single(cores: int, rows: int) -> None:
    from fixtures.vars import VARIABLES
    from sagan_spark.data.pages import write_pages
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import assemble_alerts, eve_view, rule_metadata_df
    from sagan_spark.rules.parser import parse_rules
    from sagan_spark.session import build_spark

    pages_path = f"/tmp/sagan_spark_bench/pages_{rows}.parquet"
    if not Path(pages_path).exists():
        Path(pages_path).parent.mkdir(parents=True, exist_ok=True)
        write_pages(pages_path, n_rows=rows)

    spark = build_spark(app=f"scale{cores}", cores=cores, driver_memory="32g")
    spark.sparkContext.setLogLevel("ERROR")
    rules = parse_rules((REPO / "fixtures/ruleset.rules").read_text(), VARIABLES)
    pages = spark.read.parquet(pages_path)
    n_events = pages.count()  # warm page cache outside the timed window

    t0 = time.monotonic()
    engine = SaganSparkEngine(rules)
    frame = engine.frame_from_pages(pages)
    alerts = engine.run(frame).alerts()
    routed = eve_view(assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame))
    n_routed = routed.count()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "events": n_events,
                "routed_rows": n_routed,
                "sec": round(dt, 3),
                "events_per_sec": round(n_events / dt, 1),
                "routed_rows_per_sec": round(n_routed / dt, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--single", type=int, default=0)
    args = ap.parse_args()

    if args.single:
        run_single(args.single, args.rows)
        return

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--single", str(cores), "--rows", str(args.rows)],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)

    n, n4 = results[8], results[32]
    assert n["routed_rows"] == n4["routed_rows"], "parallelism changed the result set"
    eff = (n4["routed_rows_per_sec"] / n["routed_rows_per_sec"]) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency local[8] -> local[32]",
                "rows": args.rows,
                "n": n,
                "4n": n4,
                "speedup": round(n4["routed_rows_per_sec"] / n["routed_rows_per_sec"], 3),
                "efficiency": round(eff, 3),
                "routed_rows_equal": True,
            }
        )
    )


if __name__ == "__main__":
    main()
