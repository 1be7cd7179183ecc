"""Rule-count scaling probe: how does the columnar rule fan-out hold
up as the ruleset grows toward reference-production size?

The bench fixture set is 23 rules; real deployments of the reference
load thousands (its default `max-threads`/rule files assume so).  The
engine's plan is one boolean column per rule (`_c{i}` cheap predicate,
then a WHEN-gated match expr), so ruleset size grows the PROJECTION
WIDTH, not the row count — the thing to measure is Catalyst
analysis/codegen time and any whole-stage-codegen fallback, not data
throughput.

Each rule count runs in its own subprocess (fresh JVM — janino/JIT
state cannot leak between sizes).  Generated rules mimic a production
mix: ~10% fire against the corpus (real rulesets mostly don't fire),
shapes rotate over plain content / content+nocase / pcre / threshold /
after so the correlation stages see load too.

Usage:  python tools/bench_rulecount.py [--rows 200000] [--sizes 23,100,300]
        python tools/bench_rulecount.py --single <n_rules> --rows N  (internal)
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

# tokens that occur in the synthetic corpus (sagan_spark/data/pages.py
# templates) -> the ~10% of generated rules that actually fire
FIRING = [
    'content:"Failed password"; parse_src_ip: 1',
    'content:"connection from"',
    'content:"port"; nocase',
    'pcre:"/Failed password for \\w+/"',
    'content:"Failed password"; threshold: type limit, track by_src, count 3, seconds 120',
]


def gen_rules(n: int) -> str:
    lines = []
    for i in range(n):
        sid = 6_000_000 + i
        if i % 10 == 0:
            body = FIRING[(i // 10) % len(FIRING)]
        else:
            # unique non-firing literal per rule; shape rotates
            tok = f"zq{i:06x}tok"
            shape = i % 5
            if shape == 0:
                body = f'content:"{tok}"'
            elif shape == 1:
                body = f'content:"{tok.upper()}"; nocase'
            elif shape == 2:
                body = f'pcre:"/{tok}\\d+/"'
            elif shape == 3:
                body = (
                    f'content:"{tok}"; parse_src_ip: 1; '
                    "threshold: type suppress, track by_src, count 5, seconds 300"
                )
            else:
                body = (
                    f'content:"{tok}"; parse_src_ip: 1; '
                    "after: track by_src, count 5, seconds 300"
                )
        lines.append(
            f'alert any any any -> any any (msg:"gen {i}"; {body}; '
            f"classtype: misc-activity; sid:{sid}; rev:1;)"
        )
    return "\n".join(lines)


def run_single(n_rules: int, rows: int) -> None:
    from fixtures.vars import VARIABLES
    from sagan_spark.data.pages import write_pages
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import (
        assemble_alerts,
        eve_view,
        rule_metadata_df,
    )
    from sagan_spark.rules.parser import parse_rules
    from sagan_spark.session import build_spark

    pages_path = f"/tmp/sagan_spark_bench/pages_{rows}.parquet"
    if not Path(pages_path).exists():
        Path(pages_path).parent.mkdir(parents=True, exist_ok=True)
        write_pages(pages_path, n_rows=rows)

    spark = build_spark(app=f"rules{n_rules}", cores=32, driver_memory="32g")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    rules = parse_rules(gen_rules(n_rules), VARIABLES)
    t_parse = time.monotonic() - t0

    pages = spark.read.parquet(pages_path)
    pages.count()  # warm scan outside the timed window

    t1 = time.monotonic()
    engine = SaganSparkEngine(rules)
    frame = engine.frame_from_pages(pages)
    alerts = engine.run(frame).alerts()
    routed = eve_view(
        assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame)
    )
    t_plan = time.monotonic() - t1  # DataFrame graph construction (driver side)

    t2 = time.monotonic()
    n_routed = routed.count()  # analysis + codegen + execution
    t_exec = time.monotonic() - t2

    # steady-state second execution: per-process compile cost amortized
    t3 = time.monotonic()
    n2 = routed.count()
    t_steady = time.monotonic() - t3
    assert n2 == n_routed

    print(
        json.dumps(
            {
                "n_rules": n_rules,
                "rows": rows,
                "routed_rows": n_routed,
                "parse_sec": round(t_parse, 3),
                "plan_build_sec": round(t_plan, 3),
                "first_exec_sec": round(t_exec, 3),
                "steady_exec_sec": round(t_steady, 3),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--sizes", default="23,100,300")
    ap.add_argument("--single", type=int, default=0)
    args = ap.parse_args()

    if args.single:
        run_single(args.single, args.rows)
        return

    results = []
    for n in [int(s) for s in args.sizes.split(",")]:
        out = subprocess.run(
            [
                sys.executable,
                __file__,
                "--single",
                str(n),
                "--rows",
                str(args.rows),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)

    print(json.dumps({"metric": "rule-count scaling", "results": results}))


if __name__ == "__main__":
    main()
