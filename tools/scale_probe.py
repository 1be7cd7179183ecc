"""Order-of-magnitude scale probe (VERDICT r4 next-round task #6):
run the five most expensive headline queries once at sf0.1 (5k docs)
and once at a synthesized sf1 (50k docs), recording wall time and
per-run shuffle read/write bytes, and append the table to
tools/scaling_results.json.  Pass = wall grows <= ~10x at 10x rows
(the shapes are log-linear) or the deviation is diagnosed in the
notes field.

sf1 synthesis (the driver's testdata is read-only and stops at
sf0.1): ten replicas of the sf0.1 documents table; replica 0 is the
original, replicas 1-9 shift doc_id by r*10^7 and deterministically
REORDER each document's words (sort by md5(word, position, replica)).
The word multiset per doc is preserved (bpe/token stats unchanged)
while every >=2-word shingle changes, so MinHash finds no cross-
replica near-dups and the near-dup structure is replicated per
replica — pair volume scales ~10x, the honest load shape.  Spark-side
generation, no driver loops.

Usage: python tools/scale_probe.py  [--skip-gen]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sagan_sf1"
PROBES = ["dedup_minhash_lsh", "dedup_duplicated_spans", "domain_pagerank",
          "decontam_hits", "bpe_train"]
UI_PORT = 4717


def gen_sf1(spark) -> None:
    from pyspark.sql import functions as F

    out = Path(SF1)
    if (out / "documents.parquet").exists():
        return
    out.mkdir(parents=True, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    reps = spark.range(10).select(F.col("id").cast("long").alias("_rep"))
    x = docs.crossJoin(reps)
    words = F.split(F.col("text"), " ")
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    words,
                    lambda w, i: F.struct(
                        F.md5(
                            F.concat_ws(
                                "|", w, i.cast("string"),
                                F.col("_rep").cast("string"),
                            )
                        ).alias("k"),
                        w.alias("w"),
                    ),
                )
            ),
            lambda s: s["w"],
        ),
        " ",
    )
    text = F.when(F.col("_rep") == 0, F.col("text")).otherwise(shuffled)
    (
        x.select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            text.alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF1}/documents.parquet")
    )


def _app_shuffle_totals(app_id: str) -> tuple[int, int]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
    stages = json.loads(urllib.request.urlopen(url, timeout=10).read())
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def main() -> None:
    from sagan_spark.session import build_spark

    import __spark_entry__ as E

    if "--skip-gen" not in sys.argv:
        spark = build_spark(app="scale_probe_gen", cores=32,
                            driver_memory="48g")
        spark.sparkContext.setLogLevel("ERROR")
        gen_sf1(spark)
        spark.stop()

    qs = E.queries()
    probe: dict[str, dict] = {}
    n01 = n1 = 0
    # one FRESH JVM per query: the heavy queries' intermediates (the
    # sf1 minhash pair set above all) otherwise leave GC pressure that
    # contaminates the next query's small leg.  Within a query the
    # sf0.1 leg runs once untimed first (codegen/JIT warmup — the
    # generated source is plan-shaped, so the sf1 leg reuses the
    # compiled stage from the warmed cache too).
    for name in PROBES:
        spark = build_spark(app=f"scale_probe_{name}", cores=32,
                            driver_memory="48g",
                            extra={"spark.ui.enabled": "true",
                                   "spark.ui.port": str(UI_PORT)})
        spark.sparkContext.setLogLevel("ERROR")
        app_id = spark.sparkContext.applicationId
        n01 = spark.read.parquet(f"{SF01}/documents.parquet").count()
        n1 = spark.read.parquet(f"{SF1}/documents.parquet").count()
        fn = qs[name]
        fn(spark, SF01).count()  # warmup, untimed
        spark.catalog.clearCache()
        row: dict[str, dict] = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            rd0, wr0 = _app_shuffle_totals(app_id)
            t0 = time.monotonic()
            n_out = fn(spark, sf_dir).count()
            wall = time.monotonic() - t0
            spark.catalog.clearCache()
            rd1, wr1 = _app_shuffle_totals(app_id)
            row[label] = {
                "wall_sec": round(wall, 2),
                "rows_out": n_out,
                "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
                "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
            }
            print(name, label, row[label], flush=True)
        row["wall_ratio_10x_rows"] = round(
            row["sf1"]["wall_sec"] / max(row["sf0.1"]["wall_sec"], 1e-9), 2
        )
        probe[name] = row
        spark.stop()

    path = Path(__file__).parent / "scaling_results.json"
    snap = json.loads(path.read_text())
    snap["sf_probe_r5"] = {
        "method": (
            "5 heaviest headline queries once at sf0.1 (5k docs) and once at "
            "a synthesized sf1 (50k docs: 10 replicas, word-order perturbed "
            "so near-dup structure replicates per replica); local[32], fresh "
            "cache per run; shuffle bytes from the stage REST API deltas"
        ),
        "docs_sf0.1": n01,
        "docs_sf1": n1,
        "queries": probe,
    }
    path.write_text(json.dumps(snap, indent=1) + "\n")
    print(json.dumps(snap["sf_probe_r5"], indent=1))


if __name__ == "__main__":
    main()
