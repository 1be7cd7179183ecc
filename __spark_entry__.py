"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2 (engine
primitives re-expressed over the driver's log-like `events` table and
`documents`/`embeddings` corpora) or one large-scale training-data op;
``oracle_sql()`` holds the ANSI-SQL equivalent DuckDB runs on the same
parquet.  Column names/aliases match pairwise; floats are rounded on
both sides; exact Sagan state-machine semantics (first-event-anchored
windows etc.) are pinned by tests/oracle.py in pytest — the SQL-gate
entries use the closed-form event-time formulations documented in
SURVEY.md §2.5/§2.9.

The gate builders themselves live in ``sagan_spark/contracts/`` (split
per family in r5 — queries_engine / queries_corpus / queries_web plus
the oracle builders); this file is the stable driver-facing surface:
``entry``, ``queries``, ``oracle_sql``.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
# belt: local-mode python workers inherit the driver env when the session
# is created after this import
sys.path.insert(0, str(_REPO))
_pp = os.environ.get("PYTHONPATH", "")
if str(_REPO) not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{_pp}" if _pp else str(_REPO)

from sagan_spark.contracts.common import (  # noqa: E402
    _events_frame,
    _ship_package,
)
from sagan_spark.contracts.oracles import oracle_sql  # noqa: E402,F401
from sagan_spark.contracts.registry import queries  # noqa: E402,F401

# ---------------------------------------------------------------------------
# flagship: the Sagan engine itself over the events table (sf0.001)
# ---------------------------------------------------------------------------

_FLAGSHIP_RULES = """\
alert any any any -> any any (msg:"error burst"; program: error; threshold: type suppress, track by_username, count 3, seconds 86400; classtype: misc-attack; sid:6000001; rev:1;)
alert any any any -> any any (msg:"purchase json k"; program: purchase; json_content:".k","7"; json_nocase; classtype: misc-activity; sid:6000002; rev:1;)
alert any any any -> any any (msg:"signup after"; program: signup; after: track by_username, count 2, seconds 604800; classtype: misc-activity; sid:6000003; rev:1;)
pass any any any -> any any (msg:"pass views"; program: view; sid:6000004; rev:1;)
alert any any any -> any any (msg:"catchall nonview"; content:!"never-in-data"; classtype: not-suspicious; sid:6000005; rev:1;)
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse -> match -> correlate -> route pipeline over
    /root/testdata/sf0.001 events with an embedded 5-rule set."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import assemble_alerts, eve_view, rule_metadata_df
    from sagan_spark.rules.parser import parse_rules

    rules = parse_rules(_FLAGSHIP_RULES)
    engine = SaganSparkEngine(rules)
    frame = _events_frame(spark, "/root/testdata/sf0.001")
    alerts = engine.run(frame).alerts()
    meta = rule_metadata_df(spark, rules)
    return eve_view(assemble_alerts(alerts, meta, events=frame))
