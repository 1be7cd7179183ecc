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
"""

from __future__ import annotations

import os
import sys
import zipfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
# belt: local-mode python workers inherit the driver env when the session
# is created after this import
sys.path.insert(0, str(_REPO))
_pp = os.environ.get("PYTHONPATH", "")
if str(_REPO) not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{_pp}" if _pp else str(_REPO)


def _ship_package(spark: SparkSession) -> None:
    """braces: ship sagan_spark to python workers via addPyFile so pandas
    UDFs resolve imports even when the harness built the session before
    importing this module (addPyFile works on a live session)."""
    if getattr(_ship_package, "_done", None) is spark:
        return
    zpath = "/tmp/sagan_spark_pkg.zip"
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for sub in ("sagan_spark", "fixtures"):
                for p in (_REPO / sub).rglob("*.py"):
                    z.write(p, p.relative_to(_REPO))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added in this context
    _ship_package._done = spark


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


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


def _events_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the events table to the engine's canonical frame:
    event_type≙program, user_id≙host/username source, props≙message."""
    ev = _ev(spark, sf_dir)
    return ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        F.col("props").alias("message"),
    )


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


# ---------------------------------------------------------------------------
# engine-operator queries (SURVEY §2) over the driver tables
# ---------------------------------------------------------------------------


def q_s5_pipe_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: '|'-delimited frame decode with per-field defaulting
    (reference src/input-pipe.c:41-347)."""
    ev = _ev(spark, sf_dir)
    line = F.concat_ws(
        "|",
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.date_format("ts", "yyyy-MM-dd"),
        F.col("props"),
    )
    parts = F.split(line, r"\|")
    return (
        ev.select(
            F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("unknown")).alias("program"),
            F.try_element_at(parts, F.lit(3)).alias("evt_date"),
        )
        .groupBy("program", "evt_date")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f1_program_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: glob program prefilter (engine.c:492-509; Wildcard util.c:970)."""
    from sagan_spark.functions.textmatch import program_predicate

    ev = _ev(spark, sf_dir)
    return (
        ev.filter(program_predicate(F.col("event_type"), ["p*", "s?gnup"]))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f2_isin_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: '|'-alternative exact match (engine.c:511-581)."""
    from sagan_spark.functions.textmatch import isin_predicate

    ev = _ev(spark, sf_dir)
    return (
        ev.filter(isin_predicate(F.col("event_type"), ["error", "signup"]))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


def q_f2_syslog_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 (complete): syslog_priority prefilter compiled through the
    real engine path (reference src/processors/engine.c:565-581,
    option parse src/rules.c:2706)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    ev = _ev(spark, sf_dir)
    frame = ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        F.when(F.col("value") > 150, "crit")
        .when(F.col("value") > 50, "warning")
        .otherwise("info")
        .alias("priority"),
        F.col("props").alias("message"),
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"pri gate"; '
        'syslog_priority: crit|warning; content:"{"; sid:7300001; rev:1;)'
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    return (
        alerts.join(frame.select("event_key", "program"), "event_key")
        .groupBy("program")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f3_content_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: content with offset/depth slicing + negation, exact C
    arithmetic (reference src/content.c:42-179)."""
    from sagan_spark.functions.textmatch import content_predicate
    from sagan_spark.rules.ir import ContentSpec

    docs = _docs(spark, sf_dir)
    specs = [
        ContentSpec("filter", offset=7, depth=60),
        ContentSpec("slow", negated=True),
    ]
    return (
        docs.filter(content_predicate(F.col("text"), specs))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f4_pcre(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: pcre match anywhere (reference src/pcre-s.c:39-68)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.filter(F.col("text").rlike("(?i)(fast|slow) (query|scan)"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f5_meta_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: meta_content OR-list within container, AND across
    (reference src/meta-content.c:51-224)."""
    from sagan_spark.functions.textmatch import meta_content_predicate
    from sagan_spark.rules.ir import MetaContentSpec

    docs = _docs(spark, sf_dir)
    specs = [
        MetaContentSpec(literals=["merge sort", "hash join", "table scan"]),
        MetaContentSpec(literals=["slow"], negated=True),
    ]
    return (
        docs.filter(meta_content_predicate(F.col("text"), specs))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f6_json_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/P2: JSON key lookup + value compare (reference
    src/json-content.c:47-172, src/parsers/json.c:136-151)."""
    ev = _ev(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select(F.col("event_type"), k.alias("k"))
        .filter(F.col("k") >= 90)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").cast("long").alias("sum_k"))
    )


def q_f11_alert_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: day-of-week + HHMM window gate (reference src/aetas.c:48-143).
    dow computed as (epoch_days+4) % 7 (0=Sunday) so the formula is
    dialect-portable."""
    ev = _ev(spark, sf_dir)
    epoch = F.unix_timestamp("ts")
    dow = ((epoch / 86400).cast("long") + 4) % 7
    hhmm = F.hour("ts") * 100 + F.minute("ts")
    return (
        ev.filter(dow.isin(1, 2, 3, 4, 5) & (hhmm >= 800) & (hhmm <= 1700))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_p3_parse_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: positional IP/port extraction from log text (reference
    src/parsers/ip.c:88-958; full token zoo pinned in pytest)."""
    ev = _ev(spark, sf_dir)
    msg = F.format_string(
        "login from 10.%d.%d.%d:%d accepted",
        (F.col("user_id") % 200).cast("int"),
        (F.col("event_id") % 250).cast("int"),
        ((F.col("event_id") * 7) % 250).cast("int"),
        ((F.col("event_id") * 131) % 60000 + 1024).cast("int"),
    )
    ip = F.regexp_extract(msg, r"(\d+\.\d+\.\d+\.\d+):(\d+)", 1)
    port = F.regexp_extract(msg, r"(\d+\.\d+\.\d+\.\d+):(\d+)", 2).cast("long")
    return (
        ev.select(F.col("event_id"), ip.alias("src_ip"), port.alias("src_port"))
        .filter(F.col("src_port") > 50000)
    )


def q_p6_grok_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: grok/liblognorm-style named-group extraction, vectorized
    (reference src/liblognormalize.c:105-260)."""
    _ship_package(spark)
    from sagan_spark.functions.grok import grok_extract

    ev = _ev(spark, sf_dir)
    msg = F.format_string(
        "login from 10.%d.%d.%d port %d",
        (F.col("user_id") % 200).cast("int"),
        (F.col("event_id") % 250).cast("int"),
        ((F.col("event_id") * 7) % 250).cast("int"),
        ((F.col("event_id") * 131) % 60000 + 1024).cast("int"),
    )
    df = ev.select(F.col("event_id"), msg.alias("text"))
    out = grok_extract(df, "text", ["login from %{IPV4:src_ip} port %{INT:src_port}"])
    return out.select(
        "event_id",
        F.col("grok_src_ip").alias("src_ip"),
        F.col("grok_src_port").cast("long").alias("src_port"),
    ).filter(F.col("src_port") > 50000)


def q_p4_parse_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: first md5-shaped hex token (reference src/parsers/hash.c:41-153)."""
    docs = _docs(spark, sf_dir)
    msg = F.concat(F.lit("object "), F.md5(F.col("text")), F.lit(" stored"))
    return docs.select(
        F.col("doc_id"),
        F.regexp_extract(msg, "([0-9a-f]{32})", 1).alias("md5"),
    )


def q_j1_cidr_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: blacklist CIDR membership as a broadcast range join
    (reference src/processors/blacklist.c:70-230, probe engine.c:1147)."""
    ev = _ev(spark, sf_dir)
    # deterministic synthetic ip int: 10.0.0.0/8 space
    ip_num = F.lit(167772160) + (F.col("user_id") * 65536 + F.col("event_id") % 65536)
    ranges = spark.createDataFrame(
        [
            (167772160 + 0 * 65536, 167772160 + 3 * 65536 - 1, "bad-block-a"),
            (167772160 + 10 * 65536, 167772160 + 12 * 65536 - 1, "bad-block-b"),
        ],
        "lo long, hi long, label string",
    )
    tagged = ev.select(F.col("event_id"), ip_num.alias("ip_num")).join(
        F.broadcast(ranges),
        (F.col("ip_num") >= F.col("lo")) & (F.col("ip_num") <= F.col("hi")),
    )
    return tagged.groupBy("label").agg(F.count(F.lit(1)).alias("n"))


def q_j7_classification_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: classtype -> priority broadcast lookup at alert assembly
    (reference src/classifications.c, Classtype_Lookup)."""
    ev = _ev(spark, sf_dir)
    cls = spark.createDataFrame(
        [
            ("error", "system-error", 1),
            ("purchase", "money-move", 2),
            ("signup", "identity-new", 2),
            ("click", "activity", 3),
            ("view", "activity", 3),
        ],
        "event_type string, classtype string, severity int",
    )
    return (
        ev.join(F.broadcast(cls), "event_type", "left")
        .groupBy("classtype", "severity")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_a1_threshold_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: threshold type limit — at most N alerts per key per window;
    event-time tumbling form (SURVEY §2.5; exact first-event-anchored
    form pinned in pytest vs tests/oracle.py)."""
    ev = _ev(spark, sf_dir)
    win = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("user_id", win).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_allowed"))
    )


def q_a2_threshold_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: threshold type suppress — gap-based sessionization (utime
    slides every event, reference src/threshold.c:126-146), first N per
    session alert."""
    ev = _ev(spark, sf_dir).filter(F.col("event_type") == "error")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(wo)
    new_sess = F.when(gap.isNull() | (gap > 86400), 1).otherwise(0)
    sess = F.sum(new_sess).over(wo.rowsBetween(Window.unboundedPreceding, 0))
    df = ev.withColumn("sess", sess)
    ws = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    return (
        df.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.max("sess").cast("long").alias("n_sessions"),
        )
    )


def q_a3_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: after — suppress until count exceeds N within the window
    (reference src/after.c:51-229): running count per session > N."""
    ev = _ev(spark, sf_dir).filter(F.col("event_type") == "click")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(wo)
    new_sess = F.when(gap.isNull() | (gap > 86400), 1).otherwise(0)
    sess = F.sum(new_sess).over(wo.rowsBetween(Window.unboundedPreceding, 0))
    df = ev.withColumn("sess", sess)
    ws = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    run = F.count(F.lit(1)).over(ws.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("run", run)
        .filter(F.col("run") > 3)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_after_alerts"))
    )


def q_a4_xbit_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5: xbit set -> isset as a time-range self-join: 'error' sets
    the bit per user, a later 'purchase' within 1h sees it set
    (reference src/xbit-mmap.c:60-264)."""
    ev = _ev(spark, sf_dir)
    sets = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"), F.col("ts").alias("set_ts")
    )
    checks = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id"), F.col("ts").alias("chk_ts")
    )
    hit = (
        checks.join(sets, "user_id")
        .filter(
            (F.col("set_ts") < F.col("chk_ts"))
            & (F.unix_timestamp("chk_ts") - F.unix_timestamp("set_ts") <= 3600)
        )
        .select("user_id", "event_id")
        .distinct()
    )
    return hit.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_flagged"))


def q_a9_track_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: per-source last-seen tracking (reference
    src/processors/track-clients.c)."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_a10_client_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: per-client counters (reference src/processors/client-stats.c)."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count_distinct("event_type").alias("n_types"),
    )


def q_a9_client_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (complete): per-source liveness transitions — DOWN at
    last_seen+timeout when a gap exceeds the timeout (or at the data
    horizon), UP at the first event after such a gap (reference
    src/processors/track-clients.c:232-290, event-time form)."""
    _ship_package(spark)
    from sagan_spark.pipeline.clients import track_client_transitions

    frame = _events_frame(spark, sf_dir)
    tr = track_client_transitions(frame, timeout_minutes=1440)
    return tr.groupBy("host", "change").agg(
        F.count(F.lit(1)).alias("n"),
        F.date_format(F.max("at_ts"), "yyyy-MM-dd HH:mm:ss").alias("latest_at"),
    )


def q_a10_client_stats_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (complete): per-client counters incl. byte totals and
    first/last seen (reference src/processors/client-stats.c)."""
    _ship_package(spark)
    from sagan_spark.pipeline.clients import client_stats

    frame = _events_frame(spark, sf_dir)
    st = client_stats(frame)
    return st.select(
        "host",
        "n_events",
        "bytes_total",
        F.date_format("first_seen", "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
    )


def q_k3_eve_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3/K8: EVE alert assembly — flow_id bit layout
    (reference FlowGetId src/util.c:1316-1320) + severity join."""
    ev = _ev(spark, sf_dir).filter(F.col("event_type") == "error")
    ts = F.col("ts").cast("timestamp")
    sec = F.unix_timestamp(ts)
    usec = F.unix_micros(ts) % 1_000_000
    flow_id = (sec % 65536) * 65536 + (usec % 65536)
    return ev.select(
        F.col("event_id"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        flow_id.alias("flow_id"),
        F.lit("alert").alias("event_type"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("src_host"),
        F.lit(1).alias("alert_gid"),
        F.lit("system-error").alias("alert_category"),
    )


def q_k7_sink_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: rule-classified fan-out — per-sink routed counts
    (reference Output() src/output.c:63-149)."""
    ev = _ev(spark, sf_dir)
    eve = ev.filter(F.col("event_type").isin("error", "purchase")).select(
        F.lit("eve").alias("sink"), F.col("event_id")
    )
    fast = ev.filter(F.col("event_type") == "error").select(
        F.lit("fast").alias("sink"), F.col("event_id")
    )
    syslog = ev.filter(F.col("value") > 150).select(
        F.lit("syslog").alias("sink"), F.col("event_id")
    )
    return (
        eve.unionByName(fast)
        .unionByName(syslog)
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n_routed"))
    )


def q_f10_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: rule-header nets/ports gate — positive CIDR groups OR,
    negated AND NOT, port range (reference src/flow.c:48-504)."""
    ev = _ev(spark, sf_dir)
    ip = F.lit(167772160) + (F.col("user_id") * 65536 + F.col("event_id") % 65536)
    port = (F.col("event_id") * 7) % 65536
    pos = ip.between(167772160, 167772160 + 40 * 65536 - 1) | ip.between(
        167772160 + 100 * 65536, 167772160 + 120 * 65536 - 1
    )
    neg = ip.between(167772160 + 10 * 65536, 167772160 + 12 * 65536 - 1)
    return (
        ev.filter(pos & ~neg & port.between(1, 1024))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_f15_pass_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: pass-rule short circuit — a pass rule at a smaller ruleset
    position mutes later alert rules for that event
    (reference src/processors/engine.c:1448-1453)."""
    ev = _ev(spark, sf_dir)
    pass_min = F.when(F.col("event_type") == "view", F.lit(0))
    hits = F.array(
        F.struct(F.lit(1).alias("pos"), (F.col("value") > 100).alias("match")),
        F.struct(F.lit(2).alias("pos"), (F.col("event_type") == "error").alias("match")),
    )
    return (
        ev.withColumn("_pm", pass_min)
        .select(F.explode(F.filter(hits, lambda s: s.getField("match"))).alias("a"), "_pm")
        .filter(F.col("_pm").isNull() | (F.col("a.pos") < F.col("_pm")))
        .groupBy(F.col("a.pos").alias("rule_pos"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_p1_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: recursive JSON flatten to dotted keys, Arrow-batched
    (reference src/parsers/json.c:40-134)."""
    _ship_package(spark)
    from sagan_spark.functions.udfs import json_flatten_udf

    ev = _ev(spark, sf_dir)
    flat = ev.select(F.explode(json_flatten_udf(F.col("props"))).alias("key", "val"))
    return flat.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("long")).cast("long").alias("sum_val"),
    )


def q_p9_append_program(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: match against 'message | program'
    (reference src/processors/engine.c:593-627)."""
    ev = _ev(spark, sf_dir)
    joined = F.concat(F.col("props"), F.lit(" | "), F.col("event_type"))
    return (
        ev.filter(joined.contains("error") | joined.contains('"k": 7'))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_s6_json_input_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: JSON input mapping, first-match-wins per field
    (reference src/input-json.c:103-240)."""
    ev = _ev(spark, sf_dir)
    val = F.coalesce(
        F.get_json_object(F.col("props"), "$.missing"),
        F.get_json_object(F.col("props"), "$.k"),
        F.lit("0"),
    ).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(val).cast("long").alias("sum_mapped")
    )


def q_a6_flexbit_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: flexbit 'count' comparator — windowed per-key counter with
    gt threshold (reference Flexbit_Count_MMAP src/flexbit-mmap.c:851)."""
    ev = _ev(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    per = ev.groupBy("user_id", day.alias("day")).agg(F.count(F.lit(1)).alias("c"))
    return (
        per.filter(F.col("c") > 3)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days_over"),
            F.sum("c").cast("long").alias("events_in_over"),
        )
    )


def q_j2_intel_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: Zeek intel exact-set membership as a broadcast semi-join
    (reference src/processors/zeek-intel.c:507-800)."""
    ev = _ev(spark, sf_dir)
    intel = spark.createDataFrame([(7,), (11,), (23,), (42,), (99,)], "user_id long")
    return (
        ev.join(F.broadcast(intel), "user_id", "leftsemi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_j4_geoip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/F12: ip -> country via broadcast range join (mmdb analog,
    reference src/geoip.c:93+)."""
    ev = _ev(spark, sf_dir)
    ip = F.lit(167772160) + (F.col("user_id") * 65536 + F.col("event_id") % 65536)
    geo = spark.createDataFrame(
        [
            (167772160, 167772160 + 50 * 65536 - 1, "DE"),
            (167772160 + 50 * 65536, 167772160 + 100 * 65536 - 1, "FR"),
            (167772160 + 100 * 65536, 167772160 + 150 * 65536 - 1, "US"),
        ],
        "lo long, hi long, cc string",
    )
    tagged = ev.select(ip.alias("ip_num")).join(
        F.broadcast(geo),
        (F.col("ip_num") >= F.col("lo")) & (F.col("ip_num") <= F.col("hi")),
        "left",
    )
    return tagged.groupBy(F.coalesce(F.col("cc"), F.lit("--")).alias("cc")).agg(
        F.count(F.lit(1)).alias("n")
    )


def q_j5_proto_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: protocol-map keyword probe, first keyword in map order wins
    (reference src/parsers/proto.c:51-107)."""
    docs = _docs(spark, sf_dir)
    proto = (
        F.when(F.col("text").contains("fast"), 6)
        .when(F.col("text").contains("slow"), 17)
        .otherwise(0)
    )
    return docs.groupBy(proto.alias("proto")).agg(F.count(F.lit(1)).alias("n"))


def q_f14_ignore_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: ignore-list pre-drop — any listed substring drops the line
    before the engine (reference src/ignore.c:31-50)."""
    docs = _docs(spark, sf_dir)
    drop = F.col("text").contains("slow") | F.col("text").contains("deprecated")
    return docs.filter(~drop).groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


def q_a11_lineage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: per-partition lineage counters rolled up to run totals
    (reference _SaganCounters src/sagan.h:178-332, Statistics()
    src/stats.c:54-218)."""
    _ship_package(spark)
    from sagan_spark.pipeline.metrics import partition_lineage

    frame = _events_frame(spark, sf_dir)
    lineage = partition_lineage(frame, run_id="contract", ruleset_version="r1")
    return lineage.agg(
        F.sum("rows_in").cast("long").alias("rows_in"),
        F.sum("bytes_in").cast("long").alias("bytes_in"),
        F.max("max_bytes_length").cast("long").alias("max_len"),
        F.sum("rows_null_message").cast("long").alias("n_null"),
    )


def q_j3_bluedot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: bluedot IP-reputation gate through the real engine path —
    the live HTTP cache becomes a driver-side category-filtered
    snapshot probed as a literal set (reference option parse
    src/rules.c:3742-3965, engine probe src/processors/engine.c:1176-1289)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.compiler import EngineConfig
    from sagan_spark.rules.parser import parse_rules

    ev = _ev(spark, sf_dir)
    msg = F.format_string(
        "conn from 10.%d.0.1 port 22", (F.col("user_id") % 100).cast("int")
    )
    frame = ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        msg.alias("message"),
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"bd hit"; content:"conn from"; '
        "parse_src_ip: 1; bluedot: type ip_reputation, track by_src, none, "
        "Malicious&Tor; classtype: misc-attack; sid:7500001; rev:1;)"
    )
    cfg = EngineConfig(
        bluedot_intel={
            "ip_reputation": {
                "10.7.0.1": "Malicious",
                "10.23.0.1": "Tor",
                "10.55.0.1": "Proxy",  # category not in the rule -> no alert
            }
        }
    )
    alerts = SaganSparkEngine(rules, cfg).run(frame).alerts()
    return alerts.groupBy("src_ip").agg(F.count(F.lit(1)).cast("long").alias("n"))


def q_a1_threshold_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3 through the REAL engine path: rules with ``threshold: type
    limit`` and ``after`` driven through SaganSparkEngine.run() — the
    anchored/sliding state machines in pipeline/correlate.py — checked
    against a DuckDB recursive-CTE oracle that replays the reference
    machines row by row (threshold.c:126-150, after.c:51-229).  Closes
    the r2 blind spot where the a1/a2/a3 gates verified a closed-form
    window twin instead of the engine (VERDICT r2, What's wrong #3)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    ev = _ev(spark, sf_dir)
    msg = F.format_string(
        "corr probe from 10.%d.%d.1 seq",
        (F.col("user_id") % 250).cast("int"),
        (F.floor(F.col("user_id") / 250) % 250).cast("int"),
    )
    frame = ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        msg.alias("message"),
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"thr limit"; content:"corr probe"; '
        "parse_src_ip: 1; threshold: type limit, track by_src, count 3, "
        "seconds 172800; classtype: misc-attack; sid:7600001; rev:1;)\n"
        'alert any any any -> any any (msg:"after gate"; content:"corr probe"; '
        "parse_src_ip: 1; after: track by_src, count 3, seconds 172800; "
        "classtype: misc-attack; sid:7600002; rev:1;)"
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    return alerts.groupBy("sid", "src_ip").agg(
        F.count(F.lit(1)).cast("long").alias("n_alerts")
    )


def q_a4_chain_after_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """after ON a CHAIN rule through the REAL engine path: sid 7610002
    checks bitA (set by 'view' events), carries ``after: count 2``, and
    sets bitB — its counters run INSIDE the component walk on
    condition-passing events only, and one machine verdict gates both
    the alert and the gated set (reference engine.c:1370-1389 counters
    inside routing, :1402-1427 set+alert only when the gates clear).
    sid 7610003 observes bitB, so a suppressed set that wrongly fired
    would surface as extra s3 alerts.  Oracle: window pass-filter +
    recursive-CTE replay of after.c over the passing rows."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    ev = _ev(spark, sf_dir)
    msg = F.format_string(
        "corr probe from 10.%d.%d.1 seq",
        (F.col("user_id") % 250).cast("int"),
        (F.floor(F.col("user_id") / 250) % 250).cast("int"),
    )
    frame = ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        msg.alias("message"),
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"chain arm"; program: view; '
        'content:"corr probe"; parse_src_ip: 1; '
        "xbits: set, name bitA, track ip_src; "
        "classtype: misc-attack; sid:7610001; rev:1;)\n"
        'alert any any any -> any any (msg:"chain escalate"; program: click; '
        'content:"corr probe"; parse_src_ip: 1; '
        "xbits: isset, name bitA, track ip_src; "
        "xbits: set, name bitB, track ip_src; "
        "after: track by_src, count 2, seconds 172800; "
        "classtype: misc-attack; sid:7610002; rev:1;)\n"
        'alert any any any -> any any (msg:"chain observe"; program: error; '
        'content:"corr probe"; parse_src_ip: 1; '
        "xbits: isset, name bitB, track ip_src; "
        "classtype: misc-attack; sid:7610003; rev:1;)"
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    return alerts.groupBy("sid", "src_ip").agg(
        F.count(F.lit(1)).cast("long").alias("n_alerts")
    )


def q_k6_external_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6: per-rule ``external`` routing — alerts of rules carrying
    ``external: /path`` stream to that program, one process per
    partition (reference option src/rules.c:3680-3705, plugin
    src/output-plugins/external.c:58-110).  The gate runs the selection
    with a capture runner instead of fork/exec so the routed-row set
    itself is checked."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import (
        assemble_alerts,
        route_external,
        rule_metadata_df,
    )
    from sagan_spark.rules.parser import parse_rules

    rules = parse_rules(
        'alert any any any -> any any (msg:"ext errors"; program: error; '
        'content:"{"; external: /bin/report-error; classtype: misc-attack; '
        "sid:7500011; rev:1;)\n"
        'alert any any any -> any any (msg:"local purchases"; program: purchase; '
        'content:"{"; classtype: misc-activity; sid:7500012; rev:1;)'
    )
    frame = _events_frame(spark, sf_dir)
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    assembled = assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame)
    routed: dict[str, DataFrame] = {}

    def capture(df: DataFrame, command: list[str]) -> None:
        routed[command[0]] = df

    progs = route_external(assembled, rules, runner=capture)
    assert progs == {"/bin/report-error": [7500011]}
    ext = routed["/bin/report-error"]
    return ext.groupBy("sid", "program").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def q_f7_json_pcre(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: pcre over a flattened-JSON value (reference
    src/json-pcre.c:46-103; missing key => no match)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    frame = _events_frame(spark, sf_dir)
    rules = parse_rules(
        'alert any any any -> any any (msg:"k 9x"; '
        'json_pcre: ".k", "/^9[0-9]$/"; classtype: misc-activity; '
        "sid:7500021; rev:1;)"
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    return (
        alerts.join(frame.select("event_key", "program"), "event_key")
        .groupBy("program")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_f8_json_meta_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: json_meta_content — OR-list of %sagan%-templated literals
    strcmp'd against a flattened-JSON value (reference
    src/json-meta-content.c:146 via Search_Case src/search-type.c:39-67)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    frame = _events_frame(spark, sf_dir)
    rules = parse_rules(
        'alert any any any -> any any (msg:"k in set"; '
        'json_meta_content: ".k", "%sagan%", 91,93,95; '
        "classtype: misc-activity; sid:7500031; rev:1;)"
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    return (
        alerts.join(frame.select("event_key", "program"), "event_key")
        .groupBy("program")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_f9_event_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/P7: Windows-style event-id framing match — ' <id>: ' searched
    within the first 9 chars of the message (strlcpy size 10, reference
    src/event-id.c:61-126)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    ev = _ev(spark, sf_dir)
    msg = F.format_string(
        " %d: %s event", (4600 + F.col("user_id") % 50).cast("int"), F.col("event_type")
    )
    frame = ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        msg.alias("message"),
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"win evid"; '
        'event_id: "4624|4648"; classtype: suspicious-login; sid:7500041; rev:1;)'
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    return (
        alerts.join(frame.select("event_key", "program"), "event_key")
        .groupBy("program", "event_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_p10_base64_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: json_decode_base64 — the flattened-JSON value is
    base64-decoded before the json_content compare (reference
    src/rules.c:2291-2307, decode src/processors/engine.c:652-700)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    ev = _ev(spark, sf_dir)
    msg = F.concat(
        F.lit('{"b": "'),
        F.base64(F.encode(F.col("event_type"), "UTF-8")),
        F.lit('"}'),
    )
    frame = ev.select(
        F.col("event_id").cast("string").alias("event_key"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("host"),
        F.col("event_type").alias("program"),
        F.lit("").alias("facility"),
        F.lit("").alias("level"),
        F.lit("").alias("tag"),
        msg.alias("message"),
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"b64 error"; '
        'json_content: ".b", "error"; json_decode_base64; '
        "classtype: misc-attack; sid:7500051; rev:1;)"
    )
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    return (
        alerts.join(
            frame.select("event_key", F.substring("host", 6, 20).alias("uid")),
            "event_key",
        )
        .groupBy((F.col("uid").cast("long") % 10).cast("long").alias("user_mod"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_a12_dynamic_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: dynamic rules, two-pass batch analog — a fired
    ``dynamic_load`` rule loads its ruleset and the combined set re-runs
    (reference src/processors/dynamic-rules.c:61-189)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules

    base = parse_rules(
        'alert any any any -> any any (msg:"dyn trigger"; program: signup; '
        'json_pcre: ".k", "/^9[5-9]$/"; dynamic_load: /dyn/extra.rules; '
        "classtype: misc-activity; sid:7600001; rev:1;)"
    )
    dyn_text = (
        'alert any any any -> any any (msg:"loaded purchases"; '
        'program: purchase; content:"{"; classtype: misc-activity; '
        "sid:7600002; rev:1;)"
    )

    def loader(path: str):
        assert path == "/dyn/extra.rules"
        return parse_rules(dyn_text)

    frame = _events_frame(spark, sf_dir)
    result, effective = SaganSparkEngine(base).run_with_dynamic_rules(
        frame, loader=loader
    )
    assert [r.sid for r in effective] == [7600001, 7600002]
    return (
        result.alerts()
        .groupBy("sid")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def q_k2_fast_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: the one-line snort 'fast' sink format, field-for-field
    (reference src/output-plugins/fast.c:65-88) — timestamp, sid/rev,
    signature, classification, priority, program, proto and the
    defaulted endpoint columns (src_ip/dst_ip fall back to the event
    host, ports to the sagan_port 514, reference engine.c:855-870)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import assemble_alerts, fast_view, rule_metadata_df
    from sagan_spark.rules.parser import parse_rules

    rules = parse_rules(
        'alert any any any -> any any (msg:"fast line"; program: error; '
        'content:"{"; classtype: misc-attack; sid:7500061; rev:3;)'
    )
    frame = _events_frame(spark, sf_dir)
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    assembled = assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame)
    return fast_view(assembled).select("url", "sid", "rev", "line")


def q_k1_alert_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: the multi-line 'alert.log' sink's core columns
    (reference src/output-plugins/alert.c:70-101)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import alert_view, assemble_alerts, rule_metadata_df
    from sagan_spark.rules.parser import parse_rules

    rules = parse_rules(
        'alert any any any -> any any (msg:"alert line"; program: error; '
        'content:"{"; classtype: misc-attack; sid:7500071; rev:2;)'
    )
    frame = _events_frame(spark, sf_dir)
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    assembled = assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame)
    return alert_view(assembled)


def q_k4_syslog_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: the snort-compatible one-line syslog sink format
    (reference src/output-plugins/syslog-handler.c:50-90)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.route import assemble_alerts, rule_metadata_df, syslog_view
    from sagan_spark.rules.parser import parse_rules

    rules = parse_rules(
        'alert any any any -> any any (msg:"syslog line"; program: error; '
        'content:"{"; classtype: misc-attack; sid:7500072; rev:1;)'
    )
    frame = _events_frame(spark, sf_dir)
    alerts = SaganSparkEngine(rules).run(frame).alerts()
    assembled = assemble_alerts(alerts, rule_metadata_df(spark, rules), events=frame)
    return syslog_view(assembled)


def q_k3_eve_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 all-logs variant: every event as an EVE 'log' record
    (reference Format_JSON_Log_EVE src/json-handler.c:292-361)."""
    _ship_package(spark)
    from sagan_spark.pipeline.route import eve_log_view

    frame = _events_frame(spark, sf_dir)
    return eve_log_view(frame)


def q_a11_stats_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 stats-json: the periodic EVE 'stats' record assembled from
    the real engine's hit flags (reference
    src/processors/stats-json.c:140-300)."""
    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.pipeline.metrics import stats_json_view
    from sagan_spark.rules.parser import parse_rules

    rules = parse_rules(
        'alert any any any -> any any (msg:"errs"; program: error; '
        'content:"{"; classtype: misc-attack; sid:7500081; rev:1;)'
    )
    frame = _events_frame(spark, sf_dir)
    hits = SaganSparkEngine(rules).run(frame).hits
    return stats_json_view(frame, hits, uptime_secs=100)


def q_streaming_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3 streaming form: applyInPandasWithState counters with
    checkpointed availableNow drain (rows-only gate — Structured
    Streaming state is outside DuckDB's vocabulary; batch==streaming
    equality is pinned in tests/test_streaming.py)."""
    import shutil
    import tempfile

    _ship_package(spark)
    from sagan_spark.data.pages import write_pages
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules
    from sagan_spark.streaming import StreamingSaganEngine, pages_stream_frame

    rules = parse_rules(
        'alert any any any -> any any (msg:"burst"; content:"Failed password"; '
        "parse_src_ip: 1; threshold: type suppress, track by_src, count 2, seconds 300; "
        "classtype: attempted-recon; sid:8100001; rev:1;)"
    )
    work = tempfile.mkdtemp(prefix="sagan_stream_contract_")
    try:
        inp = f"{work}/in"
        os.makedirs(inp)
        write_pages(f"{inp}/pages.parquet", n_rows=2000)
        seng = StreamingSaganEngine(rules, watermark="0 seconds")
        frame = SaganSparkEngine.frame_from_pages(pages_stream_frame(spark, inp))
        q = seng.start_sink_query(frame, f"{work}/out", f"{work}/ckpt", sinks=["alerts_eve"])
        # availableNow drain: a False return means the query is STILL
        # running — reading partial output (and rmtree'ing under it in
        # the finally) would misreport as a correctness failure
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("streaming drain did not finish in 180s")
        eve = spark.read.parquet(f"{work}/out/alerts_eve")
        # grouped result is tiny but still returned as a plan, not via a
        # driver collect/createDataFrame funnel; localCheckpoint detaches
        # it from the temp dir being cleaned below
        out = eve.groupBy("alert_signature_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_routed")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_streaming_threshold_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """threshold: type suppress through the REAL streaming path
    (applyInPandasWithState counters, checkpointed availableNow drain)
    over the DETERMINISTIC events table — so unlike
    q_streaming_threshold's generated corpus, a DuckDB recursive-CTE
    oracle can replay the reference suppress machine
    (threshold.c:126-150) row by row and the driver gets a hash-green
    check on the streaming executor path itself."""
    import shutil
    import tempfile

    _ship_package(spark)
    from sagan_spark.pipeline.engine import SaganSparkEngine
    from sagan_spark.rules.parser import parse_rules
    from sagan_spark.streaming import StreamingSaganEngine, pages_stream_frame

    ev = _ev(spark, sf_dir)
    msg = F.format_string(
        "corr probe from 10.%d.%d.1 seq",
        (F.col("user_id") % 250).cast("int"),
        (F.floor(F.col("user_id") / 250) % 250).cast("int"),
    )
    pages = ev.select(
        F.col("event_id").cast("string").alias("url"),
        F.col("ts").cast("timestamp").alias("warc_ts"),
        F.lit("").cast("binary").alias("html"),
        msg.alias("text"),
        F.lit("en").alias("lang"),
    )
    rules = parse_rules(
        'alert any any any -> any any (msg:"thr suppress stream"; '
        'content:"corr probe"; parse_src_ip: 1; threshold: type suppress, '
        "track by_src, count 2, seconds 172800; classtype: misc-attack; "
        "sid:8200001; rev:1;)"
    )
    work = tempfile.mkdtemp(prefix="sagan_stream_engine_gate_")
    try:
        inp = f"{work}/in"
        # a flat file layout (not a nested dir) so the stream source's
        # file listing sees it
        pages.coalesce(1).write.parquet(inp)
        seng = StreamingSaganEngine(rules, watermark="0 seconds")
        frame = SaganSparkEngine.frame_from_pages(pages_stream_frame(spark, inp))
        q = seng.start_sink_query(
            frame, f"{work}/out", f"{work}/ckpt", sinks=["alerts_eve"]
        )
        # see q_streaming_threshold: never read (or delete) the sink
        # under a still-running drain
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming drain did not finish in 300s")
        eve = spark.read.parquet(f"{work}/out/alerts_eve")
        out = eve.groupBy(
            F.col("alert_signature_id").cast("long").alias("sid"),
            F.col("src_ip"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n_alerts"))
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# training-data ops
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.dedup import exact_dup_groups

    docs = _docs(spark, sf_dir)
    g = exact_dup_groups(docs)
    return g.agg(
        F.count(F.lit(1)).alias("n_dup_groups"),
        F.coalesce(F.sum("dup_count"), F.lit(0)).cast("long").alias("n_dup_docs"),
    )


def q_dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup (ops/dedup.soft_dedup_weights, exact mode): every
    doc kept, weighted 1e6 div copies — one map-side-combining digest
    count + one join back."""
    from sagan_spark.ops.dedup import soft_dedup_weights

    return soft_dedup_weights(_docs(spark, sf_dir))


def q_dedup_paragraphs_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc paragraph dedup (ops/dedup.dedup_paragraphs_within):
    scan-level array codegen, first occurrence kept in order.  Each
    doc gets a copy of its first paragraph appended so the drop path
    is exercised on every row."""
    from sagan_spark.ops.dedup import dedup_paragraphs_within

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n\n", F.col("text"), F.split(F.col("text"), "\n\n")[0]
        ).alias("text"),
    )
    out = dedup_paragraphs_within(docs)
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_md5"),
        "n_paragraphs", "n_dropped",
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.dedup import minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return minhash_lsh_pairs(docs, k=8, n_bands=4)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.dedup import ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, k=8, n_bands=4, threshold=0.3)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup (numpy-vectorized pandas-UDF bit math).  Full
    oracle parity: the DuckDB twin replays the 64-bit FNV+splitmix gram
    hash with HUGEINT mul-mod emulation (see oracle_sql)."""
    from sagan_spark.ops.dedup import simhash_near_dups

    docs = _docs(spark, sf_dir)
    return simhash_near_dups(docs, k=4, max_hamming=8)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.dedup import embedding_cosine_dups

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 200)
    pairs = embedding_cosine_dups(emb, threshold=0.3)
    return pairs.select("id_a", "id_b", F.round("cosine", 5).alias("cosine"))


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed embedding dedup — the 100 TB scale path (per-bucket
    candidates instead of crossJoin).  Pinned against a pure-Python
    twin in tests/test_dedup_ops.py AND a full DuckDB oracle (the
    hyperplane literals are deterministic driver constants frozen into
    the oracle SQL, same replay pattern as ann_lsh_topk)."""
    from sagan_spark.ops.dedup import embedding_lsh_dups

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 200)
    pairs = embedding_lsh_dups(emb, threshold=0.3, n_planes=4, n_tables=4, dim=64)
    return pairs.select("id_a", "id_b", F.round("cosine", 5).alias("cosine"))


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): cluster-then-prune
    semantic dedup over the embeddings table — centroid assignment,
    (cent_sim asc, id asc) ordering, and the within-cluster cosine
    prune, run with the deterministic pretrained codebook
    (fixed_centroids) so the DuckDB oracle replays every step from the
    SAME centroid literals.  The k-means TRAINING path stays pinned by
    the pure-Python twin in tests/test_dedup_ops.py."""
    from sagan_spark.ops.dedup import semdedup
    from sagan_spark.ops.similarity import fixed_centroids

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 200)
    return semdedup(emb, threshold=0.3, centroids=fixed_centroids(16, 64))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 5).alias("cosine"), "rank"
    )


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over int8-quantized embeddings (FAISS-SQ8-style):
    scan-level fixed-point quantization, exact integer dot products —
    the 4x-narrower embedding store for 100 TB vector search."""
    from sagan_spark.ops.similarity import quantized_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    out = quantized_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id",
        F.round("cosine_q", 5).alias("cosine_q"), "rank",
    )


def q_classifier_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-rate calibration: the largest score threshold keeping >=40%
    of the corpus, from a bounded score histogram (never a corpus
    window) — the step between classifier training and filtering."""
    from sagan_spark.ops.webclean import calibrate_keep_threshold, hashed_linear_score

    scores = hashed_linear_score(_docs(spark, sf_dir), n_buckets=1 << 18)
    return calibrate_keep_threshold(scores, keep_ppm=400000)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF/LSH-bucketed ANN (scale path) — rows-only oracle check."""
    from sagan_spark.ops.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_topk(emb, queries, k=5, n_planes=6, n_tables=3, dim=64)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 5).alias("cosine"), "rank"
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH ANN path against the exact top-5 — the
    in-engine quality measurement run before trusting the approximate
    path at scale (the minhash_calibration discipline applied to
    vector search).  Composes two already-oracled ops; the oracle is
    the same composition of their SQL."""
    from sagan_spark.ops.similarity import brute_force_topk, lsh_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = lsh_topk(emb, queries, k=5, n_planes=6, n_tables=3, dim=64).select(
        "query_id", "neighbor_id"
    )
    inter = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        exact.select("query_id").distinct()
        .join(inter, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(5.0)).alias("recall"),
        )
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — centroid lists + n_probe rerank, run
    with a deterministic pretrained codebook (fixed_centroids) so the
    DuckDB oracle replays assignment/probe/rerank with the SAME
    centroid literals.  The k-means TRAINING path stays pinned by its
    pure-Python twin in tests/test_dedup_ops.py."""
    from sagan_spark.ops.similarity import fixed_centroids, ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(
        emb, queries, k=5, n_centroids=16, n_probe=4, dim=64,
        centroids=fixed_centroids(16, 64),
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 5).alias("cosine"), "rank"
    )


def q_html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> visible-text extraction over a BYTE column
    (ops/htmltext.py): documents are wrapped in a deterministic markup
    scaffold (script/style/comment/entity traps included), UTF-8
    encoded to binary — the pages table's ``html: binary`` shape — and
    the declared regex-chain spec extracts the text back.  Pure
    whole-stage codegen; the oracle applies the SAME chain
    (html_text_sql, one source of truth) to the same scaffold."""
    from sagan_spark.ops.htmltext import extract_text

    docs = _docs(spark, sf_dir)
    scaffold = F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit('</title><script type="x">var a = 1 < 2;</script>'),
        F.lit("<style>p { color: red }</style></head><body><!-- id "),
        F.col("doc_id").cast("string"),
        F.lit(" --><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &amp;lt; &nbsp;done</p></body></html>"),
    )
    pages = docs.select("doc_id", F.encode(scaffold, "UTF-8").alias("html"))
    return extract_text(pages).select("doc_id", "text_extracted")


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.textstats import lang_id

    docs = _docs(spark, sf_dir)
    return lang_id(docs).groupBy("pred_lang").agg(F.count(F.lit(1)).alias("n"))


def _langid_trained_weights() -> list[tuple[str, str, int]]:
    """The VENDORED 26-language model table
    (sagan_spark.ops.langid_data — public frequency-list derivation,
    provenance in its module docstring; replaced the r4 stand-in).
    ONE source of truth for the Spark DataFrame and the oracle's
    VALUES literal."""
    from sagan_spark.ops.langid_data import langid_weight_rows

    return langid_weight_rows()


def q_text_langid_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained lang-id over the vendored public-data model (the
    default a user gets from load_langid_weights); real-sentence
    accuracy is pinned separately in tests/test_langid_vendored.py."""
    from sagan_spark.ops.langid_data import load_langid_weights
    from sagan_spark.ops.textstats import lang_id

    return lang_id(
        _docs(spark, sf_dir), marker_weights=load_langid_weights(spark)
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.textstats import quality_score

    docs = _docs(spark, sf_dir)
    return quality_score(docs)


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.textstats import token_counts

    docs = _docs(spark, sf_dir)
    return token_counts(docs)


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.textstats import fingerprint

    docs = _docs(spark, sf_dir)
    return fingerprint(docs, k=16)


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.textstats import vocab_stats

    docs = _docs(spark, sf_dir)
    return vocab_stats(docs, top_n=100)


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by linear-idf TF-IDF
    over a frequency-capped (broadcastable) corpus vocabulary; the
    IEEE double chain is replayed operation-for-operation in the
    oracle (the `sample_temperature` precedent)."""
    from sagan_spark.ops.tfidf import tfidf_topk

    docs = _docs(spark, sf_dir)
    return tfidf_topk(docs, k=5, max_vocab=65536)


# BM25 gate workload: fixed query strings over the documents table's
# vocabulary (mix of hot tokens, rare tokens, and one absent token so
# the zero-df / no-match paths are exercised); the oracle VALUES list
# is generated from this same constant with the same tokenizer.
BM25_QUERIES = [
    (1, "fast hash join"),
    (2, "window agg scan"),
    (3, "slow vector stream"),
    (4, "customer order warehouse"),
]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval, linear-idf, integer-milli term scores,
    skew-safe two-stage per-query top-k (salted local rank, then the
    global rank over the bounded survivor set)."""
    from sagan_spark.ops.tfidf import bm25_topk

    docs = _docs(spark, sf_dir)
    return bm25_topk(docs, BM25_QUERIES, k=10)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.packing import pack_sequences

    docs = _docs(spark, sf_dir)
    return pack_sequences(docs, max_tokens=2048, n_shards=32)


def q_pack_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.packing import pack_chunk_stats

    docs = _docs(spark, sf_dir)
    return pack_chunk_stats(docs, max_tokens=2048, n_shards=32)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping retrieval chunks
    (ops/packing.chunk_documents): scan-level sequence/explode/substr,
    no shuffle.  Chunks are md5'd so the compare stays narrow; start
    offsets + lengths pin the window arithmetic exactly."""
    from sagan_spark.ops.packing import chunk_documents

    ch = chunk_documents(_docs(spark, sf_dir), chunk_chars=200, overlap=40)
    return ch.select(
        "doc_id", "chunk_id", "char_start", "chunk_len",
        F.md5(F.col("chunk")).alias("chunk_md5"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: payload byte length + content digest
    (decode kernels stubbed; batch plumbing real, see ops/multimodal.py)."""
    from sagan_spark.ops.multimodal import attach_binary, decode_metadata

    docs = _docs(spark, sf_dir)
    meta = decode_metadata(attach_binary(docs))
    return meta.select("id", "n_bytes", "content_sha")


def q_multimodal_meta_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode path: per-doc JPEG byte streams are synthesized
    in-plan (unhex'd SOI/APP0/SOF0/EOI with doc_id-derived 16-bit
    dimensions) and decoded by the registry's pure-stdlib JPEG SOF
    kernel (ops/kernels.jpeg_decode — VERDICT r4 task #2) inside the
    Arrow-batched mapInPandas stage.  The oracle replays the
    dimension arithmetic directly; byte-level kernel behavior
    (markers, fill bytes, malformed streams) carries its own exact
    twins in tests/test_kernels.py."""
    from sagan_spark.ops.multimodal import decode_metadata

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    w = (did % 1920 + 1).cast("long")
    h = (did % 1080 + 1).cast("long")
    hexstr = F.concat(
        F.lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
        F.lpad(F.hex(h), 4, "0"), F.lpad(F.hex(w), 4, "0"),
        F.lit("03011100021101031101FFD9"),
    )
    media = docs.select(
        did.alias("id"),
        F.unhex(hexstr).alias("payload"),
        F.lit("image/jpeg").alias("media_type"),
    )
    return decode_metadata(media, kernel="registry").select(
        "id", "n_bytes", "width", "height", "n_frames"
    )


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample plumbing: every-30th frame index per media item
    (n_frames derived deterministically by the stub decoder)."""
    from sagan_spark.ops.multimodal import attach_binary, decode_metadata, frame_sample_plan

    docs = _docs(spark, sf_dir)
    meta = decode_metadata(attach_binary(docs))
    frames = frame_sample_plan(meta, every_n=30)
    return frames.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.max("frame_idx").cast("long").alias("last_idx"),
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize target dims from the decoded metadata."""
    from sagan_spark.ops.multimodal import attach_binary, decode_metadata, resize_plan

    docs = _docs(spark, sf_dir)
    meta = decode_metadata(attach_binary(docs))
    return resize_plan(meta, max_w=224, max_h=224).select(
        "id", "width", "height", "out_w", "out_h"
    )


def q_multimodal_features_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: multimodal payload -> stub feature vectors -> exact
    cosine top-k (the real 100 TB shape: decode feeds the ANN ops
    unchanged).  Rows-only gate (the PRNG stub is not SQL-expressible);
    determinism pinned in tests/test_multimodal.py."""
    from sagan_spark.ops.multimodal import attach_binary, extract_features
    from sagan_spark.ops.similarity import brute_force_topk

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    emb = extract_features(attach_binary(docs), dim=16).withColumnRenamed("id", "vec_id")
    queries_df = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(emb, queries_df, k=3)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 5).alias("cosine"), "rank"
    )


def q_dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup canonicalization: Jaccard-verified pairs -> connected
    components -> (canonical_id, cluster_size) per cluster."""
    from sagan_spark.ops.dedup import near_dup_clusters

    docs = _docs(spark, sf_dir)
    return near_dup_clusters(docs, k=8, n_bands=4, threshold=0.3)


def q_dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as dedup_cluster_canonical, executed via the
    SOCC'14 large-star/small-star rounds (``cc_method="star"``) — puts
    the O(log n) deep-graph CC path under the driver's oracle gate.
    The recursive-CTE oracle is method-agnostic (component = min
    reachable id), so both execution strategies must hash-match it."""
    from sagan_spark.ops.dedup import near_dup_clusters

    docs = _docs(spark, sf_dir)
    return near_dup_clusters(docs, k=8, n_bands=4, threshold=0.3, cc_method="star")


def q_dedup_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup drop list: every clustered doc except its cluster's
    min-id canonical."""
    from sagan_spark.ops.dedup import near_dup_drop_list

    docs = _docs(spark, sf_dir)
    return near_dup_drop_list(docs, k=8, n_bands=4, threshold=0.3)


def q_webclean_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.webclean import repetition_metrics

    docs = _docs(spark, sf_dir)
    return repetition_metrics(docs)


def q_webclean_top_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.webclean import top_ngram_char_frac

    docs = _docs(spark, sf_dir)
    return top_ngram_char_frac(docs, n=2)


def q_webclean_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.webclean import pii_scrub

    docs = _docs(spark, sf_dir)
    return pii_scrub(docs).select("doc_id", "n_emails", "n_ips", "clean_len")


def q_webclean_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.webclean import filter_verdict

    docs = _docs(spark, sf_dir)
    return filter_verdict(docs)


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.dedup import dedup_paragraphs

    return dedup_paragraphs(_docs(spark, sf_dir)).select(
        "doc_id", "clean_text", "n_paragraphs", "n_dropped"
    )


def q_webclean_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.webclean import gopher_quality_filters

    return gopher_quality_filters(_docs(spark, sf_dir))


def q_webclean_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-linear quality-classifier inference, synthetic-weights
    mode (the no-join codegen path; trained-weights mode is the same
    plan plus one broadcast join, pinned in tests/test_webclean.py)."""
    from sagan_spark.ops.webclean import hashed_linear_score

    return hashed_linear_score(_docs(spark, sf_dir), n_buckets=1 << 18)


def _labeled_docs(docs: DataFrame) -> DataFrame:
    """documents + a deterministic reference/crawl label: sources
    src0..src9 play the reference corpus (positive), src10..src19 the
    raw crawl (negative) — the SAME expression runs in the oracle."""
    return docs.withColumn(
        "is_ref", F.substring(F.col("source"), 4, 10).cast("long") < 10
    )


def q_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING (GPT-3 App. A reference-vs-crawl
    labels): one map-side-combining groupBy over the hashed token
    stream -> bounded (bucket, weight_milli, pos/neg counts) model."""
    from sagan_spark.ops.webclean import train_quality_classifier

    return train_quality_classifier(
        _labeled_docs(_docs(spark, sf_dir)), label_col="is_ref"
    )


def q_webclean_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end train -> broadcast -> score: the trained-weights
    inference path of hashed_linear_score fed by train_quality_classifier
    on the same corpus (self-scoring; a real pipeline trains on a
    held-out reference and scores the crawl)."""
    from sagan_spark.ops.webclean import hashed_linear_score, train_quality_classifier

    docs = _docs(spark, sf_dir)
    model = train_quality_classifier(_labeled_docs(docs), label_col="is_ref")
    return hashed_linear_score(
        docs, weights=model.select("bucket", "weight_milli")
    )


def _benchmark_from_docs(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic eval set: every 97th document with >=30
    tokens contributes tokens 6..30 as one benchmark entry — guarantees
    real 13-gram overlap for the gate while the SAME expression builds
    the oracle's bench table."""
    from sagan_spark.ops.decontam import _tokens

    d = docs.select("doc_id", _tokens(F.col("text")).alias("toks")).filter(
        (F.col("doc_id") % 97 == 0) & (F.size("toks") >= 30)
    )
    return d.select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice("toks", 6, 25)).alias("text"),
    )


def q_decontam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (Brown et al. arXiv:2005.14165 App. C):
    13-gram overlap vs a deterministic synthetic eval set; broadcast
    benchmark side, no corpus shuffle before the hit aggregation."""
    from sagan_spark.ops.decontam import contamination_hits

    docs = _docs(spark, sf_dir)
    return contamination_hits(docs, _benchmark_from_docs(docs), n=13)


def q_decontam_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc contamination flag (decontaminate = left join against
    contamination_hits, coalesced to false) — the filter-side
    projection a training pipeline actually applies."""
    from sagan_spark.ops.decontam import decontaminate

    docs = _docs(spark, sf_dir)
    return decontaminate(docs, _benchmark_from_docs(docs)).select(
        "doc_id", "contaminated"
    )


def q_dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span fraction (Lee et al. arXiv:2107.06499):
    13-token windows occurring in >=2 distinct docs corpus-wide."""
    from sagan_spark.ops.decontam import duplicated_spans

    return duplicated_spans(_docs(spark, sf_dir), n=13)


def _docs_with_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a deterministic synthetic url (the testdata table
    carries no url column; the SAME expression runs in the oracle)."""
    docs = _docs(spark, sf_dir)
    tld = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(".co.uk"))
        .when(F.col("doc_id") % 3 == 1, F.lit(".com"))
        .otherwise(F.lit(".org"))
    )
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www."), F.col("source"), tld,
            F.lit("/p/"), F.col("doc_id").cast("string"),
        ),
    )


def q_url_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.urltools import domain_rollup

    return domain_rollup(_docs_with_url(spark, sf_dir))


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.urltools import blocklist_filter

    return blocklist_filter(
        _docs_with_url(spark, sf_dir), ["src1.com", "src0.co.uk"]
    ).select("doc_id", "url")


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL (Lee et al.
    arXiv:2107.06499 §4.1): tokens covered by a corpus-duplicated
    13-token window are dropped and the text re-joined — the editing
    counterpart of dedup_duplicated_spans' measurement."""
    from sagan_spark.ops.decontam import remove_duplicated_spans

    return remove_duplicated_spans(_docs(spark, sf_dir), n=13)


def q_dedup_span_removal_keepone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span removal in keep-one mode (Lee et al. §4.1 faithful): the
    first corpus occurrence — min struct(doc_id, position) — of each
    duplicated 13-token window keeps its tokens."""
    from sagan_spark.ops.decontam import remove_duplicated_spans

    return remove_duplicated_spans(_docs(spark, sf_dir), n=13, keep_first=True)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: the corpus is split into a
    'previously admitted' digest set (doc_id % 4 == 0) and a new batch
    (the rest); novel_docs admits the min-id row per unseen digest."""
    from sagan_spark.ops.dedup import novel_docs

    docs = _docs(spark, sf_dir)
    seen = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") % 4 != 0)
    return novel_docs(batch, seen)


def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-incremental NEAR-dup screen
    (ops/dedup.novel_docs_minhash): the new batch (doc_id % 3 != 0)
    anti-joins the seen corpus's persisted (band, sig) table — no
    re-pairing of history.  Short docs carry no signatures and pass."""
    from sagan_spark.ops.dedup import minhash_signatures, novel_docs_minhash

    docs = _docs(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    return novel_docs_minhash(batch, minhash_signatures(seen)).select("doc_id")


def q_dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup: the same seen/batch split
    as dedup_incremental, but the batch probes a bounded Bloom 1-bit
    relation first so only maybe-seen digests pay the digest-vs-digest
    anti-join.  m_bits is deliberately tiny (4096) so the
    false-positive branch is exercised at gate scale: FPs survive the
    probe, reach the exact anti-join, and are admitted there — the
    output is row-identical to dedup_incremental (a Bloom filter built
    from ``seen`` itself has no false negatives), so the two gates
    share one oracle."""
    from sagan_spark.ops.dedup import novel_docs_bloom

    docs = _docs(spark, sf_dir)
    seen = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") % 4 != 0)
    return novel_docs_bloom(batch, seen, m_bits=4096, k=3)


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event gap sessionization (gap 4 h, daily buckets): each
    event labeled with its session's start timestamp.  The two-phase
    bucket decomposition is bit-equal to the oracle's global per-key
    window — every event-level window is partitioned by (key, bucket)
    so a hot key never funnels one sorting task."""
    from sagan_spark.ops.sessions import sessionize

    return sessionize(_ev(spark, sf_dir), gap_sec=14400, bucket_sec=86400)


def q_events_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level rollup over q_events_sessionize: one row per
    (user, session) with event count and duration — a pure
    map-side-combining aggregation (the session label is a value, not
    a rank, so no further window is needed)."""
    from sagan_spark.ops.sessions import session_rollup

    return session_rollup(_ev(spark, sf_dir), gap_sec=14400, bucket_sec=86400)


def q_events_session_rollup_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same session rollup via Spark's built-in session_window
    aggregation — one oracle serves both spellings, so this gate
    proves the two-phase decomposition == the engine-native op."""
    from sagan_spark.ops.sessions import session_rollup_native

    return session_rollup_native(_ev(spark, sf_dir), gap_sec=14400)


def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-event sessionization (applyInPandasWithState,
    event-time timeout eviction) drained over the events table with
    availableNow — and, unlike the threshold smoke, a FULL-oracle
    gate: one drained batch holds each key's whole history, so the
    assignment must equal the global-window oracle bit-for-bit (the
    same SQL as events_sessionize).  Cross-chunk/restart parity is
    pinned in tests/test_sessions_streaming.py."""
    import shutil
    import tempfile

    _ship_package(spark)
    from sagan_spark.streaming.sessions import start_session_query

    work = tempfile.mkdtemp(prefix="sagan_sess_contract_")
    try:
        inp = f"{work}/in"
        os.makedirs(inp)
        shutil.copy(f"{sf_dir}/events.parquet", f"{inp}/events.parquet")
        q = start_session_query(
            spark, inp, f"{work}/out", f"{work}/ckpt", gap_sec=14400
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("streaming drain did not finish in 180s")
        out = spark.read.parquet(f"{work}/out")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel, per user: chained
    min-aggregations on the key (no window, no per-key sort) — stage i
    is the earliest event of its type at-or-after stage i-1."""
    from sagan_spark.ops.funnel import funnel_stages

    return funnel_stages(_ev(spark, sf_dir), ["view", "click", "purchase"])


def q_events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel summary: users surviving through each stage."""
    from sagan_spark.ops.funnel import funnel_counts

    return funnel_counts(_ev(spark, sf_dir), ["view", "click", "purchase"])


def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-activity-day cohorts x day offset, integer epoch-day
    arithmetic (div, never float division)."""
    from sagan_spark.ops.funnel import cohort_retention

    return cohort_retention(_ev(spark, sf_dir))


def q_events_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key event-rate burst detection (daily buckets, trailing
    7-day baseline, factor 2.0, min 3 events): the adaptive-baseline
    generalization of the reference's fixed `threshold: count N,
    seconds T` counters.  Events collapse map-side to one row per
    (key, non-empty bucket); the only window is an integer RANGE
    frame over that counts frame, so a hot key's partition is its
    non-empty-bucket count, never its event count."""
    from sagan_spark.ops.bursts import detect_bursts

    return detect_bursts(
        _ev(spark, sf_dir),
        bucket_sec=86400,
        trailing_buckets=7,
        factor_milli=2000,
        min_count=3,
    )


def q_streaming_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming burst detection (applyInPandasWithState trailing-k
    ring state, event-time timeout eviction) drained over the events
    table with availableNow — a FULL-oracle gate: one drained batch
    holds each key's whole bucket history, so the flags must equal
    the batch RANGE-frame oracle bit-for-bit (same SQL as
    events_bursts).  Cross-chunk/eviction parity is pinned in
    tests/test_bursts_streaming.py."""
    import shutil
    import tempfile

    _ship_package(spark)
    from sagan_spark.streaming.bursts import start_burst_query

    work = tempfile.mkdtemp(prefix="sagan_burst_contract_")
    try:
        inp = f"{work}/in"
        os.makedirs(inp)
        shutil.copy(f"{sf_dir}/events.parquet", f"{inp}/events.parquet")
        q = start_burst_query(
            spark, inp, f"{work}/out", f"{work}/ckpt",
            bucket_sec=86400, trailing_buckets=7,
            factor_milli=2000, min_count=3,
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("streaming drain did not finish in 180s")
        out = spark.read.parquet(f"{work}/out")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p95/p99 of `value` per event_type via the value
    histogram: the cumulative window runs over one row per (key,
    distinct value), never the raw events, and the quantile is the
    integer-exact lower empirical quantile (cum * 1e6 >= q_ppm * n)
    — always an observed value, no float interpolation."""
    from sagan_spark.ops.quantiles import quantile_rollup

    return quantile_rollup(
        _ev(spark, sf_dir), quantiles_ppm=(500000, 950000, 990000)
    )


def q_dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over CCNet-normalized text.  The corpus is the
    documents table UNION a mangled twin per doc (uppercased, digits
    scrambled via translate, punctuation/whitespace noise appended,
    doc_id offset by 10^6) — so every non-NULL doc forms a normalized
    group with its twin while remaining distinct under plain md5; the
    SAME mangling expression runs in the oracle."""
    from sagan_spark.ops.dedup import normalized_dup_groups

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    variants = docs.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(
            F.lit("  "),
            F.translate(F.upper("text"), "0123456789", "9876543210"),
            F.lit(" ?!*  ,, "),
        ).alias("text"),
    )
    return normalized_dup_groups(docs.unionByName(variants))


def q_dedup_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-granularity corpus dedup: the SAME min-struct
    aggregation as dedup_paragraphs with sep='. ' (a declared crude
    sentence boundary) — repeated sentences keep their first corpus
    occurrence; finer-grained than the paragraph pass, coarser than
    the 13-token span removal (the three exact-dedup granularities of
    the Lee et al. arXiv:2107.06499 family)."""
    from sagan_spark.ops.dedup import dedup_paragraphs

    return dedup_paragraphs(_docs(spark, sf_dir), sep=". ")


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + type/token ratio per doc — pure codegen
    regexp counts, scan-level projection, no shuffle."""
    from sagan_spark.ops.textstats import readability

    return readability(_docs(spark, sf_dir))


def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc corpus-unique-shingle census
    (ops/textstats.novelty_scores): two map-side-combining aggs off
    the shared shingle frame, no fact-fact join, no window."""
    from sagan_spark.ops.textstats import novelty_scores

    return novelty_scores(_docs(spark, sf_dir), k=8)


def _docs_with_messy_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a deliberately messy synthetic url (mixed-case
    scheme/host, default and non-default ports, tracking params,
    fragments, a non-authority mailto form) — the SAME expression runs
    in the oracle."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    tld = (
        F.when(did % 3 == 0, F.lit(".co.uk"))
        .when(did % 3 == 1, F.lit(".com"))
        .otherwise(F.lit(".org"))
    )
    port = (
        F.when(did % 5 == 0, F.lit(":443"))
        .when(did % 5 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    qs = (
        F.when(did % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(did % 3 == 1, F.lit("?a=1&fbclid=zz"))
        .otherwise(F.lit(""))
    )
    frag = F.when(did % 7 == 0, F.lit("#sec2")).otherwise(F.lit(""))
    url = F.concat(
        F.lit("HTTPS://WWW."), F.upper("source"), tld, port,
        F.lit("/p/"), (did % 50).cast("string"), qs, frag,
    )
    url = F.when(
        did % 11 == 0, F.concat(F.lit("mailto:user@"), F.col("source"), F.lit(".com"))
    ).otherwise(url)
    return docs.withColumn("url", url)


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL per document: lowercased scheme/host, default
    port dropped, tracking params removed, params sorted, fragment
    stripped; non-authority URLs pass through."""
    from sagan_spark.ops.urltools import url_canonicalize

    return _docs_with_messy_url(spark, sf_dir).select(
        "doc_id", url_canonicalize(F.col("url")).alias("canonical_url")
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup: min-doc_id winner per canonical URL (the
    messy-url corpus collides on purpose: path is doc_id % 50)."""
    from sagan_spark.ops.urltools import dedup_by_url

    return dedup_by_url(_docs_with_messy_url(spark, sf_dir))


def q_url_surt_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT-key shard census (ops/urltools.surt_shard_census): host
    labels reversed behind the index sort key, md5-hash shard
    assignment, no-authority URLs audited in shard -1.  One scan +
    one n_shards-row map-side-combining agg."""
    from sagan_spark.ops.urltools import surt_shard_census

    return surt_shard_census(_docs_with_messy_url(spark, sf_dir), n_shards=8)


def q_sample_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection (ops/sampling.budget_select): best
    scores first until the token budget fills, exact boundary via the
    (score, hash-cell) histogram — never a corpus-global sort.  The
    synthetic score (doc_id mod 7) is tie-heavy on purpose so the
    boundary cell machinery is exercised."""
    from sagan_spark.ops.sampling import budget_select

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(7)).cast("long").alias("score"),
        F.length("text").cast("long").alias("n_tokens"),
    )
    return budget_select(docs, token_budget=25_000).select(
        "doc_id", "score", "n_tokens"
    )


#: mixture gate knobs — shared by the two gate callables and the
#: oracle CTE below (es is deliberately untargeted -> dropped; ro is
#: targeted but absent from the corpus -> allocates nothing)
_MIX_TARGET = {"en": 500_000, "de": 250_000, "fr": 150_000,
               "zh": 50_000, "ro": 50_000}
_MIX_BUDGET = 400


def _mix_quota_cte(avail_sql: str = "count(*)",
                   budget: int | None = None) -> str:
    """The water-filling allocation (ops/sampling.mixture_quotas)
    replayed as one window chain over the tiny per-group frame —
    integer sort key, prefix-min saturation walk, truncating `//`
    division (both engines truncate; operands non-negative; HUGEINT
    products mirror the op's DECIMAL(38,0) discipline).
    ``avail_sql`` picks the allocation unit (rows by default, a
    weight sum for the token-budget gate)."""
    share = " ".join(
        f"WHEN '{g}' THEN {s}" for g, s in _MIX_TARGET.items()
    )
    b = _MIX_BUDGET if budget is None else budget
    return (
        f"w0 AS (SELECT lang, {avail_sql} AS n_avail,"
        f" CAST(CASE lang {share} END AS BIGINT) AS share"
        " FROM documents GROUP BY 1),"
        " w1 AS (SELECT *, CAST((CAST(n_avail AS HUGEINT) * 1000000)"
        " // share AS BIGINT) AS k FROM w0"
        "  WHERE share IS NOT NULL),"
        " w2 AS (SELECT *, coalesce(sum(n_avail) OVER (ORDER BY k, lang"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        "   AS cum_avail,"
        "  sum(share) OVER () - coalesce(sum(share) OVER (ORDER BY k, lang"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        "   AS share_after FROM w1),"
        " w3 AS (SELECT *, CASE WHEN CAST(n_avail AS HUGEINT)"
        " * share_after <="
        f"  CAST(({b} - cum_avail) AS HUGEINT) * share"
        " THEN 1 ELSE 0 END AS cond FROM w2),"
        " w4 AS (SELECT *, min(cond) OVER (ORDER BY k, lang"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1"
        "  AS saturated FROM w3),"
        f" w5 AS (SELECT *, {b} - sum(CASE WHEN saturated THEN n_avail"
        "  ELSE 0 END) OVER () AS r, sum(CASE WHEN NOT saturated THEN share"
        "  ELSE 0 END) OVER () AS s FROM w4),"
        " q AS (SELECT lang, n_avail, share, saturated,"
        "  CAST(CASE WHEN saturated THEN n_avail"
        "  ELSE least(CAST(n_avail AS HUGEINT),"
        "   (CAST(r AS HUGEINT) * share) // s) END AS BIGINT) AS quota"
        "  FROM w5)"
    )


def q_sample_mixture_quotas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling mixture allocation (ops/sampling.mixture_quotas):
    the per-group (n_avail, share, saturated, quota) frame itself —
    the budget split a multi-source training mixer reads.  The gate
    target saturates different group subsets at sf0.01 vs sf0.1, so
    both walk branches are exercised at both scales."""
    from sagan_spark.ops.sampling import mixture_quotas

    return mixture_quotas(_docs(spark, sf_dir), _MIX_TARGET, _MIX_BUDGET)


def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture selection (ops/sampling.mixture_sample): exactly the
    allocated quota per group in deterministic hash order; saturated
    groups keep all rows scan-level, capped groups go through the
    shared slack-prefiltered exact-rank core.  The oracle replays the
    allocation CTE + the NAIVE global rank window the slack
    composition is provably equivalent to."""
    from sagan_spark.ops.sampling import mixture_sample

    return mixture_sample(
        _docs(spark, sf_dir), _MIX_TARGET, _MIX_BUDGET
    ).select("doc_id", "lang")


def q_sample_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-denominated mixture selection (ops/sampling.
    mixture_budget_select): water-fill a 120k-char budget across the
    mixture shares (sum(n_chars) availability — saturates 3 of 4
    groups at sf0.01, none at sf0.1), then per-group prefix fill in
    hash order via the budget_select digit decomposition.  The oracle
    replays the naive per-group cumulative window the decomposition
    is provably equivalent to."""
    from sagan_spark.ops.sampling import mixture_budget_select

    docs = _docs(spark, sf_dir)
    return mixture_budget_select(
        docs, _MIX_TARGET, 120_000, token_col="n_chars"
    ).select("doc_id", "lang")


def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.sampling import deterministic_sample

    return deterministic_sample(_docs(spark, sf_dir), 0.25, salt="s1").select(
        "doc_id", "lang"
    )


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.sampling import train_holdout_split

    return train_holdout_split(_docs(spark, sf_dir), 0.2).select("doc_id", "split")


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.sampling import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), {"en": 50, "de": 10}).select(
        "doc_id", "lang"
    )


def q_sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain cap (skew-safe: over-cap domains only,
    slack-rate pre-filter, bounded rank window) — cap 5 over the
    synthetic-url corpus (~60 domains, ~8 docs each at sf0.01)."""
    from sagan_spark.ops.sampling import domain_quota_sample

    return domain_quota_sample(_docs_with_url(spark, sf_dir), 5).select(
        "doc_id", "domain"
    )


def _anchor_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaffolded pages for the anchor ops (q_link_extract
    discipline), one of every claimed form per doc: an absolute
    double-quoted link carrying the text's first 12 chars as anchor,
    a single-quoted ROOT-RELATIVE link and an unquoted second-
    attribute RELATIVE link (both must now resolve and extract), an
    absolute link with a whitespace-padded anchor (trim path), one
    with inner markup in the anchor body (tag-strip path), one with
    an EMPTY anchor (drop path), a fragment-only link and a no-href
    span (drop paths)."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><a href="https://'), F.col("source"),
        F.lit(".com/p/"), (did % 7).cast("string"),
        F.lit('" class="x">'), F.substring(F.col("text"), 1, 12),
        F.lit("</a><a href='/rel'>Root Rel</a>"
              "<a rel=nofollow href=../up/"), (did % 3).cast("string"),
        F.lit('>Up Link</a><a href="https://ref'), (did % 5).cast("string"),
        F.lit('.org/">  Read More  </a><a href="https://x'),
        (did % 2).cast("string"),
        F.lit('.com/b"><b>Bold</b> Text</a><a href="https://empty'),
        (did % 3).cast("string"),
        F.lit('.net/"></a><a href="#top">Top</a>'
              '<a name="no-href">Plain</a><p>'), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )


def q_anchor_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_url, dst_url, anchor) triples: scan-level two-group regex
    extraction, positional zip_with pairing, empty anchors dropped."""
    from sagan_spark.ops.anchors import extract_anchors

    return extract_anchors(_anchor_pages(spark, sf_dir))


def q_anchor_domain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END anchor mining: scaffolded html → anchor extraction →
    per-target-registered-domain (lowercased) anchor counts → salted
    two-stage top-10 (ops/topk.py) — oracle runs the plain global
    window the two-stage form is equivalent to."""
    from sagan_spark.ops.anchors import anchor_domain_topk, extract_anchors

    return anchor_domain_topk(
        extract_anchors(_anchor_pages(spark, sf_dir)), k=10
    )


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-HTML href edge extraction + resolution over scaffolded
    html (q_text_extract scaffold discipline — the testdata table
    carries no html column, so one is built from text + doc_id
    arithmetic).  The scaffold exercises every extraction form the op
    claims: double/single/unquoted values, href not the first
    attribute, tag case, a newline inside the tag, an entity in the
    value, relative + root-relative + scheme-relative references
    (resolved against the page url via ops/urlresolve), and the drop
    set (fragment-only, mailto, data-href decoy, empty value).  The
    oracle CONSTRUCTS the expected edge set from the same arithmetic
    — extraction mechanics carry their own urljoin-twin pytest."""
    from sagan_spark.ops.linkgraph import extract_links

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><a href="https://'), F.col("source"),
        F.lit(".com/p/"), (did % 7).cast("string"), F.lit('">x</a>'),
        F.lit("<A HREF='http://ref"), (did % 5).cast("string"),
        F.lit(".org/q?a=1&amp;b=2'>y</A>"),
        F.lit('<a class="c" href=../up/'), (did % 3).cast("string"),
        F.lit(">z</a><a\nhref=\"//cdn"), (did % 2).cast("string"),
        F.lit('.example/lib.js">w</a><a href="/abs/'),
        (did % 11).cast("string"), F.lit('">r</a>'),
        F.lit('<a href="#top">t</a><a href="mailto:a@b.c">m</a>'
              '<a data-href="https://no.example/">d</a><a href="">e</a><p>'),
        F.col("text"), F.lit("</p></body></html>"),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return extract_links(pages)


def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END link-graph composition: scaffolded html → href
    extraction → registered-domain edge collapse (self-loops dropped)
    → 5 iterations of deterministic integer PageRank.  The oracle
    constructs the SAME edge multiset directly from the doc_id
    arithmetic (the regex and domain-collapse layers carry their own
    gates: link_extract, url_domain_rollup) and replays the integer
    recurrence as 5 unrolled CTEs — exact BIGINT equality, the point
    of the integer formulation."""
    from sagan_spark.ops.linkgraph import domain_edges, extract_links, pagerank

    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<a href="https://src'), (F.col("doc_id") % 13).cast("string"),
        F.lit('.example/x">a</a><a href="https://ref'),
        (F.col("doc_id") % 5).cast("string"), F.lit('.org/">b</a>'),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return pagerank(domain_edges(extract_links(pages)), iterations=5)


def q_domain_pagerank_resumed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume-from-checkpoint parity for iterative compute: 3 cold
    iterations, rank table 'persisted' (localCheckpoint standing in
    for the snapshot write), then 2 warm-started iterations — the
    integer formulation makes warm(2, cold(3)) BIT-IDENTICAL to
    cold(5), so this gate replays the SAME 5-iteration oracle as
    domain_pagerank."""
    from sagan_spark.ops.linkgraph import domain_edges, extract_links, pagerank

    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<a href="https://src'), (F.col("doc_id") % 13).cast("string"),
        F.lit('.example/x">a</a><a href="https://ref'),
        (F.col("doc_id") % 5).cast("string"), F.lit('.org/">b</a>'),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    edges = domain_edges(extract_links(pages)).localCheckpoint(eager=True)
    snapshot = pagerank(edges, iterations=3).localCheckpoint(eager=True)
    return pagerank(edges, iterations=2, init_ranks=snapshot)


def q_link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer HITS over the same scaffolded domain
    graph as domain_pagerank: href extraction → registered-domain
    collapse → 3 L-infinity-normalized hub/authority iterations
    (ops/linkgraph.hits).  The oracle rebuilds the edge multiset from
    the doc_id arithmetic and replays the integer recurrence as
    unrolled CTEs with scalar-subquery maxima — exact BIGINT
    equality."""
    from sagan_spark.ops.linkgraph import domain_edges, extract_links, hits

    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<a href="https://src'), (F.col("doc_id") % 13).cast("string"),
        F.lit('.example/x">a</a><a href="https://ref'),
        (F.col("doc_id") % 5).cast("string"), F.lit('.org/">b</a>'),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return hits(domain_edges(extract_links(pages)), iterations=3)


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level corpus profiling (ops/profile.py) over documents
    with a deterministic defect scaffold (the synthetic table has no
    nulls, so doc_id%7 injects them: 0 → NULL text, 1 → empty text) —
    per-column null/empty counts, exact distinct cardinality, and
    integer milli-character length stats in ONE map-side-combining
    scan."""
    from sagan_spark.ops.profile import profile_columns

    docs = _docs(spark, sf_dir)
    scaffold = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 7 == 1, F.lit(""))
        .otherwise(F.col("text"))
        .alias("text_s"),
        "lang",
    )
    return profile_columns(scaffold, ["doc_id", "text_s", "lang"])


def q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health screen over documents with a deterministic
    defect scaffold (the synthetic text is clean ASCII, so each
    doc_id%4 class appends one defect family: mojibake digraph,
    U+FFFD, a C0 control, or nothing)."""
    from sagan_spark.ops.webclean import encoding_quality

    docs = _docs(spark, sf_dir)
    suffix = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" Ã©tÃ© broken"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" bad � char"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" ctl \x07 here"))
        .otherwise(F.lit(""))
    )
    scaffold = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return encoding_quality(scaffold)


def q_lm_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bigram LM trained on the deterministic holdout half of
    the corpus (the md5 'split' sample — the reference-corpus role of
    CCNet's LM filter), scoring ALL documents."""
    from sagan_spark.ops.lmscore import lm_likelihood, lm_train_bigrams
    from sagan_spark.ops.sampling import deterministic_sample

    docs = _docs(spark, sf_dir)
    ref = deterministic_sample(docs, 0.5, salt="split")
    lm = lm_train_bigrams(ref, n_buckets=1 << 18)
    return lm_likelihood(docs, lm)


def q_domain_lm_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain LM prior (ops/lmscore.domain_lm_prior): the CCNet
    per-domain perplexity table — average lm_score_ppm per registered
    domain over the synthetic url scaffold (same holdout-trained
    bigram model as lm_likelihood; NULL-skipping integer mean)."""
    from sagan_spark.ops.lmscore import domain_lm_prior, lm_train_bigrams
    from sagan_spark.ops.sampling import deterministic_sample

    docs = _docs(spark, sf_dir)
    ref = deterministic_sample(docs, 0.5, salt="split")
    lm = lm_train_bigrams(ref, n_buckets=1 << 18)
    tld = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(".co.uk"))
        .when(F.col("doc_id") % 3 == 1, F.lit(".com"))
        .otherwise(F.lit(".org"))
    )
    with_url = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www."), F.col("source"), tld,
            F.lit("/p/"), F.col("doc_id").cast("string"),
        ),
    )
    return domain_lm_prior(with_url, lm)


def q_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained bigram LM model TABLES as a first-class artifact
    (kind='pair'|'prefix', bucket, n) — training is one map-side-
    combining groupBy per table, output bounded by n_buckets; the
    same model lm_likelihood consumes via two broadcast joins."""
    from sagan_spark.ops.lmscore import lm_train_bigrams
    from sagan_spark.ops.sampling import deterministic_sample

    docs = _docs(spark, sf_dir)
    ref = deterministic_sample(docs, 0.5, salt="split")
    lm = lm_train_bigrams(ref, n_buckets=1 << 18)
    pairs = lm.pairs.select(
        F.lit("pair").alias("kind"),
        F.col("pair_bucket").alias("bucket"),
        F.col("pair_count").cast("long").alias("n"),
    )
    prefixes = lm.prefixes.select(
        F.lit("prefix").alias("kind"),
        F.col("prefix_bucket").alias("bucket"),
        F.col("prefix_count").cast("long").alias("n"),
    )
    return pairs.unionByName(prefixes)


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 rule set over documents with a deterministic defect
    scaffold: each doc_id%5 class appends one page-level tell (bad
    word / lorem ipsum / curly brace / a javascript line / nothing)
    so every boolean column carries both values at sf0.01."""
    from sagan_spark.ops.webclean import c4_filters

    docs = _docs(spark, sf_dir)
    suffix = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("\nwatch porn here now."))
        .when(F.col("doc_id") % 5 == 1, F.lit("\nfiller lorem ipsum text."))
        .when(F.col("doc_id") % 5 == 2, F.lit("\ncode { snippet } sample."))
        .when(F.col("doc_id") % 5 == 3, F.lit("\nenable javascript to view."))
        .otherwise(F.lit(""))
    )
    scaffold = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return c4_filters(scaffold)


def q_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail terciles per language: lang_id supplies
    the language, the 'split'-holdout bigram LM supplies the score,
    lm_buckets cuts exact per-language terciles off the score
    histogram (no corpus-wide sort)."""
    from sagan_spark.ops.lmscore import (
        lm_buckets,
        lm_likelihood,
        lm_train_bigrams,
    )
    from sagan_spark.ops.sampling import deterministic_sample
    from sagan_spark.ops.textstats import lang_id

    docs = _docs(spark, sf_dir)
    ref = deterministic_sample(docs, 0.5, salt="split")
    lm = lm_train_bigrams(ref, n_buckets=1 << 18)
    scored = lm_likelihood(docs, lm).select("doc_id", "lm_score_ppm")
    langs = lang_id(docs).select(
        "doc_id", F.col("pred_lang").alias("lang")
    )
    return lm_buckets(langs.join(scored, "doc_id"))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (ops/dsir.py): the md5 'dsir_target'
    quarter of the corpus plays the high-quality target distribution,
    the full corpus is the raw distribution, every document gets the
    integer target-vs-raw contrast score."""
    from sagan_spark.ops.dsir import dsir_train, dsir_weights
    from sagan_spark.ops.sampling import deterministic_sample

    docs = _docs(spark, sf_dir)
    target = deterministic_sample(docs, 0.25, salt="dsir_target")
    model = dsir_train(target, docs, n_buckets=1 << 16)
    return dsir_weights(docs, model)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy top-100 selection over the DSIR weights — the resampling
    step at temperature 0 (deterministic; md5 tiebreak)."""
    from sagan_spark.ops.dsir import dsir_topk

    return dsir_topk(q_dsir_weights(spark, sf_dir), 100)


def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n^alpha temperature mixing over the 20 synthetic sources
    (alpha .5, expected 150 of 500 docs at sf0.01) — rates land well
    inside (0,1) so both the hex-threshold and the keep-all sentinel
    paths stay exercised by unit tests, the gate pins the rate math."""
    from sagan_spark.ops.sampling import temperature_mix

    return temperature_mix(_docs(spark, sf_dir), budget=150, alpha=0.5).select(
        "doc_id", "source"
    )


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.webclean import corpus_prep

    return corpus_prep(_docs(spark, sf_dir))


def q_corpus_prep_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sagan_spark.ops.webclean import corpus_prep_yield

    return corpus_prep_yield(_docs(spark, sf_dir))


def q_webclean_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate line removal (ops/webclean.
    remove_boilerplate_lines, the CCNet line-dedup step): documents
    are wrapped in a deterministic multi-line page — a nav bar shared
    by every page, a newsletter footer shared by a third of them, a
    unique per-page visitor line, a whitespace-only layout line, and a
    per-source copyright — so the gate exercises drop (df >= 2), keep
    (unique lines), and blank-preservation paths.  The oracle builds
    the SAME page with || and replays the document-frequency rule."""
    from sagan_spark.ops.webclean import remove_boilerplate_lines

    docs = _docs(spark, sf_dir)
    page = F.concat_ws(
        "\n",
        F.col("text"),
        F.lit("Home | About | Contact"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("Subscribe to our newsletter")
        ).otherwise(F.concat(F.lit("Visitor note "), F.col("doc_id").cast("string"))),
        F.lit("  "),
        F.concat(F.lit("(c) "), F.col("source"), F.lit(" Media Group")),
    )
    pages = docs.select("doc_id", page.alias("text"))
    return remove_boilerplate_lines(pages, min_docs=2)


def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token-pair counts (ops/textstats.bpe_pair_stats, the
    BPE merge statistic) over the raw documents table — the word-salad
    corpus repeats tokens heavily, so the top-100 table is dense."""
    from sagan_spark.ops.textstats import bpe_pair_stats

    return bpe_pair_stats(_docs(spark, sf_dir), top_n=100)


def q_link_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + clustering coefficient
    (ops/linkgraph.triangle_stats, Suri & Vassilvitskii WWW'11
    degree-oriented wedges) over a deterministic domain graph: a
    13-cycle of s-domains cross-linked to 5 r-hubs — dense in
    triangles, plus duplicate/reversed edges the undirected
    normalization must collapse.  The oracle replays the exact
    (degree, node) orientation with SQL row-value comparisons."""
    from sagan_spark.ops.linkgraph import triangle_stats

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    edges = docs.select(
        F.concat(F.lit("s"), (did % 13).cast("string")).alias("src"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit("s"), ((did % 13 + 1) % 13).cast("string")),
        )
        .otherwise(F.concat(F.lit("r"), (did % 5).cast("string")))
        .alias("dst"),
    )
    return triangle_stats(edges)


def _triangles_oracle_sql() -> str:
    return (
        "WITH raw AS (SELECT 's' || CAST(doc_id % 13 AS VARCHAR) AS src,"
        " CASE WHEN doc_id % 3 = 0 THEN"
        " 's' || CAST((doc_id % 13 + 1) % 13 AS VARCHAR)"
        " ELSE 'r' || CAST(doc_id % 5 AS VARCHAR) END AS dst"
        " FROM documents),"
        " und AS (SELECT DISTINCT least(src, dst) AS a,"
        "  greatest(src, dst) AS b FROM raw"
        "  WHERE least(src, dst) <> greatest(src, dst)),"
        " deg AS (SELECT node, count(*) AS degree FROM ("
        "  SELECT a AS node FROM und UNION ALL SELECT b FROM und)"
        "  GROUP BY 1),"
        " ranked AS (SELECT u.a, u.b, da.degree AS da, db.degree AS db"
        "  FROM und u JOIN deg da ON da.node = u.a"
        "  JOIN deg db ON db.node = u.b),"
        " oriented AS (SELECT"
        "  CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS lo,"
        "  CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS hi,"
        "  CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS hid"
        "  FROM ranked),"
        " wedges AS (SELECT w1.lo AS p, w1.hi AS x, w2.hi AS y"
        "  FROM oriented w1 JOIN oriented w2 ON w1.lo = w2.lo"
        "  AND (w1.hid, w1.hi) < (w2.hid, w2.hi)),"
        " tris AS (SELECT w.p, w.x, w.y FROM wedges w"
        "  JOIN oriented o ON o.lo = w.x AND o.hi = w.y),"
        " pn AS (SELECT node, count(*) AS n_triangles FROM ("
        "  SELECT p AS node FROM tris UNION ALL SELECT x FROM tris"
        "  UNION ALL SELECT y FROM tris) GROUP BY 1)"
        " SELECT d.node, d.degree,"
        " CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles,"
        " CAST(CASE WHEN d.degree >= 2 THEN"
        "  (2000000 * coalesce(pn.n_triangles, 0))"
        "  // (d.degree * (d.degree - 1)) ELSE 0 END AS BIGINT)"
        "  AS clustering_ppm"
        " FROM deg d LEFT JOIN pn ON pn.node = d.node"
    )


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-scheduled frontier (ops/linkgraph.frontier_schedule
    over ops/robotstxt.crawl_delays): {source}.com domains declare a
    Crawl-delay derived from the source name, .org/.example domains
    fall back to the 3s default; fetch offset = (rank-1)*delay.  The
    oracle replays the frontier chain + the delay extraction."""
    from sagan_spark.ops.linkgraph import frontier_candidates, frontier_schedule
    from sagan_spark.ops.robotstxt import crawl_delays

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    # relative third link, q_frontier_candidates discipline
    html = F.concat(
        F.lit('<a href="https://'), F.col("source"), F.lit(".com/p/"),
        (did % 7).cast("string"),
        F.lit('">x</a><a href="https://ref'), (did % 5).cast("string"),
        F.lit('.org/">y</a><a href=/p/'), (did % 97).cast("string"),
        F.lit(">z</a>"),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            did.cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    robots = docs.select("source").distinct().select(
        F.concat(F.col("source"), F.lit(".com")).alias("domain"),
        F.concat(
            F.lit("User-agent: *\nCrawl-delay: "),
            (F.length("source") % 5 + 1).cast("string"),
            F.lit("\nDisallow: /private\n"),
        ).alias("robots_txt"),
    )
    return frontier_schedule(
        frontier_candidates(pages, k=5),
        crawl_delays(robots),
        default_delay_sec=3,
    )


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap: directive discovery from robots.txt bodies
    (ops/robotstxt.robots_sitemaps): case-insensitive field name,
    surrounding group lines ignored, comment lines skipped by the
    anchored multiline match, doc_id%3==2 files carry none."""
    from sagan_spark.ops.robotstxt import robots_sitemaps

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /private\n"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("Sitemap: https://"), F.col("source"),
                F.lit(".com/sitemap.xml\n# Sitemap: https://ignored.example/x\n"),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("sitemap:   https://"), F.col("source"),
                F.lit(".com/s1.xml\r\nSITEMAP: https://"), F.col("source"),
                F.lit(".com/s2.xml\n"),
            ),
        )
        .otherwise(F.lit("")),
        F.lit("Allow: /\n"),
    )
    robots = docs.select(F.col("source").alias("domain"), body.alias("robots_txt"))
    return robots_sitemaps(robots)


def _robots_sitemaps_oracle_sql() -> str:
    from sagan_spark.ops.robotstxt import robots_sitemaps_sql

    body = (
        "('User-agent: *' || chr(10) || 'Disallow: /private' || chr(10)"
        " || CASE WHEN doc_id % 3 = 0 THEN"
        "  'Sitemap: https://' || source || '.com/sitemap.xml' || chr(10)"
        "  || '# Sitemap: https://ignored.example/x' || chr(10)"
        " WHEN doc_id % 3 = 1 THEN"
        "  'sitemap:   https://' || source || '.com/s1.xml'"
        "  || chr(13) || chr(10)"
        "  || 'SITEMAP: https://' || source || '.com/s2.xml' || chr(10)"
        " ELSE '' END || 'Allow: /' || chr(10))"
    )
    inner = f"(SELECT source AS domain, {body} AS rt FROM documents)"
    return robots_sitemaps_sql("rt", inner)


def q_corpus_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive shard integrity manifest
    (ops/profile.shard_checksums) over the full documents table —
    modular 60-bit digest sums, independent shard window."""
    from sagan_spark.ops.profile import shard_checksums

    return shard_checksums(_docs(spark, sf_dir), n_shards=16)


def q_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed sparse-feature export (ops/textstats.doc_features):
    4096 buckets (collisions forced so per-bucket counts exceed 1),
    deterministic 'bucket:count' serialization, bucket-ascending."""
    from sagan_spark.ops.textstats import doc_features

    return doc_features(_docs(spark, sf_dir), n_buckets=4096)


def q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node link reciprocity (ops/linkgraph.link_reciprocity):
    the scaffold mixes mutual s-chain edges (i->i+1 from one doc
    class, i->i-1 from another — reciprocated when both classes hit
    the pair) with one-way r-spokes that can never reciprocate."""
    from sagan_spark.ops.linkgraph import link_reciprocity

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    edges = docs.select(
        F.concat(F.lit("s"), (did % 10).cast("string")).alias("src"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit("s"), ((did % 10 + 1) % 10).cast("string")),
        )
        .when(
            did % 3 == 1,
            F.concat(F.lit("s"), ((did % 10 + 9) % 10).cast("string")),
        )
        .otherwise(F.concat(F.lit("r"), (did % 5).cast("string")))
        .alias("dst"),
    )
    return link_reciprocity(edges)


def q_score_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group rank normalization (ops/quantiles.percentile_features)
    of document length within each language — pct_ppm =
    (1e6·n_below) div (n-1) off the (lang, score) histogram; the
    oracle replays the naive rank window (rank-1 == n_below) the
    histogram composition is provably equivalent to."""
    from sagan_spark.ops.quantiles import percentile_features

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.col("n_chars").alias("score")
    )
    return percentile_features(docs, "score", group_col="lang").select(
        "doc_id", "lang", "score", "n_below", "pct_ppm"
    )


def q_events_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU rollup (ops/funnel.active_users):
    exact distinct counts off the collapsed (day, key) frame — no
    countDistinct over raw events; carry-forward days appear with
    dau=0."""
    from sagan_spark.ops.funnel import active_users

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return active_users(ev, window_days=7)


def q_events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel (ops/funnel.funnel_stages with
    max_gap_sec=7200): stage i must land within 2h of stage i-1 or
    the chain breaks — the sparse synthetic event stream (~11h mean
    inter-event gap per user) breaks most chains, exercising the
    constraint.  Greedy walk, replayed verbatim by the oracle."""
    from sagan_spark.ops.funnel import funnel_stages

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_stages(
        ev, ["view", "click", "purchase"], max_gap_sec=7200
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous-aggregate cascade (ops/rollup.
    time_rollup): minute/hour/day per-event_type count/sum/min/max in
    integer milli-units; coarser levels aggregate the finest rollup
    (one raw scan, exchange-reused), the oracle recomputes every level
    from raw — equality proves the cascade exact."""
    from sagan_spark.ops.rollup import time_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return time_rollup(ev, resolutions=(60, 3600, 86400))


def _rollup_oracle_sql() -> str:
    def lvl(r: int) -> str:
        ru = r * 1_000_000
        return (
            f"SELECT CAST({r} AS BIGINT) AS resolution_sec,"
            ' event_type AS "key",'
            f" (epoch_us(ts) // {ru}) * {ru} AS bucket_us,"
            " count(*) AS n_events, CAST(sum(m) AS BIGINT) AS sum_milli,"
            " min(m) AS min_milli, max(m) AS max_milli"
            " FROM (SELECT event_type, ts,"
            "  CAST(floor(value * 1000) AS BIGINT) AS m FROM events"
            "  WHERE ts IS NOT NULL)"
            " GROUP BY 2, 3"
        )

    return " UNION ALL ".join(lvl(r) for r in (60, 3600, 86400))


_ASOF_BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC
_DAY_US = 86_400_000_000


def _asof_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic slowly-changing dimension over the events table's
    user space: 3 'plan version' snapshots per user (base day =
    user_id%10, then +7d/+14d), users divisible by 5 carry NO
    snapshots (no-match path), and users divisible by 7 duplicate the
    k=1 timestamp at k=2 (tie path: max payload must win)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = ev.select("user_id").distinct().filter(F.col("user_id") % 5 != 0)
    k = F.col("k")
    off = F.when(
        (k == 2) & (F.col("user_id") % 7 == 0), F.lit(0)
    ).otherwise((k - 1).cast("long") * F.lit(7 * _DAY_US))
    snap_us = (
        F.lit(_ASOF_BASE_US)
        + (F.col("user_id") % 10) * F.lit(_DAY_US)
        + off
    )
    return users.select(
        "user_id", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
    ).select(
        "user_id",
        F.timestamp_micros(snap_us).alias("ts"),
        F.concat(F.lit("v"), k.cast("string")).alias("snapshot"),
    )


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment, broadcast-dimension shape (ops/asof.
    asof_join_compact): each event picks the latest snapshot at-or-
    before its timestamp from a per-key sorted struct array — NO
    shuffle on the event side.  The scaffold dimension exercises
    no-snapshot users, before-first-snapshot events, and equal-ts
    snapshot ties."""
    from sagan_spark.ops.asof import asof_join_compact

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    return asof_join_compact(ev, _asof_dim(spark, sf_dir)).select(
        "event_id", "user_id", "right_ts_us", "snapshot"
    )


def q_events_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of join through the large-dimension two-phase
    bucket decomposition (ops/asof.asof_join, 3-day buckets forcing
    cross-bucket carry) — the oracle is IDENTICAL to events_asof's,
    proving the skew-safe shape bit-equal to the broadcast shape."""
    from sagan_spark.ops.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        ev, _asof_dim(spark, sf_dir), bucket_sec=3 * 86400
    ).select("event_id", "user_id", "right_ts_us", "snapshot")


def _asof_oracle_sql() -> str:
    """Global-definition replay: LEFT JOIN on (key, ts_r <= ts), the
    winner ranked by (ts_r desc, payload desc) — exactly the
    max(struct) spec of ops/asof.py."""
    return (
        "WITH u AS (SELECT DISTINCT user_id FROM events"
        " WHERE user_id % 5 <> 0),"
        " d AS (SELECT user_id, make_timestamp("
        f"{_ASOF_BASE_US} + (user_id % 10) * {_DAY_US}"
        " + CASE WHEN k = 2 AND user_id % 7 = 0 THEN 0"
        f" ELSE (k - 1) * {7 * _DAY_US} END) AS ts,"
        " 'v' || CAST(k AS VARCHAR) AS snapshot"
        " FROM u CROSS JOIN unnest([1, 2, 3]) AS t(k)),"
        " j AS (SELECT e.event_id, e.user_id, epoch_us(d.ts)"
        " AS right_ts_us, d.snapshot, row_number() OVER ("
        " PARTITION BY e.event_id ORDER BY d.ts DESC, d.snapshot DESC)"
        " AS rn FROM events e LEFT JOIN d"
        " ON d.user_id = e.user_id AND d.ts <= e.ts)"
        " SELECT event_id, user_id, right_ts_us, snapshot FROM j"
        " WHERE rn = 1"
    )


def q_streaming_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming as-of enrichment (streaming/asof.start_asof_query):
    the compact broadcast probe as a stream-static join, drained over
    the events table with availableNow — a FULL-oracle gate sharing
    events_asof's global-definition SQL (stateless per event, so
    chunking cannot change the answer)."""
    import shutil
    import tempfile

    _ship_package(spark)
    from sagan_spark.streaming.asof import start_asof_query

    work = tempfile.mkdtemp(prefix="sagan_asof_contract_")
    try:
        inp = f"{work}/in"
        os.makedirs(inp)
        shutil.copy(f"{sf_dir}/events.parquet", f"{inp}/events.parquet")
        q = start_asof_query(
            spark, inp, f"{work}/out", f"{work}/ckpt",
            dim=_asof_dim(spark, sf_dir),
        )
        if not q.awaitTermination(180):
            q.stop()
            raise TimeoutError("streaming drain did not finish in 180s")
        out = spark.read.parquet(f"{work}/out").select(
            "event_id", "user_id", "right_ts_us", "snapshot"
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_vocab_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies census (ops/textstats.vocab_spectrum):
    one map-side-combining token count, then a tiny rollup grouped by
    frequency — the Zipf/Heaps curve corpus QA reads.  No window, no
    join."""
    from sagan_spark.ops.textstats import vocab_spectrum

    return vocab_spectrum(_docs(spark, sf_dir))


def q_html_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML structural census + link density (ops/htmlstats.py): the
    deterministic scaffold injects every counted shape — a script
    whose string literal contains a tag (raw census must count it), a
    style block, quoted and uppercase anchors, a nested-markup anchor
    body, an entity in anchor text, an <abbr> trap that must NOT count
    as <a>, an <img>, and (doc_id%4==0) a trailing unclosed anchor
    that must contribute zero anchor chars.  The oracle applies the
    SAME census (ops.htmlstats.html_stats_sql, one source of truth)
    to the same scaffold string."""
    from sagan_spark.ops.htmlstats import html_stats

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><head><script src=x>var a="<b>";</script>'
              "<style>p{color:red}</style></head><body>"
              '<a href="/h">Home &amp; Garden</a>'),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("<A HREF=y><b>Bold</b> link "),
                (did % 5).cast("string"), F.lit("</A>"),
            ),
        ).otherwise(F.lit("")),
        F.lit('<img src=i><abbr>np</abbr><p>'), F.col("text"),
        F.lit("</p>"),
        F.when(did % 4 == 0, F.lit('<a href="tail">dangling'))
        .otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = docs.select(
        F.col("doc_id"), F.encode(html, "UTF-8").alias("html")
    )
    return html_stats(pages, id_col="doc_id")


def q_outlink_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page outlink-shape census (ops/htmlstats.outlink_census):
    the scaffold mixes an internal absolute link (same host as the
    page), an external one repeated (distinct-host dedup), a rotating
    ref{n}.org target, and a relative link — exercising every
    counter."""
    from sagan_spark.ops.htmlstats import outlink_census

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<a href="https://'), F.col("source"), F.lit(".example/p/"),
        (did % 9).cast("string"),
        F.lit('">self</a><a href="https://ext.com/x">e1</a>'
              '<a href="https://ext.com/y">e2</a><a href="https://ref'),
        (did % 5).cast("string"),
        F.lit('.org/">r</a><a href="/rel/path">rel</a><p>'),
        F.col("text"), F.lit("</p>"),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            did.cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return outlink_census(pages)


def _outlink_oracle_sql() -> str:
    from sagan_spark.ops.htmlstats import outlink_census_sql

    scaffold = (
        "('<a href=\"https://' || source || '.example/p/'"
        " || CAST(doc_id % 9 AS VARCHAR)"
        " || '\">self</a><a href=\"https://ext.com/x\">e1</a>"
        "<a href=\"https://ext.com/y\">e2</a><a href=\"https://ref'"
        " || CAST(doc_id % 5 AS VARCHAR)"
        " || '.org/\">r</a><a href=\"/rel/path\">rel</a><p>'"
        " || text || '</p>')"
    )
    inner = (
        "(SELECT 'https://' || source || '.example/p/'"
        " || CAST(doc_id AS VARCHAR) AS url,"
        f" {scaffold} AS h FROM documents)"
    )
    return outlink_census_sql("h") + f" FROM {inner}"


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniffing (ops/htmlmeta.charset_sniff): BOM > transport
    header > meta, with a deterministic scaffold covering every
    branch — doc_id%4 picks the BOM (UTF-8 / UTF-16LE / UTF-16BE /
    none; the UTF-16 branches must NOT be decoded), doc_id%3 the meta
    declaration (modern charset= / legacy http-equiv / none), and
    doc_id%5 the header charset.  The oracle applies the SAME sniff
    (ops.htmlmeta.charset_sql) to the same unhex||encode bytes."""
    from sagan_spark.ops.htmlmeta import charset_sniff

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    bom_hex = (
        F.when(did % 4 == 0, F.lit("EFBBBF"))
        .when(did % 4 == 1, F.lit("FFFE"))
        .when(did % 4 == 2, F.lit("FEFF"))
        .otherwise(F.lit(""))
    )
    body = F.concat(
        F.lit("<html><head>"),
        F.when(did % 3 == 0, F.lit('<meta charset="UTF-8">'))
        .when(
            did % 3 == 1,
            F.lit("<META HTTP-EQUIV='Content-Type'"
                  " CONTENT='text/html; charset=windows-1252'>"),
        )
        .otherwise(F.lit("")),
        F.lit("</head><body>"), F.col("text"), F.lit("</body></html>"),
    )
    headers = (
        F.when(
            did % 5 == 0,
            F.lit("Content-Type: text/html; charset=ISO-8859-1\r\nX-Y: z"),
        )
        .when(did % 5 == 1, F.lit("Content-Type: text/plain"))
        .otherwise(F.lit(None).cast("string"))
    )
    pages = docs.select(
        F.col("doc_id"),
        F.concat(F.unhex(bom_hex), F.encode(body, "UTF-8")).alias("html"),
        headers.alias("headers"),
    )
    return charset_sniff(pages, headers_col="headers", id_col="doc_id")


def q_frontier_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier mining (ops/linkgraph.frontier_candidates):
    scaffolded html carries three absolute links per page — a shared
    {source}.com target (hot, high n_refs), a ref{n}.org target, and
    a {source}.example target colliding with the CRAWLED url space so
    the anti-join actually removes rows.  Per-domain top-5 by citation
    count via the shared salted two-stage top-k; the oracle replays
    the chain with the plain global window it is provably equivalent
    to."""
    from sagan_spark.ops.linkgraph import frontier_candidates

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    # third link is ROOT-RELATIVE and unquoted: it resolves against
    # the page url to the same {source}.example/p/{n} target space as
    # before, proving relative navigation enters the frontier
    html = F.concat(
        F.lit('<a href="https://'), F.col("source"), F.lit(".com/p/"),
        (did % 7).cast("string"),
        F.lit('">x</a><a href="https://ref'), (did % 5).cast("string"),
        F.lit('.org/">y</a><a href=/p/'), (did % 97).cast("string"),
        F.lit(">z</a>"),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"),
            did.cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return frontier_candidates(pages, k=5)


def q_parse_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing (ops/sitemap.parse_sitemap): doc_id%13==0 pages
    are <sitemapindex> files (child-sitemap rows, kind='sitemap'),
    the rest <urlset> files carrying an entity-escaped loc with
    lastmod+priority, a loc-only entry, an UPPERCASE-tag entry, and a
    loc-less entry that must drop.  The oracle applies the SAME spec
    (ops.sitemap.sitemap_sql) to the same scaffold."""
    from sagan_spark.ops.sitemap import parse_sitemap

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    urlset = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc> https://'),
        F.col("source"), F.lit(".com/p?id="), (did % 50).cast("string"),
        F.lit("&amp;v=2 </loc><lastmod>2026-01-"),
        F.lpad((did % 28 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><priority>0."), (did % 10).cast("string"),
        F.lit("</priority></url><url><loc>https://"), F.col("source"),
        F.lit(".com/q/"), (did % 7).cast("string"),
        F.lit("</loc></url><URL><LOC>https://"), F.col("source"),
        F.lit(".com/up</LOC></URL>"
              "<url><lastmod>2026-02-01</lastmod></url></urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://"), F.col("source"),
        F.lit(".com/sitemap1.xml</loc><lastmod>2026-02-03</lastmod>"
              "</sitemap><sitemap><loc>https://"), F.col("source"),
        F.lit(".com/sitemap2.xml</loc></sitemap></sitemapindex>"),
    )
    xml = F.when(did % 13 == 0, index).otherwise(urlset)
    pages = docs.select("doc_id", F.encode(xml, "UTF-8").alias("html"))
    return parse_sitemap(pages, id_col="doc_id")


def _sitemap_oracle_sql() -> str:
    from sagan_spark.ops.sitemap import sitemap_sql

    urlset = (
        "'<?xml version=\"1.0\"?><urlset><url><loc> https://' || source"
        " || '.com/p?id=' || CAST(doc_id % 50 AS VARCHAR)"
        " || '&amp;v=2 </loc><lastmod>2026-01-'"
        " || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')"
        " || '</lastmod><priority>0.' || CAST(doc_id % 10 AS VARCHAR)"
        " || '</priority></url><url><loc>https://' || source"
        " || '.com/q/' || CAST(doc_id % 7 AS VARCHAR)"
        " || '</loc></url><URL><LOC>https://' || source"
        " || '.com/up</LOC></URL>"
        "<url><lastmod>2026-02-01</lastmod></url></urlset>'"
    )
    index = (
        "'<sitemapindex><sitemap><loc>https://' || source"
        " || '.com/sitemap1.xml</loc><lastmod>2026-02-03</lastmod>"
        "</sitemap><sitemap><loc>https://' || source"
        " || '.com/sitemap2.xml</loc></sitemap></sitemapindex>'"
    )
    inner = (
        f"(SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN {index}"
        f" ELSE {urlset} END AS x FROM documents)"
    )
    return sitemap_sql("x", inner, id_sql="doc_id")


def q_robots_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots meta-directive screen (ops/htmltext.robots_directives)
    over a BYTE html column: pages are wrapped in a deterministic
    scaffold where doc_id mod classes inject the three tag shapes —
    double-quoted "noindex, nofollow", uppercase-attr 'none', and a
    bare-value nofollow with trailing space — plus the no-tag default,
    so all four directive paths are exercised.  The oracle applies the
    SAME spec (ops.htmltext.robots_sql, one source of truth) to the
    same scaffold string."""
    from sagan_spark.ops.htmltext import robots_directives

    docs = _docs(spark, sf_dir)
    tagged = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit('<meta name="robots" content="noindex, nofollow">'),
        )
        .when(F.col("doc_id") % 5 == 0, F.lit("<meta NAME=ROBOTS CONTENT='none'>"))
        .when(F.col("doc_id") % 3 == 0, F.lit("<meta name=robots content=nofollow >"))
        .otherwise(F.lit(""))
    )
    scaffold = F.concat(
        F.lit("<html><head>"),
        tagged,
        F.lit("</head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    pages = docs.select("doc_id", F.encode(scaffold, "UTF-8").alias("html"))
    return robots_directives(pages)


def q_html_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured page metadata (ops/htmlmeta.page_metadata) over a
    BYTE html column: the deterministic scaffold injects all five
    fields with doc_id-mod shape variation — quoted/bare/absent lang
    attr, entity-laden title, double-quoted vs single-quoted vs absent
    meta description, alternating og:title, quoted-absolute vs
    bare-relative canonical — so every attr-form alternation and the
    empty-string no-match path are exercised.  The oracle applies the
    SAME spec (ops.htmlmeta.page_meta_sql) to the same scaffold."""
    from sagan_spark.ops.htmlmeta import page_metadata

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    lang_tag = (
        F.when(did % 4 == 0, F.lit('<html lang="en-GB">'))
        .when(did % 4 == 1, F.lit("<HTML LANG=fr>"))
        .when(did % 4 == 2, F.lit("<html data-x=1 lang='de'>"))
        .otherwise(F.lit("<html>"))
    )
    title = F.concat(
        F.lit("<title> "), F.col("source"),
        F.lit(" &amp;lt; Home &nbsp; "), (did % 10).cast("string"),
        F.lit(" </title>"),
    )
    desc = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<meta name="description" content="Desc '),
                F.col("source"), F.lit(', page">'),
            ),
        )
        .when(did % 3 == 1, F.lit("<meta NAME=description CONTENT='one two  three'>"))
        .otherwise(F.lit(""))
    )
    og = F.when(
        did % 2 == 0,
        F.concat(
            F.lit('<meta property="og:title" content="OG '),
            (did % 5).cast("string"), F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    canon = F.when(
        did % 5 == 0, F.lit("<link REL=canonical HREF=/rel/path>")
    ).otherwise(
        F.concat(
            F.lit('<link rel="canonical" href="https://'), F.col("source"),
            F.lit(".com/c/"), (did % 50).cast("string"), F.lit('">'),
        )
    )
    scaffold = F.concat(
        lang_tag, F.lit("<head>"), title, desc, og, canon,
        F.lit("</head><body><p>x</p></body></html>"),
    )
    pages = docs.select("doc_id", F.encode(scaffold, "UTF-8").alias("html"))
    return page_metadata(pages)


def q_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record parse (ops/warc.parse_warc) over per-row record
    bytes built deterministically from documents: doc_id-mod classes
    vary the WARC type, the HTTP status line (200 vs 404, HTTP/1.1 vs
    1.0), and the payload Content-Type; the body is the document text
    itself (NULL text → NULL record → NULL fields, the corrupt-record
    path).  The oracle applies the SAME parse (ops.warc.warc_sql) to
    the same record string."""
    from sagan_spark.ops.warc import parse_warc

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    wtype = F.when(did % 6 == 0, F.lit("request")).otherwise(F.lit("response"))
    status = F.when(did % 5 == 0, F.lit("HTTP/1.0 404 Not Found")).otherwise(
        F.lit("HTTP/1.1 200 OK")
    )
    mime = (
        F.when(did % 3 == 0, F.lit("text/html; charset=UTF-8"))
        .when(did % 3 == 1, F.lit("text/plain"))
        .otherwise(F.lit("application/json"))
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: "), wtype,
        F.lit("\r\nWARC-Record-ID: <urn:uuid:"), did.cast("string"),
        F.lit(">\r\nWARC-Date: 2026-08-"),
        F.lpad((did % 28 + 1).cast("string"), 2, "0"),
        F.lit("T12:00:00Z\r\nWARC-Target-URI: https://"), F.col("source"),
        F.lit(".com/p/"), (did % 50).cast("string"),
        F.lit("\r\nContent-Type: application/http; msgtype=response"
              "\r\nContent-Length: "),
        (F.length("text") + F.lit(60)).cast("string"),
        F.lit("\r\n\r\n"), status,
        F.lit("\r\nContent-Type: "), mime,
        F.lit("\r\nContent-Length: "), F.length("text").cast("string"),
        F.lit("\r\n\r\n"), F.col("text"),
    )
    records = docs.select("doc_id", F.encode(rec, "UTF-8").alias("warc"))
    return parse_warc(records).select(
        "doc_id", "warc_type", "record_id", "target_uri", "warc_date",
        "content_length", "http_status", "mime", "body_len",
        F.substring("body", 1, 64).alias("body_prefix"),
    )


def q_dedup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of LSH candidates
    (ops/dedup.edit_verify_pairs): JVM levenshtein over 512-char
    prefixes gated to >= 2 shared bands (the quadratic kernel runs
    only on likely duplicates), integer sim_ppm, keep >= 0.8 — the
    byte-level verify family next to jaccard/containment."""
    from sagan_spark.ops.dedup import edit_verify_pairs

    return edit_verify_pairs(
        _docs(spark, sf_dir), k=8, n_bands=4, prefix_chars=128,
        min_shared_bands=2,
    )


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided shingle containment on LSH candidates
    (ops/dedup.containment_pairs): catches the short-doc-quoted-in-
    long-doc shape Jaccard misses.  Same candidate CTEs as the
    ngram_jaccard oracle; containments projected instead."""
    from sagan_spark.ops.dedup import containment_pairs

    docs = _docs(spark, sf_dir)
    pairs = containment_pairs(docs, k=8, n_bands=4, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b",
        F.round("containment_a", 6).alias("containment_a"),
        F.round("containment_b", 6).alias("containment_b"),
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (ops/collocations.pmi_collocations):
    adjacent-bigram lift over the corpus, min_count=5 — the word-salad
    corpus repeats phrases heavily, so the table is dense."""
    from sagan_spark.ops.collocations import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir), min_count=5)


def _robots_body_sql_case(key: str) -> str:
    """The three robots.txt body shapes keyed by length(source) % 3 —
    ONE literal table drives the Spark CASE and the SQL CASE."""
    bodies = _ROBOTS_BODIES
    return (
        f"CASE ({key}) % 3"
        f" WHEN 0 THEN {_sq(bodies[0])}"
        f" WHEN 1 THEN {_sq(bodies[1])}"
        f" ELSE {_sq(bodies[2])} END"
    )


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"


# shape 0: star group after a specific-agent group (applies filtering);
# shape 1: multi-UA run + comments + empty Disallow (dropped) + tie case;
# shape 2: no star group at all (everything allowed for us)
_ROBOTS_BODIES = [
    "# robots for shape 0\nUser-agent: badbot\nDisallow: /\n\n"
    "User-agent: *\nDisallow: /p/1\nAllow: /p/12\nDisallow: /q/\n",
    "User-agent: googlebot\nUser-agent: *\n# mixed run\n"
    "Disallow:\nAllow: /p/1\nDisallow: /p/12\nDisallow: /ok\n",
    "User-agent: badbot\nDisallow: /p/\nDisallow: /ok/\n",
]


def q_robots_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl-permission screen (ops/robotstxt): per-domain
    robots bodies (three shapes by length(source) % 3 — see
    _ROBOTS_BODIES: group applicability, multi-UA runs, comments,
    empty Disallow, longest-match ties in both directions, and a
    domain with no applicable group) parsed into rules, then every
    page URL screened by longest-prefix match with Allow winning
    ties.  The oracle replays the same parse + screen
    (ops.robotstxt.robots_rules_sql / robots_screen_sql) over the
    same synthetic bodies and urls."""
    from sagan_spark.ops.robotstxt import parse_robots, url_robots_screen

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    robots = (
        docs.select(F.lower("source").alias("src")).distinct()
        .select(
            F.concat(F.col("src"), F.lit(".com")).alias("domain"),
            F.when(F.length("src") % 3 == 0, F.lit(_ROBOTS_BODIES[0]))
            .when(F.length("src") % 3 == 1, F.lit(_ROBOTS_BODIES[1]))
            .otherwise(F.lit(_ROBOTS_BODIES[2])).alias("robots_txt"),
        )
    )
    path = (
        F.when(did % 4 == 0, F.lit("/p/1"))
        .when(did % 4 == 1, F.lit("/p/12"))
        .when(did % 4 == 2, F.concat(F.lit("/q/"), (did % 9).cast("string")))
        .otherwise(F.concat(F.lit("/ok/"), (did % 9).cast("string")))
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.lower("source"), F.lit(".com"), path
        ).alias("url"),
    )
    rules = parse_robots(robots)
    return url_robots_screen(pages, rules)


def _snapshots(spark: SparkSession, sf_dir: str):
    """Two synthetic crawl snapshots from documents: old drops
    doc_id%10==0, new drops doc_id%7==0 and rewrites text for
    doc_id%3==0; urls collide (doc_id % 400) so the min-digest
    multi-capture collapse is exercised.  SAME expressions in the
    oracle."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".com/p/"),
        (did % 400).cast("string"),
    )
    base = docs.select(url.alias("url"), "text", "doc_id")
    old = base.filter(did % 10 != 0).select("url", "text")
    new = base.filter(did % 7 != 0).select(
        "url",
        F.when(did % 3 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"),
    )
    return old, new


def q_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL crawl-snapshot delta (ops/crawldiff.snapshot_diff):
    added/removed/changed/unchanged verdicts over two synthetic
    snapshots."""
    from sagan_spark.ops.crawldiff import snapshot_diff

    old, new = _snapshots(spark, sf_dir)
    return snapshot_diff(old, new)


def q_crawl_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verdict rollup of the snapshot diff (ops/crawldiff.diff_counts)."""
    from sagan_spark.ops.crawldiff import diff_counts

    old, new = _snapshots(spark, sf_dir)
    return diff_counts(old, new)


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH precision calibration (ops/dedup.minhash_calibration): the
    (n_shared_bands × exact-jaccard-decile) joint over candidate
    pairs — integer decile, map-side rollup."""
    from sagan_spark.ops.dedup import minhash_calibration

    return minhash_calibration(_docs(spark, sf_dir), k=8, n_bands=4)


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer training (ops/bpetrain.bpe_train): 8
    greedy merge rounds over the corpus's word-type frame — the
    double-space rendering makes literal replace() exactly Sennrich's
    left-to-right pairing, so the unrolled-CTE oracle reproduces the
    whole run bit-for-bit."""
    from sagan_spark.ops.bpetrain import bpe_train

    return bpe_train(_docs(spark, sf_dir), rounds=8)


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL path-template census (ops/urltools.url_template_mining):
    id-like segments collapse to {n}/{hex} placeholders; synthetic
    paths exercise numeric ids, hex ids, literal pages, multi-id
    paths, and the empty path; domains vary by doc_id%3 TLD so
    n_domains counts real PSL registered domains."""
    from sagan_spark.ops.urltools import url_template_mining

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    tld = (
        F.when(did % 3 == 0, F.lit(".co.uk"))
        .when(did % 3 == 1, F.lit(".com"))
        .otherwise(F.lit(".org"))
    )
    path = (
        F.when(did % 6 == 0,
               F.concat(F.lit("/product/"), (did % 40).cast("string"),
                        F.lit("/view")))
        .when(did % 6 == 1,
              F.concat(F.lit("/product/"), (did % 40).cast("string")))
        .when(did % 6 == 2,
              F.concat(F.lit("/u/"),
                       F.substring(F.md5(did.cast("string")), 1, 12)))
        .when(did % 6 == 3, F.lit("/about"))
        .when(did % 6 == 4,
              F.concat(F.lit("/blog/"), (did % 5).cast("string"),
                       F.lit("/"), (did % 97).cast("string")))
        .otherwise(F.lit(""))
    )
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), tld, path
        ).alias("url")
    )
    return url_template_mining(pages, min_urls=2)


def q_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch calibration (ops/sketch.cm_heavy_hitters):
    estimates vs exact counts over the corpus token stream, width 512
    so collisions actually occur (est > exact rows prove the sketch is
    doing sketch things); probes = the distinct tokens of every 101st
    document."""
    from sagan_spark.ops.sketch import cm_heavy_hitters
    from sagan_spark.ops.textstats import TOKEN_RE

    docs = _docs(spark, sf_dir)
    toks = F.explode(
        F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
    ).alias("key")
    items = docs.select(toks)
    probes = docs.filter(F.col("doc_id") % 101 == 0).select(toks).distinct()
    return cm_heavy_hitters(items, probes, width=512, depth=4)


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token estimate per source
    (ops/sketch.hll_distinct, p=10) calibrated against the exact
    distinct — integer-only registers and estimate, no IEEE chain."""
    from sagan_spark.ops.sketch import hll_distinct
    from sagan_spark.ops.textstats import TOKEN_RE

    docs = _docs(spark, sf_dir)
    items = docs.select(
        F.col("source").alias("grp"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
        ).alias("key"),
    )
    return hll_distinct(items, p=10)


def q_web_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end WARC→page ingest (ops/webpipeline.ingest_pipeline):
    framing parse, HTTP/MIME route flags, robots meta screen, text +
    metadata extraction, and the first-failing-reason keep verdict —
    ONE codegen pass.  The record scaffold varies status (404s), MIME
    (application/pdf rows), robots (noindex rows), and body length
    (short texts) so every reason branch fires; NULL text exercises
    the corrupt-record path.  The oracle composes the per-stage
    fragments (warc_sql / html_text_sql / meta_field_sqls /
    robots_noindex_sql) over the same scaffold."""
    from sagan_spark.ops.webpipeline import ingest_pipeline

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    robots = F.when(
        did % 7 == 0, F.lit('<meta name="robots" content="noindex">')
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit('<html lang="en"><head><title>T '), F.col("source"),
        F.lit("</title>"), robots,
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    status = F.when(did % 5 == 0, F.lit("HTTP/1.0 404 Not Found")).otherwise(
        F.lit("HTTP/1.1 200 OK")
    )
    mime = F.when(did % 3 == 2, F.lit("application/pdf")).otherwise(
        F.lit("text/html")
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://"),
        F.col("source"), F.lit(".com/p/"), (did % 50).cast("string"),
        F.lit("\r\n\r\n"), status,
        F.lit("\r\nContent-Type: "), mime,
        F.lit("\r\n\r\n"), body,
    )
    records = docs.select("doc_id", F.encode(rec, "UTF-8").alias("warc"))
    return ingest_pipeline(records)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding under the corpus-trained tokenizer
    (ops/bpetrain.bpe_encode): per-doc word and piece counts via ONE
    join against the vocab-bounded segmentation table — the sizing
    statistic packing/cost estimation need."""
    from sagan_spark.ops.bpetrain import bpe_encode

    return bpe_encode(_docs(spark, sf_dir), rounds=8)


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index materialization (ops/invindex.inverted_index),
    max_postings=10 so the word-salad corpus exercises the hot-term
    cap: df_count keeps the TRUE document frequency while postings
    keep only the top-10 by (tf DESC, doc_id)."""
    from sagan_spark.ops.invindex import inverted_index

    return inverted_index(_docs(spark, sf_dir), max_postings=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s5_pipe_decode": q_s5_pipe_decode,
        "f1_program_prefilter": q_f1_program_prefilter,
        "f2_isin_prefilter": q_f2_isin_prefilter,
        "f2_syslog_priority": q_f2_syslog_priority,
        "f3_content_modifiers": q_f3_content_modifiers,
        "f4_pcre": q_f4_pcre,
        "f5_meta_content": q_f5_meta_content,
        "f6_json_content": q_f6_json_content,
        "f11_alert_time": q_f11_alert_time,
        "p3_parse_ip": q_p3_parse_ip,
        "p4_parse_hash": q_p4_parse_hash,
        "p6_grok_normalize": q_p6_grok_normalize,
        "j1_cidr_range_join": q_j1_cidr_range_join,
        "j7_classification_join": q_j7_classification_join,
        "f10_flow": q_f10_flow,
        "f14_ignore_list": q_f14_ignore_list,
        "f15_pass_mask": q_f15_pass_mask,
        "p1_json_flatten": q_p1_json_flatten,
        "p9_append_program": q_p9_append_program,
        "s6_json_input_map": q_s6_json_input_map,
        "a6_flexbit_count": q_a6_flexbit_count,
        "j2_intel_set": q_j2_intel_set,
        "j4_geoip": q_j4_geoip,
        "j5_proto_map": q_j5_proto_map,
        "a1_threshold_limit": q_a1_threshold_limit,
        "a2_threshold_suppress": q_a2_threshold_suppress,
        "a3_after": q_a3_after,
        "a4_xbit_interval_join": q_a4_xbit_interval_join,
        "a9_track_clients": q_a9_track_clients,
        "a9_client_transitions": q_a9_client_transitions,
        "a10_client_stats": q_a10_client_stats,
        "a10_client_stats_full": q_a10_client_stats_full,
        "k3_eve_assembly": q_k3_eve_assembly,
        "k7_sink_fanout": q_k7_sink_fanout,
        "a11_lineage_rollup": q_a11_lineage_rollup,
        "j3_bluedot": q_j3_bluedot,
        "a1_threshold_engine": q_a1_threshold_engine,
        "streaming_threshold_engine": q_streaming_threshold_engine,
        "a4_chain_after_engine": q_a4_chain_after_engine,
        "k6_external_route": q_k6_external_route,
        "f7_json_pcre": q_f7_json_pcre,
        "f8_json_meta_content": q_f8_json_meta_content,
        "f9_event_id": q_f9_event_id,
        "p10_base64_json": q_p10_base64_json,
        "a12_dynamic_rules": q_a12_dynamic_rules,
        "k2_fast_format": q_k2_fast_format,
        "k1_alert_view": q_k1_alert_view,
        "k4_syslog_format": q_k4_syslog_format,
        "k3_eve_log": q_k3_eve_log,
        "a11_stats_json": q_a11_stats_json,
        "streaming_threshold": q_streaming_threshold,
        "dedup_exact": q_dedup_exact,
        "dedup_soft_weights": q_dedup_soft_weights,
        "dedup_paragraphs_within": q_dedup_paragraphs_within,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_cluster_canonical": q_dedup_cluster_canonical,
        "dedup_cluster_star": q_dedup_cluster_star,
        "dedup_drop_list": q_dedup_drop_list,
        "dedup_paragraphs": q_dedup_paragraphs,
        "decontam_hits": q_decontam_hits,
        "decontam_filter": q_decontam_filter,
        "dedup_duplicated_spans": q_dedup_duplicated_spans,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "dedup_semantic": q_dedup_semantic,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_quantized_topk": q_ann_quantized_topk,
        "classifier_calibrate": q_classifier_calibrate,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_recall": q_ann_recall,
        "ann_ivf_topk": q_ann_ivf_topk,
        "html_extract_text": q_html_extract_text,
        "text_langid": q_text_langid,
        "text_langid_trained": q_text_langid_trained,
        "text_quality": q_text_quality,
        "text_tokens": q_text_tokens,
        "text_fingerprint": q_text_fingerprint,
        "vocab_stats": q_vocab_stats,
        "tfidf_topk": q_tfidf_topk,
        "bm25_topk": q_bm25_topk,
        "pack_sequences": q_pack_sequences,
        "doc_chunks": q_doc_chunks,
        "pack_chunk_stats": q_pack_chunk_stats,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_meta_jpeg": q_multimodal_meta_jpeg,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_features_ann": q_multimodal_features_ann,
        "webclean_repetition": q_webclean_repetition,
        "webclean_top_ngram": q_webclean_top_ngram,
        "webclean_pii": q_webclean_pii,
        "webclean_verdict": q_webclean_verdict,
        "webclean_gopher": q_webclean_gopher,
        "webclean_classifier": q_webclean_classifier,
        "classifier_train": q_classifier_train,
        "webclean_classifier_trained": q_webclean_classifier_trained,
        "url_domain_rollup": q_url_domain_rollup,
        "url_blocklist": q_url_blocklist,
        "url_canonicalize": q_url_canonicalize,
        "url_dedup": q_url_dedup,
        "dedup_span_removal": q_dedup_span_removal,
        "dedup_span_removal_keepone": q_dedup_span_removal_keepone,
        "dedup_incremental": q_dedup_incremental,
        "dedup_incremental_minhash": q_dedup_incremental_minhash,
        "dedup_incremental_bloom": q_dedup_incremental_bloom,
        "events_sessionize": q_events_sessionize,
        "events_session_rollup": q_events_session_rollup,
        "events_session_rollup_native": q_events_session_rollup_native,
        "streaming_sessionize": q_streaming_sessionize,
        "events_funnel": q_events_funnel,
        "events_funnel_counts": q_events_funnel_counts,
        "events_cohort_retention": q_events_cohort_retention,
        "events_bursts": q_events_bursts,
        "events_quantiles": q_events_quantiles,
        "dedup_exact_normalized": q_dedup_exact_normalized,
        "text_readability": q_text_readability,
        "text_novelty": q_text_novelty,
        "corpus_prep": q_corpus_prep,
        "corpus_prep_yield": q_corpus_prep_yield,
        "sample_deterministic": q_sample_deterministic,
        "sample_budget": q_sample_budget,
        "sample_split": q_sample_split,
        "sample_stratified": q_sample_stratified,
        "sample_domain_quota": q_sample_domain_quota,
        "sample_temperature": q_sample_temperature,
        "link_extract": q_link_extract,
        "anchor_extract": q_anchor_extract,
        "anchor_domain_topk": q_anchor_domain_topk,
        "domain_pagerank": q_domain_pagerank,
        "link_hits": q_link_hits,
        "corpus_profile": q_corpus_profile,
        "encoding_quality": q_encoding_quality,
        "lm_likelihood": q_lm_likelihood,
        "lm_train": q_lm_train,
        "lm_buckets": q_lm_buckets,
        "c4_filters": q_c4_filters,
        "dsir_weights": q_dsir_weights,
        "dsir_select": q_dsir_select,
        "webclean_boilerplate": q_webclean_boilerplate,
        "bpe_pair_stats": q_bpe_pair_stats,
        "robots_directives": q_robots_directives,
        "html_metadata": q_html_metadata,
        "warc_parse": q_warc_parse,
        "dedup_containment": q_dedup_containment,
        "pmi_collocations": q_pmi_collocations,
        "robots_screen": q_robots_screen,
        "inverted_index": q_inverted_index,
        "crawl_diff": q_crawl_diff,
        "crawl_diff_counts": q_crawl_diff_counts,
        "minhash_calibration": q_minhash_calibration,
        "streaming_bursts": q_streaming_bursts,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "web_ingest": q_web_ingest,
        "cm_heavy_hitters": q_cm_heavy_hitters,
        "hll_distinct": q_hll_distinct,
        "url_templates": q_url_templates,
        "url_surt_shards": q_url_surt_shards,
        "vocab_spectrum": q_vocab_spectrum,
        "html_stats": q_html_stats,
        "charset_sniff": q_charset_sniff,
        "frontier_candidates": q_frontier_candidates,
        "sample_mixture_quotas": q_sample_mixture_quotas,
        "sample_mixture": q_sample_mixture,
        "parse_sitemap": q_parse_sitemap,
        "events_asof": q_events_asof,
        "events_asof_bucketed": q_events_asof_bucketed,
        "events_rollup": q_events_rollup,
        "outlink_census": q_outlink_census,
        "streaming_asof": q_streaming_asof,
        "link_triangles": q_link_triangles,
        "link_reciprocity": q_link_reciprocity,
        "score_percentiles": q_score_percentiles,
        "robots_sitemaps": q_robots_sitemaps,
        "corpus_checksums": q_corpus_checksums,
        "doc_features": q_doc_features,
        "domain_pagerank_resumed": q_domain_pagerank_resumed,
        "dedup_edit_verify": q_dedup_edit_verify,
        "events_actives": q_events_actives,
        "sample_mixture_budget": q_sample_mixture_budget,
        "events_funnel_windowed": q_events_funnel_windowed,
        "frontier_schedule": q_frontier_schedule,
        "domain_lm_prior": q_domain_lm_prior,
        "dedup_sentences": q_dedup_sentences,
    }


def _html_extract_sql() -> str:
    """html_extract_text oracle: the SAME scaffold and the SAME rewrite
    chain (ops.htmltext.html_text_sql) the Spark query runs — decode
    (encode(s)) on the Spark side is the identity on valid UTF-8, so
    the oracle applies the chain to the scaffold string directly."""
    from sagan_spark.ops.htmltext import html_text_sql

    scaffold = (
        "'<html><head><title>' || source ||"
        " '</title><script type=\"x\">var a = 1 < 2;</script>' ||"
        " '<style>p { color: red }</style></head><body><!-- id ' ||"
        " CAST(doc_id AS VARCHAR) || ' --><h1>' || source ||"
        " '</h1><p>' || text || ' &amp;lt; &nbsp;done</p></body></html>'"
    )
    return (
        f"SELECT doc_id, {html_text_sql('(' + scaffold + ')')}"
        " AS text_extracted FROM documents"
    )


def _langid_sql() -> str:
    """Per-doc langid oracle core — (doc_id, pred_lang) — generated
    from the SAME dicts the Spark op uses
    (sagan_spark.ops.textstats.LANG_MARKERS / LANG_SCRIPTS): one
    source of truth for marker words, script ranges + fraction
    thresholds, the script-cascade order, and the first-wins marker
    tie-break order.  text_langid rolls this up
    (:func:`_langid_rollup_sql`); lm_buckets joins it per-doc."""
    from sagan_spark.ops.textstats import (
        LANG_MARKERS,
        LANG_SCRIPTS,
        NON_ASCII_RE,
        script_pattern,
    )

    scores = ", ".join(
        "CAST(len(list_filter(string_split(t, ' '), x -> x IN ("
        + ", ".join(f"'{m}'" for m in markers)
        + f"))) AS DOUBLE) AS s_{lang}"
        for lang, markers in LANG_MARKERS.items()
    )
    scripts = ", ".join(
        f"CASE WHEN len(regexp_extract_all(t, '{NON_ASCII_RE}')) > 0"
        f" THEN len(regexp_extract_all(t, '{script_pattern(ranges)}'))"
        f" ELSE 0 END AS c_{lang}"
        for lang, (ranges, _f) in LANG_SCRIPTS.items()
    )
    script_case = " ".join(
        f"WHEN nc > 0 AND c_{lang} >= {frac} * nc THEN '{lang}'"
        for lang, (_r, frac) in LANG_SCRIPTS.items()
    )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs)
    cols = ", ".join(
        [f"s_{lang}" for lang in langs]
        + [f"c_{lang}" for lang in LANG_SCRIPTS]
        + ["nc"]
    )
    return (
        f"SELECT doc_id, CASE {script_case}"
        " WHEN best <= 0 THEN 'und' " + case + " ELSE 'und' END"
        " AS pred_lang FROM ("
        f"SELECT doc_id, {best} AS best, {cols} FROM ("
        f"SELECT doc_id, {scores}, {scripts}, length(t) AS nc"
        " FROM (SELECT doc_id, text AS t"
        " FROM documents)))"
    )


def _langid_trained_sql() -> str:
    """text_langid_trained oracle: the broadcast-model argmax replayed
    with a per-doc window (oracle side only — the Spark op is the
    min(struct) aggregation), weights inlined from the SAME
    :func:`_langid_trained_weights` list."""
    vals = ", ".join(
        f"('{tok}', '{lang}', {w})" for tok, lang, w in _langid_trained_weights()
    )
    return (
        f"WITH w(token, lang, weight_milli) AS (VALUES {vals}), "
        "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token"
        " FROM documents), "
        "per AS (SELECT doc_id, lang, SUM(weight_milli) AS s FROM toks"
        " JOIN w USING (token) GROUP BY doc_id, lang), "
        "win AS (SELECT doc_id, lang, s, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY s DESC, lang ASC) AS rn FROM per) "
        "SELECT d.doc_id, COALESCE(win.lang, 'und') AS pred_lang, "
        "COALESCE(ROUND(win.s / 1000.0, 6), 0.0) AS best_score "
        "FROM documents d LEFT JOIN (SELECT * FROM win WHERE rn = 1) win"
        " USING (doc_id)"
    )


def _langid_rollup_sql() -> str:
    """text_langid oracle: the per-doc langid core rolled up to
    (pred_lang, n) — the gate's output shape."""
    return (
        "SELECT pred_lang, count(*) AS n FROM ("
        + _langid_sql()
        + ") GROUP BY 1"
    )


def _pagerank_sql(iterations: int = 5, damping_milli: int = 850,
                  scale: int = 1_000_000) -> str:
    """domain_pagerank oracle: the q_domain_pagerank edge multiset
    rebuilt from doc_id arithmetic, then the integer recurrence of
    ops/linkgraph.pagerank unrolled as one CTE per iteration.  DuckDB
    `//` and Spark `div` agree exactly on the non-negative BIGINTs
    involved (floor == truncate for non-negatives)."""
    base = (1000 - damping_milli) * scale // 1000
    sql = (
        "WITH e AS ("
        " SELECT source || '.example' AS src,"
        "  'src' || CAST(doc_id % 13 AS VARCHAR) || '.example' AS dst"
        "  FROM documents"
        " UNION ALL SELECT source || '.example',"
        "  'ref' || CAST(doc_id % 5 AS VARCHAR) || '.org' FROM documents),"
        " ef AS (SELECT src, dst FROM e WHERE src != dst),"
        " outd AS (SELECT src, count(*) AS outdeg FROM ef GROUP BY 1),"
        " nodes AS (SELECT src AS node FROM ef UNION SELECT dst FROM ef),"
        f" r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes),"
    )
    for i in range(iterations):
        sql += (
            f" r{i + 1} AS (SELECT n.node,"
            f" CAST({base} + ({damping_milli} * coalesce(c.s, 0)) // 1000"
            f"  AS BIGINT) AS rank"
            f" FROM nodes n LEFT JOIN ("
            f"  SELECT ef.dst AS node, sum(r.rank // outd.outdeg) AS s"
            f"  FROM ef JOIN r{i} r ON ef.src = r.node"
            f"  JOIN outd ON ef.src = outd.src GROUP BY 1) c"
            f" ON n.node = c.node),"
        )
    return sql.rstrip(",") + f" SELECT node, rank FROM r{iterations}"


def _hits_sql(iterations: int = 3, scale: int = 1_000_000) -> str:
    """link_hits oracle: the q_link_hits edge multiset rebuilt from
    doc_id arithmetic, then ops/linkgraph.hits's integer recurrence
    unrolled — per iteration a raw-sum CTE and an L-infinity rescale
    CTE (scalar-subquery max) for each of authority and hub.  DuckDB
    `//` and Spark `div` agree exactly on the non-negative BIGINTs."""
    sql = (
        "WITH e AS ("
        " SELECT source || '.example' AS src,"
        "  'src' || CAST(doc_id % 13 AS VARCHAR) || '.example' AS dst"
        "  FROM documents"
        " UNION ALL SELECT source || '.example',"
        "  'ref' || CAST(doc_id % 5 AS VARCHAR) || '.org' FROM documents),"
        " ef AS (SELECT src, dst FROM e WHERE src != dst),"
        " nodes AS (SELECT src AS node FROM ef UNION SELECT dst FROM ef),"
        f" h0 AS (SELECT node, CAST({scale} AS BIGINT) AS hub FROM nodes),"
    )
    for i in range(iterations):
        sql += (
            f" a{i + 1}r AS (SELECT n.node,"
            f" CAST(coalesce(c.s, 0) AS BIGINT) AS auth"
            f" FROM nodes n LEFT JOIN ("
            f"  SELECT ef.dst AS node, sum(h.hub) AS s"
            f"  FROM ef JOIN h{i} h ON ef.src = h.node GROUP BY 1) c"
            f" ON n.node = c.node),"
            f" a{i + 1} AS (SELECT node, CAST((auth * {scale}) //"
            f"  greatest((SELECT max(auth) FROM a{i + 1}r), 1)"
            f"  AS BIGINT) AS auth FROM a{i + 1}r),"
            f" h{i + 1}r AS (SELECT n.node,"
            f" CAST(coalesce(c.s, 0) AS BIGINT) AS hub"
            f" FROM nodes n LEFT JOIN ("
            f"  SELECT ef.src AS node, sum(a.auth) AS s"
            f"  FROM ef JOIN a{i + 1} a ON ef.dst = a.node GROUP BY 1) c"
            f" ON n.node = c.node),"
            f" h{i + 1} AS (SELECT node, CAST((hub * {scale}) //"
            f"  greatest((SELECT max(hub) FROM h{i + 1}r), 1)"
            f"  AS BIGINT) AS hub FROM h{i + 1}r),"
        )
    return sql.rstrip(",") + (
        f" SELECT h.node AS node, h.hub AS hub, a.auth AS auth"
        f" FROM h{iterations} h JOIN a{iterations} a ON h.node = a.node"
    )


def _corpus_profile_sql() -> str:
    """corpus_profile oracle: the q_corpus_profile null/empty scaffold,
    then ops/profile.profile_columns replayed as one SELECT per
    profiled column UNION ALLed — the same string-cast lengths,
    NULL-skipping distinct, and (sum*1000) // n_nonnull milli-mean."""

    def one(col: str) -> str:
        e = f"CAST({col} AS VARCHAR)"
        return (
            f"SELECT '{col}' AS col_name, count(*) AS n_rows,"
            f" CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
            f"  AS BIGINT) AS n_null,"
            f" CAST(sum(CASE WHEN {e} = '' THEN 1 ELSE 0 END)"
            f"  AS BIGINT) AS n_empty,"
            f" count(DISTINCT {col}) AS n_distinct,"
            f" min(length({e})) AS len_min,"
            f" max(length({e})) AS len_max,"
            f" CAST(CASE WHEN count(*) >"
            f"  sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
            f" THEN (sum(coalesce(length({e}), 0)) * 1000) //"
            f"  (count(*) -"
            f"   sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END))"
            f" END AS BIGINT) AS len_avg_milli"
            f" FROM d"
        )

    return (
        "WITH d AS (SELECT doc_id,"
        " CASE WHEN doc_id % 7 = 0 THEN NULL"
        "  WHEN doc_id % 7 = 1 THEN '' ELSE text END AS text_s,"
        " lang FROM documents) "
        + " UNION ALL ".join(one(c) for c in ["doc_id", "text_s", "lang"])
    )


def _encoding_quality_sql() -> str:
    """encoding_quality oracle: defect scaffold + the same regex/
    literal constants the Spark op uses (one source of truth)."""
    from sagan_spark.ops.webclean import (
        CONTROL_RE,
        MOJIBAKE_RE,
        REPLACEMENT_CHAR,
    )

    return (
        "SELECT doc_id, n_replacement, n_control, n_mojibake,"
        " (n_replacement = 0 AND n_control = 0"
        "  AND n_mojibake <= 0.001 * length(t)) AS enc_ok"
        " FROM (SELECT doc_id, t,"
        " CAST(length(t) - length(replace(t,"
        f" '{REPLACEMENT_CHAR}', '')) AS BIGINT) AS n_replacement,"
        f" CAST(len(regexp_extract_all(t, '{CONTROL_RE}')) AS BIGINT)"
        "  AS n_control,"
        f" CAST(len(regexp_extract_all(t, '{MOJIBAKE_RE}')) AS BIGINT)"
        "  AS n_mojibake"
        " FROM (SELECT doc_id, text || CASE doc_id % 4"
        "  WHEN 0 THEN ' Ã©tÃ© broken' WHEN 1 THEN ' bad � char'"
        "  WHEN 2 THEN ' ctl \x07 here' ELSE '' END AS t FROM documents))"
    )


def _lm_likelihood_sql() -> str:
    """lm_likelihood oracle (ops/lmscore.py): train hashed bigram
    counts on the md5-'split' holdout half, score every document —
    the same 60-bit md5 bucket idiom as the Spark side, integer
    milli-prob (1000*pc) // fc end to end."""
    from sagan_spark.ops.sampling import frac_to_hex8

    return (
        "WITH d AS (SELECT doc_id, regexp_extract_all(text,"
        " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS l FROM documents),"
        " trp AS (SELECT l[i] AS prev, l[i+1] AS tok FROM ("
        "  SELECT l, unnest(generate_series(1, len(l) - 1)) AS i"
        "  FROM d WHERE len(l) >= 2 AND"
        f"  substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)"
        f"  < '{frac_to_hex8(0.5)}')),"
        " pairs AS (SELECT"
        "  ('0x'||substr(md5(prev||'|'||tok),1,15))::BIGINT % 262144 AS pb,"
        "  count(*) AS pc FROM trp GROUP BY 1),"
        " prefixes AS (SELECT"
        "  ('0x'||substr(md5(prev),1,15))::BIGINT % 262144 AS fb,"
        "  count(*) AS fc FROM trp GROUP BY 1),"
        " dp AS (SELECT doc_id, l[i] AS prev, l[i+1] AS tok FROM ("
        "  SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i"
        "  FROM d WHERE len(l) >= 2)),"
        " sc AS (SELECT doc_id,"
        "  coalesce((1000 * pc) // fc, 0) AS milli FROM dp"
        "  LEFT JOIN pairs ON pairs.pb ="
        "   ('0x'||substr(md5(prev||'|'||tok),1,15))::BIGINT % 262144"
        "  LEFT JOIN prefixes ON prefixes.fb ="
        "   ('0x'||substr(md5(prev),1,15))::BIGINT % 262144),"
        " agg AS (SELECT doc_id, count(*)::BIGINT AS n_pairs,"
        "  (1000 * sum(milli)) // count(*) AS lm_score_ppm"
        "  FROM sc GROUP BY 1)"
        " SELECT doc_id, n_pairs, CAST(lm_score_ppm AS BIGINT)"
        "  AS lm_score_ppm FROM agg"
        " UNION ALL SELECT doc_id, CAST(0 AS BIGINT),"
        "  CAST(NULL AS BIGINT) FROM d WHERE coalesce(len(l), 0) < 2"
    )


def _lm_train_sql() -> str:
    """lm_train oracle: the SAME holdout-half bigram stream as
    _lm_likelihood_sql, emitting the two model tables union-tagged."""
    from sagan_spark.ops.sampling import frac_to_hex8

    return (
        "WITH d AS (SELECT doc_id, regexp_extract_all(text,"
        " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS l FROM documents),"
        " trp AS (SELECT l[i] AS prev, l[i+1] AS tok FROM ("
        "  SELECT l, unnest(generate_series(1, len(l) - 1)) AS i"
        "  FROM d WHERE len(l) >= 2 AND"
        f"  substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)"
        f"  < '{frac_to_hex8(0.5)}'))"
        " SELECT 'pair' AS kind,"
        "  ('0x'||substr(md5(prev||'|'||tok),1,15))::BIGINT % 262144 AS bucket,"
        "  count(*)::BIGINT AS n FROM trp GROUP BY 2"
        " UNION ALL SELECT 'prefix',"
        "  ('0x'||substr(md5(prev),1,15))::BIGINT % 262144,"
        "  count(*)::BIGINT FROM trp GROUP BY 2"
    )


def _dsir_weights_sql() -> str:
    """dsir_weights oracle (ops/dsir.py): hashed unigram+bigram grams
    into 2^16 buckets (60-bit md5 idiom), target = the md5
    'dsir_target' quarter, raw = everything; integer ppm contrast
    summed per doc.  Token-less docs carry n_grams 0 / NULL score."""
    from sagan_spark.ops.sampling import frac_to_hex8

    tok = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return (
        f"WITH d AS (SELECT doc_id, regexp_extract_all(text, '{tok}')"
        "  AS l FROM documents),"
        " g AS (SELECT doc_id, unnest(l) AS gram FROM d"
        "  UNION ALL"
        "  SELECT doc_id, l[i] || '|' || l[i+1] AS gram FROM ("
        "   SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i"
        "   FROM d WHERE len(l) >= 2)),"
        " gb AS (SELECT doc_id,"
        "  ('0x'||substr(md5(gram),1,15))::BIGINT % 65536 AS bucket FROM g),"
        " tgt AS (SELECT bucket, count(*) AS tc FROM gb"
        "  WHERE substr(md5('dsir_target|' || CAST(doc_id AS VARCHAR)), 1, 8)"
        f"  < '{frac_to_hex8(0.25)}' GROUP BY 1),"
        " raw AS (SELECT bucket, count(*) AS qc FROM gb GROUP BY 1),"
        " tot AS (SELECT (SELECT sum(tc) FROM tgt) AS tn,"
        "  (SELECT sum(qc) FROM raw) AS qn),"
        " model AS (SELECT coalesce(tgt.bucket, raw.bucket) AS bucket,"
        "  coalesce((1000000 * coalesce(tc, 0)) // tn, 0) AS ppm_t,"
        "  coalesce((1000000 * coalesce(qc, 0)) // qn, 0) AS ppm_q"
        "  FROM tgt FULL JOIN raw ON tgt.bucket = raw.bucket, tot),"
        " sc AS (SELECT gb.doc_id, count(*)::BIGINT AS n_grams,"
        "  sum(coalesce(ppm_t, 0) - coalesce(ppm_q, 0))::BIGINT"
        "   AS dsir_score"
        "  FROM gb LEFT JOIN model USING (bucket) GROUP BY 1)"
        " SELECT doc_id, n_grams, dsir_score FROM sc"
        " UNION ALL SELECT doc_id, CAST(0 AS BIGINT), CAST(NULL AS BIGINT)"
        "  FROM d WHERE coalesce(len(l), 0) < 1"
    )


def _dsir_select_sql() -> str:
    """dsir_select oracle: top-100 by score with the md5 'dsir'
    tiebreak, NULL scores excluded (DESC NULLS placement differs
    between engines, and unscorable docs must not be selected)."""
    return (
        f"WITH w AS ({_dsir_weights_sql()})"
        " SELECT doc_id, n_grams, dsir_score FROM w"
        " WHERE dsir_score IS NOT NULL"
        " ORDER BY dsir_score DESC,"
        "  substr(md5('dsir|' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id"
        " LIMIT 100"
    )


def _c4_filters_sql() -> str:
    """c4_filters oracle: the q_c4_filters defect scaffold + the same
    line/page rules, regex and badword constants imported from the op
    module (one source of truth)."""
    import re as _re

    from sagan_spark.ops.webclean import C4_BADWORDS_DEFAULT, C4_TERMINAL_RE

    bad_re = (
        "\\b(?:" + "|".join(_re.escape(w) for w in C4_BADWORDS_DEFAULT) + ")\\b"
    )
    return (
        "WITH s AS (SELECT doc_id, text || CASE doc_id % 5"
        "  WHEN 0 THEN chr(10) || 'watch porn here now.'"
        "  WHEN 1 THEN chr(10) || 'filler lorem ipsum text.'"
        "  WHEN 2 THEN chr(10) || 'code { snippet } sample.'"
        "  WHEN 3 THEN chr(10) || 'enable javascript to view.'"
        "  ELSE '' END AS t FROM documents),"
        " k AS (SELECT doc_id, t, list_filter(string_split(t, chr(10)),"
        f"  x -> regexp_matches(rtrim(x), '{C4_TERMINAL_RE}')"
        "   AND len(list_filter(regexp_split_to_array(x, '\\s+'),"
        "        w -> w != '')) >= 3"
        "   AND NOT contains(lower(x), 'javascript')) AS kept FROM s),"
        # array_to_string([]) is NULL in DuckDB but array_join([]) is
        # '' in Spark — coalesce to '' (t is never NULL under the
        # scaffold, so the NULL-text passthrough case can't arise here)
        " m AS (SELECT doc_id, t,"
        "  coalesce(array_to_string(kept, chr(10)), '') AS clean_text,"
        "  coalesce(len(kept), 0)::BIGINT AS n_lines_kept,"
        "  coalesce(len(regexp_extract_all("
        "   array_to_string(kept, chr(10)), '[.!?]')), 0)::BIGINT"
        "   AS n_sentences FROM k)"
        " SELECT doc_id, clean_text, n_lines_kept, n_sentences,"
        "  n_sentences >= 5 AS enough_sentences,"
        f"  NOT regexp_matches(lower(t), '{bad_re}') AS no_bad_words,"
        "  NOT contains(lower(t), 'lorem ipsum') AS no_lorem_ipsum,"
        "  NOT contains(t, '{') AS no_curly_brace,"
        "  (n_sentences >= 5"
        f"   AND NOT regexp_matches(lower(t), '{bad_re}')"
        "   AND NOT contains(lower(t), 'lorem ipsum')"
        "   AND NOT contains(t, '{')) AS c4_keep FROM m"
    )


def _lm_buckets_sql() -> str:
    """lm_buckets oracle: the langid and LM-likelihood oracles
    composed as derived tables (one source of truth each), then the
    exact-tercile cut off the per-(lang, score) histogram — ``t_k`` =
    smallest score whose ascending cumulative count reaches
    ``ceil(k*n/3)`` (integer form ``3*cum >= k*n``), ties share a
    bucket, NULL score -> NULL bucket."""
    return (
        f"WITH lg AS ({_langid_sql()}),"
        f" lmsc AS ({_lm_likelihood_sql()}),"
        " j AS (SELECT lg.doc_id, lg.pred_lang AS lang, lmsc.lm_score_ppm"
        "  FROM lg JOIN lmsc ON lg.doc_id = lmsc.doc_id),"
        " hist AS (SELECT lang, lm_score_ppm AS s, count(*) AS c FROM j"
        "  WHERE lm_score_ppm IS NOT NULL GROUP BY 1, 2),"
        " cum AS (SELECT lang, s,"
        "  sum(c) OVER (PARTITION BY lang ORDER BY s) AS cum,"
        "  sum(c) OVER (PARTITION BY lang) AS n FROM hist),"
        " th AS (SELECT lang,"
        "  min(CASE WHEN 3 * cum >= n THEN s END) AS t1,"
        "  min(CASE WHEN 3 * cum >= 2 * n THEN s END) AS t2"
        "  FROM cum GROUP BY 1)"
        " SELECT j.doc_id, j.lang, j.lm_score_ppm,"
        "  CASE WHEN j.lm_score_ppm IS NULL OR th.t1 IS NULL THEN NULL"
        "   WHEN j.lm_score_ppm <= th.t1 THEN 'tail'"
        "   WHEN j.lm_score_ppm <= th.t2 THEN 'middle'"
        "   ELSE 'head' END AS lm_bucket"
        " FROM j LEFT JOIN th ON j.lang = th.lang"
    )


def _bpe_pair_sql() -> str:
    """bpe_pair_stats oracle: same TOKEN_RE constant as the op; lead()
    over the ordered token stream forms the adjacent pairs."""
    from sagan_spark.ops.textstats import TOKEN_RE

    return (
        "WITH s AS (SELECT doc_id, u.i AS i, u.tok AS tok FROM ("
        " SELECT doc_id, unnest(list_transform(regexp_extract_all(text,"
        f" '{TOKEN_RE}'), (x,i) -> struct_pack(i := i, tok := x))) AS u"
        " FROM documents)),"
        " p AS (SELECT tok AS tok_left, lead(tok) OVER"
        " (PARTITION BY doc_id ORDER BY i) AS tok_right FROM s)"
        " SELECT tok_left, tok_right, count(*) AS pair_count FROM p"
        " WHERE tok_right IS NOT NULL GROUP BY 1, 2"
        " ORDER BY pair_count DESC, tok_left ASC, tok_right ASC LIMIT 100"
    )


def _bm25_sql() -> str:
    """bm25_topk oracle: the query-token VALUES list is generated from
    BM25_QUERIES with the op's own tokenizer, and the IEEE double chain
    (linear idf x saturation, floored to milli BEFORE the per-(query,
    doc) sum) is replayed operation-for-operation; the per-query top-k
    is the plain single global window the two-stage form is provably
    equivalent to."""
    import re

    from sagan_spark.ops.textstats import TOKEN_RE

    tok_re = re.compile(TOKEN_RE)
    vals = ", ".join(
        f"({qid}, '{tok}')"
        for qid, qtext in BM25_QUERIES
        for tok in dict.fromkeys(tok_re.findall(qtext))
    )
    return (
        f"WITH qt AS (SELECT * FROM (VALUES {vals}) AS t(query_id, token)),"
        " toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
        " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM documents),"
        " pd AS (SELECT doc_id, token, count(*) AS tf FROM toks"
        "  GROUP BY 1, 2),"
        " dlen AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM pd"
        "  GROUP BY 1),"
        " corpus AS (SELECT count(*) AS n_docs,"
        "  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dlen),"
        " qdf AS (SELECT token, count(*) AS df FROM pd"
        "  WHERE token IN (SELECT DISTINCT token FROM qt) GROUP BY 1),"
        " m AS (SELECT qt.query_id, pd.doc_id,"
        "  CAST(floor(1000.0 * (CAST(c.n_docs AS DOUBLE) / qdf.df)"
        "   * (CAST(pd.tf AS DOUBLE) * 2.2 / (CAST(pd.tf AS DOUBLE)"
        "      + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / c.avgdl))))"
        "   AS BIGINT) AS tm"
        "  FROM pd JOIN qt USING (token) JOIN qdf USING (token)"
        "  JOIN dlen d USING (doc_id) CROSS JOIN corpus c),"
        " s AS (SELECT query_id, doc_id, CAST(sum(tm) AS BIGINT)"
        "  AS score_milli FROM m GROUP BY 1, 2)"
        " SELECT query_id, doc_id, score_milli, rank FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY query_id"
        "   ORDER BY score_milli DESC, doc_id ASC) AS rank FROM s)"
        " WHERE rank <= 10"
    )


def _anchor_sqls() -> tuple[str, str]:
    """(anchor_extract, anchor_domain_topk) oracles: the expected
    (src_url, dst_url, anchor) triples RECONSTRUCTED from the
    _anchor_pages arithmetic — one UNION ALL branch per surviving
    anchor form, resolved targets written directly, the text-carrying
    anchor rendered through the SAME inner-text chain as the op
    (ops.htmlstats._inner_text_sql, one source of truth) — then the
    domain rollup through the shared PSL CASE ladder with the plain
    global top-k window.  Span/attribute extraction mechanics carry
    their own pytests (test_anchors, test_urlresolve)."""
    from sagan_spark.ops.htmlstats import _inner_text_sql
    from sagan_spark.ops.psl import registered_domain_sql
    from sagan_spark.ops.urltools import HOST_RE

    base = (
        "WITH ap AS (SELECT doc_id, source, text,"
        " 'https://' || source || '.example/p/'"
        " || CAST(doc_id AS VARCHAR) AS src_url FROM documents),"
        " raw AS ("
        " SELECT src_url, 'https://' || source || '.com/p/'"
        " || CAST(doc_id % 7 AS VARCHAR) AS dst_url,"
        f" {_inner_text_sql('substr(text, 1, 12)')} AS anchor FROM ap"
        " UNION ALL SELECT src_url, 'https://' || source"
        " || '.example/rel', 'Root Rel' FROM ap"
        " UNION ALL SELECT src_url, 'https://' || source"
        " || '.example/up/' || CAST(doc_id % 3 AS VARCHAR),"
        " 'Up Link' FROM ap"
        " UNION ALL SELECT src_url,"
        " 'https://ref' || CAST(doc_id % 5 AS VARCHAR) || '.org/',"
        " 'Read More' FROM ap"
        " UNION ALL SELECT src_url,"
        " 'https://x' || CAST(doc_id % 2 AS VARCHAR) || '.com/b',"
        " 'Bold Text' FROM ap),"
        " a AS (SELECT src_url, dst_url, anchor FROM raw"
        " WHERE anchor <> '')"
    )
    extract = base + " SELECT src_url, dst_url, anchor FROM a"
    topk = (
        base
        + ", d AS (SELECT "
        + registered_domain_sql("host", "hp")
        + " AS domain, anchor FROM (SELECT host, str_split(host, '.')"
        " AS hp, anchor FROM (SELECT"
        f" lower(regexp_extract(dst_url, '{HOST_RE}', 1)) AS host,"
        " lower(anchor) AS anchor FROM a))),"
        " c AS (SELECT domain, anchor, count(*) AS n_links FROM d"
        " GROUP BY 1, 2)"
        " SELECT domain, anchor, n_links, rank FROM ("
        " SELECT *, row_number() OVER (PARTITION BY domain"
        " ORDER BY n_links DESC, anchor ASC) AS rank FROM c)"
        " WHERE rank <= 10"
    )
    return extract, topk


def _robots_sql() -> str:
    """robots_directives oracle: the q_robots_directives scaffold in ||
    form, the extraction via ops.htmltext.robots_sql (shared spec)."""
    from sagan_spark.ops.htmltext import robots_sql

    scaffold = (
        "('<html><head>' || CASE"
        " WHEN doc_id % 7 = 0 THEN"
        " '<meta name=\"robots\" content=\"noindex, nofollow\">'"
        " WHEN doc_id % 5 = 0 THEN '<meta NAME=ROBOTS CONTENT=''none''>'"
        " WHEN doc_id % 3 = 0 THEN '<meta name=robots content=nofollow >'"
        " ELSE '' END || '</head><body><p>' || text"
        " || '</p></body></html>')"
    )
    return f"SELECT doc_id, {robots_sql(scaffold)} FROM documents"


_BURSTS_ORACLE_SQL = (
    "WITH c AS (SELECT user_id,"
    " epoch_us(ts) // 86400000000 AS b, count(*) AS n_events"
    " FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),"
    " t AS (SELECT user_id, b, n_events,"
    " sum(n_events) OVER (PARTITION BY user_id ORDER BY b"
    " RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)"
    " AS trailing_sum FROM c)"
    " SELECT user_id, b * 86400000000 AS bucket_start_us,"
    " n_events, trailing_sum,"
    " CASE WHEN trailing_sum IS NOT NULL AND n_events >= 3"
    " AND n_events * 7000 >= 2000 * trailing_sum"
    " THEN 1 ELSE 0 END AS is_burst FROM t"
)


def _html_meta_oracle_sql() -> str:
    """html_metadata oracle: the SAME scaffold as q_html_metadata and
    the SAME extraction chain (ops.htmlmeta.page_meta_sql)."""
    from sagan_spark.ops.htmlmeta import page_meta_sql

    scaffold = (
        "(CASE WHEN doc_id % 4 = 0 THEN '<html lang=\"en-GB\">'"
        " WHEN doc_id % 4 = 1 THEN '<HTML LANG=fr>'"
        " WHEN doc_id % 4 = 2 THEN '<html data-x=1 lang=''de''>'"
        " ELSE '<html>' END"
        " || '<head>' || '<title> ' || source || ' &amp;lt; Home &nbsp; '"
        " || CAST(doc_id % 10 AS VARCHAR) || ' </title>'"
        " || CASE WHEN doc_id % 3 = 0 THEN"
        "  '<meta name=\"description\" content=\"Desc ' || source || ', page\">'"
        " WHEN doc_id % 3 = 1 THEN"
        "  '<meta NAME=description CONTENT=''one two  three''>'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 2 = 0 THEN"
        "  '<meta property=\"og:title\" content=\"OG '"
        "  || CAST(doc_id % 5 AS VARCHAR) || '\">' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN '<link REL=canonical HREF=/rel/path>'"
        " ELSE '<link rel=\"canonical\" href=\"https://' || source"
        "  || '.com/c/' || CAST(doc_id % 50 AS VARCHAR) || '\">' END"
        " || '</head><body><p>x</p></body></html>')"
    )
    return f"SELECT doc_id, {page_meta_sql(scaffold)} FROM documents"


def _html_stats_oracle_sql() -> str:
    """html_stats oracle: the SAME scaffold as q_html_stats and the
    SAME census (ops.htmlstats.html_stats_sql)."""
    from sagan_spark.ops.htmlstats import html_stats_sql

    scaffold = (
        "('<html><head><script src=x>var a=\"<b>\";</script>"
        "<style>p{color:red}</style></head><body>"
        "<a href=\"/h\">Home &amp; Garden</a>'"
        " || CASE WHEN doc_id % 3 = 0 THEN"
        "  '<A HREF=y><b>Bold</b> link ' || CAST(doc_id % 5 AS VARCHAR)"
        "  || '</A>' ELSE '' END"
        " || '<img src=i><abbr>np</abbr><p>' || text || '</p>'"
        " || CASE WHEN doc_id % 4 = 0 THEN '<a href=\"tail\">dangling'"
        " ELSE '' END || '</body></html>')"
    )
    return html_stats_sql(scaffold, id_sql="doc_id") + " FROM documents"


def _charset_oracle_sql() -> str:
    """charset_sniff oracle: the SAME BOM/meta/header scaffold as
    q_charset_sniff and the SAME sniff (ops.htmlmeta.charset_sql)."""
    from sagan_spark.ops.htmlmeta import charset_sql

    body = (
        "'<html><head>'"
        " || CASE WHEN doc_id % 3 = 0 THEN '<meta charset=\"UTF-8\">'"
        " WHEN doc_id % 3 = 1 THEN '<META HTTP-EQUIV=''Content-Type''"
        " CONTENT=''text/html; charset=windows-1252''>'"
        " ELSE '' END"
        " || '</head><body>' || text || '</body></html>'"
    )
    bom = (
        "CASE WHEN doc_id % 4 = 0 THEN 'EFBBBF'"
        " WHEN doc_id % 4 = 1 THEN 'FFFE'"
        " WHEN doc_id % 4 = 2 THEN 'FEFF' ELSE '' END"
    )
    headers = (
        "CASE WHEN doc_id % 5 = 0 THEN"
        " 'Content-Type: text/html; charset=ISO-8859-1'"
        " || chr(13) || chr(10) || 'X-Y: z'"
        " WHEN doc_id % 5 = 1 THEN 'Content-Type: text/plain'"
        " ELSE NULL END"
    )
    inner = (
        f"SELECT doc_id, (unhex({bom}) || encode({body})) AS b,"
        f" {headers} AS headers FROM documents"
    )
    return charset_sql("b", "headers", id_sql="doc_id") + f" FROM ({inner})"


def _frontier_oracle_sql() -> str:
    """frontier_candidates oracle: link extraction -> canonicalize ->
    citation count -> anti-join vs the crawled set -> per-domain
    top-5, replayed with the plain global window the salted two-stage
    top-k is provably equivalent to (pinned in tests/test_topk.py's
    family).  Canonicalization and the PSL domain ladder come from the
    SAME generators as the Spark ops (ops.urltools.url_canonicalize_sql,
    ops.psl.registered_domain_sql)."""
    from sagan_spark.ops.psl import registered_domain_sql
    from sagan_spark.ops.urltools import HOST_RE, url_canonicalize_sql

    # edges RECONSTRUCTED from the scaffold arithmetic (extraction +
    # resolution mechanics carry their own gates/pytests); the third
    # branch is the RESOLVED form of the scaffold's relative
    # '/p/{n}' link — same target space the crawled anti-join hits
    pages = (
        "SELECT doc_id, source, 'https://' || source || '.example/p/'"
        " || CAST(doc_id AS VARCHAR) AS url FROM documents"
    )
    return (
        f"WITH pages AS ({pages}),"
        " edges AS ("
        "  SELECT url AS src_url, 'https://' || source || '.com/p/'"
        "  || CAST(doc_id % 7 AS VARCHAR) AS dst_url FROM pages"
        "  UNION ALL SELECT url, 'https://ref'"
        "  || CAST(doc_id % 5 AS VARCHAR) || '.org/' FROM pages"
        "  UNION ALL SELECT url, 'https://' || source || '.example/p/'"
        "  || CAST(doc_id % 97 AS VARCHAR) FROM pages),"
        f" counts AS (SELECT {url_canonicalize_sql('dst_url')} AS url,"
        "  count(*) AS n_refs FROM edges GROUP BY 1),"
        f" crawled AS (SELECT DISTINCT {url_canonicalize_sql('url')} AS url"
        "  FROM pages),"
        " frontier AS (SELECT c.url, c.n_refs FROM counts c"
        "  LEFT JOIN crawled w ON c.url = w.url WHERE w.url IS NULL),"
        f" dom AS (SELECT url, n_refs, {registered_domain_sql('host', 'hp')}"
        "  AS domain FROM (SELECT url, n_refs, host,"
        "  str_split(host, '.') AS hp FROM (SELECT url, n_refs,"
        f"  coalesce(lower(regexp_extract(url, '{HOST_RE}', 1)), '') AS host"
        "  FROM frontier))),"
        " ranked AS (SELECT domain, url, n_refs,"
        "  CAST(row_number() OVER (PARTITION BY domain"
        "  ORDER BY n_refs DESC, url) AS BIGINT) AS rank FROM dom)"
        " SELECT domain, url, n_refs, rank FROM ranked WHERE rank <= 5"
    )


def _warc_oracle_sql() -> str:
    """warc_parse oracle: the SAME record scaffold as q_warc_parse and
    the SAME parse (ops.warc.warc_sql)."""
    from sagan_spark.ops.warc import warc_sql

    cr = "chr(13) || chr(10)"
    rec = (
        f"('WARC/1.0' || {cr} || 'WARC-Type: '"
        " || CASE WHEN doc_id % 6 = 0 THEN 'request' ELSE 'response' END"
        f" || {cr} || 'WARC-Record-ID: <urn:uuid:'"
        " || CAST(doc_id AS VARCHAR) || '>'"
        f" || {cr} || 'WARC-Date: 2026-08-'"
        " || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T12:00:00Z'"
        f" || {cr} || 'WARC-Target-URI: https://' || source || '.com/p/'"
        " || CAST(doc_id % 50 AS VARCHAR)"
        f" || {cr} || 'Content-Type: application/http; msgtype=response'"
        f" || {cr} || 'Content-Length: '"
        " || CAST(length(text) + 60 AS VARCHAR)"
        f" || {cr} || {cr}"
        " || CASE WHEN doc_id % 5 = 0 THEN 'HTTP/1.0 404 Not Found'"
        "  ELSE 'HTTP/1.1 200 OK' END"
        f" || {cr} || 'Content-Type: '"
        " || CASE WHEN doc_id % 3 = 0 THEN 'text/html; charset=UTF-8'"
        "  WHEN doc_id % 3 = 1 THEN 'text/plain'"
        "  ELSE 'application/json' END"
        f" || {cr} || 'Content-Length: ' || CAST(length(text) AS VARCHAR)"
        f" || {cr} || {cr} || text)"
    )
    return (
        "SELECT doc_id, warc_type, record_id, target_uri, warc_date,"
        " content_length, http_status, mime, body_len,"
        " substring(body, 1, 64) AS body_prefix FROM"
        f" (SELECT doc_id, {warc_sql(rec)} FROM documents)"
    )


_SNAP_OLD_REL = (
    "(SELECT 'https://' || source || '.com/p/'"
    " || CAST(doc_id % 400 AS VARCHAR) AS url, text"
    " FROM documents WHERE doc_id % 10 <> 0)"
)
_SNAP_NEW_REL = (
    "(SELECT 'https://' || source || '.com/p/'"
    " || CAST(doc_id % 400 AS VARCHAR) AS url,"
    " CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text"
    " FROM documents WHERE doc_id % 7 <> 0)"
)


def _bpe_train_oracle_sql() -> str:
    from sagan_spark.ops.bpetrain import bpe_train_sql

    return bpe_train_sql("documents", rounds=8)


def _cm_oracle_sql() -> str:
    from sagan_spark.ops.sketch import cm_heavy_hitters_sql
    from sagan_spark.ops.textstats import TOKEN_RE

    items = (
        "(SELECT unnest(regexp_extract_all(text,"
        f" '{TOKEN_RE}')) AS key FROM documents)"
    )
    probes = (
        "(SELECT DISTINCT unnest(regexp_extract_all(text,"
        f" '{TOKEN_RE}')) AS key FROM documents WHERE doc_id % 101 = 0)"
    )
    return cm_heavy_hitters_sql(items, probes, width=512, depth=4)


def _url_templates_oracle_sql() -> str:
    from sagan_spark.ops.psl import registered_domain_sql
    from sagan_spark.ops.urltools import (
        HOST_RE,
        PATH_RE,
        TEMPLATE_HEX_RE,
        TEMPLATE_NUM_RE,
    )

    urls = (
        "SELECT 'https://' || source ||"
        " (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'"
        "  WHEN doc_id % 3 = 1 THEN '.com' ELSE '.org' END) ||"
        " (CASE WHEN doc_id % 6 = 0 THEN"
        "   '/product/' || CAST(doc_id % 40 AS VARCHAR) || '/view'"
        "  WHEN doc_id % 6 = 1 THEN"
        "   '/product/' || CAST(doc_id % 40 AS VARCHAR)"
        "  WHEN doc_id % 6 = 2 THEN"
        "   '/u/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)"
        "  WHEN doc_id % 6 = 3 THEN '/about'"
        "  WHEN doc_id % 6 = 4 THEN"
        "   '/blog/' || CAST(doc_id % 5 AS VARCHAR) || '/'"
        "   || CAST(doc_id % 97 AS VARCHAR)"
        "  ELSE '' END) AS url FROM documents"
    )
    seg = (
        f"x -> CASE WHEN regexp_matches(x, '{TEMPLATE_NUM_RE}') THEN '{{n}}'"
        f" WHEN regexp_matches(x, '{TEMPLATE_HEX_RE}') THEN '{{hex}}'"
        " ELSE x END"
    )
    return (
        f"WITH u AS ({urls}),"
        " parts AS (SELECT"
        f" array_to_string(list_transform(str_split("
        f"  CASE WHEN regexp_extract(url, '{PATH_RE}', 1) = '' THEN '/'"
        f"  ELSE regexp_extract(url, '{PATH_RE}', 1) END, '/'), {seg}), '/')"
        "  AS template,"
        f" lower(regexp_extract(url, '{HOST_RE}', 1)) AS host FROM u),"
        " dom AS (SELECT template, "
        + registered_domain_sql("host", "hp")
        + " AS domain FROM (SELECT template, host,"
        " str_split(host, '.') AS hp FROM parts)),"
        " pd AS (SELECT template, domain, count(*) AS n FROM dom"
        "  GROUP BY 1, 2)"
        " SELECT template, CAST(sum(n) AS BIGINT) AS n_urls,"
        " CAST(count(*) AS BIGINT) AS n_domains FROM pd GROUP BY 1"
        " HAVING sum(n) >= 2"
    )


def _hll_oracle_sql() -> str:
    from sagan_spark.ops.sketch import hll_distinct_sql
    from sagan_spark.ops.textstats import TOKEN_RE

    items = (
        "(SELECT source AS grp, unnest(regexp_extract_all(text,"
        f" '{TOKEN_RE}')) AS key FROM documents)"
    )
    return hll_distinct_sql(items, p=10)


def _web_ingest_oracle_sql() -> str:
    """web_ingest oracle: the q_web_ingest record scaffold through the
    composed per-stage fragments (ops.webpipeline.ingest_pipeline_sql)."""
    from sagan_spark.ops.webpipeline import ingest_pipeline_sql

    cr = "chr(13) || chr(10)"
    body = (
        "'<html lang=\"en\"><head><title>T ' || source || '</title>'"
        " || CASE WHEN doc_id % 7 = 0 THEN"
        " '<meta name=\"robots\" content=\"noindex\">' ELSE '' END"
        " || '</head><body><p>' || text || '</p></body></html>'"
    )
    rec = (
        f"('WARC/1.0' || {cr} || 'WARC-Type: response'"
        f" || {cr} || 'WARC-Target-URI: https://' || source || '.com/p/'"
        " || CAST(doc_id % 50 AS VARCHAR)"
        f" || {cr} || {cr}"
        " || CASE WHEN doc_id % 5 = 0 THEN 'HTTP/1.0 404 Not Found'"
        "  ELSE 'HTTP/1.1 200 OK' END"
        f" || {cr} || 'Content-Type: '"
        " || CASE WHEN doc_id % 3 = 2 THEN 'application/pdf'"
        "  ELSE 'text/html' END"
        f" || {cr} || {cr} || ({body}))"
    )
    return ingest_pipeline_sql(rec, "documents")


def _bpe_encode_oracle_sql() -> str:
    from sagan_spark.ops.bpetrain import bpe_encode_sql

    return bpe_encode_sql("documents", rounds=8)


def _crawl_diff_oracle_sql() -> str:
    from sagan_spark.ops.crawldiff import snapshot_diff_sql

    return snapshot_diff_sql(_SNAP_OLD_REL, _SNAP_NEW_REL)


def _inverted_index_oracle_sql() -> str:
    from sagan_spark.ops.invindex import inverted_index_sql

    return inverted_index_sql("documents", max_postings=10)


def _pmi_oracle_sql() -> str:
    from sagan_spark.ops.collocations import pmi_sql

    return pmi_sql("documents", min_count=5)


def _robots_screen_oracle_sql() -> str:
    """robots_screen oracle: same synthetic robots bodies (the
    _ROBOTS_BODIES table via _robots_body_sql_case) and page urls as
    q_robots_screen; parse + screen from ops.robotstxt — one source of
    truth."""
    from sagan_spark.ops.robotstxt import robots_rules_sql, robots_screen_sql

    robots_rel = (
        "(SELECT lower(source) || '.com' AS domain, "
        + _robots_body_sql_case("length(lower(source))")
        + " AS robots_txt FROM (SELECT DISTINCT source FROM documents))"
    )
    pages_rel = (
        "(SELECT doc_id, 'https://' || lower(source) || '.com' ||"
        " CASE WHEN doc_id % 4 = 0 THEN '/p/1'"
        " WHEN doc_id % 4 = 1 THEN '/p/12'"
        " WHEN doc_id % 4 = 2 THEN '/q/' || CAST(doc_id % 9 AS VARCHAR)"
        " ELSE '/ok/' || CAST(doc_id % 9 AS VARCHAR) END AS url"
        " FROM documents)"
    )
    return robots_screen_sql(pages_rel, robots_rules_sql(robots_rel))


def oracle_sql() -> dict[str, str]:
    # same pattern strings on both contract sides (RE2-compatible)
    from sagan_spark.ops.profile import render_value_sql as _render_value_sql
    from sagan_spark.ops.psl import registered_domain_sql
    from sagan_spark.ops.sampling import frac_to_hex8
    from sagan_spark.ops.similarity import _hyperplanes, fixed_centroids
    from sagan_spark.ops.urltools import HOST_RE, PATH_RE
    from sagan_spark.ops.webclean import GOPHER_STOPWORDS

    # --- ANN oracles: the SAME hyperplane/centroid literals the Spark
    # ops compile in (deterministic driver-side constants), so DuckDB
    # replays bucket assignment / probe selection exactly.  Dots and
    # cosines use the SEQUENTIAL list_sum(list_transform(list_zip))
    # form: it is bit-identical to Spark's F.aggregate left fold, where
    # DuckDB's vectorized list_dot_product/list_cosine_similarity
    # differ at ~1e-8 and can straddle a round(...,5) boundary --------
    def _arr(vals) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vals) + "]"

    def _sqdot(a: str, b: str) -> str:
        return f"list_sum(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]))"

    def _sqcos(a: str, b: str) -> str:
        return (
            f"({_sqdot(a, b)} / (sqrt({_sqdot(a, a)}) * sqrt({_sqdot(b, b)})))"
        )

    def _bucket_sql(planes) -> str:
        return " + ".join(
            f"(CASE WHEN {_sqdot('embedding', _arr(p))} >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    _lsh_tables = [_hyperplanes(64, 6, t) for t in range(3)]
    _lsh_cands = " UNION ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id"
        f" FROM t{t} q JOIN t{t} c ON q.bucket = c.bucket"
        f" AND q.vec_id < 5 AND c.vec_id <> q.vec_id"
        for t in range(len(_lsh_tables))
    )
    _ann_lsh_sql = (
        "WITH "
        + ", ".join(
            f"t{t} AS (SELECT vec_id, embedding, {_bucket_sql(pl)} AS bucket"
            f" FROM embeddings)"
            for t, pl in enumerate(_lsh_tables)
        )
        + f", cand AS ({_lsh_cands})"
        " SELECT query_id, neighbor_id, round(cosine, 5) AS cosine, rank FROM ("
        " SELECT cand.query_id, cand.neighbor_id,"
        "  " + _sqcos("qe.embedding", "ce.embedding") + " AS cosine,"
        "  row_number() OVER (PARTITION BY cand.query_id ORDER BY"
        "  " + _sqcos("qe.embedding", "ce.embedding") + " DESC,"
        "  cand.neighbor_id) AS rank"
        " FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id"
        " JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)"
        " WHERE rank <= 5"
    )

    _cent_rows = ", ".join(
        f"({i}, {_arr(c)})" for i, c in enumerate(fixed_centroids(16, 64))
    )
    _ann_ivf_sql = (
        f"WITH cents(i, cv) AS (VALUES {_cent_rows}),"
        # corpus assignment: FIRST index of the max dot (ties -> lowest i,
        # the Spark side's array_position(array_max) rule)
        " assign AS (SELECT vec_id, i AS centroid FROM ("
        "  SELECT e.vec_id, c.i, row_number() OVER (PARTITION BY e.vec_id"
        "   ORDER BY " + _sqdot("e.embedding", "c.cv") + " DESC, c.i ASC) AS rn"
        "  FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),"
        # per-query probe lists: top n_probe by dot, ties -> HIGHER i
        # (the Spark side's reverse(array_sort(struct(d, i))) order)
        " probe AS (SELECT query_id, centroid FROM ("
        "  SELECT q.vec_id AS query_id, c.i AS centroid,"
        "   row_number() OVER (PARTITION BY q.vec_id"
        "    ORDER BY " + _sqdot("q.embedding", "c.cv") + " DESC, c.i DESC) AS rn"
        "  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5) WHERE rn <= 4),"
        " cand AS (SELECT p.query_id, a.vec_id AS neighbor_id"
        "  FROM probe p JOIN assign a ON a.centroid = p.centroid"
        "  WHERE a.vec_id <> p.query_id)"
        " SELECT query_id, neighbor_id, round(cosine, 5) AS cosine, rank FROM ("
        " SELECT cand.query_id, cand.neighbor_id,"
        "  " + _sqcos("qe.embedding", "ce.embedding") + " AS cosine,"
        "  row_number() OVER (PARTITION BY cand.query_id ORDER BY"
        "  " + _sqcos("qe.embedding", "ce.embedding") + " DESC,"
        "  cand.neighbor_id) AS rank"
        " FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id"
        " JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)"
        " WHERE rank <= 5"
    )

    # --- dedup_embedding_lsh oracle: same frozen-hyperplane replay as
    # ann_lsh_topk, over the q entry's vec_id < 200 slice (4 planes x
    # 4 tables; UNION dedups candidate pairs across tables exactly like
    # the Spark side's dropDuplicates) -------------------------------
    _elsh_tables = [_hyperplanes(64, 4, t) for t in range(4)]
    _elsh_cands = " UNION ".join(
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM et{t} a JOIN et{t} b"
        " ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
        for t in range(len(_elsh_tables))
    )
    _elsh_sql = (
        "WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200), "
        + ", ".join(
            f"et{t} AS (SELECT vec_id, {_bucket_sql(pl)} AS bucket FROM e)"
            for t, pl in enumerate(_elsh_tables)
        )
        + f", cand AS ({_elsh_cands})"
        " SELECT id_a, id_b, round(cosine, 5) AS cosine FROM ("
        " SELECT cand.id_a, cand.id_b, "
        + _sqcos("ea.embedding", "eb.embedding")
        + " AS cosine"
        " FROM cand JOIN e ea ON ea.vec_id = cand.id_a"
        " JOIN e eb ON eb.vec_id = cand.id_b)"
        " WHERE cosine >= 0.3"
    )

    # --- dedup_semantic (SemDeDup) oracle: frozen-centroid replay of
    # assignment (first-max, ties -> lowest i), cent_sim with the SAME
    # division order as the Spark side ((dot / |c|) / |v|), the
    # (cent_sim asc, id asc) "earlier" rule, and the within-cluster
    # cosine prune — all sequential-dot forms ------------------------
    import numpy as np

    _sd_cents = fixed_centroids(16, 64)
    # same norm computation as ops.dedup.semdedup, so the literal is
    # bit-identical to the F.lit the Spark side divides by
    _sd_rows = ", ".join(
        f"({i}, {_arr(c)}, {float(np.linalg.norm(c)) or 1.0!r})"
        for i, c in enumerate(_sd_cents)
    )
    _semdedup_sql = (
        f"WITH cents(i, cv, cn) AS (VALUES {_sd_rows}),"
        " e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),"
        " sims AS (SELECT e.vec_id, c.i,"
        "  (" + _sqdot("e.embedding", "c.cv") + " / c.cn) AS cd"
        "  FROM e CROSS JOIN cents c),"
        " assign AS (SELECT s.vec_id, s.i AS centroid,"
        "  (s.cd / sqrt(" + _sqdot("e.embedding", "e.embedding") + ")) AS cent_sim"
        "  FROM (SELECT vec_id, i, cd, row_number() OVER (PARTITION BY vec_id"
        "   ORDER BY cd DESC, i ASC) AS rn FROM sims) s"
        "  JOIN e ON e.vec_id = s.vec_id WHERE s.rn = 1)"
        " SELECT DISTINCT b.vec_id AS vec_id"
        " FROM assign a JOIN assign b ON a.centroid = b.centroid"
        "  AND (a.cent_sim < b.cent_sim"
        "   OR (a.cent_sim = b.cent_sim AND a.vec_id < b.vec_id))"
        " JOIN e ea ON ea.vec_id = a.vec_id"
        " JOIN e eb ON eb.vec_id = b.vec_id"
        " WHERE (" + _sqdot("ea.embedding", "eb.embedding")
        + " / (sqrt(" + _sqdot("ea.embedding", "ea.embedding") + ")"
        " * sqrt(" + _sqdot("eb.embedding", "eb.embedding") + "))) >= 0.3"
    )

    # --- dedup_simhash oracle: full 64-bit gram-hash replay in SQL.
    # DuckDB BIGINT/UBIGINT multiplication raises on overflow, so each
    # wrapping u64 multiply is emulated in HUGEINT pieces:
    #   a*b mod 2^64 = ((a_hi*b mod 2^32) << 32 + a_lo*b) mod 2^64
    # (a_lo*b <= 2^96 and the shifted term <= 2^64, both inside
    # HUGEINT range).  Everything else — xor, logical >>, bit_count,
    # the bit-majority vote, and the pigeonhole block join — maps to
    # native UBIGINT ops.  Validated bit-for-bit against
    # ops.dedup.simhash_scalar on every sf0.001/sf0.01 document. ------
    from sagan_spark.ops.dedup import _FNV_OFFSET, _FNV_PRIME, _MIX1, _MIX2

    _m64 = 1 << 64

    def _mm(a: str, b: int) -> str:
        return (
            f"CAST((((({a}) >> 32)::HUGEINT * {b} % 4294967296) * 4294967296"
            f" + (({a}) & 4294967295)::HUGEINT * {b}) % {_m64} AS UBIGINT)"
        )

    def _fnv_step(prev: str, cp: str) -> str:
        # one FNV round; skipped when the codepoint is NULL (a short
        # gram from a text with fewer than k chars — scalar spec hashes
        # the whole text as a single gram)
        return (
            f"CASE WHEN {cp} IS NULL THEN {prev} ELSE "
            + _mm(f"xor({prev}, CAST({cp} AS UBIGINT))", _FNV_PRIME)
            + " END"
        )

    _sh_k, _sh_maxham = 4, 8
    _sh_blocks = _sh_maxham + 1
    _sh_width = 64 // _sh_blocks
    _sh_mask = (1 << _sh_width) - 1
    _simhash_sql = (
        "WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),"
        f" pos AS (SELECT doc_id, text, n, unnest(range(1, greatest(n - {_sh_k - 1}, 1) + 1)) AS i"
        "  FROM d WHERE n > 0),"
        " cps AS (SELECT doc_id, unicode(substr(text, CAST(i AS INT), 1)) AS cp1,"
        "  CASE WHEN i+1 <= n THEN unicode(substr(text, CAST(i+1 AS INT), 1)) END AS cp2,"
        "  CASE WHEN i+2 <= n THEN unicode(substr(text, CAST(i+2 AS INT), 1)) END AS cp3,"
        "  CASE WHEN i+3 <= n THEN unicode(substr(text, CAST(i+3 AS INT), 1)) END AS cp4"
        "  FROM pos),"
        f" s1 AS (SELECT doc_id, cp2, cp3, cp4, {_fnv_step(str(_FNV_OFFSET) + '::UBIGINT', 'cp1')} AS h FROM cps),"
        f" s2 AS (SELECT doc_id, cp3, cp4, {_fnv_step('h', 'cp2')} AS h FROM s1),"
        f" s3 AS (SELECT doc_id, cp4, {_fnv_step('h', 'cp3')} AS h FROM s2),"
        f" s4 AS (SELECT doc_id, {_fnv_step('h', 'cp4')} AS h FROM s3),"
        " f1 AS (SELECT doc_id, xor(h, h >> 30) AS h FROM s4),"
        f" f2 AS (SELECT doc_id, {_mm('h', _MIX1)} AS h FROM f1),"
        " f3 AS (SELECT doc_id, xor(h, h >> 27) AS h FROM f2),"
        f" f4 AS (SELECT doc_id, {_mm('h', _MIX2)} AS h FROM f3),"
        " gh AS (SELECT DISTINCT doc_id, xor(h, h >> 31) AS g FROM f4),"
        " cnt AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY 1),"
        " bits AS (SELECT gh.doc_id, b.b,"
        "   sum(CASE WHEN (g >> CAST(b.b AS INT)) & 1 = 1 THEN 1 ELSE 0 END) AS c"
        "  FROM gh CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b GROUP BY 1, 2),"
        " sh AS (SELECT bits.doc_id,"
        "   CAST(sum(CASE WHEN c * 2 >= cnt.n THEN (CAST(1 AS UBIGINT) << CAST(b AS INT))::HUGEINT ELSE 0 END) AS UBIGINT) AS u"
        "  FROM bits JOIN cnt ON cnt.doc_id = bits.doc_id GROUP BY 1),"
        # empty/NULL-text docs hash to 0 in the Spark UDF and join like
        # any other value — the oracle must carry them too
        " shz AS (SELECT * FROM sh UNION ALL"
        "  SELECT doc_id, CAST(0 AS UBIGINT) AS u FROM documents"
        "  WHERE text IS NULL OR length(text) = 0),"
        f" bl AS (SELECT doc_id, u, blk.blk, (u >> CAST(blk.blk * {_sh_width} AS INT)) & {_sh_mask} AS block"
        f"  FROM shz CROSS JOIN (SELECT unnest(range(0, {_sh_blocks})) AS blk) blk)"
        " SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        "  CAST(bit_count(xor(a.u, b.u)) AS INT) AS hamming"
        " FROM bl a JOIN bl b ON a.blk = b.blk AND a.block = b.block"
        "  AND a.doc_id < b.doc_id"
        f" WHERE bit_count(xor(a.u, b.u)) <= {_sh_maxham}"
    )

    # --- decontamination / duplicated-span oracles (ops/decontam.py):
    # same tokenization, short-item shingle rule, and >=2-distinct-docs
    # span test, replayed in DuckDB list ops --------------------------
    _dc_tok = (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
        " x -> x <> '')"
    )

    def _dc_shingles(src: str, idc: str, n: int) -> str:
        # distinct (id, md5(shingle)); texts shorter than n tokens
        # contribute their whole token join (Brown et al. short-item
        # rule); DuckDB range() is stop-exclusive -> stop = len-(n-2)
        return (
            f"SELECT DISTINCT {idc}, md5(sh) AS h FROM ("
            f" SELECT {idc}, unnest(list_transform(range(1, len(toks) - {n - 2}),"
            f"  i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS sh"
            f" FROM {src} WHERE len(toks) >= {n}"
            f" UNION ALL"
            f" SELECT {idc}, array_to_string(toks, ' ') AS sh"
            f" FROM {src} WHERE len(toks) BETWEEN 1 AND {n - 1})"
        )

    _decontam_sql = (
        f"WITH dt AS (SELECT doc_id, {_dc_tok} AS toks FROM documents),"
        " bt AS (SELECT doc_id AS bench_id, toks[6:30] AS toks FROM dt"
        "  WHERE doc_id % 97 = 0 AND len(toks) >= 30),"
        f" ds AS ({_dc_shingles('dt', 'doc_id', 13)}),"
        f" bs AS ({_dc_shingles('bt', 'bench_id', 13)})"
        " SELECT ds.doc_id, count(DISTINCT ds.h) AS n_hit_shingles,"
        " count(DISTINCT bs.bench_id) AS n_bench_docs"
        " FROM ds JOIN bs ON ds.h = bs.h GROUP BY 1"
    )

    _dspan_n = 13
    _dspan_sql = (
        f"WITH dt AS (SELECT doc_id, {_dc_tok} AS toks FROM documents),"
        " pos AS (SELECT doc_id, md5(sh) AS h FROM ("
        f" SELECT doc_id, unnest(list_transform(range(1, len(toks) - {_dspan_n - 2}),"
        f"  i -> array_to_string(toks[i:i+{_dspan_n - 1}], ' '))) AS sh"
        f" FROM dt WHERE len(toks) >= {_dspan_n})),"
        " duph AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd"
        "  FROM pos GROUP BY 1) WHERE nd >= 2),"
        " tot AS (SELECT doc_id, count(*) AS n_windows FROM pos GROUP BY 1),"
        " dup AS (SELECT doc_id, count(*) AS n_dup FROM pos"
        "  WHERE h IN (SELECT h FROM duph) GROUP BY 1)"
        " SELECT d.doc_id, coalesce(t.n_windows, 0) AS n_windows,"
        " coalesce(dup.n_dup, 0) AS n_dup_windows,"
        " round(CASE WHEN coalesce(t.n_windows, 0) > 0"
        "  THEN coalesce(dup.n_dup, 0) / CAST(t.n_windows AS DOUBLE)"
        "  ELSE 0.0 END, 6) AS dup_frac"
        " FROM (SELECT doc_id FROM documents) d"
        " LEFT JOIN tot t ON t.doc_id = d.doc_id"
        " LEFT JOIN dup ON dup.doc_id = d.doc_id"
    )

    # cross-snapshot incremental dedup (ops/dedup.novel_docs): shared
    # by the plain gate and the Bloom-prefiltered gate — the Bloom
    # path is exact by construction, so one oracle covers both.
    _incremental_sql = (
        "WITH seen AS (SELECT DISTINCT md5(text) AS h FROM documents"
        " WHERE doc_id % 4 = 0),"
        " b AS (SELECT md5(text) AS content_hash, min(doc_id) AS doc_id"
        " FROM documents WHERE doc_id % 4 <> 0 GROUP BY 1)"
        " SELECT doc_id, content_hash FROM b WHERE NOT EXISTS"
        " (SELECT 1 FROM seen WHERE seen.h = b.content_hash)"
    )

    # gap sessionization (ops/sessions.py): global window definition —
    # per key ordered by (us, event_id), new session when the gap from
    # the previous event exceeds 4 h; session labeled by its start us.
    _session_cte = (
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us"
        " FROM events WHERE ts IS NOT NULL),"
        " f AS (SELECT *, lag(us) OVER"
        " (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),"
        " g AS (SELECT *, CASE WHEN prev IS NULL OR us - prev >"
        " 14400000000 THEN us END AS st FROM f),"
        " h AS (SELECT user_id, event_id, us, max(st) OVER"
        " (PARTITION BY user_id ORDER BY us, event_id"
        " ROWS UNBOUNDED PRECEDING) AS session_start_us FROM g)"
    )

    from sagan_spark.ops.textstats import TOKEN_RE as _TOKEN_RE_SQL

    # funnel (ops/funnel.py): chained earliest-at-or-after minima —
    # the same aggregation chain the Spark op runs (no window).
    _funnel_cte = (
        "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us"
        " FROM events WHERE ts IS NOT NULL),"
        " s1 AS (SELECT user_id, min(us) AS t1 FROM e"
        " WHERE event_type = 'view' GROUP BY 1),"
        " s2 AS (SELECT e.user_id, min(us) AS t2 FROM e"
        " JOIN s1 USING (user_id)"
        " WHERE event_type = 'click' AND us >= t1 GROUP BY 1),"
        " s3 AS (SELECT e.user_id, min(us) AS t3 FROM e"
        " JOIN s2 USING (user_id)"
        " WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)"
    )

    # duplicated-span REMOVAL (ops/decontam.remove_duplicated_spans):
    # same tokenization and >=2-distinct-docs window test as _dspan_sql,
    # then covered token positions are dropped and the rest re-joined
    _rm_sql = (
        f"WITH dt AS (SELECT doc_id, {_dc_tok} AS toks FROM documents),"
        " w AS (SELECT doc_id, i, md5(array_to_string(toks[i:i+12], ' ')) AS h"
        "  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 11)) AS i"
        "   FROM dt WHERE len(toks) >= 13)),"
        " duph AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd"
        "  FROM w GROUP BY 1) WHERE nd >= 2),"
        " cov AS (SELECT DISTINCT doc_id, p FROM (SELECT doc_id,"
        "  unnest(range(i, i + 13)) AS p FROM w WHERE h IN (SELECT h FROM duph))),"
        " pos AS (SELECT doc_id, p, toks[p] AS tok FROM (SELECT doc_id, toks,"
        "  unnest(range(1, len(toks) + 1)) AS p FROM dt)),"
        " kept AS (SELECT pos.doc_id, pos.p, pos.tok FROM pos LEFT JOIN cov"
        "  ON cov.doc_id = pos.doc_id AND cov.p = pos.p WHERE cov.p IS NULL),"
        " agg AS (SELECT doc_id, count(*) AS n_kept,"
        "  string_agg(tok, ' ' ORDER BY p) AS cleaned FROM kept GROUP BY 1)"
        " SELECT dt.doc_id, len(dt.toks) AS n_tokens,"
        " len(dt.toks) - coalesce(agg.n_kept, 0) AS n_removed,"
        " coalesce(agg.cleaned, '') AS cleaned_text"
        " FROM dt LEFT JOIN agg ON agg.doc_id = dt.doc_id"
    )

    # keep-one span removal: same window test, but each duplicated
    # hash's first corpus occurrence (min (doc_id, i)) protects its
    # own start; only non-keeper occurrences contribute covered
    # positions.  Oracle replays the keeper pick with a per-hash
    # window (oracle side only; the Spark op is a min(struct) agg).
    _rm_keepone_sql = (
        f"WITH dt AS (SELECT doc_id, {_dc_tok} AS toks FROM documents),"
        " w AS (SELECT doc_id, i, md5(array_to_string(toks[i:i+12], ' ')) AS h"
        "  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 11)) AS i"
        "   FROM dt WHERE len(toks) >= 13)),"
        " duph AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd"
        "  FROM w GROUP BY 1) WHERE nd >= 2),"
        " dw AS (SELECT doc_id, i, h, row_number() OVER ("
        "  PARTITION BY h ORDER BY doc_id, i) AS rn FROM w"
        "  WHERE h IN (SELECT h FROM duph)),"
        " cov AS (SELECT DISTINCT doc_id, p FROM (SELECT doc_id,"
        "  unnest(range(i, i + 13)) AS p FROM dw WHERE rn > 1)),"
        " pos AS (SELECT doc_id, p, toks[p] AS tok FROM (SELECT doc_id, toks,"
        "  unnest(range(1, len(toks) + 1)) AS p FROM dt)),"
        " kept AS (SELECT pos.doc_id, pos.p, pos.tok FROM pos LEFT JOIN cov"
        "  ON cov.doc_id = pos.doc_id AND cov.p = pos.p WHERE cov.p IS NULL),"
        " agg AS (SELECT doc_id, count(*) AS n_kept,"
        "  string_agg(tok, ' ' ORDER BY p) AS cleaned FROM kept GROUP BY 1)"
        " SELECT dt.doc_id, len(dt.toks) AS n_tokens,"
        " len(dt.toks) - coalesce(agg.n_kept, 0) AS n_removed,"
        " coalesce(agg.cleaned, '') AS cleaned_text"
        " FROM dt LEFT JOIN agg ON agg.doc_id = dt.doc_id"
    )

    # URL canonicalization (ops/urltools.url_canonicalize): the SAME
    # component regexes and tracking-param pattern, replayed in DuckDB
    _messy_url = (
        "SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN"
        " 'mailto:user@' || source || '.com'"
        " ELSE 'HTTPS://WWW.' || upper(source) ||"
        " (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'"
        "   WHEN doc_id % 3 = 1 THEN '.com' ELSE '.org' END) ||"
        " (CASE WHEN doc_id % 5 = 0 THEN ':443'"
        "   WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END) ||"
        " '/p/' || CAST(doc_id % 50 AS VARCHAR) ||"
        " (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1'"
        "   WHEN doc_id % 3 = 1 THEN '?a=1&fbclid=zz' ELSE '' END) ||"
        " (CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END)"
        " END AS url FROM documents"
    )
    from sagan_spark.ops.urltools import url_canonicalize_sql

    _canon_inner = (
        f"SELECT doc_id, {url_canonicalize_sql('url')} AS canonical_url"
        f" FROM ({_messy_url})"
    )

    # per-domain quota sample (cap 5) — slack literal is the SAME
    # Python float the Spark op computes from the cap, so both engines
    # divide identical doubles
    _dq_cap = 5
    _dq_slack = repr(float(_dq_cap + 6 * (_dq_cap ** 0.5) + 16))

    # synthetic url + host/domain (the op's exact algorithm: the PSL
    # longest-match CASE generated from the SAME vendored tables the
    # Spark column expression compiles from — ops/psl.py)
    _domain_inner = (
        "SELECT doc_id, url, host, "
        + registered_domain_sql("host", "hp")
        + " AS domain, toks"
        " FROM (SELECT doc_id, url, host, str_split(host, '.') AS hp, toks"
        " FROM (SELECT doc_id, url,"
        "  lower(regexp_extract(url, '" + HOST_RE + "', 1)) AS host,"
        "  len(list_filter(regexp_split_to_array(text, '\\s+'),"
        "   x -> x <> '')) AS toks"
        " FROM (SELECT doc_id, text, 'https://www.' || source ||"
        "  (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'"
        "   WHEN doc_id % 3 = 1 THEN '.com' ELSE '.org' END) ||"
        "  '/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents)))"
    )
    _dq_sql = (
        f"WITH u AS ({_domain_inner}),"
        " sz AS (SELECT domain, count(*) AS n FROM u GROUP BY 1),"
        f" over_d AS (SELECT * FROM sz WHERE n > {_dq_cap}),"
        " under_rows AS (SELECT u.doc_id, u.domain FROM u"
        "  LEFT JOIN over_d o ON o.domain = u.domain WHERE o.domain IS NULL),"
        " surv AS (SELECT u.doc_id, u.domain,"
        "  substr(md5('domq|' || CAST(u.doc_id AS VARCHAR)), 1, 8) AS h, o.n"
        "  FROM u JOIN over_d o ON o.domain = u.domain),"
        " filt AS (SELECT * FROM surv WHERE h <"
        f"  (CASE WHEN {_dq_slack} >= n THEN 'g'"
        f"   ELSE lpad(format('{{:x}}', CAST(floor(({_dq_slack} / n)"
        "    * 4294967296.0) AS BIGINT)), 8, '0') END)),"
        " ranked AS (SELECT doc_id, domain, row_number() OVER"
        "  (PARTITION BY domain ORDER BY h, doc_id) AS rn FROM filt)"
        " SELECT doc_id, domain FROM under_rows"
        f" UNION ALL SELECT doc_id, domain FROM ranked WHERE rn <= {_dq_cap}"
    )

    from sagan_spark.ops.webclean import EMAIL_RE, IPV4_RE

    shingles = (
        "SELECT DISTINCT doc_id, shingle FROM ("
        "SELECT doc_id, unnest(list_transform(range(1, greatest(length(text)-7,1)+1),"
        " i -> substr(text, i, 8))) AS shingle FROM documents)"
        " WHERE length(shingle) = 8"
    )
    sigs = (
        f"WITH sh AS ({shingles}), "
        "sig AS (SELECT doc_id, "
        " min(('0x'||substr(md5('b0|' || shingle),1,15))::BIGINT) AS sig0,"
        " min(('0x'||substr(md5('b1|' || shingle),1,15))::BIGINT) AS sig1,"
        " min(('0x'||substr(md5('b2|' || shingle),1,15))::BIGINT) AS sig2,"
        " min(('0x'||substr(md5('b3|' || shingle),1,15))::BIGINT) AS sig3 "
        "FROM sh GROUP BY doc_id), "
        "stacked AS ("
        " SELECT doc_id, 0 AS band, sig0 AS sig FROM sig UNION ALL"
        " SELECT doc_id, 1, sig1 FROM sig UNION ALL"
        " SELECT doc_id, 2, sig2 FROM sig UNION ALL"
        " SELECT doc_id, 3, sig3 FROM sig)"
    )
    pairs = (
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " count(*) AS n_shared_bands "
        "FROM stacked a JOIN stacked b ON a.band = b.band AND a.sig = b.sig"
        " AND a.doc_id < b.doc_id GROUP BY 1, 2)"
    )
    # GPT-style sequence packing (ops/packing.py): per-shard hash-shuffle
    # order, running token sum, fixed 2048-token chunk ids.
    _pack_cte = (
        "WITH base AS (SELECT doc_id,"
        " ('0x'||substr(md5('shard||' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 32"
        "  AS shard,"
        " ('0x'||substr(md5('order||' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT"
        "  AS okey,"
        " coalesce(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')),"
        "  0)::BIGINT AS n_tokens FROM documents),"
        " cums AS (SELECT doc_id, shard, n_tokens,"
        " CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY okey, doc_id"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tok_end"
        " FROM base),"
        " packed AS (SELECT doc_id, shard, n_tokens,"
        " tok_end - n_tokens AS tok_start, tok_end,"
        " CAST(floor((tok_end - n_tokens) / 2048) AS BIGINT) AS chunk_first,"
        " CAST(floor(greatest(tok_end - 1, tok_end - n_tokens) / 2048) AS BIGINT)"
        "  AS chunk_last FROM cums)"
    )
    # Jaccard-verified pairs -> symmetric edges -> transitive closure
    # (recursive CTE; UNION dedups so the fixpoint terminates) ->
    # per-node component = min reachable node.  Mirrors
    # ops/dedup.py connected_components over ngram_jaccard_pairs(0.3).
    # Parametrized by doc source so the corpus-prep composition can run
    # the same clustering over only quality-kept docs.
    def _components_cte(doc_src: str, extra_ctes: str = "") -> str:
        sh = shingles.replace("FROM documents)", f"FROM {doc_src})")
        # sh is read four times and edges sits INSIDE the recursive
        # reach — DuckDB's default CTE inlining would re-evaluate the
        # whole shingle join once per reach iteration (the bpe_encode
        # lesson: MATERIALIZED took that oracle 190s -> 0.6s; at sf0.1
        # the un-materialized form ran >1h on the dense component)
        return (
            f"WITH RECURSIVE {extra_ctes}sh AS MATERIALIZED ({sh}), "
            "sig AS (SELECT doc_id, "
            " min(('0x'||substr(md5('b0|' || shingle),1,15))::BIGINT) AS sig0,"
            " min(('0x'||substr(md5('b1|' || shingle),1,15))::BIGINT) AS sig1,"
            " min(('0x'||substr(md5('b2|' || shingle),1,15))::BIGINT) AS sig2,"
            " min(('0x'||substr(md5('b3|' || shingle),1,15))::BIGINT) AS sig3 "
            "FROM sh GROUP BY doc_id), "
            "stacked AS ("
            " SELECT doc_id, 0 AS band, sig0 AS sig FROM sig UNION ALL"
            " SELECT doc_id, 1, sig1 FROM sig UNION ALL"
            " SELECT doc_id, 2, sig2 FROM sig UNION ALL"
            " SELECT doc_id, 3, sig3 FROM sig), "
            f"{pairs}, "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), "
            "inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter FROM pairs p"
            " JOIN sh a ON a.doc_id = p.doc_a JOIN sh b ON b.doc_id = p.doc_b"
            " AND b.shingle = a.shingle GROUP BY 1, 2), "
            "jp AS (SELECT i.doc_a, i.doc_b FROM inter i"
            " JOIN sizes na ON na.doc_id = i.doc_a"
            " JOIN sizes nb ON nb.doc_id = i.doc_b"
            " WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) >= 0.3), "
            "edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM jp"
            " UNION SELECT doc_b, doc_a FROM jp), "
            "reach AS (SELECT u AS node, u AS r FROM edges"
            " UNION SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v), "
            "comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY 1)"
        )

    components = _components_cte("documents")
    # quality verdict (webclean_verdict's CASE) and the kept-docs
    # variant of the clustering for the corpus-prep composition
    verdict_inner = (
        "SELECT doc_id, CASE WHEN text IS NULL OR length(text) < 20 THEN 'too_short'"
        " WHEN lang IS NULL OR lang NOT IN ('en') THEN 'lang'"
        " WHEN (len(l) - len(list_distinct(l))) / CAST(len(l) AS DOUBLE) > 0.30"
        "  THEN 'repetition' ELSE 'ok' END AS reason"
        " FROM (SELECT doc_id, lang, text, str_split(text, chr(10)) AS l"
        " FROM documents)"
    )
    kept_cte = (
        f"kept AS (SELECT d.* FROM documents d JOIN ({verdict_inner}) v"
        " ON v.doc_id = d.doc_id AND v.reason = 'ok'), "
    )
    components_kept = _components_cte("kept", kept_cte)
    prep_cte = (
        f"{components_kept}, "
        f"prep AS (SELECT v.doc_id, CASE WHEN v.reason <> 'ok' THEN v.reason"
        " WHEN c.node IS NOT NULL AND c.node <> c.comp THEN 'near_dup'"
        " ELSE 'ok' END AS reason"
        f" FROM ({verdict_inner}) v LEFT JOIN comp c ON c.node = v.doc_id)"
    )
    session_cte = (
        "WITH o AS (SELECT *, CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL"
        " OR epoch(ts) - lag(epoch(ts)) OVER w > 86400 THEN 1 ELSE 0 END AS new_sess"
        " FROM events WHERE event_type = '{etype}'"
        " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS UNBOUNDED PRECEDING) AS sess FROM o)"
    )
    sqls = {
        "s5_pipe_decode": (
            "SELECT program, evt_date, count(*) AS n FROM ("
            "SELECT string_split(concat_ws('|', CAST(user_id AS VARCHAR), event_type,"
            " strftime(ts, '%Y-%m-%d'), props), '|') AS parts FROM events)"
            " t(parts), (SELECT 1) _ "
            ", LATERAL (SELECT coalesce(parts[2], 'unknown') AS program,"
            " parts[3] AS evt_date) p GROUP BY 1, 2"
        ),
        "f1_program_prefilter": (
            "SELECT event_type, count(*) AS n FROM events "
            "WHERE regexp_matches(event_type, '^(?:p.*|s.gnup)$') GROUP BY 1"
        ),
        "f2_isin_prefilter": (
            "SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users "
            "FROM events WHERE event_type IN ('error','signup') GROUP BY 1"
        ),
        "f2_syslog_priority": (
            "SELECT event_type AS program, count(*) AS n FROM events "
            "WHERE (CASE WHEN value > 150 THEN 'crit' WHEN value > 50 THEN 'warning'"
            " ELSE 'info' END) IN ('crit','warning')"
            " AND length(props) > 0 AND position('{' IN props) > 0 GROUP BY 1"
        ),
        "f3_content_modifiers": (
            "SELECT lang, count(*) AS n FROM ("
            "SELECT lang, CASE WHEN length(text) > 7 THEN substr(text, 8) ELSE '' END AS s1"
            ", text FROM documents) "
            "WHERE position('filter' IN substr(s1, 1, 61)) > 0"
            " AND position('slow' IN text) = 0 GROUP BY 1"
        ),
        "f4_pcre": (
            "SELECT source, count(*) AS n FROM documents "
            "WHERE regexp_matches(text, '(?i)(fast|slow) (query|scan)') GROUP BY 1"
        ),
        "f5_meta_content": (
            "SELECT lang, count(*) AS n FROM documents "
            "WHERE (position('merge sort' IN text) > 0 OR position('hash join' IN text) > 0"
            " OR position('table scan' IN text) > 0)"
            " AND position('slow' IN text) = 0 GROUP BY 1"
        ),
        "f6_json_content": (
            "SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k FROM ("
            "SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k"
            " FROM events) WHERE k >= 90 GROUP BY 1"
        ),
        "f11_alert_time": (
            "SELECT event_type, count(*) AS n FROM events "
            "WHERE ((CAST(floor(epoch(ts)/86400) AS BIGINT) + 4) % 7) IN (1,2,3,4,5)"
            " AND (hour(ts)*100 + minute(ts)) BETWEEN 800 AND 1700 GROUP BY 1"
        ),
        "p3_parse_ip": (
            "SELECT event_id, regexp_extract(msg, '(\\d+\\.\\d+\\.\\d+\\.\\d+):(\\d+)', 1) AS src_ip,"
            " CAST(regexp_extract(msg, '(\\d+\\.\\d+\\.\\d+\\.\\d+):(\\d+)', 2) AS BIGINT) AS src_port"
            " FROM (SELECT event_id, printf('login from 10.%d.%d.%d:%d accepted',"
            " user_id % 200, event_id % 250, (event_id*7) % 250,"
            " (event_id*131) % 60000 + 1024) AS msg FROM events)"
            " WHERE CAST(regexp_extract(msg, '(\\d+\\.\\d+\\.\\d+\\.\\d+):(\\d+)', 2) AS BIGINT) > 50000"
        ),
        "p6_grok_normalize": (
            "SELECT event_id, src_ip, src_port FROM ("
            "SELECT event_id, regexp_extract(msg,"
            " 'login from ((?:\\d{1,3}\\.){3}\\d{1,3}) port ([+-]?\\d+)', 1) AS src_ip,"
            " CAST(regexp_extract(msg,"
            " 'login from ((?:\\d{1,3}\\.){3}\\d{1,3}) port ([+-]?\\d+)', 2) AS BIGINT) AS src_port"
            " FROM (SELECT event_id, printf('login from 10.%d.%d.%d port %d',"
            " user_id % 200, event_id % 250, (event_id*7) % 250,"
            " (event_id*131) % 60000 + 1024) AS msg FROM events))"
            " WHERE src_port > 50000"
        ),
        "p4_parse_hash": (
            "SELECT doc_id, regexp_extract('object ' || md5(text) || ' stored',"
            " '([0-9a-f]{32})', 1) AS md5 FROM documents"
        ),
        "j1_cidr_range_join": (
            "SELECT label, count(*) AS n FROM ("
            "SELECT 167772160 + (user_id * 65536 + event_id % 65536) AS ip_num FROM events) e "
            "JOIN (VALUES (167772160, 167772160 + 3*65536 - 1, 'bad-block-a'),"
            " (167772160 + 10*65536, 167772160 + 12*65536 - 1, 'bad-block-b'))"
            " r(lo, hi, label) ON e.ip_num BETWEEN r.lo AND r.hi GROUP BY 1"
        ),
        "j7_classification_join": (
            "SELECT classtype, severity, count(*) AS n FROM events e LEFT JOIN "
            "(VALUES ('error','system-error',1), ('purchase','money-move',2),"
            " ('signup','identity-new',2), ('click','activity',3), ('view','activity',3))"
            " c(event_type, classtype, severity) USING (event_type) GROUP BY 1, 2"
        ),
        "f10_flow": (
            "SELECT event_type, count(*) AS n FROM ("
            "SELECT event_type, 167772160 + (user_id*65536 + event_id%65536) AS ip,"
            " (event_id*7) % 65536 AS port FROM events) "
            "WHERE (ip BETWEEN 167772160 AND 167772160 + 40*65536 - 1"
            " OR ip BETWEEN 167772160 + 100*65536 AND 167772160 + 120*65536 - 1)"
            " AND NOT (ip BETWEEN 167772160 + 10*65536 AND 167772160 + 12*65536 - 1)"
            " AND port BETWEEN 1 AND 1024 GROUP BY 1"
        ),
        "f14_ignore_list": (
            "SELECT lang, count(*) AS n FROM documents "
            "WHERE NOT (position('slow' IN text) > 0 OR position('deprecated' IN text) > 0)"
            " GROUP BY 1"
        ),
        "f15_pass_mask": (
            "SELECT rule_pos, count(*) AS n FROM ("
            "SELECT 1 AS rule_pos FROM events WHERE value > 100 AND event_type <> 'view'"
            " UNION ALL "
            "SELECT 2 FROM events WHERE event_type = 'error' AND event_type <> 'view')"
            " GROUP BY 1"
        ),
        "p1_json_flatten": (
            "SELECT '.' || k AS key, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_val FROM ("
            "SELECT unnest(json_keys(props)) AS k,"
            " CAST(json_extract_string(props, '$.' || unnest(json_keys(props))) AS BIGINT) AS v"
            " FROM events) GROUP BY 1"
        ),
        "p9_append_program": (
            "SELECT event_type, count(*) AS n FROM events "
            "WHERE position('error' IN (props || ' | ' || event_type)) > 0"
            " OR position('\"k\": 7' IN (props || ' | ' || event_type)) > 0 GROUP BY 1"
        ),
        "s6_json_input_map": (
            "SELECT event_type, count(*) AS n, CAST(sum(CAST(coalesce("
            "json_extract_string(props, '$.missing'),"
            " json_extract_string(props, '$.k'), '0') AS BIGINT)) AS BIGINT) AS sum_mapped"
            " FROM events GROUP BY 1"
        ),
        "a6_flexbit_count": (
            "SELECT user_id, count(*) AS n_days_over, CAST(sum(c) AS BIGINT) AS events_in_over FROM ("
            "SELECT user_id, date_trunc('day', ts) AS day, count(*) AS c FROM events"
            " GROUP BY 1, 2) WHERE c > 3 GROUP BY 1"
        ),
        "j2_intel_set": (
            "SELECT user_id, count(*) AS n FROM events"
            " WHERE user_id IN (7, 11, 23, 42, 99) GROUP BY 1"
        ),
        "j4_geoip": (
            "SELECT coalesce(cc, '--') AS cc, count(*) AS n FROM ("
            "SELECT 167772160 + (user_id*65536 + event_id%65536) AS ip_num FROM events) e "
            "LEFT JOIN (VALUES (167772160, 167772160 + 50*65536 - 1, 'DE'),"
            " (167772160 + 50*65536, 167772160 + 100*65536 - 1, 'FR'),"
            " (167772160 + 100*65536, 167772160 + 150*65536 - 1, 'US'))"
            " g(lo, hi, cc) ON e.ip_num BETWEEN g.lo AND g.hi GROUP BY 1"
        ),
        "j5_proto_map": (
            "SELECT CASE WHEN position('fast' IN text) > 0 THEN 6"
            " WHEN position('slow' IN text) > 0 THEN 17 ELSE 0 END AS proto,"
            " count(*) AS n FROM documents GROUP BY 1"
        ),
        "a1_threshold_limit": (
            "SELECT user_id, count(*) AS n_allowed FROM ("
            "SELECT user_id, row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)"
            " ORDER BY ts, event_id) AS rn FROM events) WHERE rn <= 3 GROUP BY 1"
        ),
        "a2_threshold_suppress": (
            session_cte.format(etype="error")
            + ", r AS (SELECT user_id, sess, row_number() OVER (PARTITION BY user_id, sess"
            " ORDER BY ts, event_id) AS rn FROM s) "
            "SELECT user_id, count(*) AS n_alerts,"
            " CAST((SELECT max(sess) FROM s s2 WHERE s2.user_id = r.user_id) AS BIGINT)"
            " AS n_sessions"
            " FROM r WHERE rn <= 2 GROUP BY user_id"
        ),
        "a3_after": (
            session_cte.format(etype="click")
            + ", r AS (SELECT user_id, count(*) OVER (PARTITION BY user_id, sess"
            " ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run FROM s) "
            "SELECT user_id, count(*) AS n_after_alerts FROM r WHERE run > 3 GROUP BY 1"
        ),
        "a4_xbit_interval_join": (
            "SELECT user_id, count(*) AS n_flagged FROM ("
            "SELECT DISTINCT c.user_id, c.event_id FROM "
            "(SELECT user_id, event_id, ts AS chk_ts FROM events WHERE event_type = 'purchase') c "
            "JOIN (SELECT user_id, ts AS set_ts FROM events WHERE event_type = 'error') s "
            "USING (user_id) WHERE s.set_ts < c.chk_ts"
            " AND epoch(c.chk_ts) - epoch(s.set_ts) <= 3600) GROUP BY 1"
        ),
        "a9_track_clients": (
            "SELECT user_id, strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,"
            " count(*) AS n_events FROM events GROUP BY 1"
        ),
        "a10_client_stats": (
            "SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value,"
            " count(DISTINCT event_type) AS n_types FROM events GROUP BY 1"
        ),
        "a9_client_transitions": (
            "WITH f AS (SELECT 'user-' || CAST(user_id AS VARCHAR) AS host, ts"
            " FROM events), "
            "o AS (SELECT host, ts,"
            " lag(ts) OVER (PARTITION BY host ORDER BY ts) AS prev_ts,"
            " lead(ts) OVER (PARTITION BY host ORDER BY ts) AS next_ts FROM f), "
            "h AS (SELECT max(ts) AS horizon FROM f), "
            "downs AS (SELECT host, 'down' AS change,"
            " ts + INTERVAL 86400 SECOND AS at_ts FROM o, h"
            " WHERE (next_ts IS NULL AND epoch(horizon) - epoch(ts) >= 86400)"
            " OR (next_ts IS NOT NULL AND epoch(next_ts) - epoch(ts) >= 86400)), "
            "ups AS (SELECT host, 'up' AS change, ts AS at_ts FROM o"
            " WHERE prev_ts IS NOT NULL AND epoch(ts) - epoch(prev_ts) >= 86400) "
            "SELECT host, change, count(*) AS n,"
            " strftime(max(at_ts), '%Y-%m-%d %H:%M:%S') AS latest_at"
            " FROM (SELECT * FROM downs UNION ALL SELECT * FROM ups) GROUP BY 1, 2"
        ),
        "a10_client_stats_full": (
            "SELECT 'user-' || CAST(user_id AS VARCHAR) AS host,"
            " count(*) AS n_events,"
            " CAST(sum(length(props)) AS BIGINT) AS bytes_total,"
            " strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,"
            " strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen"
            " FROM events GROUP BY 1"
        ),
        "k3_eve_assembly": (
            "SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS timestamp,"
            " (CAST(floor(epoch(ts)) AS BIGINT) % 65536) * 65536"
            " + (CAST(epoch_us(ts) AS BIGINT) % 1000000) % 65536 AS flow_id,"
            " 'alert' AS event_type, 'user-' || CAST(user_id AS VARCHAR) AS src_host,"
            " 1 AS alert_gid, 'system-error' AS alert_category"
            " FROM events WHERE event_type = 'error'"
        ),
        "a11_lineage_rollup": (
            "SELECT CAST(count(*) AS BIGINT) AS rows_in,"
            " CAST(sum(length(props)) AS BIGINT) AS bytes_in,"
            " CAST(max(length(props)) AS BIGINT) AS max_len,"
            " CAST(0 AS BIGINT) AS n_null FROM events"
        ),
        "j3_bluedot": (
            "SELECT '10.' || CAST(user_id % 100 AS VARCHAR) || '.0.1' AS src_ip,"
            " CAST(count(*) AS BIGINT) AS n FROM events"
            " WHERE (user_id % 100) IN (7, 23) GROUP BY 1"
        ),
        # engine-path after/threshold: a recursive CTE replays the
        # reference state machines row by row per track key — threshold
        # type limit (threshold.c:126-150: window anchored at first
        # event, count reset when an event arrives > T after the
        # anchor, suppress once count exceeds N) and after
        # (after.c:51-229: suppress UNTIL count exceeds N within T of
        # the anchor; reset check first, then the N < count check which
        # also slides the anchor on every alerting event)
        "a1_threshold_engine": (
            # partition by the DERIVED KEY, not user_id: the engine's
            # by_src machine merges any user_ids that map to one IP
            # (the formula wraps at 62500), and the walk must replay
            # the merged stream exactly as the engine does
            "WITH RECURSIVE ord AS ("
            " SELECT key, t, row_number() OVER (PARTITION BY key"
            "   ORDER BY ts, ek) AS rn FROM ("
            "  SELECT '10.' || CAST(user_id % 250 AS VARCHAR) || '.' ||"
            "   CAST((user_id // 250) % 250 AS VARCHAR) || '.1' AS key,"
            "   CAST(floor(epoch(ts)) AS BIGINT) AS t, ts,"
            "   CAST(event_id AS VARCHAR) AS ek"
            "  FROM events)),"
            " walk AS ("
            "  SELECT key, rn, t,"
            "   1 AS tcnt, t AS tut, false AS tsup,"
            "   1 AS acnt, t AS aut, true AS asup"
            "  FROM ord WHERE rn = 1"
            "  UNION ALL"
            "  SELECT o.key, o.rn, o.t,"
            "   CASE WHEN o.t - w.tut > 172800 THEN 1 ELSE w.tcnt + 1 END,"
            "   CASE WHEN o.t - w.tut > 172800 THEN o.t ELSE w.tut END,"
            "   CASE WHEN o.t - w.tut > 172800 THEN false"
            "        ELSE 3 < w.tcnt + 1 END,"
            "   CASE WHEN o.t - w.aut > 172800 THEN 1 ELSE w.acnt + 1 END,"
            "   CASE WHEN (CASE WHEN o.t - w.aut > 172800 THEN 1"
            "              ELSE w.acnt + 1 END) > 3 THEN o.t"
            "        WHEN o.t - w.aut > 172800 THEN o.t"
            "        ELSE w.aut END,"
            "   NOT ((CASE WHEN o.t - w.aut > 172800 THEN 1"
            "         ELSE w.acnt + 1 END) > 3)"
            "  FROM walk w JOIN ord o ON o.key = w.key AND o.rn = w.rn + 1)"
            " SELECT CAST(7600001 AS BIGINT) AS sid, key AS src_ip,"
            "  CAST(count(*) AS BIGINT) AS n_alerts"
            " FROM walk WHERE NOT tsup GROUP BY key"
            " UNION ALL"
            " SELECT CAST(7600002 AS BIGINT), key,"
            "  CAST(count(*) AS BIGINT)"
            " FROM walk WHERE NOT asup GROUP BY key"
        ),
        "streaming_threshold_engine": (
            # reference suppress machine (threshold.c:126-150): utime
            # slides EVERY event, count resets when the gap since the
            # previous event exceeds the window, alert while count <= N
            "WITH RECURSIVE ord AS ("
            " SELECT key, t, row_number() OVER (PARTITION BY key"
            "   ORDER BY ts, ek) AS rn FROM ("
            "  SELECT '10.' || CAST(user_id % 250 AS VARCHAR) || '.' ||"
            "   CAST((user_id // 250) % 250 AS VARCHAR) || '.1' AS key,"
            "   CAST(floor(epoch(ts)) AS BIGINT) AS t, ts,"
            "   CAST(event_id AS VARCHAR) AS ek"
            "  FROM events)),"
            " walk AS ("
            "  SELECT key, rn, t, 1 AS tcnt, false AS tsup"
            "  FROM ord WHERE rn = 1"
            "  UNION ALL"
            "  SELECT o.key, o.rn, o.t,"
            "   CASE WHEN o.t - w.t > 172800 THEN 1 ELSE w.tcnt + 1 END,"
            "   CASE WHEN o.t - w.t > 172800 THEN false"
            "        ELSE 2 < w.tcnt + 1 END"
            "  FROM walk w JOIN ord o ON o.key = w.key AND o.rn = w.rn + 1)"
            " SELECT CAST(8200001 AS BIGINT) AS sid, key AS src_ip,"
            "  CAST(count(*) AS BIGINT) AS n_alerts"
            " FROM walk WHERE NOT tsup GROUP BY key"
        ),
        "a4_chain_after_engine": (
            # replay order (ts, event_key) matches the walk's
            # sortWithinPartitions(ts_d, event_key, seq); bits are
            # permanent (expire 0) so 'bitA live' reduces to 'a prior
            # view row exists for this key', and bitB to 'a prior
            # UNSUPPRESSED passing click row exists' — the after
            # machine (after.c:51-229) replays as a recursive CTE over
            # the condition-PASSING click rows only (engine.c:1370-1389)
            "WITH RECURSIVE base AS ("
            " SELECT '10.' || CAST(user_id % 250 AS VARCHAR) || '.' ||"
            "  CAST((user_id // 250) % 250 AS VARCHAR) || '.1' AS key,"
            "  CAST(floor(epoch(ts)) AS BIGINT) AS t, ts,"
            "  CAST(event_id AS VARCHAR) AS ek, event_type"
            " FROM events),"
            " pass AS ("
            "  SELECT key, t, ts, ek FROM ("
            "   SELECT b.*, sum(CASE WHEN event_type = 'view' THEN 1"
            "    ELSE 0 END) OVER (PARTITION BY key ORDER BY ts, ek"
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
            "    AS prior_views FROM base b)"
            "  WHERE event_type = 'click'"
            "   AND coalesce(prior_views, 0) > 0),"
            " ord AS (SELECT key, t, ts, ek, row_number() OVER ("
            "  PARTITION BY key ORDER BY ts, ek) AS rn FROM pass),"
            " walk AS ("
            "  SELECT key, rn, t, ts, ek,"
            "   1 AS acnt, t AS aut, true AS asup"
            "  FROM ord WHERE rn = 1"
            "  UNION ALL"
            "  SELECT o.key, o.rn, o.t, o.ts, o.ek,"
            "   CASE WHEN o.t - w.aut > 172800 THEN 1 ELSE w.acnt + 1 END,"
            "   CASE WHEN (CASE WHEN o.t - w.aut > 172800 THEN 1"
            "              ELSE w.acnt + 1 END) > 2 THEN o.t"
            "        WHEN o.t - w.aut > 172800 THEN o.t"
            "        ELSE w.aut END,"
            "   NOT ((CASE WHEN o.t - w.aut > 172800 THEN 1"
            "         ELSE w.acnt + 1 END) > 2)"
            "  FROM walk w JOIN ord o ON o.key = w.key AND o.rn = w.rn + 1),"
            " s2alert AS (SELECT key, ts, ek FROM walk WHERE NOT asup),"
            " s3 AS ("
            "  SELECT b.key, b.ek FROM base b"
            "  WHERE b.event_type = 'error' AND EXISTS ("
            "   SELECT 1 FROM s2alert s WHERE s.key = b.key"
            "    AND (s.ts < b.ts OR (s.ts = b.ts AND s.ek < b.ek))))"
            " SELECT CAST(7610001 AS BIGINT) AS sid, key AS src_ip,"
            "  CAST(count(*) AS BIGINT) AS n_alerts"
            " FROM base WHERE event_type = 'view' GROUP BY key"
            " UNION ALL"
            " SELECT CAST(7610002 AS BIGINT), key,"
            "  CAST(count(*) AS BIGINT) FROM s2alert GROUP BY key"
            " UNION ALL"
            " SELECT CAST(7610003 AS BIGINT), key,"
            "  CAST(count(*) AS BIGINT) FROM s3 GROUP BY key"
        ),
        "k6_external_route": (
            "SELECT CAST(7500011 AS BIGINT) AS sid, 'error' AS program,"
            " CAST(count(*) AS BIGINT) AS n FROM events"
            " WHERE event_type = 'error' AND position('{' IN props) > 0"
            " HAVING count(*) > 0"
        ),
        "f7_json_pcre": (
            "SELECT event_type AS program, CAST(count(*) AS BIGINT) AS n FROM events"
            " WHERE regexp_matches(json_extract_string(props, '$.k'), '^9[0-9]$')"
            " GROUP BY 1"
        ),
        "f8_json_meta_content": (
            "SELECT event_type AS program, CAST(count(*) AS BIGINT) AS n FROM events"
            " WHERE json_extract_string(props, '$.k') IN ('91','93','95')"
            " GROUP BY 1"
        ),
        "f9_event_id": (
            "SELECT event_type AS program,"
            " CAST(4600 + user_id % 50 AS VARCHAR) AS event_id,"
            " CAST(count(*) AS BIGINT) AS n FROM events"
            " WHERE (user_id % 50) IN (24, 48) GROUP BY 1, 2"
        ),
        "p10_base64_json": (
            "SELECT CAST(user_id % 10 AS BIGINT) AS user_mod,"
            " CAST(count(*) AS BIGINT) AS n FROM events"
            " WHERE decode(from_base64(to_base64(encode(event_type)))) = 'error'"
            " GROUP BY 1"
        ),
        "a12_dynamic_rules": (
            "SELECT CAST(sid AS BIGINT) AS sid, CAST(n AS BIGINT) AS n FROM ("
            "SELECT 7600001 AS sid, count(*) AS n FROM events"
            " WHERE event_type = 'signup'"
            " AND regexp_matches(json_extract_string(props, '$.k'), '^9[5-9]$')"
            " UNION ALL "
            "SELECT 7600002, count(*) FROM events"
            " WHERE event_type = 'purchase' AND position('{' IN props) > 0"
            " AND EXISTS (SELECT 1 FROM events WHERE event_type = 'signup'"
            " AND regexp_matches(json_extract_string(props, '$.k'), '^9[5-9]$'))"
            ") WHERE n > 0"
        ),
        "k2_fast_format": (
            "SELECT CAST(event_id AS VARCHAR) AS url,"
            " CAST(7500061 AS BIGINT) AS sid, 3 AS rev,"
            " strftime(ts, '%m/%d/%Y-%H:%M:%S.%f')"
            " || ' [**] [1:7500061:3] fast line [**]"
            " [Classification: Misc Attack] [Priority: 2] [Program: error]"
            " {UNKNOWN} user-' || CAST(user_id AS VARCHAR) || ':514 -> user-'"
            " || CAST(user_id AS VARCHAR) || ':514' AS line"
            " FROM events WHERE event_type = 'error'"
            " AND position('{' IN props) > 0"
        ),
        "a11_stats_json": (
            "SELECT strftime((SELECT max(ts) FROM events),"
            " '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' AS \"timestamp\","
            " 'stats' AS event_type, 'spark' AS event_source,"
            " 'sagan_spark' AS host, CAST(100 AS BIGINT) AS uptime,"
            " CAST(count(*) AS BIGINT) AS captured_total,"
            " CAST(0 AS BIGINT) AS captured_drop,"
            " CAST(0 AS BIGINT) AS captured_ignore,"
            " CAST(0 AS BIGINT) AS captured_threshold,"
            " CAST(0 AS BIGINT) AS captured_after,"
            " CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS captured_alert,"
            " CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
            " AS BIGINT) AS captured_match,"
            " CAST(sum(length(props)) AS BIGINT) AS captured_bytes_total,"
            " CAST(0 AS BIGINT) AS captured_bytes_ignored,"
            " CAST(max(length(props)) AS BIGINT) AS captured_max_bytes_log_line,"
            " CAST(count(*) // 100 AS BIGINT) AS captured_eps"
            " FROM events"
        ),
        "k3_eve_log": (
            "SELECT strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '+00:00' AS \"timestamp\","
            " 'log' AS event_type,"
            " CAST((CAST(epoch_us(ts) // 1000000 AS BIGINT) % 65536) * 65536"
            " + (epoch_us(ts) % 1000000) % 65536 AS BIGINT) AS flow_id,"
            " 'user-' || CAST(user_id AS VARCHAR) AS syslog_source,"
            " 'udp' AS syslog_proto,"
            " '' AS facility, '' AS priority, '' AS level, '' AS tag,"
            " strftime(ts, '%Y-%m-%d %H:%M:%S') AS source_timestamp,"
            " events.event_type AS program, props AS message,"
            " CAST(event_id AS VARCHAR) AS url FROM events"
        ),
        "k1_alert_view": (
            "SELECT CAST(event_id AS VARCHAR) AS url,"
            " CAST(7500071 AS BIGINT) AS sid, 2 AS rev,"
            " 'alert line' AS signature, 'misc-attack' AS classtype,"
            " 'Misc Attack' AS category, 2 AS severity,"
            " 'user-' || CAST(user_id AS VARCHAR) AS host,"
            " strftime(ts, '%Y-%m-%d') AS \"date\","
            " strftime(ts, '%H:%M:%S') AS \"time\","
            " 'user-' || CAST(user_id AS VARCHAR) AS src_ip,"
            " 514 AS src_port,"
            " 'user-' || CAST(user_id AS VARCHAR) AS dst_ip,"
            " 514 AS dst_port, '' AS facility, event_type AS program,"
            " props AS message, '' AS rule_reference"
            " FROM events WHERE event_type = 'error'"
            " AND position('{' IN props) > 0"
        ),
        "k4_syslog_format": (
            "SELECT CAST(event_id AS VARCHAR) AS url,"
            " CAST(7500072 AS BIGINT) AS sid,"
            " '[1:7500072:1] syslog line [Classification: Misc Attack]"
            " [Priority: 2] {UNKNOWN} user-' || CAST(user_id AS VARCHAR)"
            " || ':514 -> user-' || CAST(user_id AS VARCHAR) || ':514' AS line"
            " FROM events WHERE event_type = 'error'"
            " AND position('{' IN props) > 0"
        ),
        # streaming_threshold: stateful streaming — rows-only gate
        "k7_sink_fanout": (
            "SELECT sink, count(*) AS n_routed FROM ("
            "SELECT 'eve' AS sink, event_id FROM events WHERE event_type IN ('error','purchase')"
            " UNION ALL SELECT 'fast', event_id FROM events WHERE event_type = 'error'"
            " UNION ALL SELECT 'syslog', event_id FROM events WHERE value > 150)"
            " GROUP BY 1"
        ),
        "dedup_paragraphs_within": (
            "WITH d AS (SELECT doc_id,"
            " text || chr(10) || chr(10) ||"
            " str_split(text, chr(10) || chr(10))[1] AS text"
            " FROM documents),"
            " s AS (SELECT doc_id, text,"
            "  str_split(text, chr(10) || chr(10)) AS l FROM d),"
            " k AS (SELECT doc_id, l,"
            "  list_filter(range(1, len(l) + 1),"
            "   i -> list_position(l, l[i]) = i) AS keep FROM s)"
            " SELECT doc_id,"
            " md5(array_to_string(list_transform(keep, i -> l[i]),"
            "  chr(10) || chr(10))) AS clean_md5,"
            " CAST(len(l) AS BIGINT) AS n_paragraphs,"
            " CAST(len(l) - len(keep) AS BIGINT) AS n_dropped"
            " FROM k"
        ),
        "dedup_soft_weights": (
            "WITH d AS (SELECT doc_id, md5(text) AS dig FROM documents),"
            " s AS (SELECT dig, CAST(count(*) AS BIGINT) AS n_copies"
            "  FROM d GROUP BY dig)"
            " SELECT d.doc_id, s.n_copies,"
            " CAST(1000000 // s.n_copies AS BIGINT) AS weight_ppm"
            " FROM d JOIN s ON s.dig = d.dig"
        ),
        "dedup_exact": (
            "SELECT count(*) AS n_dup_groups,"
            " CAST(coalesce(sum(dup_count), 0) AS BIGINT) AS n_dup_docs FROM ("
            "SELECT md5(text) AS h, count(*) AS dup_count FROM documents"
            " GROUP BY 1 HAVING count(*) > 1)"
        ),
        "dedup_minhash_lsh": f"{sigs}, {pairs} SELECT doc_a, doc_b, n_shared_bands FROM pairs",
        # levenshtein verify over the same LSH candidate core
        "dedup_edit_verify": (
            f"{sigs}, {pairs},"
            " pref AS (SELECT doc_id,"
            "  substr(coalesce(text, ''), 1, 128) AS t FROM documents),"
            " m AS (SELECT p.doc_a, p.doc_b, p.n_shared_bands,"
            "  greatest(length(a.t), length(b.t), 1) AS mx,"
            "  levenshtein(a.t, b.t) AS d FROM pairs p"
            "  JOIN pref a ON a.doc_id = p.doc_a"
            "  JOIN pref b ON b.doc_id = p.doc_b"
            "  WHERE p.n_shared_bands >= 2)"
            " SELECT doc_a, doc_b, n_shared_bands,"
            " CAST((1000000 * (mx - d)) // mx AS BIGINT) AS sim_ppm,"
            " (1000000 * (mx - d)) // mx >= 800000 AS keep FROM m"
        ),
        "dedup_ngram_jaccard": (
            f"{sigs}, {pairs}, "
            "sh2 AS (SELECT DISTINCT doc_id, shingle FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, greatest(length(text)-7,1)+1),"
            " i -> substr(text, i, 8))) AS shingle FROM documents)"
            " WHERE length(shingle) = 8), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1), "
            "inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter FROM pairs p"
            " JOIN sh2 a ON a.doc_id = p.doc_a JOIN sh2 b ON b.doc_id = p.doc_b"
            " AND b.shingle = a.shingle GROUP BY 1, 2) "
            "SELECT i.doc_a, i.doc_b, round(CAST(i.n_inter AS DOUBLE)"
            " / (na.n + nb.n - i.n_inter), 6) AS jaccard "
            "FROM inter i JOIN sizes na ON na.doc_id = i.doc_a"
            " JOIN sizes nb ON nb.doc_id = i.doc_b "
            "WHERE CAST(i.n_inter AS DOUBLE) / (na.n + nb.n - i.n_inter) >= 0.3"
        ),
        "dedup_cluster_canonical": (
            f"{components} SELECT CAST(comp AS BIGINT) AS canonical_id,"
            " CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1"
        ),
        "dedup_drop_list": (
            f"{components} SELECT CAST(node AS BIGINT) AS doc_id"
            " FROM comp WHERE node <> comp"
        ),
        # same method-agnostic oracle as dedup_cluster_canonical: the
        # star-rounds execution must produce identical components
        "dedup_cluster_star": (
            f"{components} SELECT CAST(comp AS BIGINT) AS canonical_id,"
            " CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1"
        ),
        "dedup_embedding_cosine": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b,"
            " round(" + _sqcos("a.embedding", "b.embedding") + ", 5) AS cosine"
            " FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id"
            " WHERE a.vec_id < 200 AND b.vec_id < 200"
            " AND " + _sqcos("a.embedding", "b.embedding") + " >= 0.3"
        ),
        "ann_cosine_topk": (
            "SELECT query_id, neighbor_id, round(cosine, 5) AS cosine, rank FROM ("
            "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
            " " + _sqcos("q.embedding", "c.embedding") + " AS cosine,"
            " row_number() OVER (PARTITION BY q.vec_id ORDER BY"
            " " + _sqcos("q.embedding", "c.embedding") + " DESC, c.vec_id) AS rank"
            " FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)"
            " WHERE rank <= 5"
        ),
        "ann_quantized_topk": (
            "WITH z AS (SELECT vec_id, CASE WHEN m > 0 THEN"
            "  list_transform(embedding, x -> CAST(floor("
            "   CAST(x AS DOUBLE) / m * 127.0 + 0.5) AS BIGINT))"
            "  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v"
            " FROM (SELECT vec_id, embedding, list_max(list_transform("
            "  embedding, y -> abs(CAST(y AS DOUBLE)))) AS m FROM embeddings)),"
            " n AS (SELECT vec_id, v, list_sum(list_transform("
            "  list_zip(v, v), x -> x[1] * x[2])) AS s FROM z)"
            " SELECT query_id, neighbor_id, round(cosine_q, 5) AS cosine_q, rank"
            " FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
            "  CAST(list_sum(list_transform(list_zip(q.v, c.v),"
            "   x -> x[1] * x[2])) AS DOUBLE)"
            "   / (sqrt(CAST(q.s AS DOUBLE)) * sqrt(CAST(c.s AS DOUBLE)))"
            "   AS cosine_q,"
            "  row_number() OVER (PARTITION BY q.vec_id ORDER BY"
            "   CAST(list_sum(list_transform(list_zip(q.v, c.v),"
            "    x -> x[1] * x[2])) AS DOUBLE)"
            "    / (sqrt(CAST(q.s AS DOUBLE)) * sqrt(CAST(c.s AS DOUBLE)))"
            "   DESC, c.vec_id) AS rank"
            "  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id"
            "   AND q.s > 0 AND c.s > 0)"
            " WHERE rank <= 5"
        ),
        "classifier_calibrate": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
            " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM documents),"
            " b AS (SELECT doc_id,"
            "  ('0x'||substr(md5(token),1,15))::BIGINT % 262144 AS bucket FROM toks),"
            " w AS (SELECT doc_id,"
            "  (('0x'||substr(md5('w|' || CAST(bucket AS VARCHAR)),1,15))::BIGINT"
            "   % 2001) - 1000 AS w_milli FROM b),"
            " agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,"
            "  CAST(sum(w_milli) AS BIGINT) AS w_sum FROM w GROUP BY 1),"
            " scored AS (SELECT"
            "  round(1.0/(1.0+exp(-(w_sum/(n_tokens*1000.0)))), 6) AS score FROM agg"
            "  UNION ALL SELECT 0.5 FROM documents"
            "  WHERE doc_id NOT IN (SELECT doc_id FROM agg)),"
            " hist AS (SELECT score, count(*)::BIGINT AS c FROM scored"
            "  WHERE score IS NOT NULL GROUP BY 1),"
            " cum AS (SELECT score, sum(c) OVER (ORDER BY score DESC"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,"
            "  sum(c) OVER () AS n FROM hist)"
            " SELECT max(score) AS threshold,"
            "  CAST(min(cum) AS BIGINT) AS n_kept,"
            "  CAST(max(n) AS BIGINT) AS n_total,"
            "  CAST(max(greatest(1, (n * 400000) // 1000000)) AS BIGINT) AS target"
            " FROM cum WHERE cum >= greatest(1, (n * 400000) // 1000000)"
        ),
        "ann_lsh_topk": _ann_lsh_sql,
        "ann_ivf_topk": _ann_ivf_sql,
        "html_extract_text": _html_extract_sql(),
        "text_langid": _langid_rollup_sql(),
        "text_langid_trained": _langid_trained_sql(),
        "text_quality": (
            "SELECT doc_id, n_chars, n_words, round(avg_word_len, 6) AS avg_word_len,"
            " round(punct_ratio, 6) AS punct_ratio, round(stop_ratio, 6) AS stop_ratio,"
            " round((len_ok + word_ok + punct_ok + least(stop_ratio * 5, 1.0)) / 4, 6) AS quality"
            " FROM (SELECT doc_id, n_chars, n_words,"
            " CASE WHEN n_words > 0 THEN CAST(n_chars - n_words + 1 AS DOUBLE)/n_words ELSE 0 END AS avg_word_len,"
            " CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0 END AS punct_ratio,"
            " CASE WHEN n_words > 0 THEN n_stop/n_words ELSE 0 END AS stop_ratio,"
            " CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.0 END AS len_ok,"
            " CASE WHEN n_words > 0 AND CAST(n_chars - n_words + 1 AS DOUBLE)/n_words"
            "  BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END AS word_ok,"
            " CASE WHEN n_chars > 0 AND CAST(n_punct AS DOUBLE)/n_chars <= 0.2"
            "  THEN 1.0 ELSE 0.0 END AS punct_ok"
            " FROM (SELECT doc_id, length(text) AS n_chars,"
            " CASE WHEN length(trim(text)) = 0 THEN 0"
            "  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,"
            " length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,"
            " (length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ''))) / 5.0"
            " + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ''))) / 3.0"
            " + (length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ''))) / 5.0"
            " + (length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ''))) / 4.0"
            " + (length(' '||text||' ') - length(replace(' '||text||' ', ' to ', ''))) / 4.0 AS n_stop"
            " FROM documents))"
        ),
        "text_tokens": (
            "SELECT doc_id,"
            " CASE WHEN length(trim(text)) = 0 THEN 0"
            "  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,"
            " len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens"
            " FROM documents"
        ),
        "text_fingerprint": (
            "SELECT doc_id, min(md5(g)) AS fingerprint FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, greatest(length(text)-15,1)+1),"
            " i -> substr(text, i, 16))) AS g FROM documents) GROUP BY 1"
        ),
        "vocab_stats": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
            " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM documents),"
            " pd AS (SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2)"
            " SELECT token, CAST(sum(tf) AS BIGINT) AS term_freq,"
            " count(*) AS doc_freq FROM pd GROUP BY 1"
            " ORDER BY term_freq DESC, token ASC LIMIT 100"
        ),
        # linear-idf TF-IDF replayed operation-for-operation:
        # ((tf*1000.0) * n_docs / doc_freq) / in-vocab doc length,
        # rank ties broken by token ascending
        "tfidf_topk": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
            " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM documents),"
            " pd AS (SELECT doc_id, token, count(*) AS tf FROM toks"
            "  GROUP BY 1, 2),"
            " vocab AS (SELECT token, count(*) AS doc_freq FROM pd"
            "  GROUP BY 1 ORDER BY CAST(sum(tf) AS BIGINT) DESC, token ASC"
            "  LIMIT 65536),"
            " nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM pd),"
            " scored AS (SELECT pd.doc_id, pd.token, pd.tf, v.doc_freq,"
            "  (CAST(pd.tf AS DOUBLE) * 1000.0) * (SELECT n_docs FROM nd)"
            "  / v.doc_freq / CAST(sum(pd.tf) OVER (PARTITION BY pd.doc_id)"
            "   AS BIGINT) AS tfidf_milli"
            "  FROM pd JOIN vocab v USING (token))"
            " SELECT doc_id, token, tf, doc_freq AS df, tfidf_milli, rank"
            " FROM (SELECT *, row_number() OVER (PARTITION BY doc_id"
            "  ORDER BY tfidf_milli DESC, token ASC) AS rank FROM scored)"
            " WHERE rank <= 5"
        ),
        "bm25_topk": _bm25_sql(),
        "pack_sequences": f"{_pack_cte} SELECT * FROM packed",
        "doc_chunks": (
            # W=200, S=160: n = 1 for len<=W else 1+ceil((len-W)/S)
            "WITH n AS (SELECT doc_id, text, length(text) AS ln,"
            " CASE WHEN length(text) <= 200 THEN 1"
            "  ELSE 1 + (length(text) - 200 + 159) // 160 END AS nc"
            " FROM documents),"
            " e AS (SELECT doc_id, text,"
            "  unnest(range(0, nc)) AS chunk_id FROM n WHERE ln > 0)"
            " SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,"
            " CAST(chunk_id * 160 AS BIGINT) AS char_start,"
            " CAST(length(substr(text, CAST(chunk_id * 160 + 1 AS INT),"
            "  200)) AS BIGINT) AS chunk_len,"
            " md5(substr(text, CAST(chunk_id * 160 + 1 AS INT), 200))"
            "  AS chunk_md5"
            " FROM e"
        ),
        "pack_chunk_stats": (
            f"{_pack_cte}, ex AS (SELECT shard, tok_start, tok_end,"
            " unnest(range(chunk_first, chunk_last + 1)) AS chunk_id"
            " FROM packed WHERE n_tokens > 0)"
            " SELECT shard, chunk_id, count(*) AS n_docs,"
            " CAST(sum(least(tok_end, (chunk_id + 1) * 2048)"
            "  - greatest(tok_start, chunk_id * 2048)) AS BIGINT) AS n_tokens"
            " FROM ex GROUP BY 1, 2"
        ),
        "multimodal_meta": (
            "SELECT doc_id AS id, octet_length(encode(text)) AS n_bytes,"
            " sha256(text) AS content_sha FROM documents"
        ),
        # real JPEG SOF kernel via the registry: the synthesized
        # stream is 41 bytes (SOI 2 + APP0 18 + SOF0 19 + EOI 2) and
        # the kernel must read back exactly the doc_id-derived dims
        "multimodal_meta_jpeg": (
            "SELECT doc_id AS id, CAST(41 AS BIGINT) AS n_bytes,"
            " CAST(doc_id % 1920 + 1 AS INT) AS width,"
            " CAST(doc_id % 1080 + 1 AS INT) AS height,"
            " CAST(1 AS INT) AS n_frames FROM documents"
        ),
        "multimodal_frame_sample": (
            "WITH m AS (SELECT doc_id AS id,"
            " (('0x' || substr(sha256(text), 1, 8))::BIGINT % 300) + 1 AS n_frames"
            " FROM documents) "
            "SELECT id, count(*) AS n_sampled,"
            " CAST(max(f) AS BIGINT) AS last_idx FROM m,"
            " LATERAL unnest(range(0, n_frames, 30)) t(f) GROUP BY id"
        ),
        "multimodal_resize": (
            "WITH m AS (SELECT doc_id AS id,"
            " (('0x' || substr(sha256(text), 1, 8))::BIGINT % 1920) + 1 AS width,"
            " (('0x' || substr(sha256(text), 1, 8))::BIGINT % 1080) + 1 AS height"
            " FROM documents) "
            "SELECT id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,"
            " CAST(greatest(floor(width * least(224.0/width, 224.0/height, 1.0)), 1) AS INT) AS out_w,"
            " CAST(greatest(floor(height * least(224.0/width, 224.0/height, 1.0)), 1) AS INT) AS out_h"
            " FROM m"
        ),
        # multimodal_features_ann: PRNG stub kernel — rows-only
        "dedup_simhash": _simhash_sql,
        "dedup_embedding_lsh": _elsh_sql,
        "dedup_semantic": _semdedup_sql,
        "decontam_hits": _decontam_sql,
        "decontam_filter": (
            "SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated"
            " FROM documents d LEFT JOIN (" + _decontam_sql + ") h"
            " ON h.doc_id = d.doc_id"
        ),
        "dedup_duplicated_spans": _dspan_sql,
        "webclean_repetition": (
            "SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,"
            " round((len(l) - len(list_distinct(l))) / CAST(len(l) AS DOUBLE), 6)"
            "  AS dup_line_frac,"
            " round((tc - dc) / CAST(greatest(tc, 1) AS DOUBLE), 6)"
            "  AS dup_line_char_frac"
            " FROM (SELECT doc_id, l,"
            " coalesce(CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT), 0) AS tc,"
            " coalesce(CAST(list_sum(list_transform(list_distinct(l), x -> length(x))) AS BIGINT), 0) AS dc"
            " FROM (SELECT doc_id, str_split(text, chr(10)) AS l FROM documents))"
        ),
        "webclean_top_ngram": (
            "WITH w AS (SELECT doc_id,"
            " list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws"
            " FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform("
            " range(1, greatest(len(ws) - 1, 0) + 1),"
            " i -> ws[i] || ' ' || ws[i + 1])) AS gram FROM w), "
            "c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2), "
            "top AS (SELECT doc_id, gram, cnt FROM ("
            " SELECT doc_id, gram, cnt, row_number() OVER ("
            "  PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn FROM c)"
            " WHERE rn = 1), "
            "wc AS (SELECT doc_id,"
            " coalesce(CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT), 0)"
            "  AS wchars FROM w) "
            "SELECT w.doc_id, top.gram AS top_gram,"
            " CAST(coalesce(top.cnt, 0) AS BIGINT) AS top_gram_count,"
            " round(top.cnt * (length(top.gram) - 1)"
            "  / CAST(greatest(wc.wchars, 1) AS DOUBLE), 6) AS top_gram_char_frac"
            " FROM w LEFT JOIN top ON top.doc_id = w.doc_id"
            " JOIN wc ON wc.doc_id = w.doc_id"
        ),
        "webclean_pii": (
            f"SELECT doc_id,"
            f" CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,"
            f" CAST(len(regexp_extract_all(regexp_replace(text, '{EMAIL_RE}',"
            f" '<EMAIL>', 'g'), '{IPV4_RE}')) AS BIGINT) AS n_ips,"
            f" CAST(length(regexp_replace(regexp_replace(text, '{EMAIL_RE}',"
            f" '<EMAIL>', 'g'), '{IPV4_RE}', '<IP>', 'g')) AS BIGINT) AS clean_len"
            f" FROM documents"
        ),
        "dedup_paragraphs": (
            "SELECT d.doc_id, g.clean_text,"
            " CAST(coalesce(g.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,"
            " CAST(coalesce(g.n_dropped, 0) AS BIGINT) AS n_dropped"
            " FROM documents d LEFT JOIN ("
            "SELECT doc_id,"
            " coalesce(string_agg(para, chr(10) || chr(10) ORDER BY idx)"
            "  FILTER (WHERE keep), '') AS clean_text,"
            " count(*) AS n_paragraphs,"
            " sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_dropped"
            " FROM (SELECT doc_id, idx, para,"
            "  regexp_matches(para, '^\\s*$') OR row_number() OVER ("
            "   PARTITION BY para ORDER BY doc_id, idx) = 1 AS keep"
            " FROM (SELECT doc_id, u.idx AS idx, u.para AS para"
            "  FROM (SELECT doc_id, unnest(list_transform("
            "   str_split(text, chr(10) || chr(10)),"
            "   (x, i) -> struct_pack(idx := i, para := x))) AS u"
            "  FROM documents))) GROUP BY doc_id) g ON g.doc_id = d.doc_id"
        ),
        "dedup_sentences": (
            "SELECT d.doc_id, g.clean_text,"
            " CAST(coalesce(g.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,"
            " CAST(coalesce(g.n_dropped, 0) AS BIGINT) AS n_dropped"
            " FROM documents d LEFT JOIN ("
            "SELECT doc_id,"
            " coalesce(string_agg(para, '. ' ORDER BY idx)"
            "  FILTER (WHERE keep), '') AS clean_text,"
            " count(*) AS n_paragraphs,"
            " sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_dropped"
            " FROM (SELECT doc_id, idx, para,"
            "  regexp_matches(para, '^\\s*$') OR row_number() OVER ("
            "   PARTITION BY para ORDER BY doc_id, idx) = 1 AS keep"
            " FROM (SELECT doc_id, u.idx AS idx, u.para AS para"
            "  FROM (SELECT doc_id, unnest(list_transform("
            "   str_split(text, '. '),"
            "   (x, i) -> struct_pack(idx := i, para := x))) AS u"
            "  FROM documents))) GROUP BY doc_id) g ON g.doc_id = d.doc_id"
        ),
        "webclean_classifier": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
            " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM documents),"
            " b AS (SELECT doc_id,"
            "  ('0x'||substr(md5(token),1,15))::BIGINT % 262144 AS bucket FROM toks),"
            " w AS (SELECT doc_id,"
            "  (('0x'||substr(md5('w|' || CAST(bucket AS VARCHAR)),1,15))::BIGINT"
            "   % 2001) - 1000 AS w_milli FROM b),"
            " agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,"
            "  CAST(sum(w_milli) AS BIGINT) AS w_sum FROM w GROUP BY 1),"
            " scored AS (SELECT doc_id, n_tokens,"
            "  round(1.0/(1.0+exp(-(w_sum/(n_tokens*1000.0)))), 6) AS score FROM agg)"
            " SELECT doc_id, n_tokens, score FROM scored"
            " UNION ALL SELECT doc_id, CAST(0 AS BIGINT), 0.5 FROM documents"
            "  WHERE doc_id NOT IN (SELECT doc_id FROM scored)"
        ),
        "classifier_train": (
            "WITH lab AS (SELECT text,"
            "  CAST(substr(source, 4) AS BIGINT) < 10 AS is_ref FROM documents),"
            " toks AS (SELECT is_ref, unnest(regexp_extract_all(text,"
            "  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM lab),"
            " b AS (SELECT"
            "  ('0x'||substr(md5(token),1,15))::BIGINT % 262144 AS bucket,"
            "  is_ref FROM toks),"
            " c AS (SELECT bucket,"
            "  CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS pos_count,"
            "  CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS neg_count"
            "  FROM b GROUP BY 1)"
            " SELECT bucket, (2000 * (pos_count + 1))"
            "   // (pos_count + neg_count + 2) - 1000 AS weight_milli,"
            "  pos_count, neg_count FROM c"
        ),
        "webclean_classifier_trained": (
            "WITH lab AS (SELECT text,"
            "  CAST(substr(source, 4) AS BIGINT) < 10 AS is_ref FROM documents),"
            " ttoks AS (SELECT is_ref, unnest(regexp_extract_all(text,"
            "  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM lab),"
            " tb AS (SELECT"
            "  ('0x'||substr(md5(token),1,15))::BIGINT % 262144 AS bucket,"
            "  is_ref FROM ttoks),"
            " model AS (SELECT bucket, (2000 * (pos_count + 1))"
            "   // (pos_count + neg_count + 2) - 1000 AS weight_milli FROM ("
            "  SELECT bucket,"
            "   sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS pos_count,"
            "   sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS neg_count"
            "   FROM tb GROUP BY 1)),"
            " toks AS (SELECT doc_id, unnest(regexp_extract_all(text,"
            "  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM documents),"
            " b AS (SELECT doc_id,"
            "  ('0x'||substr(md5(token),1,15))::BIGINT % 262144 AS bucket FROM toks),"
            " w AS (SELECT doc_id, coalesce(weight_milli, 0) AS w_milli"
            "  FROM b LEFT JOIN model USING (bucket)),"
            " agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,"
            "  CAST(sum(w_milli) AS BIGINT) AS w_sum FROM w GROUP BY 1),"
            " scored AS (SELECT doc_id, n_tokens,"
            "  round(1.0/(1.0+exp(-(w_sum/(n_tokens*1000.0)))), 6) AS score FROM agg)"
            " SELECT doc_id, n_tokens, score FROM scored"
            " UNION ALL SELECT doc_id, CAST(0 AS BIGINT), 0.5 FROM documents"
            "  WHERE doc_id NOT IN (SELECT doc_id FROM scored)"
        ),
        "webclean_gopher": (
            "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,"
            " round(mean_wlen, 6) AS mean_word_len,"
            " round(hash_r, 6) AS hash_ratio,"
            " round(ell_r, 6) AS ellipsis_ratio,"
            " round(bullet_frac, 6) AS bullet_line_frac,"
            " round(ell_frac, 6) AS ellipsis_line_frac,"
            " round(alpha_frac, 6) AS alpha_word_frac,"
            " CAST(n_stop AS BIGINT) AS n_stopwords,"
            " reason AS gopher_reason, reason = 'ok' AS gopher_keep"
            " FROM (SELECT *, CASE"
            "  WHEN NOT coalesce(n_words >= 50 AND n_words <= 100000, FALSE)"
            "   THEN 'word_count'"
            "  WHEN NOT coalesce(mean_wlen >= 3.0 AND mean_wlen <= 10.0, FALSE)"
            "   THEN 'mean_word_length'"
            "  WHEN NOT coalesce(hash_r <= 0.1 AND ell_r <= 0.1, FALSE)"
            "   THEN 'symbol_ratio'"
            "  WHEN NOT coalesce(bullet_frac < 0.9, FALSE) THEN 'bullet_lines'"
            "  WHEN NOT coalesce(ell_frac < 0.3, FALSE) THEN 'ellipsis_lines'"
            "  WHEN NOT coalesce(alpha_frac >= 0.8, FALSE) THEN 'alpha_words'"
            "  WHEN NOT coalesce(n_stop >= 2, FALSE) THEN 'stopwords'"
            "  ELSE 'ok' END AS reason FROM ("
            " SELECT doc_id, len(w) AS n_words,"
            "  coalesce(list_aggregate(list_transform(w, x -> length(x)), 'sum'), 0)"
            "   / CAST(greatest(len(w), 1) AS DOUBLE) AS mean_wlen,"
            "  (len(str_split(text, '#')) - 1)"
            "   / CAST(greatest(len(w), 1) AS DOUBLE) AS hash_r,"
            "  (len(str_split(text, '...')) - 1"
            "   + len(str_split(text, chr(8230))) - 1)"
            "   / CAST(greatest(len(w), 1) AS DOUBLE) AS ell_r,"
            "  len(list_filter(l, x -> regexp_matches(x, '^[-*' || chr(8226) || ']')))"
            "   / CAST(greatest(len(l), 1) AS DOUBLE) AS bullet_frac,"
            "  len(list_filter(l, x -> regexp_matches(x,"
            "   '(\\.\\.\\.|' || chr(8230) || ')$')))"
            "   / CAST(greatest(len(l), 1) AS DOUBLE) AS ell_frac,"
            "  len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))"
            "   / CAST(greatest(len(w), 1) AS DOUBLE) AS alpha_frac,"
            + " + ".join(
                "  CAST(len(list_filter(w, x -> lower(regexp_replace(x,"
                " '^[^A-Za-z0-9]+|[^A-Za-z0-9]+$', '', 'g')) = '{}')) > 0"
                " AS INT)".format(s)
                for s in GOPHER_STOPWORDS
            )
            + " AS n_stop"
            " FROM (SELECT doc_id, coalesce(text, '') AS text,"
            "  list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),"
            "   x -> x <> '') AS w,"
            "  str_split(coalesce(text, ''), chr(10)) AS l"
            " FROM documents)))"
        ),
        "url_domain_rollup": (
            "SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(sum(toks) AS BIGINT) AS n_tokens,"
            " CAST(count(DISTINCT host) AS BIGINT) AS n_hosts FROM ("
            + _domain_inner
            + ") GROUP BY domain"
        ),
        "url_blocklist": (
            "SELECT doc_id, url FROM (" + _domain_inner + ")"
            " WHERE domain NOT IN ('src1.com', 'src0.co.uk')"
        ),
        "url_canonicalize": "SELECT doc_id, canonical_url FROM (" + _canon_inner + ")",
        # NULL canonical urls pass through ungrouped (same contract as
        # dedup_by_url; the messy-url corpus never produces one, but
        # the semantics stay aligned)
        "url_dedup": (
            "SELECT min(doc_id) AS doc_id, canonical_url FROM ("
            + _canon_inner + ") WHERE canonical_url IS NOT NULL"
            " GROUP BY canonical_url"
            " UNION ALL SELECT doc_id, canonical_url FROM ("
            + _canon_inner + ") WHERE canonical_url IS NULL"
        ),
        "dedup_span_removal": _rm_sql,
        "dedup_span_removal_keepone": _rm_keepone_sql,
        "dedup_incremental": _incremental_sql,
        "dedup_incremental_minhash": (
            f"WITH sh AS ({shingles}),"
            " w AS (SELECT doc_id,"
            "  ('0x'||substr(min(md5('b0|' || shingle)),1,15))::BIGINT AS sig0,"
            "  ('0x'||substr(min(md5('b1|' || shingle)),1,15))::BIGINT AS sig1,"
            "  ('0x'||substr(min(md5('b2|' || shingle)),1,15))::BIGINT AS sig2,"
            "  ('0x'||substr(min(md5('b3|' || shingle)),1,15))::BIGINT AS sig3"
            "  FROM sh GROUP BY doc_id),"
            " seen AS (SELECT * FROM w WHERE doc_id % 3 = 0),"
            " batch AS (SELECT * FROM w WHERE doc_id % 3 <> 0),"
            " hit AS (SELECT n.doc_id FROM batch n WHERE EXISTS ("
            "  SELECT 1 FROM seen s WHERE s.sig0 = n.sig0 OR s.sig1 = n.sig1"
            "   OR s.sig2 = n.sig2 OR s.sig3 = n.sig3))"
            " SELECT d.doc_id FROM documents d WHERE d.doc_id % 3 <> 0"
            " AND d.doc_id NOT IN (SELECT doc_id FROM hit)"
        ),
        # the Bloom pre-filter is exact (no false negatives when the
        # filter is built from `seen` itself), so the bloom gate
        # replays the SAME oracle — equality with it IS the claim.
        "dedup_incremental_bloom": _incremental_sql,
        # sessionization oracle: the GLOBAL per-key window definition
        # (the thing the two-phase bucket decomposition must equal).
        "events_sessionize": (
            _session_cte + " SELECT user_id, event_id, us AS event_us,"
            " session_start_us FROM h"
        ),
        # the streaming drain over one availableNow batch must equal
        # the same global-window oracle (full history per key in-batch)
        "streaming_sessionize": (
            _session_cte + " SELECT user_id, event_id, us AS event_us,"
            " session_start_us FROM h"
        ),
        "events_session_rollup": (
            _session_cte + " SELECT user_id, session_start_us,"
            " count(*) AS n_events,"
            " max(us) - session_start_us AS duration_us"
            " FROM h GROUP BY user_id, session_start_us"
        ),
        "events_session_rollup_native": (
            _session_cte + " SELECT user_id, session_start_us,"
            " count(*) AS n_events,"
            " max(us) - session_start_us AS duration_us"
            " FROM h GROUP BY user_id, session_start_us"
        ),
        "events_funnel": (
            _funnel_cte
            + " SELECT s1.user_id, t1 AS view_us, t2 AS click_us,"
            " t3 AS purchase_us FROM s1"
            " LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)"
        ),
        "events_funnel_windowed": (
            "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us"
            " FROM events WHERE ts IS NOT NULL),"
            " s1 AS (SELECT user_id, min(us) AS t1 FROM e"
            " WHERE event_type = 'view' GROUP BY 1),"
            " s2 AS (SELECT e.user_id, min(us) AS t2 FROM e"
            " JOIN s1 USING (user_id)"
            " WHERE event_type = 'click' AND us >= t1"
            " AND us <= t1 + 7200000000 GROUP BY 1),"
            " s3 AS (SELECT e.user_id, min(us) AS t3 FROM e"
            " JOIN s2 USING (user_id)"
            " WHERE event_type = 'purchase' AND us >= t2"
            " AND us <= t2 + 7200000000 GROUP BY 1)"
            " SELECT s1.user_id, t1 AS view_us, t2 AS click_us,"
            " t3 AS purchase_us FROM s1"
            " LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)"
        ),
        "events_funnel_counts": (
            _funnel_cte
            + " SELECT 1 AS stage_idx, 'view' AS stage,"
            " count(*) AS keys_reached FROM s1"
            " UNION ALL SELECT 2, 'click', count(*) FROM s2"
            " UNION ALL SELECT 3, 'purchase', count(*) FROM s3"
        ),
        "events_cohort_retention": (
            "WITH e AS (SELECT user_id,"
            " epoch_us(ts) // 86400000000 AS d"
            " FROM events WHERE ts IS NOT NULL),"
            " firsts AS (SELECT user_id, min(d) AS cohort_day FROM e"
            " GROUP BY 1),"
            " days AS (SELECT DISTINCT user_id, d FROM e)"
            " SELECT cohort_day, d - cohort_day AS day_offset,"
            " count(*) AS active_keys FROM days JOIN firsts USING"
            " (user_id) GROUP BY 1, 2"
        ),
        # burst rule replayed integer-exact: n*1000*k >= factor_milli
        # * trailing_sum, RANGE frame over the bucket index so empty
        # buckets count as zero on both sides
        "events_bursts": _BURSTS_ORACLE_SQL,
        # the streaming drain must equal the batch RANGE-frame oracle
        # bit-for-bit (one availableNow batch holds each key's whole
        # bucket history) — SAME SQL as events_bursts
        "streaming_bursts": _BURSTS_ORACLE_SQL,
        # lower empirical quantile off the per-key value histogram:
        # smallest value with cum*1e6 >= q_ppm*n, replayed exactly
        "events_quantiles": (
            "WITH h AS (SELECT event_type, value, count(*) AS c"
            " FROM events WHERE value IS NOT NULL GROUP BY 1, 2),"
            " cum AS (SELECT event_type, value,"
            " sum(c) OVER (PARTITION BY event_type ORDER BY value"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS cum,"
            " sum(c) OVER (PARTITION BY event_type) AS n FROM h),"
            " q AS (SELECT unnest([500000, 950000, 990000]) AS q_ppm)"
            " SELECT event_type, q_ppm,"
            " CAST(max(n) AS BIGINT) AS n_events,"
            " min(value) AS q_value FROM cum CROSS JOIN q"
            " WHERE cum * 1000000 >= q_ppm * n GROUP BY 1, 2"
        ),
        "text_novelty": (
            f"WITH sh AS ({shingles}),"
            " per_sh AS (SELECT shingle, count(*) AS df,"
            "  min(doc_id) AS owner FROM sh GROUP BY shingle),"
            " novel AS (SELECT owner AS doc_id, count(*) AS n"
            "  FROM per_sh WHERE df = 1 GROUP BY owner),"
            " totals AS (SELECT doc_id, count(*) AS n"
            "  FROM sh GROUP BY doc_id)"
            " SELECT d.doc_id,"
            " CAST(coalesce(t.n, 0) AS BIGINT) AS n_shingles,"
            " CAST(CASE WHEN t.n IS NOT NULL THEN coalesce(v.n, 0) END"
            "  AS BIGINT) AS n_novel,"
            " CAST(CASE WHEN t.n IS NOT NULL THEN"
            "  (1000000 * coalesce(v.n, 0)) // t.n END AS BIGINT)"
            "  AS novelty_ppm"
            " FROM documents d LEFT JOIN totals t ON t.doc_id = d.doc_id"
            " LEFT JOIN novel v ON v.doc_id = d.doc_id"
        ),
        "text_readability": (
            "SELECT doc_id, n_words,"
            " CASE WHEN has_text THEN greatest(n_sent_raw, 1) END"
            " AS n_sentences, n_syllables,"
            " CASE WHEN n_words > 0 THEN round(206.835"
            " - 1.015 * (n_words / greatest(n_sent_raw, 1))"
            " - 84.6 * (n_syllables / n_words), 6) END AS flesch,"
            " CASE WHEN n_toks > 0 THEN round(n_types / n_toks, 6) END"
            " AS ttr FROM ("
            "SELECT doc_id, text IS NOT NULL AS has_text,"
            " len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,"
            " len(regexp_extract_all(text, '[.!?]+')) AS n_sent_raw,"
            " len(regexp_extract_all(text, '(?i)[aeiouy]+'))"
            " AS n_syllables,"
            f" len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))"
            " AS n_toks,"
            " len(list_distinct(regexp_extract_all(text,"
            f" '{_TOKEN_RE_SQL}'))) AS n_types"
            " FROM documents)"
        ),
        "dedup_exact_normalized": (
            "WITH corpus AS (SELECT doc_id, text FROM documents"
            " UNION ALL SELECT doc_id + 1000000,"
            " '  ' || translate(upper(text), '0123456789',"
            " '9876543210') || ' ?!*  ,, ' FROM documents),"
            " n AS (SELECT doc_id, md5(trim(regexp_replace("
            "regexp_replace(regexp_replace(lower(text),"
            " '\\p{N}', '0', 'g'),"
            " '[^\\p{L}\\p{N}\\s]', '', 'g'),"
            " '\\s+', ' ', 'g'))) AS content_hash FROM corpus)"
            " SELECT content_hash, count(*) AS dup_count,"
            " min(doc_id) AS keeper_id FROM n GROUP BY 1"
            " HAVING count(*) > 1"
        ),
        "webclean_verdict": (
            "SELECT doc_id, reason, reason = 'ok' AS keep FROM ("
            "SELECT doc_id, CASE WHEN text IS NULL OR length(text) < 20 THEN 'too_short'"
            " WHEN lang IS NULL OR lang NOT IN ('en') THEN 'lang'"
            " WHEN (len(l) - len(list_distinct(l))) / CAST(len(l) AS DOUBLE) > 0.30"
            "  THEN 'repetition' ELSE 'ok' END AS reason"
            " FROM (SELECT doc_id, lang, text, str_split(text, chr(10)) AS l"
            " FROM documents))"
        ),
        # training-data prep composition: quality verdict -> near-dup
        # clustering over kept docs -> per-doc routing reason
        "corpus_prep": (
            f"{prep_cte} "
            "SELECT doc_id, reason, reason = 'ok' AS keep FROM prep"
        ),
        "corpus_prep_yield": (
            f"{prep_cte}, "
            "toks AS (SELECT doc_id, CAST(len(list_filter("
            "regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS t"
            " FROM documents) "
            "SELECT p.reason, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(sum(t.t) AS BIGINT) AS n_tokens"
            " FROM prep p JOIN toks t ON t.doc_id = p.doc_id GROUP BY 1"
        ),
        # deterministic md5-keyed sampling: same hex-threshold /
        # hash-order expressions on both sides (ops/sampling.py)
        "sample_budget": (
            "WITH d AS (SELECT doc_id,"
            " CAST(doc_id % 7 AS BIGINT) AS score,"
            " CAST(length(text) AS BIGINT) AS n_tokens FROM documents),"
            " o AS (SELECT *, substr(md5('budget|' ||"
            "  CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM d),"
            " c AS (SELECT *, sum(n_tokens) OVER (ORDER BY score DESC,"
            "  h ASC, doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND"
            "  CURRENT ROW) AS cum FROM o)"
            " SELECT doc_id, score, n_tokens FROM c WHERE cum <= 25000"
        ),
        "sample_deterministic": (
            "SELECT doc_id, lang FROM documents"
            f" WHERE substr(md5('s1|' || CAST(doc_id AS VARCHAR)), 1, 8)"
            f" < '{frac_to_hex8(0.25)}'"
        ),
        "sample_split": (
            "SELECT doc_id, CASE WHEN"
            " substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)"
            f" < '{frac_to_hex8(0.2)}' THEN 'holdout' ELSE 'train' END AS split"
            " FROM documents"
        ),
        "sample_stratified": (
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER (PARTITION BY lang"
            " ORDER BY substr(md5('strata|' || CAST(doc_id AS VARCHAR)), 1, 8),"
            " doc_id) AS rn FROM documents)"
            " WHERE rn <= CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 10 ELSE 0 END"
        ),
        # per-domain quota (ops/sampling.domain_quota_sample, cap 5):
        # over-cap domains get the slack-rate hex pre-filter (keep-all
        # sentinel 'g' when slack >= size) then rank <= cap; under-cap
        # rows pass through untouched
        "sample_domain_quota": _dq_sql,
        # link-graph: real-HTML href extraction + resolution over the
        # q_link_extract scaffold.  The oracle RECONSTRUCTS the
        # expected resolved edge multiset from the same doc_id
        # arithmetic (one UNION ALL branch per surviving link form) —
        # extraction/resolution mechanics are pinned by the urljoin
        # fuzz twin in tests/test_urlresolve.py and the form matrix in
        # tests/test_linkgraph.py.
        "anchor_extract": _anchor_sqls()[0],
        "anchor_domain_topk": _anchor_sqls()[1],
        "link_extract": (
            "WITH d AS (SELECT doc_id, source,"
            " 'https://' || source || '.example/p/'"
            " || CAST(doc_id AS VARCHAR) AS src_url FROM documents)"
            " SELECT src_url, 'https://' || source || '.com/p/'"
            " || CAST(doc_id % 7 AS VARCHAR) AS dst_url FROM d"
            " UNION ALL SELECT src_url,"
            " 'http://ref' || CAST(doc_id % 5 AS VARCHAR)"
            " || '.org/q?a=1&b=2' FROM d"
            " UNION ALL SELECT src_url, 'https://' || source"
            " || '.example/up/' || CAST(doc_id % 3 AS VARCHAR) FROM d"
            " UNION ALL SELECT src_url, 'https://cdn'"
            " || CAST(doc_id % 2 AS VARCHAR) || '.example/lib.js' FROM d"
            " UNION ALL SELECT src_url, 'https://' || source"
            " || '.example/abs/' || CAST(doc_id % 11 AS VARCHAR) FROM d"
        ),
        "domain_pagerank": _pagerank_sql(),
        # warm(2, cold(3)) == cold(5): same oracle as domain_pagerank
        "domain_pagerank_resumed": _pagerank_sql(),
        "link_hits": _hits_sql(),
        "corpus_profile": _corpus_profile_sql(),
        # encoding-health screen (ops/webclean.encoding_quality) over
        # the q_encoding_quality defect scaffold; regexes generated
        # from the SAME module constants as the Spark op
        "encoding_quality": _encoding_quality_sql(),
        # hashed bigram LM likelihood (ops/lmscore.py): train on the
        # md5-'split' holdout half, score everything — same 60-bit
        # md5 bucket idiom, integer milli-prob (1000*pc) // fc
        "lm_likelihood": _lm_likelihood_sql(),
        # trained bigram model tables (pair/prefix counts) themselves
        "lm_train": _lm_train_sql(),
        # CCNet per-domain perplexity prior: lm_likelihood composed
        # with the PSL domain ladder, NULL-skipping integer mean
        "domain_lm_prior": (
            f"WITH lm AS ({_lm_likelihood_sql()}),"
            " u AS (SELECT doc_id,"
            + " " + registered_domain_sql("host", "hp")
            + " AS domain FROM (SELECT doc_id, host,"
            " str_split(host, '.') AS hp FROM (SELECT doc_id,"
            " lower('www.' || source ||"
            " (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'"
            "  WHEN doc_id % 3 = 1 THEN '.com' ELSE '.org' END))"
            " AS host FROM documents)))"
            " SELECT u.domain, count(*) AS n_docs,"
            " count(lm.lm_score_ppm) AS n_scored,"
            " CAST(CASE WHEN count(lm.lm_score_ppm) > 0 THEN"
            "  sum(lm.lm_score_ppm) // count(lm.lm_score_ppm)"
            " END AS BIGINT) AS prior_ppm"
            " FROM lm JOIN u ON u.doc_id = lm.doc_id GROUP BY 1"
        ),
        # CCNet head/middle/tail terciles (ops/lmscore.lm_buckets):
        # langid + LM score composed, exact tercile cuts off the
        # per-(lang, score) histogram — same cut rule 3*cum >= k*n
        "lm_buckets": _lm_buckets_sql(),
        # C4 line+page rule set (ops/webclean.c4_filters) over the
        # q_c4_filters defect scaffold; constants imported from the op
        "c4_filters": _c4_filters_sql(),
        # DSIR hashed-ngram importance weights + greedy top-k
        # resampling (ops/dsir.py) — integer ppm contrast, md5 buckets
        "dsir_weights": _dsir_weights_sql(),
        "dsir_select": _dsir_select_sql(),
        # n^alpha temperature mixing (ops/sampling.temperature_mix,
        # budget 150, alpha 0.5): integer milli-weight w=floor(1000*n^a)
        # quarantines pow(), Z is an exact integer sum, keep-all is an
        # exact wide-integer compare, the threshold double chain
        # ((B*w)/(Z*n))*2^32 is IEEE-identical on both engines
        "sample_temperature": (
            "WITH c AS (SELECT source, count(*) AS n"
            "  FROM documents GROUP BY 1),"
            " w AS (SELECT source, n, CAST(floor(1000.0 *"
            "  pow(CAST(n AS DOUBLE), 0.5)) AS BIGINT) AS w FROM c),"
            " wz AS (SELECT source, n, w, sum(w) OVER () AS z FROM w),"
            " t AS (SELECT source, CASE"
            "  WHEN CAST(150 AS HUGEINT) * w >= CAST(z AS HUGEINT) * n"
            "  THEN 'g'"
            "  ELSE lpad(lower(hex(CAST(floor("
            "   (150.0 * CAST(w AS DOUBLE))"
            "   / (CAST(z AS DOUBLE) * CAST(n AS DOUBLE))"
            "   * 4294967296.0) AS BIGINT))), 8, '0') END AS th FROM wz)"
            " SELECT d.doc_id, d.source FROM documents d"
            " JOIN t ON d.source = t.source"
            " WHERE substr(md5('tmix|' || CAST(d.doc_id AS VARCHAR)), 1, 8)"
            " < t.th"
        ),
        # corpus-frequency boilerplate line removal (ops/webclean.
        # remove_boilerplate_lines) over the q_webclean_boilerplate
        # page scaffold: document-frequency >= 2 on the trimmed line,
        # whitespace-only lines always kept, per-doc reassembly in
        # line order
        "webclean_boilerplate": (
            "WITH pages AS (SELECT doc_id,"
            " text || chr(10) || 'Home | About | Contact' || chr(10) ||"
            " CASE WHEN doc_id % 3 = 0 THEN 'Subscribe to our newsletter'"
            "  ELSE 'Visitor note ' || CAST(doc_id AS VARCHAR) END"
            " || chr(10) || '  ' || chr(10) ||"
            " '(c) ' || source || ' Media Group' AS text FROM documents),"
            " lines AS (SELECT doc_id, u.idx AS idx, u.line AS line FROM ("
            "  SELECT doc_id, unnest(list_transform(str_split(text, chr(10)),"
            "   (x,i) -> struct_pack(idx := i, line := x))) AS u FROM pages)),"
            " hot AS (SELECT trim(line) AS k FROM lines"
            "  WHERE NOT regexp_matches(line, '^[ \\t\\r\\f]*$')"
            "  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),"
            " marked AS (SELECT doc_id, idx, line,"
            "  regexp_matches(line, '^[ \\t\\r\\f]*$')"
            "   OR trim(line) NOT IN (SELECT k FROM hot) AS keep FROM lines),"
            " g AS (SELECT doc_id,"
            "  coalesce(string_agg(line, chr(10) ORDER BY idx)"
            "   FILTER (WHERE keep), '') AS clean_text,"
            "  count(*) AS n_lines,"
            "  sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_dropped"
            " FROM marked GROUP BY doc_id)"
            " SELECT d.doc_id, g.clean_text,"
            " CAST(coalesce(g.n_lines, 0) AS BIGINT) AS n_lines,"
            " CAST(coalesce(g.n_dropped, 0) AS BIGINT) AS n_dropped"
            " FROM documents d LEFT JOIN g ON g.doc_id = d.doc_id"
        ),
        # BPE merge-pair counts (ops/textstats.bpe_pair_stats): lead()
        # over the per-doc ordered token stream replays zip_with(slice,
        # slice); (count DESC, left, right) is a total order so the
        # LIMIT is deterministic
        "bpe_pair_stats": _bpe_pair_sql(),
        # robots meta screen (ops/htmltext.robots_directives) over the
        # q_robots_directives scaffold; the extraction fragment comes
        # from ops.htmltext.robots_sql — one source of truth
        "robots_directives": _robots_sql(),
        # structured page metadata (ops/htmlmeta.page_metadata) over
        # the q_html_metadata scaffold; extraction fragment from
        # ops.htmlmeta.page_meta_sql — one source of truth
        "html_metadata": _html_meta_oracle_sql(),
        # WARC record parse (ops/warc.parse_warc) over the
        # q_warc_parse record scaffold; parse fragment from
        # ops.warc.warc_sql — one source of truth
        "warc_parse": _warc_oracle_sql(),
        # one-sided shingle containment on the SAME LSH candidate CTEs
        # as dedup_ngram_jaccard; containments projected instead
        "dedup_containment": (
            f"{sigs}, {pairs}, "
            "sh2 AS (SELECT DISTINCT doc_id, shingle FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, greatest(length(text)-7,1)+1),"
            " i -> substr(text, i, 8))) AS shingle FROM documents)"
            " WHERE length(shingle) = 8), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1), "
            "inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter FROM pairs p"
            " JOIN sh2 a ON a.doc_id = p.doc_a JOIN sh2 b ON b.doc_id = p.doc_b"
            " AND b.shingle = a.shingle GROUP BY 1, 2) "
            "SELECT i.doc_a, i.doc_b,"
            " round(CAST(i.n_inter AS DOUBLE) / na.n, 6) AS containment_a,"
            " round(CAST(i.n_inter AS DOUBLE) / nb.n, 6) AS containment_b "
            "FROM inter i JOIN sizes na ON na.doc_id = i.doc_a"
            " JOIN sizes nb ON nb.doc_id = i.doc_b "
            "WHERE CAST(i.n_inter AS DOUBLE) / na.n >= 0.5"
            " OR CAST(i.n_inter AS DOUBLE) / nb.n >= 0.5"
        ),
        # PMI collocation lift (ops/collocations.pmi_collocations):
        # same TOKEN_RE, lead()-formed pairs, pinned double chain
        "pmi_collocations": _pmi_oracle_sql(),
        # robots.txt rule parse + longest-prefix URL screen
        # (ops/robotstxt): rules/screen fragments from
        # ops.robotstxt.robots_rules_sql / robots_screen_sql
        "robots_screen": _robots_screen_oracle_sql(),
        # inverted-index postings (ops/invindex): same TOKEN_RE, same
        # (tf DESC, doc_id) total order, plain-window cap the salted
        # two-stage rank is provably equivalent to
        "inverted_index": _inverted_index_oracle_sql(),
        # crawl-snapshot diff (ops/crawldiff): same synthetic
        # snapshots (_SNAP_*_REL), same min-digest collapse + full
        # outer join; the counts gate rolls the same relation up
        "crawl_diff": _crawl_diff_oracle_sql(),
        "crawl_diff_counts": (
            f"SELECT verdict, CAST(count(*) AS BIGINT) AS n_urls"
            f" FROM ({_crawl_diff_oracle_sql()}) GROUP BY 1"
        ),
        # iterative BPE training (ops/bpetrain): 8 unrolled CTE layers
        # replaying pair counts, (count DESC, left, right) argmax, and
        # the double-space greedy merge per round
        "bpe_train": _bpe_train_oracle_sql(),
        # encode side: same CTE tower, final segmentation joined back
        # to the corpus token stream
        "bpe_encode": _bpe_encode_oracle_sql(),
        # end-to-end WARC->page ingest: per-stage oracle fragments
        # composed over the q_web_ingest scaffold
        "web_ingest": _web_ingest_oracle_sql(),
        # count-min sketch build + estimate + exact comparison: same
        # md5-salted cells, same min-over-depth, replayed exactly
        "cm_heavy_hitters": _cm_oracle_sql(),
        # HLL registers + integer estimate replayed exactly (bin()
        # string-length ranks, one integer division, no floats)
        "hll_distinct": _hll_oracle_sql(),
        # URL path-template census: same TEMPLATE_* constants, same
        # per-segment CASE, same two-level (template, domain) rollup
        "url_templates": _url_templates_oracle_sql(),
        "url_surt_shards": (
            f"WITH u AS ({_messy_url}),"
            " parts AS (SELECT url,"
            f"  coalesce(lower(regexp_extract(url, '{HOST_RE}', 1)), '')"
            "   AS host,"
            f"  coalesce(regexp_extract(url, '{PATH_RE}', 1), '') AS path"
            "  FROM u),"
            " s AS (SELECT CASE WHEN host = '' THEN NULL ELSE"
            "  array_to_string(list_reverse(str_split("
            "   regexp_replace(host, '^www\\.', ''), '.')), ',')"
            "  || ')' ||"
            "  (CASE WHEN path = '' THEN '/' ELSE lower(path) END)"
            "  END AS surt FROM parts),"
            " sh AS (SELECT surt, CASE WHEN surt IS NULL THEN -1 ELSE"
            "  ('0x' || substr(md5(surt), 1, 15))::BIGINT % 8 END AS shard"
            "  FROM s)"
            " SELECT CAST(shard AS BIGINT) AS shard,"
            " CAST(count(*) AS BIGINT) AS n_urls,"
            " min(surt) AS surt_min, max(surt) AS surt_max"
            " FROM sh GROUP BY shard"
        ),
        # LSH calibration joint (ops/dedup.minhash_calibration): same
        # candidate CTEs as the jaccard oracle; integer decile via //
        "minhash_calibration": (
            f"{sigs}, {pairs}, "
            "sh2 AS (SELECT DISTINCT doc_id, shingle FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, greatest(length(text)-7,1)+1),"
            " i -> substr(text, i, 8))) AS shingle FROM documents)"
            " WHERE length(shingle) = 8), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1), "
            "inter AS (SELECT p.doc_a, p.doc_b, p.n_shared_bands,"
            " count(*) AS n_inter FROM pairs p"
            " JOIN sh2 a ON a.doc_id = p.doc_a JOIN sh2 b ON b.doc_id = p.doc_b"
            " AND b.shingle = a.shingle GROUP BY 1, 2, 3) "
            "SELECT n_shared_bands,"
            " CAST((10 * i.n_inter) // (na.n + nb.n - i.n_inter) AS BIGINT)"
            "  AS jaccard_decile,"
            " CAST(count(*) AS BIGINT) AS n_pairs "
            "FROM inter i JOIN sizes na ON na.doc_id = i.doc_a"
            " JOIN sizes nb ON nb.doc_id = i.doc_b"
            " GROUP BY 1, 2"
        ),
        # frequency-of-frequencies census (ops/textstats.vocab_spectrum)
        # over the SAME BPE-ish token stream as vocab_stats
        "vocab_spectrum": (
            "WITH toks AS (SELECT unnest(regexp_extract_all(text,"
            " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token FROM documents),"
            " pt AS (SELECT token, count(*) AS term_freq FROM toks"
            " GROUP BY 1)"
            " SELECT CAST(term_freq AS BIGINT) AS term_freq,"
            " CAST(count(*) AS BIGINT) AS n_types FROM pt GROUP BY 1"
        ),
        "html_stats": _html_stats_oracle_sql(),
        "charset_sniff": _charset_oracle_sql(),
        "frontier_candidates": _frontier_oracle_sql(),
        # frontier + crawl-delay politeness schedule; the single-group
        # scaffold lets the oracle extract the delay with one anchored
        # multiline regex (multi-group walks carry their own pytest)
        "frontier_schedule": (
            f"WITH fr AS ({_frontier_oracle_sql()}),"
            " dl AS (SELECT source || '.com' AS domain,"
            "  CAST(regexp_extract('User-agent: *' || chr(10) ||"
            "  'Crawl-delay: ' || CAST(length(source) % 5 + 1 AS VARCHAR)"
            "  || chr(10) || 'Disallow: /private' || chr(10),"
            "  '(?im)^crawl-delay:[ \t]*([0-9]+)$', 1) AS BIGINT)"
            "  AS crawl_delay_sec"
            "  FROM (SELECT DISTINCT source FROM documents))"
            " SELECT fr.domain, fr.url, fr.n_refs, fr.rank,"
            " coalesce(dl.crawl_delay_sec, 3) AS delay_sec,"
            " (fr.rank - 1) * coalesce(dl.crawl_delay_sec, 3)"
            "  AS fetch_offset_sec"
            " FROM fr LEFT JOIN dl ON dl.domain = fr.domain"
        ),
        # water-filling mixture allocation + selection
        # (ops/sampling.mixture_quotas / mixture_sample); selection
        # replays the naive global rank window the slack-prefiltered
        # core is provably equivalent to (sample_stratified idiom)
        "sample_mixture_quotas": (
            f"WITH {_mix_quota_cte()}"
            " SELECT lang, CAST(n_avail AS BIGINT) AS n_avail,"
            " CAST(share AS BIGINT) AS share, saturated, quota FROM q"
        ),
        "parse_sitemap": _sitemap_oracle_sql(),
        # both as-of shapes replay the SAME global-definition oracle
        "events_asof": _asof_oracle_sql(),
        "events_asof_bucketed": _asof_oracle_sql(),
        "events_rollup": _rollup_oracle_sql(),
        "events_actives": (
            "WITH dk AS (SELECT DISTINCT epoch_us(ts) // 86400000000"
            " AS d, user_id FROM events WHERE ts IS NOT NULL),"
            " dau AS (SELECT d AS day, count(*) AS dau FROM dk"
            "  GROUP BY 1),"
            " span AS (SELECT DISTINCT d + g.x AS day, user_id FROM dk"
            "  CROSS JOIN (SELECT unnest(range(0, 7)) AS x) g"
            "  WHERE d + g.x <= (SELECT max(d) FROM dk)),"
            " wau AS (SELECT day, count(*) AS wau FROM span GROUP BY 1)"
            " SELECT w.day, CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,"
            " w.wau FROM wau w LEFT JOIN dau ON dau.day = w.day"
        ),
        "outlink_census": _outlink_oracle_sql(),
        # stateless stream-static probe == the batch global definition
        "streaming_asof": _asof_oracle_sql(),
        "link_triangles": _triangles_oracle_sql(),
        "robots_sitemaps": _robots_sitemaps_oracle_sql(),
        # order-insensitive 60-bit modular digest manifest; column
        # render order matches docs.columns
        "corpus_checksums": (
            "WITH d AS (SELECT md5("
            + " || chr(31) || ".join(
                _render_value_sql(e)
                for e in (
                    "CAST(doc_id AS VARCHAR)",
                    "text",
                    "lang",
                    "source",
                    "CAST(n_chars AS VARCHAR)",
                )
            )
            + ") AS g"
            " FROM documents),"
            " v AS (SELECT ('0x' || substr(g, 1, 15))::BIGINT AS v,"
            "  ('0x' || substr(g, 17, 8))::BIGINT % 16 AS shard FROM d)"
            " SELECT CAST(shard AS BIGINT) AS shard,"
            " count(*) AS n_rows,"
            " CAST(sum(CAST(v AS HUGEINT)) % 1152921504606846976"
            "  AS BIGINT) AS checksum FROM v GROUP BY 1"
        ),
        "doc_features": (
            "WITH toks AS (SELECT doc_id,"
            " unnest(regexp_extract_all(text,"
            " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token"
            " FROM documents),"
            " b AS (SELECT doc_id,"
            "  ('0x' || substr(md5(token), 1, 15))::BIGINT % 4096"
            "  AS bucket FROM toks),"
            " pb AS (SELECT doc_id, bucket, count(*) AS c FROM b"
            "  GROUP BY 1, 2)"
            " SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,"
            " count(*) AS n_buckets_used,"
            " string_agg(CAST(bucket AS VARCHAR) || ':'"
            "  || CAST(c AS VARCHAR), ' ' ORDER BY bucket) AS features"
            " FROM pb GROUP BY 1"
        ),
        "link_reciprocity": (
            "WITH raw AS (SELECT 's' || CAST(doc_id % 10 AS VARCHAR) AS src,"
            " CASE WHEN doc_id % 3 = 0 THEN"
            "  's' || CAST((doc_id % 10 + 1) % 10 AS VARCHAR)"
            " WHEN doc_id % 3 = 1 THEN"
            "  's' || CAST((doc_id % 10 + 9) % 10 AS VARCHAR)"
            " ELSE 'r' || CAST(doc_id % 5 AS VARCHAR) END AS dst"
            " FROM documents),"
            " d AS (SELECT DISTINCT src AS a, b FROM (SELECT src, dst AS b"
            "  FROM raw WHERE src <> dst)),"
            " m AS (SELECT d.a, d.b FROM d"
            "  JOIN d r ON r.a = d.b AND r.b = d.a),"
            " no AS (SELECT a AS node, count(*) AS n_out FROM d GROUP BY 1),"
            " nm AS (SELECT a AS node, count(*) AS n_mutual FROM m GROUP BY 1)"
            " SELECT no.node, no.n_out,"
            " CAST(coalesce(nm.n_mutual, 0) AS BIGINT) AS n_mutual,"
            " CAST((1000000 * coalesce(nm.n_mutual, 0)) // no.n_out"
            "  AS BIGINT) AS reciprocity_ppm"
            " FROM no LEFT JOIN nm ON nm.node = no.node"
        ),
        "score_percentiles": (
            "WITH b AS (SELECT doc_id, lang, n_chars AS score"
            " FROM documents WHERE n_chars IS NOT NULL),"
            " r AS (SELECT doc_id, lang, score,"
            " CAST(rank() OVER (PARTITION BY lang ORDER BY score) - 1"
            "  AS BIGINT) AS n_below,"
            " count(*) OVER (PARTITION BY lang) AS n FROM b)"
            " SELECT doc_id, lang, score, n_below,"
            " CAST(CASE WHEN n > 1 THEN (1000000 * n_below) // (n - 1)"
            "  ELSE 0 END AS BIGINT) AS pct_ppm FROM r"
        ),
        "sample_mixture_budget": (
            f"WITH {_mix_quota_cte('CAST(sum(n_chars) AS BIGINT)', 120_000)}"
            " SELECT doc_id, lang FROM ("
            "SELECT d.doc_id, d.lang, q.quota,"
            " sum(d.n_chars) OVER (PARTITION BY d.lang ORDER BY"
            " substr(md5('mixb|' || CAST(d.doc_id AS VARCHAR)), 1, 8),"
            " d.doc_id ROWS UNBOUNDED PRECEDING) AS cum"
            " FROM documents d JOIN q ON q.lang = d.lang)"
            " WHERE cum <= quota"
        ),
        "sample_mixture": (
            f"WITH {_mix_quota_cte()}"
            " SELECT doc_id, lang FROM ("
            "SELECT d.doc_id, d.lang, q.quota, row_number() OVER ("
            " PARTITION BY d.lang ORDER BY"
            " substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8),"
            " d.doc_id) AS rn FROM documents d JOIN q ON q.lang = d.lang)"
            " WHERE rn <= quota"
        ),
    }
    # ann_recall composes the two already-verified ANN oracles: recall@5
    # of the LSH path against the exact top-5, per query
    sqls["ann_recall"] = (
        f"WITH exact AS ({sqls['ann_cosine_topk']}),"
        f" approx AS ({sqls['ann_lsh_topk']})"
        " SELECT q.query_id, CAST(coalesce(i.n_hit, 0) AS BIGINT) AS n_hit,"
        "  coalesce(i.n_hit, 0) / 5.0 AS recall"
        " FROM (SELECT DISTINCT query_id FROM exact) q"
        " LEFT JOIN (SELECT e.query_id, count(*) AS n_hit FROM exact e"
        "  JOIN approx a ON a.query_id = e.query_id"
        "   AND a.neighbor_id = e.neighbor_id GROUP BY 1) i"
        "  ON i.query_id = q.query_id"
    )
    return sqls
