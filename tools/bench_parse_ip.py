"""Parse_IP microbench: scalar token walk (extract.parse_ip, the
semantic spec) vs the two-tier vectorized batch path
(udfs.parse_ip_batch) over a synthetic web/syslog message mix.

Writes interleaved-A/B timings (median of per-pair ratios, the
noise-robust estimator on this neighbor-steal-prone host) into
tools/scaling_results.json under "parse_ip_microbench", for two
disclosed mixes (see MIXES).
"""

from __future__ import annotations

import json
import random
import statistics
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sagan_spark.functions.extract import int_to_biased_hilo, parse_ip
from sagan_spark.functions.udfs import parse_ip_batch

N = 40_000
#: two disclosed mixes, (tier2_fraction, prose_fraction):
#: 'weblike' — Common-Crawl-style candidate stream: rule-matched page
#:   TEXT fragments are dominantly IP-free prose, and BIND '#' forms /
#:   raw IPv6 literals are rare in web text;
#: 'loglike' — IP-dense infra syslog with a heavier v6/'#' share.
#: Tier-2 rows cost the same in both paths by design, so the tier-2
#: fraction bounds the attainable speedup.
#: third element: exact-duplicate row share.  Common-Crawl exact-dup
#: density runs ~30% (the motivation for ops/dedup.py); syslog streams
#: repeat cron/systemd/heartbeat lines heavily.  Duplicates exercise
#: the batch memo (parse is deterministic per message).
MIXES = {"weblike": (0.02, 0.50, 0.30), "loglike": (0.08, 0.20, 0.20)}


def build_corpus(n: int, slow_fraction: float = 0.08,
                 prose_fraction: float = 0.20,
                 dup_fraction: float = 0.0) -> list[str]:
    """Realistic-length line mix (~120-260 chars, the shape of actual
    sshd/nginx/audit/json lines and web-page text fragments the engine's
    candidate filter feeds Parse_IP)."""
    rng = random.Random(7)
    fast = [
        # sshd-ish
        "Jan {d} 03:1{c}:07 web-{b:03d}.prod.example.net sshd[{b}{c}]: "
        "Accepted publickey for deploy from {a}.{b}.{c}.{d} ssh2: "
        "RSA SHA256:kXod7qZpWrFyBqYt3h{b:02x}UvNdA8PmQcLs9RgJwEe0TiY",
        # nginx access-ish
        '{a}.{b}.{c}.{d} - frontend [01/Jan/2026:03:1{c}:07 +0000] '
        '"GET /assets/app.v{b}.{c}.js HTTP/1.1" 200 {b}{c}{d} '
        '"https://www.example.com/p/{d}" "Mozilla/5.0 (X11; Linux x86_64) '
        'AppleWebKit/537.36 (KHTML, like Gecko) Chrome/126.0 Safari/537.36"',
        # firewall/conn-ish with v4:port
        "kernel: conn established proto=tcp src={a}.{b}.{c}.{d}:3{b}{c} "
        "dst=10.{c}.{d}.{b}:443 mark=0x{b:02x}{c:02x} state=ESTABLISHED "
        "bytes_in={b}{c}{d} bytes_out={d}{c}{b} policy=allow zone=dmz",
        # app log, no IP at all
        "level=info msg=\"cache refresh complete\" service=catalog "
        "shard={b} items={b}{c}{d} took={c}{d}ms next_refresh=300s "
        "trace_id=4bf92f3577b34da6a3ce929d0e0e47{b:02x} span=ingest",
        # web page text fragment, no IP
        "Copyright 2026 Example Media Group. All rights reserved. "
        "Reproduction in whole or in part without permission is "
        "prohibited. Terms of service apply. Contact: press office, "
        "Market Street {b}{c}, San Francisco, CA 941{d:02d}, USA.",
        # audit-ish
        "audit[{b}{c}{d}]: op=login acct=\"svc-backup\" exe=\"/usr/sbin/crond\" "
        "hostname=batch-{c:02d} addr={a}.{b}.{c}.{d} terminal=cron res=success "
        "UID=root AUID=unset ses={d} subj=system_u:system_r:crond_t:s0-s0:c0",
    ]
    slow = [
        # port lookahead is tier-1 now; these exercise the REAL tier-2
        # markers: '#' forms and v6 tokens
        "named[{b}{c}]: client @0x7f{b:02x}c{c:02x}0 10.{b}.{c}.{d}#53{d} "
        "({c}.in-addr.arpa): query (cache) '{c}.{d}.10.in-addr.arpa/PTR/IN' "
        "denied after policy lookup in view internal zone arpa",
        "sshd[{b}{c}]: Connection closed by authenticating user git "
        "fe80::b614:89ff:fe11:5e{b:02x} port 5{c}{d} [preauth] on listener "
        "::ffff:10.1.2.{d} via proxy protocol v2 header inspection",
    ]
    out = []
    hot_pool: list[str] = []
    for _ in range(n):
        if hot_pool and rng.random() < dup_fraction:
            out.append(rng.choice(hot_pool))
            continue
        r = rng.random()
        if r < slow_fraction:
            tmpl = rng.choice(slow)
        elif r < slow_fraction + prose_fraction:
            tmpl = rng.choice(fast[3:5])   # the IP-free app-log/prose pair
        else:
            tmpl = rng.choice(fast)
        msg = tmpl.format(
            a=rng.randint(1, 223), b=rng.randint(0, 255),
            c=rng.randint(0, 255), d=rng.randint(1, 254),
        )
        out.append(msg)
        if len(hot_pool) < 200:
            hot_pool.append(msg)
    return out


def run_scalar(texts: pd.Series):
    ips_out, proto_out = [], []
    for msg in texts:
        hits, proto = parse_ip(msg if msg is not None else "")
        row = []
        for h in hits:
            hi, lo = int_to_biased_hilo(h.ip_int)
            row.append({"ip": h.ip, "port": h.port, "hi": hi, "lo": lo})
        ips_out.append(row)
        proto_out.append(proto)
    return ips_out, proto_out


def bench_mix(name: str, slow_fraction: float, prose_fraction: float,
              dup_fraction: float) -> dict:
    texts = pd.Series(
        build_corpus(N, slow_fraction, prose_fraction, dup_fraction),
        dtype=object,
    )

    # parity first: the bench is meaningless if the paths diverge
    got_ips, got_proto = parse_ip_batch(texts)
    want_ips, want_proto = run_scalar(texts)
    n_hits = 0
    for i in range(len(texts)):
        assert list(got_ips.iloc[i]) == want_ips[i], texts.iloc[i]
        assert int(got_proto.iloc[i]) == want_proto[i], texts.iloc[i]
        n_hits += len(want_ips[i])

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # interleaved A/B x11 on a smaller corpus (pairs complete inside
    # one noise window); the headline is the MEDIAN OF PER-PAIR RATIOS
    # (each adjacent scalar/batch pair shares its noise window, so a
    # neighbor-steal burst cancels out of the ratio — this host swings
    # 2-3x on identical code, see BASELINE.md)
    scalar_runs, batch_runs, ratios = [], [], []
    for _ in range(11):
        s_i = timed(lambda: run_scalar(texts))
        b_i = timed(lambda: parse_ip_batch(texts))
        scalar_runs.append(s_i)
        batch_runs.append(b_i)
        ratios.append(s_i / b_i)

    return {
        "rows": N,
        "ip_hits": n_hits,
        "slow_row_fraction": slow_fraction,
        "prose_row_fraction_min": prose_fraction,
        "dup_row_fraction": dup_fraction,
        "scalar_sec_median": round(statistics.median(scalar_runs), 3),
        "batch_sec_median": round(statistics.median(batch_runs), 3),
        "scalar_runs": [round(x, 3) for x in scalar_runs],
        "batch_runs": [round(x, 3) for x in batch_runs],
        "pair_ratios": [round(x, 2) for x in ratios],
        "speedup": round(statistics.median(ratios), 2),
        "speedup_min_max": [round(min(ratios), 2), round(max(ratios), 2)],
        "parity": "batch == scalar on all rows (asserted in this run)",
    }


def main() -> None:
    entry: dict = {
        "note": (
            "scalar = the round-2 UDF body (per-row extract.parse_ip, the "
            "semantic spec); batch = the two-tier udfs.parse_ip_batch. "
            "Interleaved A/B; speedup = median of per-pair ratios. "
            "Tier-2 marker rows ('#' forms, v6-shaped tokens) cost the "
            "same in both paths by design, so the tier-2 fraction bounds "
            "the attainable speedup."
        ),
    }
    for name, (slow_frac, prose_frac, dup_frac) in MIXES.items():
        entry[name] = bench_mix(name, slow_frac, prose_frac, dup_frac)
        print(name, json.dumps(entry[name], indent=1))
    entry["speedup"] = entry["weblike"]["speedup"]

    path = Path(__file__).with_name("scaling_results.json")
    data = json.loads(path.read_text())
    data["parse_ip_microbench"] = entry
    path.write_text(json.dumps(data, indent=1) + "\n")


if __name__ == "__main__":
    main()
