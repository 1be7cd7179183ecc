"""Pure-Python reference oracle (SURVEY §5.1).

A direct per-event transliteration of the reference engine's semantics
(reference src/processors/engine.c:92-1558) — slow but obviously
correct.  Events are replayed in canonical order (ts, event_key); the
Spark engine under test must produce the identical routed alert set.

Matching logic here is written independently from the Spark compiler
(sagan_spark.rules.compiler builds Catalyst Columns; this walks Python
strings), so a bug must be made twice to slip through.  The extraction
primitives (parse_ip / parse_hash / json_flatten) are shared with the
engine on purpose: they ARE the per-event semantic spec and are pinned
separately by unit tests against the reference's documented token zoo.
"""

from __future__ import annotations

import ipaddress
import re
from dataclasses import dataclass, field
from fnmatch import fnmatchcase

from sagan_spark.functions.extract import (
    json_flatten,
    parse_hash,
    parse_ip,
)
from sagan_spark.rules.ir import ContentSpec, MetaContentSpec, RuleIR


def _slice(msg: str, offset: int, depth: int, distance: int, within: int,
           prev_depth: int) -> str:
    """reference src/content.c:57-117 arithmetic."""
    if distance != 0:
        start = prev_depth + distance + 1
        s = msg[start:] if start < len(msg) else ""
        if within != 0:
            s = s[:within]
        return s
    if offset != 0:
        s = msg[offset:] if len(msg) > offset else ""
    else:
        s = msg
    if depth != 0:
        s = s[: depth + 1]
    return s


def _content_ok(msg: str, specs: list[ContentSpec]) -> bool:
    for z, c in enumerate(specs):
        prev_depth = specs[z - 1].depth if z > 0 else 0
        s = _slice(msg, c.offset, c.depth, c.distance, c.within, prev_depth)
        hay = s.lower() if c.nocase else s
        hit = c.literal in hay
        if c.negated:
            hit = not hit
        if not hit:
            return False
    return True


def _meta_ok(msg: str, specs: list[MetaContentSpec]) -> bool:
    for z, m in enumerate(specs):
        prev_depth = specs[z - 1].depth if z > 0 else 0
        s = _slice(msg, m.offset, m.depth, m.distance, m.within, prev_depth)
        hay = s.lower() if m.nocase else s
        any_hit = any(lit in hay for lit in m.literals)
        ok = (not any_hit) if m.negated else any_hit
        if not ok:
            return False
    return True


def _pcre_ok(msg: str, rule: RuleIR) -> bool:
    for p in rule.pcres:
        fl = 0
        for ch in p.flags:
            fl |= {"i": re.I, "s": re.S, "m": re.M, "x": re.X}.get(ch, 0)
        if re.search(p.pattern, msg, fl) is None:
            return False
    return True


def _ip_int(ip: str) -> int | None:
    try:
        a = ipaddress.ip_address(ip)
    except ValueError:
        return None
    if a.version == 4:
        return 0xFFFF00000000 + int(a)
    return int(a)


def _cidr_ok(ip: str | None, groups) -> bool:
    if not groups:
        return True
    v = _ip_int(ip) if ip else None
    if v is None:
        return False
    positives = [g for g in groups if not g.negated]
    if positives and not any(g.lo <= v <= g.hi for g in positives):
        return False
    return all(not (g.lo <= v <= g.hi) for g in groups if g.negated)


def _port_ok(port: int, groups) -> bool:
    if not groups:
        return True
    positives = [g for g in groups if not g.negated]
    if positives and not any(g.lo <= port <= g.hi for g in positives):
        return False
    return all(not (g.lo <= port <= g.hi) for g in groups if g.negated)


@dataclass
class OracleCounters:
    events_received: int = 0
    saganfound: int = 0
    suppressed_after: int = 0
    suppressed_threshold: int = 0
    alerts: int = 0
    per_sid: dict = field(default_factory=dict)


class Oracle:
    def __init__(self, rules: list[RuleIR], sagan_port: int = 514):
        self.rules = rules
        self.sagan_port = sagan_port
        self.after_state: dict = {}  # (sid, key) -> [count, utime]
        self.thr_state: dict = {}
        self.xbit_state: dict = {}  # (name, key) -> (set_ts_float, expire) | None

    # -- per-rule evaluation ------------------------------------------------

    def _eval_rule(self, r: RuleIR, ev: dict, jmap: dict, cache) -> dict | None:
        """Return extracted-field dict if the rule matches (pre-correlation,
        pre-xbit-condition), else None.  Order mirrors engine.c:492-921."""
        msg = ev["message"]
        if not msg:
            return None  # F13

        # json_map message override + append_program (P8, P9)
        for jm in r.json_maps:
            if jm.field == "message" and jm.key in jmap:
                msg = jmap[jm.key]
        if r.append_program and ev["program"]:
            msg = f"{msg} | {ev['program']}"

        if r.programs and not any(fnmatchcase(ev["program"], g) for g in r.programs):
            return None  # F1
        if r.facilities and ev["facility"] not in r.facilities:
            return None  # F2
        if r.levels and ev["level"] not in r.levels:
            return None
        if r.tags and ev["tag"] not in r.tags:
            return None
        if r.contents and not _content_ok(msg, r.contents):
            return None  # F3
        if r.meta_contents and not _meta_ok(msg, r.meta_contents):
            return None  # F5
        if r.pcres and not _pcre_ok(msg, r):
            return None  # F4

        for jc in r.json_contents:  # F6
            if jc.key not in jmap:
                return None
            v = jmap[jc.key]
            hay = v.lower() if jc.nocase else v
            hit = (jc.value in hay) if jc.strstr else (hay == jc.value)
            if jc.negated:
                hit = not hit
            if not hit:
                return None
        for jp in r.json_pcres:  # F7
            if jp.key not in jmap:
                return None
            fl = 0
            for ch in jp.flags:
                fl |= {"i": re.I, "s": re.S, "m": re.M, "x": re.X}.get(ch, 0)
            if re.search(jp.pattern, jmap[jp.key], fl) is None:
                return None

        decoded_eid = ""
        for jm in r.json_maps:
            if jm.field == "event_id" and jm.key in jmap:
                decoded_eid = jmap[jm.key]
        event_id = decoded_eid
        if r.event_ids:  # F9 (reference src/event-id.c:61-126)
            if decoded_eid:
                if decoded_eid not in r.event_ids:
                    return None
            else:
                head = msg[:9]
                hit = None
                for i in r.event_ids:
                    if f" {i}: " in head:
                        hit = i
                        break
                if hit is None:
                    return None
                event_id = hit

        if r.alert_time is not None:  # F11 (reference src/aetas.c:48-143)
            ts = ev["ts"]
            tm_wday = (ts.weekday() + 1) % 7  # Sunday=0
            hhmm = ts.hour * 100 + ts.minute
            if tm_wday not in r.alert_time.days:
                return None
            s, e = r.alert_time.start, r.alert_time.end
            ok = (s <= hhmm <= e) if s <= e else (hhmm >= s or hhmm <= e)
            if not ok:
                return None

        # --- extraction (engine.c:788-921) ---
        if cache["ips"] is None and r.needs_parse_ip:
            cache["ips"], cache["proto"] = parse_ip(ev["message"], self.sagan_port)
        ips, tok_proto = cache["ips"] or [], cache["proto"] or 0

        def jm_val(fld):
            for jm in r.json_maps:
                if jm.field == fld and jm.key in jmap:
                    return jmap[jm.key]
            return None

        src_ip = jm_val("src_ip")
        src_port = None
        if src_ip is None and r.parse_src_ip_pos > 0 and len(ips) >= r.parse_src_ip_pos:
            h = ips[r.parse_src_ip_pos - 1]
            src_ip, src_port = h.ip, h.port
        dst_ip = jm_val("dst_ip")
        dst_port = None
        if dst_ip is None and r.parse_dst_ip_pos > 0 and len(ips) >= r.parse_dst_ip_pos:
            h = ips[r.parse_dst_ip_pos - 1]
            dst_ip, dst_port = h.ip, h.port

        def lh_fix(ip):
            if not ip or ip.startswith("127.") or ip == "::1":
                return ev["host"]
            return ip

        jm_sp, jm_dp = jm_val("src_port"), jm_val("dst_port")
        final_sport = (
            int(jm_sp)
            if jm_sp is not None
            else (r.default_src_port or (src_port if src_port is not None else self.sagan_port))
        )
        final_dport = (
            int(jm_dp)
            if jm_dp is not None
            else (r.default_dst_port or (dst_port if dst_port is not None else self.sagan_port))
        )
        proto = r.default_proto or (tok_proto if r.needs_parse_ip else 0)

        ext = {
            "src_ip": lh_fix(src_ip),
            "dst_ip": lh_fix(dst_ip),
            "src_port": final_sport,
            "dst_port": final_dport,
            "proto": proto,
            "username": jm_val("username") or "",
            "event_id": event_id or "",
            "md5": parse_hash(ev["message"], "md5") if r.parse_hash == "md5" else (jm_val("md5") or ""),
            "sha1": parse_hash(ev["message"], "sha1") if r.parse_hash == "sha1" else "",
            "sha256": parse_hash(ev["message"], "sha256") if r.parse_hash == "sha256" else "",
            "_src_raw": src_ip,  # pre-localhost-fix, for flow check
            "_dst_raw": dst_ip,
        }

        # F10 flow (reference src/flow.c:48-504)
        f = r.flow
        if f.src_nets and not _cidr_ok(ext["_src_raw"], f.src_nets):
            return None
        if f.dst_nets and not _cidr_ok(ext["_dst_raw"], f.dst_nets):
            return None
        if f.src_ports and not _port_ok(ext["src_port"], f.src_ports):
            return None
        if f.dst_ports and not _port_ok(ext["dst_port"], f.dst_ports):
            return None
        if f.proto and ext["proto"] != f.proto:
            return None
        return ext

    # -- correlation state machines ------------------------------------------

    @staticmethod
    def _track_key(track, ext) -> str:
        src = ext["src_ip"] if "by_src" in track else ""
        dst = ext["dst_ip"] if "by_dst" in track else ""
        user = ext["username"] if "by_username" in track else ""
        sp = ext["src_port"] if "by_srcport" in track else 0
        dp = ext["dst_port"] if "by_dstport" in track else 0
        return f"{src}|{sp}|{dst}|{dp}|{user}"

    def _after(self, r: RuleIR, ext, t: int) -> bool:
        """True => suppressed (reference src/after.c:51-229)."""
        key = (r.sid, self._track_key(r.after.track, ext))
        st = self.after_state.get(key)
        if st is None:
            self.after_state[key] = [1, t]
            return True
        st[0] += 1
        old = t - st[1]
        flag = True
        if old > r.after.seconds:
            st[0], st[1] = 1, t
            flag = True
        if r.after.count < st[0]:
            st[1] = t
            flag = False
        return flag

    def _threshold(self, r: RuleIR, ext, t: int) -> bool:
        """True => suppressed (reference src/threshold.c:54-234)."""
        key = (r.sid, self._track_key(r.threshold.track, ext))
        st = self.thr_state.get(key)
        if st is None:
            self.thr_state[key] = [1, t]
            return False
        st[0] += 1
        old = t - st[1]
        if r.threshold.ttype == "suppress":
            st[1] = t
        if old > r.threshold.seconds:
            st[0], st[1] = 1, t
        return r.threshold.count < st[0]

    def _xbit_key(self, track: str, ext) -> str:
        if track == "ip_src":
            return ext["src_ip"]
        if track == "ip_dst":
            return ext["dst_ip"]
        return f"{ext['src_ip']}:{ext['dst_ip']}"

    def _xbit_condition(self, r: RuleIR, ext, t: float) -> bool:
        """isset/isnotset during routing (reference src/xbit-mmap.c:181-264)."""
        for x in r.xbits:
            if x.action not in ("isset", "isnotset"):
                continue
            st = self.xbit_state.get((x.name, self._xbit_key(x.track, ext)))
            active = st is not None and (st[1] == 0 or (t - st[0]) < st[1])
            if x.action == "isset" and not active:
                return False
            if x.action == "isnotset" and active:
                return False
        return True

    def _xbit_set(self, r: RuleIR, ext, t: float) -> None:
        """set/unset after surviving correlation (engine.c:1415-1427)."""
        for x in r.xbits:
            key = (x.name, self._xbit_key(x.track, ext))
            if x.action == "set":
                self.xbit_state[key] = (t, x.expire)
            elif x.action == "unset":
                self.xbit_state.pop(key, None)

    # -- main loop --------------------------------------------------------------

    def run(self, events: list[dict]) -> tuple[list[dict], OracleCounters]:
        """events: dicts with event_key, ts (datetime), host, program,
        facility, level, tag, message.  Replayed in (ts, event_key) order."""
        counters = OracleCounters()
        alerts: list[dict] = []
        for ev in sorted(events, key=lambda e: (e["ts"], e["event_key"])):
            counters.events_received += 1
            msg = ev["message"]
            jmap = json_flatten(msg) if msg else {}
            cache = {"ips": None, "proto": None}
            t_int = int(ev["ts"].timestamp())
            t_f = ev["ts"].timestamp()

            for r in self.rules:
                ext = self._eval_rule(r, ev, jmap, cache)
                if ext is None:
                    continue
                if not self._xbit_condition(r, ext, t_f):
                    continue
                counters.saganfound += 1

                sup_after = self._after(r, ext, t_int) if r.after else False
                sup_thr = (
                    self._threshold(r, ext, t_int)
                    if (r.threshold and not sup_after)
                    else False
                )
                if sup_after:
                    counters.suppressed_after += 1
                    continue
                if sup_thr:
                    counters.suppressed_threshold += 1
                    continue

                self._xbit_set(r, ext, t_f)

                if r.action != "pass":
                    alerts.append(
                        {
                            "url": ev["event_key"],
                            "ts": ev["ts"],
                            "sid": r.sid,
                            "rev": r.rev,
                            "src_ip": ext["src_ip"],
                            "src_port": ext["src_port"],
                            "dst_ip": ext["dst_ip"],
                            "dst_port": ext["dst_port"],
                            "proto": ext["proto"],
                            "username": ext["username"],
                            "event_id": ext["event_id"],
                            "md5": ext["md5"],
                        }
                    )
                    counters.alerts += 1
                    counters.per_sid[r.sid] = counters.per_sid.get(r.sid, 0) + 1
                if r.action == "pass":
                    break  # F15 (engine.c:1448-1453)
        return alerts, counters
