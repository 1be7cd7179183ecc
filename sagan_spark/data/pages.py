"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Generates the Common-Crawl-style input table from BASELINE.json's
input_hint — (url string, warc_ts timestamp, html binary, text string,
lang string) — with log-like `text` templates covering the reference's
Parse_IP token zoo (reference src/parsers/ip.c:33-61) and matcher edge
cases.  Seeded (42), pure numpy/stdlib; no external data.

Host draw is Zipf(1.2)-skewed so hot-host key skew is exercised
(the north_rule's skew requirement).
"""

from __future__ import annotations

import base64
import hashlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_HOSTS = 1000
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

LANGS = ["en", "de", "fr", "es"]


def _lang(rng: np.random.RandomState) -> str:
    r = rng.rand()
    if r < 0.90:
        return "en"
    return LANGS[1 + int(rng.rand() * 3) % 3]


def generate_pages(n_rows: int = 20_000, seed: int = 42) -> pa.Table:
    """Build the pages table with ~n_rows rows (bursts expand slightly)."""
    rng = np.random.RandomState(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []

    ts = BASE_TS
    uid = 0

    def emit(text: str, lang: str, ts_override: datetime | None = None) -> None:
        nonlocal uid
        host = int(rng.zipf(1.2)) % N_HOSTS
        url = f"https://host{host}.example/p/{uid}"
        uid += 1
        t = ts_override or ts
        b64 = b""
        if rng.rand() < 0.05:
            b64 = b" <!--" + base64.b64encode(text.encode()) + b"-->"
        html = b"<html><body>" + text.encode() + b"</body></html>" + b64
        urls.append(url)
        tss.append(t)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)

    i = 0
    while uid < n_rows:
        ts = ts + timedelta(seconds=int([1, 2, 5][i % 3]))
        i += 1
        t = rng.randint(0, 100)
        a, b, c = rng.randint(0, 256), rng.randint(0, 256), rng.randint(1, 255)
        p = int(rng.randint(1, 65000))
        u = rng.randint(0, 100)

        if t < 18:  # template 1: Failed password + parse_src_ip + port word
            emit(f"Failed password for admin from 10.{a}.{b}.{c} port {p} ssh2", _lang(rng))
        elif t < 28:  # template 2: IPv6 [v6]:port form
            x = rng.randint(0, 65536)
            emit(
                f"Accepted publickey for root from [fe80::b614:89ff:fe11:{x:04x}]:{p}",
                _lang(rng),
            )
        elif t < 40:  # template 3: ip:port, ip#port, literal proto token
            d = rng.randint(1, 255)
            q = int(rng.randint(1, 65000))
            emit(
                f"connection from 192.168.{a}.{b}:{p} to 172.16.{c}.{d}#{q} proto tcp",
                _lang(rng),
            )
        elif t < 48:  # template 4: md5 for parse_hash
            md5 = hashlib.md5(f"mal{a}.{b}".encode()).hexdigest()
            emit(f"Malware hash {md5} seen in /tmp/drop{u}.exe", _lang(rng))
        elif t < 56:  # template 5: windows event-id framing
            emit(f" 4625: An account failed to log on DOMAIN\\user{u}", _lang(rng))
        elif t < 66:  # template 6: embedded JSON
            sev = "high" if rng.rand() < 0.3 else "low"
            emit(
                '{"event": {"severity": "%s", "src_ip": "10.%d.%d.%d", "user": "u%d"}} '
                % (sev, a, b, c, u),
                _lang(rng),
            )
        elif t < 90:  # template 7: filler prose (negative control)
            emit(f"user u{u} viewed page {a} and logged out cleanly", _lang(rng))
        else:  # template 8: burst of template 1 (drives threshold/after)
            k = int([3, 6, 12][rng.randint(0, 3)])
            lang = _lang(rng)
            for j in range(k):
                emit(
                    f"Failed password for admin from 10.{a}.{b}.{c} port {p + j} ssh2",
                    lang,
                    ts_override=ts + timedelta(seconds=10 * j),
                )
            if rng.rand() < 0.5:  # correlated success -> xbit isset pair
                emit(
                    f"Accepted password for root from 10.{a}.{b}.{c} port {p} ssh2",
                    lang,
                    ts_override=ts + timedelta(seconds=10 * k + 5),
                )

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages(path: str, n_rows: int = 20_000, seed: int = 42) -> str:
    table = generate_pages(n_rows, seed)
    # small row groups => the single file scans as many parallel splits
    # (a real Iceberg table gives the same via its file/row-group layout)
    pq.write_table(table, path, row_group_size=max(8192, n_rows // 64))
    return path
