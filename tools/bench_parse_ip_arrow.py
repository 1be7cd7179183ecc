"""VERDICT-r3 #9 experiment: does a pyarrow-compute ROW PRE-CLASSIFIER
beat parse_ip_batch's fused per-row tier gate?

The candidate variant vectorizes the tier-2 marker gates
(ascii-encodability, '#', '::'/':'-count) with pyarrow.compute over
the whole batch, then runs the SAME per-row kernels (_fast_row /
_walk_row) routed by the precomputed masks — so any delta is purely
the gating strategy, never the parse.  Adoption bar: >= 1.5x
(VERDICT r3 What's-wrong #3); results recorded in
tools/scaling_results.json either way.

Interleaved A/B pairs, median of per-pair ratios (the noise-robust
estimator on this neighbor-steal-prone host).
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_parse_ip import MIXES, N, build_corpus  # noqa: E402

from sagan_spark.functions.udfs import (  # noqa: E402
    _SCRUB_BYTES_TABLE,
    _V6_COLON6_RE_B,
    _V6_DCOLON_RE_B,
    _fast_row,
    _walk_row,
    parse_ip_batch,
)

DEFAULT_SAGAN_PORT = 514


def parse_ip_batch_arrow(texts: pd.Series, sagan_port: int = DEFAULT_SAGAN_PORT):
    """Candidate: pyarrow-compute pre-classification, same kernels."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    arr = pa.array(texts, type=pa.string(), from_pandas=True)
    # vectorized tier gates (cheap superset checks; exact byte-level
    # re-checks happen on the flagged rows only)
    nonascii = pc.fill_null(pc.invert(pc.string_is_ascii(arr)), True)
    hash_mark = pc.fill_null(pc.match_substring(arr, "#"), False)
    dcolon = pc.fill_null(pc.match_substring(arr, "::"), False)
    colons = pc.fill_null(
        pc.greater_equal(pc.count_substring(arr, ":"), 6), False
    )
    suspect = pc.or_(pc.or_(nonascii, hash_mark), pc.or_(dcolon, colons))
    suspect_np = suspect.to_numpy(zero_copy_only=False)

    texts_np = texts.to_numpy()
    ips_arr = np.empty(n, dtype=object)
    proto_arr = np.zeros(n, dtype=np.int32)
    table = _SCRUB_BYTES_TABLE
    dcolon_re = _V6_DCOLON_RE_B.search
    colon6_re = _V6_COLON6_RE_B.search
    memo: dict = {}
    memo_get = memo.get
    for i in range(n):
        raw = texts_np[i]
        if raw is None or raw != raw or not raw:
            ips_arr[i] = []
            continue
        cached = memo_get(raw)
        if cached is not None:
            ips_arr[i], proto_arr[i] = cached
            continue
        if suspect_np[i]:
            # flagged superset: re-run the exact gates byte-level
            try:
                b2 = raw.encode("ascii").translate(table)
            except UnicodeEncodeError:
                res = _walk_row(raw, sagan_port)
            else:
                if (
                    b"#" in b2
                    or (b"::" in b2 and dcolon_re(b2))
                    or (b2.count(b":") >= 6 and colon6_re(b2))
                ):
                    res = _walk_row(raw, sagan_port)
                else:
                    res = _fast_row(b2, sagan_port)
        else:
            res = _fast_row(raw.encode("ascii").translate(table), sagan_port)
        ips_arr[i], proto_arr[i] = res
        if len(memo) < 65536:
            memo[raw] = res
    return (
        pd.Series(ips_arr, index=texts.index),
        pd.Series(proto_arr, index=texts.index),
    )


def main() -> None:
    results: dict = {"n_rows": N, "pairs": 5, "adopt_bar": 1.5, "mixes": {}}
    for name, (slow_f, prose_f, dup_f) in MIXES.items():
        texts = pd.Series(build_corpus(N, slow_f, prose_f, dup_f), dtype=object)
        # parity first
        a_ips, a_pr = parse_ip_batch(texts)
        b_ips, b_pr = parse_ip_batch_arrow(texts)
        for i in range(len(texts)):
            assert list(a_ips.iloc[i]) == list(b_ips.iloc[i]), texts.iloc[i]
            assert int(a_pr.iloc[i]) == int(b_pr.iloc[i])

        def timed(fn) -> float:
            t0 = time.perf_counter()
            fn(texts)
            return time.perf_counter() - t0

        timed(parse_ip_batch)
        timed(parse_ip_batch_arrow)  # warm both
        cur, arw, ratios = [], [], []
        for _ in range(5):
            a = timed(parse_ip_batch)
            b = timed(parse_ip_batch_arrow)
            cur.append(round(a, 4))
            arw.append(round(b, 4))
            ratios.append(round(a / b, 3))
        results["mixes"][name] = {
            "current_sec": cur,
            "arrow_preclassify_sec": arw,
            "pair_ratio_current_over_arrow": ratios,
            "ratio_median": round(statistics.median(ratios), 3),
        }
        print(name, results["mixes"][name])

    meds = [m["ratio_median"] for m in results["mixes"].values()]
    results["verdict"] = (
        "ADOPT" if min(meds) >= 1.5 else
        "KEEP CURRENT: arrow pre-classifier below the 1.5x adoption bar"
    )
    p = Path(__file__).parent / "scaling_results.json"
    d = json.loads(p.read_text())
    d["parse_ip_arrow_preclassifier_r4"] = results
    p.write_text(json.dumps(d, indent=1))
    print("verdict:", results["verdict"])


if __name__ == "__main__":
    main()
