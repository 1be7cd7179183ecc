"""One-shot refactoring script: split __spark_entry__.py into
sagan_spark/contracts/* (VERDICT r4 task #5).  Verbatim line moves;
cross-module imports computed from the AST.  Idempotence not needed —
run once, verify byte-identical oracle strings + full gate, commit."""

from __future__ import annotations

import ast
from pathlib import Path

REPO = Path("/root/repo")
SRC = REPO / "__spark_entry__.py"
PKG = REPO / "sagan_spark" / "contracts"

text = SRC.read_text()
lines = text.splitlines(keepends=True)
tree = ast.parse(text)


def def_line(name: str) -> int:
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name == name:
            return node.lineno
    raise KeyError(name)


# segment boundaries (1-based, [start, end) in line numbers)
b_entry = def_line("entry")
b_qe = def_line("q_s5_pipe_decode")
b_qc = def_line("q_dedup_exact")
b_qw = def_line("_anchor_pages")
b_reg = def_line("queries")
b_ob = def_line("_html_extract_sql")
b_osql = def_line("oracle_sql")
n = len(lines)

SEGS = {
    "queries_engine": (b_qe, b_qc),
    "queries_corpus": (b_qc, b_qw),
    "queries_web": (b_qw, b_reg),
    "registry": (b_reg, b_ob),
    "oracle_builders": (b_ob, b_osql),
    "oracles": (b_osql, n + 1),
}

# names defined at top level in each segment
COMMON_NAMES = {"_ship_package", "_ev", "_docs", "_emb", "_events_frame",
                "_REPO"}
seg_of: dict[str, str] = {name: "common" for name in COMMON_NAMES}
for node in tree.body:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        for seg, (s, e) in SEGS.items():
            if s <= node.lineno < e:
                seg_of[node.name] = seg
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                for seg, (s, e) in SEGS.items():
                    if s <= node.lineno < e:
                        seg_of[t.id] = seg

ORDER = ["common", "queries_engine", "queries_corpus", "queries_web",
         "oracle_builders", "registry", "oracles"]


def needed_imports(seg: str) -> dict[str, list[str]]:
    s, e = SEGS[seg]
    sub = ast.parse("".join(lines[s - 1:e - 1]))
    loads = {nd.id for nd in ast.walk(sub) if isinstance(nd, ast.Name)}
    out: dict[str, list[str]] = {}
    for name in sorted(loads):
        src_seg = seg_of.get(name)
        if src_seg and src_seg != seg:
            out.setdefault(src_seg, []).append(name)
    return out


HEADER = (
    "from __future__ import annotations\n\n"
    "from collections.abc import Callable  # noqa: F401\n"
    "from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401\n"
    "from pyspark.sql import functions as F  # noqa: F401\n"
)

DOCS = {
    "queries_engine": "Engine-family contract queries (SURVEY §2 S/K/P/F/J/A gates).",
    "queries_corpus": "Corpus-curation contract queries (dedup / text / ANN / sampling families).",
    "queries_web": "Web-graph, crawl, events and streaming contract queries.",
    "registry": "queries(): the driver-facing name -> builder registry.",
    "oracle_builders": "Shared DuckDB oracle SQL builders.",
    "oracles": "oracle_sql(): the driver-facing name -> DuckDB SQL registry.",
}

PKG.mkdir(exist_ok=True)
for seg in ORDER:
    if seg == "common":
        continue
    s, e = SEGS[seg]
    imports = needed_imports(seg)
    imp_lines = []
    for src_seg in ORDER:
        if src_seg in imports:
            names = ", ".join(imports[src_seg])
            line = f"from sagan_spark.contracts.{src_seg} import {names}  # noqa: E501\n"
            imp_lines.append(line)
    body = "".join(lines[s - 1:e - 1]).lstrip("\n")
    mod = (
        f'"""{DOCS[seg]}\n\nSplit out of __spark_entry__.py (r5); see its '
        'docstring for the\ncontract rules.  Verbatim builder bodies — '
        'one gate per operator,\ncolumn aliases matched pairwise with the '
        'oracle.\n"""\n\n'
        + HEADER + "\n"
        + "".join(imp_lines)
        + ("\n" if imp_lines else "")
        + body
    )
    (PKG / f"{seg}.py").write_text(mod)
    print(seg, (e - s), "lines", "imports:", {k: len(v) for k, v in imports.items()})

# entry() imports
entry_imports = {}
sub = ast.parse("".join(lines[b_entry - 1:b_qe - 1]))
for nd in ast.walk(sub):
    if isinstance(nd, ast.Name) and seg_of.get(nd.id) not in (None,):
        entry_imports.setdefault(seg_of[nd.id], set()).add(nd.id)
print("entry needs:", entry_imports)
