"""liblognorm ``.rulebase`` loader -> grok pattern specs.

The reference normalizes messages through liblognorm
(src/liblognormalize.c:105-260): a *rulebase* file of
``rule=[tags]:<literal text + %field:type% captures>`` lines.  Users
carry these files; this loader translates them to the grok pattern
strings :mod:`sagan_spark.functions.grok` already compiles and runs
vectorized — no hand-translation needed.

Supported surface (the classic v1/v2 colon syntax from the public
liblognorm documentation):

- ``version=``, ``#`` comments, blank lines
- ``prefix=<pattern>`` — prepended to every following rule
- ``rule=tag1,tag2:<pattern>`` (tags kept, exposed by the loader)
- ``%name:type%`` and ``%name:type:extra%`` captures; ``%%`` literal
- field name ``-`` discards the match (unnamed group)
- types: word, char-to (extra = stop char), char-sep, number, float,
  hexnumber, ipv4, ipv6, mac48, quoted-string, op-quoted-string,
  date-rfc3164, date-rfc5424, time-24hr, time-12hr, whitespace, rest

liblognorm consumes the WHOLE message (a rule fails if unparsed text
remains), so every translated pattern is anchored ``^...$``.  Field
names are sanitized for regex group syntax (``src-ip`` -> ``src_ip``),
matching how the reference copies them into its event record.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sagan_spark.functions.grok import grok_extract, grok_fields, make_grok_udf

#: liblognorm type -> grok pattern-library name (fixed-regex types)
_TYPE_TO_GROK = {
    "word": "NOTSPACE",
    "number": "INT",
    "float": "NUMBER",
    "ipv4": "IPV4",
    "ipv6": "IPV6",
    "rest": "GREEDYDATA",
    "alpha": "LNALPHA",
    "hexnumber": "LNHEX",
    "mac48": "MAC48",
    "quoted-string": "QUOTEDSTRING",
    "op-quoted-string": "OPQUOTEDSTRING",
    "date-rfc3164": "DATERFC3164",
    "date-rfc5424": "DATERFC5424",
    "time-24hr": "TIME24HR",
    "time-12hr": "TIME12HR",
    "whitespace": "LNSPACE",
}

#: library entries for the liblognorm-specific types (added on top of
#: grok.BASE_PATTERNS when compiling)
LOGNORM_PATTERNS = {
    "LNALPHA": r"[A-Za-z]+",
    "LNHEX": r"0x[0-9a-fA-F]+",
    "MAC48": r"(?:[0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}",
    "QUOTEDSTRING": r'"[^"]*"',
    "OPQUOTEDSTRING": r'(?:"[^"]*"|[^ ]+)',
    "DATERFC3164": (
        r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
        r"\s+\d{1,2}\s\d{2}:\d{2}:\d{2}"
    ),
    "DATERFC5424": (
        r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
        r"(?:Z|[+-]\d{2}:\d{2})?"
    ),
    "TIME24HR": r"(?:2[0-3]|[01]\d):[0-5]\d:[0-5]\d",
    "TIME12HR": r"(?:1[0-2]|0?\d):[0-5]\d:[0-5]\d\s?(?:AM|PM|am|pm)?",
    "LNSPACE": r"\s+",
}

def _sanitize(name: str) -> str:
    """Regex-group-safe field name (src-ip -> src_ip)."""
    out = re.sub(r"\W", "_", name)
    if not out or out[0].isdigit():
        out = "f_" + out
    return out


@dataclass
class Rulebase:
    """Loaded rulebase: grok patterns (file order — liblognorm's
    first-resolution order), the per-use pattern library, rule tags."""

    patterns: list[str] = field(default_factory=list)
    library: dict[str, str] = field(default_factory=lambda: dict(LOGNORM_PATTERNS))
    tags: list[list[str]] = field(default_factory=list)

    def fields(self) -> list[str]:
        return grok_fields(self.patterns, self.library)

    def udf(self):
        return make_grok_udf(self.patterns, self.library)

    def extract(self, df, text_col: str, prefix: str = "grok_"):
        return grok_extract(df, text_col, self.patterns, self.library, prefix)


def _translate_pattern(pattern: str, rb: Rulebase, where: str) -> str:
    """One rulebase pattern body -> a grok pattern string.  Literal
    text is regex-escaped; captures become %{NAME:field} tokens.
    Distinct field names that sanitize to the same group name ('src-ip'
    vs 'src_ip') are a loader error HERE, with the line number — not a
    cryptic re.error deep inside the grok compile."""
    out: list[str] = []
    sanitized: dict[str, str] = {}
    pos = 0
    while True:
        start = pattern.find("%", pos)
        if start < 0:
            out.append(re.escape(pattern[pos:]))
            break
        out.append(re.escape(pattern[pos:start]))
        end = pattern.find("%", start + 1)
        if end < 0:
            raise ValueError(f"{where}: unterminated %% capture: {pattern!r}")
        inner = pattern[start + 1 : end]
        pos = end + 1
        if inner == "":  # '%%' -> literal percent
            out.append(re.escape("%"))
            continue
        parts = inner.split(":", 2)
        if len(parts) < 2:
            raise ValueError(f"{where}: capture needs name:type, got %{inner}%")
        name, typ = parts[0], parts[1]
        extra = parts[2] if len(parts) > 2 else None
        if typ in ("char-to", "char-sep"):
            if not extra:
                raise ValueError(f"{where}: {typ} needs a stop char")
            key = f"CHARTO{ord(extra[0])}"
            rb.library[key] = f"[^{re.escape(extra[0])}]*"
            grok_name = key
        else:
            grok_name = _TYPE_TO_GROK.get(typ)
            if grok_name is None:
                raise ValueError(f"{where}: unsupported liblognorm type {typ!r}")
        if name == "-":  # discard capture
            out.append("%{" + grok_name + "}")
        else:
            clean = _sanitize(name)
            prev = sanitized.get(clean)
            if prev is not None:
                # regex group names must be unique within one pattern —
                # covers both a literal repeat and a sanitize collision
                raise ValueError(
                    f"{where}: fields {prev!r} and {name!r} both need "
                    f"group {clean!r} — a rule can bind each field once"
                )
            sanitized[clean] = name
            out.append("%{" + grok_name + ":" + clean + "}")
    return "".join(out)


def load_rulebase(text: str) -> Rulebase:
    """Parse a liblognorm ``.rulebase`` file body."""
    rb = Rulebase()
    prefix = ""
    for lineno, raw in enumerate(text.splitlines(), 1):
        # only newlines trimmed: a TRAILING SPACE in prefix=/rule= is a
        # significant literal (liblognorm matches it against the message)
        line = raw.rstrip("\r\n")
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        where = f"rulebase line {lineno}"
        if line.startswith("version="):
            continue
        if line.startswith("prefix="):
            prefix = _translate_pattern(line[len("prefix=") :], rb, where)
            continue
        if not line.startswith("rule="):
            raise ValueError(f"{where}: unrecognized directive {line[:40]!r}")
        body = line[len("rule=") :]
        tags_str, sep, pattern = body.partition(":")
        if not sep:
            raise ValueError(f"{where}: rule needs 'rule=tags:pattern'")
        rb.tags.append([t for t in tags_str.split(",") if t])
        # anchored: liblognorm rules consume the whole message
        rb.patterns.append("^" + prefix + _translate_pattern(pattern, rb, where) + "$")
    return rb
