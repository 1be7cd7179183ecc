"""Ad-hoc fuzz harness: resolve_url vs urldefrag(urljoin(...)).
Run inside an active SparkSession (exec'd from the REPL)."""
from itertools import product
from urllib.parse import urldefrag, urljoin

from pyspark.sql import functions as F

from sagan_spark.ops.urlresolve import resolve_url

BASES = [
    "https://h.com/a/b/c?q=1",
    "https://h.com/a/b/c",
    "https://h.com/a/b/",
    "https://h.com/",
    "https://h.com",
    "https://h.com/a//b/c",
    "http://user:pw@h.com:8080/a/b;p=1/c?q=1",
    "HTTPS://UPPER.example/Dir/Page.html?Q=Z#frag",
    "https://h.com/%7Euser/a/b",
]
HREFS = [
    "", "#frag", "?x=2", "?", ".", "..", "./", "../", "d", "d/e", "d/e/",
    "./d", "../d", "../../d", "../../../../d", "d/../e", "d/..", "d/./e",
    "/", "/d", "/d/e", "/./d", "/../d", "/d/../e", "/d/..", "/..", "/.",
    "//x.com", "//x.com/p", "//x.com/p/../q", "//x.com?q", "///p", "//",
    "https://x.com/p", "https://x.com/p/../q", "http://x.com/p/../q",
    "HTTPS://x.com/P", "https:/p/q", "https:p", "mailto:a@b.c",
    "javascript:void(0)", "g:h", "d?q", "d?q=1&r=2", "d/e?q", ";x=1",
    "g;x=1/../y", "a//b", "a//../b", "..//d", ".//d", "d//..//e",
    "p%20q/r", "%2e%2e/d", "a/b/c/../../../../x", "...", "..a", ".a",
    "a.", "a..", "/a/.../b", "./../d", ".././d", "../..", "../../",
    "d#f", "d?q#f", "#", "?#", "a b", "/a b/c", "a\tb",
]

rows = [(b, h) for b, h in product(BASES, HREFS)]
df = spark.createDataFrame(rows, "base string, href string")  # noqa: F821
got = {
    (r["base"], r["href"]): r["got"]
    for r in df.select(
        "base", "href", resolve_url(F.col("base"), F.col("href")).alias("got")
    ).collect()
}
bad = 0
for b, h in rows:
    exp = urldefrag(urljoin(b, h))[0]
    if got[(b, h)] != exp:
        bad += 1
        print(f"MISMATCH base={b!r} href={h!r} exp={exp!r} got={got[(b,h)]!r}")
print(f"{len(rows)} cases, {bad} mismatches")
