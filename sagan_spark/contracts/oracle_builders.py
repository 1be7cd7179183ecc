"""Shared DuckDB oracle SQL builders.

Split out of __spark_entry__.py (r5); see its docstring for the
contract rules.  Verbatim builder bodies — one gate per operator,
column aliases matched pairwise with the oracle.
"""

from __future__ import annotations

from collections.abc import Callable  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from sagan_spark.contracts.queries_corpus import BM25_QUERIES, _langid_trained_weights  # noqa: E501
from sagan_spark.contracts.queries_web import _robots_body_sql_case  # noqa: E501

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


