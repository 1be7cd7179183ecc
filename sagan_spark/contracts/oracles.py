"""oracle_sql(): the driver-facing name -> DuckDB SQL registry.

Split out of __spark_entry__.py (r5); see its docstring for the
contract rules.  Verbatim builder bodies — one gate per operator,
column aliases matched pairwise with the oracle.
"""

from __future__ import annotations

from collections.abc import Callable  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from sagan_spark.contracts.queries_corpus import _mix_quota_cte  # noqa: E501
from sagan_spark.contracts.queries_web import _asof_oracle_sql, _outlink_oracle_sql, _robots_sitemaps_oracle_sql, _rollup_oracle_sql, _sitemap_oracle_sql, _triangles_oracle_sql  # noqa: E501
from sagan_spark.contracts.oracle_builders import _BURSTS_ORACLE_SQL, _anchor_sqls, _bm25_sql, _bpe_encode_oracle_sql, _bpe_pair_sql, _bpe_train_oracle_sql, _c4_filters_sql, _charset_oracle_sql, _cm_oracle_sql, _corpus_profile_sql, _crawl_diff_oracle_sql, _dsir_select_sql, _dsir_weights_sql, _encoding_quality_sql, _frontier_oracle_sql, _hits_sql, _hll_oracle_sql, _html_extract_sql, _html_meta_oracle_sql, _html_stats_oracle_sql, _inverted_index_oracle_sql, _langid_rollup_sql, _langid_trained_sql, _lm_buckets_sql, _lm_likelihood_sql, _lm_train_sql, _pagerank_sql, _pmi_oracle_sql, _robots_screen_oracle_sql, _robots_sql, _url_templates_oracle_sql, _warc_oracle_sql, _web_ingest_oracle_sql  # noqa: E501

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
    # streaming ledger twins serve from per-batch partials and must be
    # bit-identical to the batch cascade - SAME oracle
    sqls["streaming_rollup"] = sqls["events_rollup"]
    sqls["streaming_actives"] = sqls["events_actives"]
    sqls["streaming_quantiles"] = sqls["events_quantiles"]
    return sqls
