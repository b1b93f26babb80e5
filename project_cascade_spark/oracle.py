"""DuckDB-dialect oracle SQL generators.

Every query in queries.py has a twin here, generated from the SAME
CascadeConfig constants (config.py), so the Spark implementation and the
oracle cannot drift.  Cross-engine equivalences used:

  Spark                                         DuckDB
  -----                                         ------
  conv(substring(md5(s),1,15),16,10)::long      ('0x'||substr(md5(s),1,15))::BIGINT
  regexp_replace(c,'\\s+',' ')                  regexp_replace(c,'\\s+',' ','g')
  split(c,' ')                                  str_split(c,' ')
  slice(a,i,k) / substring(s,i,k)               a[i:i+k-1] / substr(s,i,k)
  transform / aggregate / array_min             list_transform / list_sum / list_min
  size(array_intersect(a,b))                    len(list_filter(a,x->list_contains(b,x)))
  bit_count(a ^ b)                              bit_count(xor(a,b))

Floats: both engines are forced through float64 arithmetic in identical
evaluation order, and outputs are rounded, so value hashes match.
"""

from __future__ import annotations

from .config import MERSENNE31, CascadeConfig
from .operators.textstats import STOPWORDS, TOKEN_REGEX

P = MERSENNE31


def norm_sql(col: str) -> str:
    """normalize_ws twin."""
    return f"lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


def hash60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _doc_shingle_ctes(cfg: CascadeConfig) -> str:
    """norm → toks → distinct word-k-shingles → hashed shingles (documents)."""
    k = cfg.shingle_k
    return f"""
norm AS (SELECT doc_id, {norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, str_split(norm, ' ') AS toks FROM norm),
sh AS (SELECT doc_id, list_distinct(list_transform(
        generate_series(1, greatest(len(toks) - {k - 1}, 1)),
        i -> array_to_string(toks[i:i+{k - 1}], ' '))) AS shingles FROM tok),
hx AS (SELECT doc_id, list_transform(shingles,
        s -> {hash60_sql('s')} % {P}) AS hs FROM sh)"""


def _sig_cte(cfg: CascadeConfig) -> str:
    mins = ",\n    ".join(
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {P}))"
        for a, b in cfg.perm_pairs
    )
    return f"sig AS (SELECT doc_id, [\n    {mins}] AS sig FROM hx)"


def _bands_cte(cfg: CascadeConfig) -> str:
    b, r = cfg.lsh_bands, cfg.lsh_rows
    return f"""
bands AS (SELECT doc_id, unnest(list_transform(generate_series(0, {b - 1}),
        j -> j::VARCHAR || ':' || array_to_string(sig[j*{r}+1 : j*{r}+{r}], ','))) AS band
    FROM sig)"""


def _band_pairs_cte(cfg: CascadeConfig) -> str:
    return f"""{_bands_cte(cfg)},
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)"""


def _verified_pairs_cte(cfg: CascadeConfig) -> str:
    return f"""
inter AS (SELECT c.id_a, c.id_b,
        len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS n_i,
        len(sa.shingles) AS n_a, len(sb.shingles) AS n_b
    FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b),
pairs AS (SELECT id_a, id_b, n_i::DOUBLE / (n_a + n_b - n_i) AS jaccard
    FROM inter WHERE n_i::DOUBLE / (n_a + n_b - n_i) >= {cfg.jaccard_threshold})"""


def doc_minhash_pairs_sql(cfg: CascadeConfig) -> str:
    return f"""WITH {_doc_shingle_ctes(cfg)},
{_sig_cte(cfg)},
{_band_pairs_cte(cfg)},
{_verified_pairs_cte(cfg)}
SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM pairs ORDER BY id_a, id_b"""


def link_pairs_sql(cfg: CascadeConfig) -> str:
    """Two-table linkage twin: cross-table band collisions only (even
    doc_ids = source, odd = registry), verified at the same threshold."""
    return f"""WITH {_doc_shingle_ctes(cfg)},
{_sig_cte(cfg)},
{_bands_cte(cfg)},
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band
    WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
{_verified_pairs_cte(cfg)}
SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM pairs ORDER BY id_a, id_b"""


def doc_near_dup_clusters_sql(cfg: CascadeConfig) -> str:
    """Flagship: full LSH pipeline + connected components (recursive CTE
    transitive closure — min node id per component, singletons = own id)."""
    return f"""WITH RECURSIVE {_doc_shingle_ctes(cfg)},
{_sig_cte(cfg)},
{_band_pairs_cte(cfg)},
{_verified_pairs_cte(cfg)},
bidir AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b AS u, id_a AS v FROM pairs),
reach(id, root) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT b.v, r.root FROM reach r JOIN bidir b ON b.u = r.id)
SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id ORDER BY doc_id"""


def doc_ngram_jaccard_pairs_sql(cfg: CascadeConfig) -> str:
    """Exact inverted-index Jaccard — validates LSH recall on this table."""
    return f"""WITH {_doc_shingle_ctes(cfg)},
inv AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
        count(*) AS n_i
    FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, round(n_i::DOUBLE / (n_a + n_b - n_i), 4) AS jaccard
FROM inter WHERE n_i::DOUBLE / (n_a + n_b - n_i) >= {cfg.jaccard_threshold}
ORDER BY id_a, id_b"""


def doc_exact_dedup_sql() -> str:
    """Group sizes by md5 of normalized text; representative = min doc_id."""
    return f"""WITH norm AS (SELECT doc_id, {norm_sql('text')} AS norm FROM documents)
SELECT md5(norm) AS text_md5, count(*)::BIGINT AS n_dups, min(doc_id) AS rep_id
FROM norm GROUP BY 1 ORDER BY rep_id"""


def doc_simhash_pairs_sql(cfg: CascadeConfig) -> str:
    nbits = cfg.simhash_bits
    width = nbits // cfg.simhash_chunks
    mask = (1 << width) - 1
    bit_terms = " + ".join(
        f"CASE WHEN list_sum(list_transform(th, x -> CASE WHEN (x >> {j}) & 1 = 1"
        f" THEN 1 ELSE -1 END)) >= 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END"
        for j in range(nbits)
    )
    chunk_eq = " OR ".join(
        f"((a.sim >> {j * width}) & {mask} = (b.sim >> {j * width}) & {mask})"
        for j in range(cfg.simhash_chunks)
    )
    return f"""WITH norm AS (SELECT doc_id, {norm_sql('text')} AS norm FROM documents),
th AS (SELECT doc_id, list_transform(str_split(norm, ' '), s -> {hash60_sql('s')}) AS th FROM norm),
simhash AS (SELECT doc_id, ({bit_terms}) AS sim FROM th)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id AND ({chunk_eq})
WHERE bit_count(xor(a.sim, b.sim)) <= {cfg.simhash_max_hamming}
ORDER BY id_a, id_b"""


def doc_winnow_pairs_sql(cfg: CascadeConfig) -> str:
    k, w = cfg.winnow_k, cfg.winnow_w
    return f"""WITH norm AS (SELECT doc_id, {norm_sql('text')} AS norm FROM documents),
grams AS (SELECT doc_id, list_transform(
        generate_series(1, greatest(length(norm) - {k - 1}, 1)),
        i -> {hash60_sql(f'substr(norm, i, {k})')}) AS g FROM norm),
prints AS (SELECT doc_id, list_distinct(list_transform(
        generate_series(1, greatest(len(g) - {w - 1}, 1)),
        i -> list_min(g[i:i+{w - 1}]))) AS fps FROM grams),
fp AS (SELECT doc_id, unnest(fps) AS fp FROM prints)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b"""


def doc_fingerprint_sql() -> str:
    return f"""WITH norm AS (SELECT doc_id, {norm_sql('text')} AS norm FROM documents)
SELECT doc_id, {hash60_sql('norm')} AS doc_fp FROM norm ORDER BY doc_id"""


def doc_token_counts_sql() -> str:
    # TOKEN_REGEX contains backslashes valid in both regex dialects
    return f"""WITH norm AS (SELECT doc_id, text, {norm_sql('text')} AS norm FROM documents)
SELECT doc_id,
       len(str_split(norm, ' '))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}'))::BIGINT AS bpe_tokens
FROM norm ORDER BY doc_id"""


def doc_language_id_sql() -> str:
    """Argmax over stopword hit counts; ties → first language in order
    en,de,fr,es; all-zero → 'und'.  Mirrors operators/textstats.language_id."""
    hit_exprs = []
    for lang, stops in STOPWORDS.items():
        arr = "[" + ", ".join(f"'{s}'" for s in stops) + "]"
        hit_exprs.append(
            f"len(list_filter(toks, t -> list_contains({arr}, t))) AS hits_{lang}"
        )
    langs = list(STOPWORDS)
    # same fold as the Spark side: iterate reversed, earlier langs win ties
    best = "'und'"
    best_hits = "0"
    for lang in reversed(langs):
        cond = f"(hits_{lang} > 0 AND hits_{lang} >= {best_hits})"
        best = f"CASE WHEN {cond} THEN '{lang}' ELSE {best} END"
        best_hits = f"CASE WHEN {cond} THEN hits_{lang} ELSE {best_hits} END"
    return f"""WITH norm AS (SELECT doc_id, {norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, str_split(norm, ' ') AS toks FROM norm),
hits AS (SELECT doc_id, {', '.join(hit_exprs)} FROM tok)
SELECT doc_id, {best} AS lang_pred FROM hits ORDER BY doc_id"""


def doc_quality_sql() -> str:
    stops = "[" + ", ".join(f"'{s}'" for s in STOPWORDS["en"]) + "]"
    return f"""WITH norm AS (SELECT doc_id, text, {norm_sql('text')} AS norm FROM documents),
feat AS (SELECT doc_id,
    length(text)::BIGINT AS n_chars_calc,
    len(str_split(norm, ' '))::BIGINT AS n_tokens,
    len(list_filter(str_split(norm, ' '), t -> list_contains({stops}, t)))::DOUBLE
        / len(str_split(norm, ' ')) AS stop_ratio,
    (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
        / greatest(length(text), 1) AS punct_ratio,
    length(replace(norm, ' ', ''))::DOUBLE / greatest(len(str_split(norm, ' ')), 1) AS mean_tok_len
    FROM norm)
SELECT doc_id, n_chars_calc, n_tokens,
    round(stop_ratio, 6) AS stop_ratio,
    round(punct_ratio, 6) AS punct_ratio,
    round(mean_tok_len, 6) AS mean_tok_len,
    round((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END
         + CASE WHEN punct_ratio <= 0.2 THEN 0.3 ELSE 0.0 END
         + CASE WHEN stop_ratio >= 0.02 THEN 0.2 ELSE 0.0 END
         + CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 0.1 ELSE 0.0 END), 2)
        AS quality_score
FROM feat ORDER BY doc_id"""


def _cosine_sql(a: str, b: str, dim: int) -> str:
    """float64 cosine with the same evaluation order as the Spark side
    (sequential fold over zipped elements)."""
    dot = (f"list_sum(list_transform(generate_series(1, {dim}),"
           f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")
    na = f"sqrt(list_sum(list_transform(generate_series(1, {dim}), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))"
    nb = f"sqrt(list_sum(list_transform(generate_series(1, {dim}), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE)))"
    return f"({dot}) / (({na}) * ({nb}))"


def emb_topk_sql(k: int, n_queries: int, dim: int) -> str:
    cos = _cosine_sql("q.embedding", "n.embedding", dim)
    return f"""WITH scored AS (
    SELECT q.vec_id AS q_id, n.vec_id AS n_id, {cos} AS cosine
    FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
    WHERE q.vec_id < {n_queries}),
ranked AS (SELECT q_id, n_id, cosine,
    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
    FROM scored)
SELECT q_id, n_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k} ORDER BY q_id, rank"""


def emb_ann_lsh_sql(
    k: int, dim: int, n_planes: int, n_tables: int, seed: int
) -> str:
    """Exact DuckDB twin of operators/similarity.srp_lsh_topk: the SRP
    hyperplanes are regenerated from the same seeded RandomState stream and
    embedded as double literals (repr round-trips bit-exactly), so both
    engines compute identical buckets, identical candidate sets, and
    identical within-bucket cosine rankings.

    The bucket cap is provably a no-op at gate scale — the sf0.01 corpus has
    fewer rows in TOTAL than max_bucket_size — so the oracle omits it; the
    salted cap itself is covered by tests/test_bucket_cap.py.

    Sign-boundary note: bucket bits compare dot >= 0; both engines sum the
    same 64 double products, so a flip would need |dot| at float-noise
    scale (~1e-13), measure-zero for randn planes over real embeddings.
    """
    import numpy as np

    bucket_tables = []
    for t in range(n_tables):
        rng = np.random.RandomState(seed + 1009 * t)
        planes = rng.randn(n_planes, dim)
        bits = []
        for j in range(n_planes):
            lit = "[" + ", ".join(repr(float(x)) for x in planes[j]) + "]"
            dot = (f"list_sum(list_transform(generate_series(1, {dim}),"
                   f" i -> embedding[i]::DOUBLE * ({lit})[i]))")
            bits.append(
                f"CASE WHEN ({dot}) >= 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END"
            )
        bucket_tables.append(
            f"SELECT vec_id AS _id, {t} AS srp_table,"
            f" ({' + '.join(bits)}) AS srp_bucket FROM embeddings"
        )
    buckets_union = "\nUNION ALL\n".join(bucket_tables)
    cos = _cosine_sql("q.embedding", "n.embedding", dim)
    return f"""WITH buckets AS (
{buckets_union}),
cand AS (SELECT DISTINCT a._id AS q_id, b._id AS n_id
    FROM buckets a JOIN buckets b
      ON a.srp_table = b.srp_table AND a.srp_bucket = b.srp_bucket
     AND a._id <> b._id),
scored AS (SELECT c.q_id, c.n_id, {cos} AS cosine
    FROM cand c JOIN embeddings q ON q.vec_id = c.q_id
                JOIN embeddings n ON n.vec_id = c.n_id),
ranked AS (SELECT q_id, n_id, cosine,
    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
    FROM scored)
SELECT q_id, n_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k} ORDER BY q_id, rank"""


def emb_ann_ivf_sql(k: int, dim: int, n_probe: int, centroids) -> str:
    """Exact DuckDB twin of operators/similarity.ivf_topk with a TRAINED
    quantizer: `centroids` is the (n_cells, dim) float64 array produced by
    train_ivf_centroids — the caller retrains it from the same deterministic
    sample rule as the Spark side (queries._trained_ivf_centroids_gate), and
    it embeds here as double literals (repr round-trips bit-exactly), the
    same move as the SRP oracle's regenerated hyperplanes.  Every vector
    joins its argmax-cosine cell, each query probes its n_probe best cells,
    candidates are scored exactly.  Both engines evaluate every cosine with
    the same sequential fold (_cosine_sql ↔ F.aggregate / the operator's
    literal-norm loop), so cell assignment, probe sets, candidates, and
    rankings are identical.  The cell cap is a no-op at gate scale (corpus <
    max_cell_size), as for the SRP oracle; the salted cap is covered by
    tests/test_bucket_cap.py."""
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            cid, ", ".join(repr(float(x)) for x in vec)
        )
        for cid, vec in enumerate(centroids)
    )
    cos_qc = _cosine_sql("e.embedding", "c.cvec", dim)
    cos = _cosine_sql("q.embedding", "n.embedding", dim)
    return f"""WITH cents AS (
    SELECT cid::BIGINT AS cid, cvec FROM (VALUES {rows}) AS t(cid, cvec)),
cellscore AS (
    SELECT e.vec_id AS _id, c.cid, {cos_qc} AS cos
    FROM embeddings e CROSS JOIN cents c),
rankedcells AS (
    SELECT _id, cid,
           row_number() OVER (PARTITION BY _id ORDER BY cos DESC, cid) AS r
    FROM cellscore),
cells AS (SELECT _id, cid AS cell FROM rankedcells WHERE r = 1),
probes AS (SELECT _id AS q_id, cid AS cell FROM rankedcells WHERE r <= {n_probe}),
cand AS (
    SELECT DISTINCT p.q_id, c._id AS n_id
    FROM probes p JOIN cells c USING (cell)
    WHERE p.q_id <> c._id),
scored AS (
    SELECT cd.q_id, cd.n_id, {cos} AS cosine
    FROM cand cd JOIN embeddings q ON q.vec_id = cd.q_id
                 JOIN embeddings n ON n.vec_id = cd.n_id),
ranked AS (
    SELECT q_id, n_id, cosine,
           row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
    FROM scored)
SELECT q_id, n_id, round(cosine, 6) AS cosine, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k} ORDER BY q_id, rank"""


def emb_near_dup_sql(threshold: float, dim: int) -> str:
    cos = _cosine_sql("a.embedding", "b.embedding", dim)
    return f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold} ORDER BY id_a, id_b"""


# ---------------------------------------------------------------------------
# Reference-operator re-expressions over the TPC-H-ish tables (SURVEY §2)
# ---------------------------------------------------------------------------

def match_stats_sql() -> str:
    """A5-A8: one-pass conditional aggregation (buyer_matching_checks style)."""
    return """SELECT l_returnflag, l_linestatus,
    count(*)::BIGINT AS n_rows,
    round(sum(l_quantity), 2) AS sum_qty,
    round(avg(l_extendedprice), 4) AS avg_price,
    round(avg(l_discount), 6) AS avg_disc,
    sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)::BIGINT AS n_high_disc
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""


def cluster_sizes_window_sql() -> str:
    """W2: cluster-size annotation as a window, clusters = customers."""
    return """SELECT o_orderkey, o_custkey,
    count(*) OVER (PARTITION BY o_custkey)::BIGINT AS cluster_size
FROM orders ORDER BY o_orderkey"""


def distinct_on_sql() -> str:
    """W3 / DISTINCT ON: keep latest order per customer (db_calls.py:79-87)."""
    return """WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders)
SELECT o_custkey, o_orderkey,
    strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM r WHERE rn = 1 ORDER BY o_custkey"""


def propagate_best_sql() -> str:
    """A2/W1: per-cluster best-row payload propagation
    (data_processing.py:342-381 re-expressed as a window)."""
    return """SELECT o_orderkey, o_custkey,
    first_value(o_orderpriority) OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_priority
FROM orders ORDER BY o_orderkey"""


def blacklist_anti_join_sql() -> str:
    """J1: blacklist anti-join (data_processing.py:246-255).  Blacklist =
    customers in nations of region 0."""
    return """SELECT c.c_custkey, c.c_name FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_regionkey = 0 AND n.n_nationkey = c.c_nationkey)
ORDER BY c_custkey"""


def addback_right_outer_sql() -> str:
    """J2: matched ⋈ full source right-outer add-back → customers with zero
    orders retained (data_matching.py:142)."""
    return """SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey ORDER BY c_custkey"""


def union_dedup_sql() -> str:
    """U1+A11: accumulate unions then drop duplicates
    (data_matching.py:124-125)."""
    return """SELECT DISTINCT o_orderkey FROM (
    SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
    UNION ALL
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
) ORDER BY o_orderkey"""


def singleton_renumber_sql() -> str:
    """A3: groupby().ngroup()-style dense renumbering
    (data_matching.py:269-273)."""
    return """SELECT c_custkey, dense_rank() OVER (ORDER BY c_name)::BIGINT AS new_cluster_id
FROM customer ORDER BY c_custkey"""


def best_config_argmax_sql() -> str:
    """A9: argmax config by stat (match_filtering.py:173-175)."""
    return """WITH stats AS (
    SELECT c_mktsegment, round(avg(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY c_mktsegment)
SELECT max_by(c_mktsegment, avg_bal) AS best_config FROM stats"""


def topk_orders_sql() -> str:
    """O2/O4: sort desc + limit."""
    return """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""


def cascade_band_filter_sql() -> str:
    """P3+P4 single-pass rewrite: length bands over documents, per-band
    quality threshold on alpha ratio (match_filtering.py:36-59 semantics)."""
    return """WITH feat AS (
    SELECT doc_id, n_chars,
        CASE WHEN n_chars <= 150 THEN 0
             WHEN n_chars <= 300 THEN 1
             ELSE 2 END AS band,
        length(regexp_replace(text, '[^a-z ]', '', 'g'))::DOUBLE
            / greatest(length(text), 1) AS alpha_ratio
    FROM documents)
SELECT doc_id, band::BIGINT AS band, round(alpha_ratio, 6) AS alpha_ratio
FROM feat
WHERE alpha_ratio >= CASE band WHEN 0 THEN 0.97 WHEN 1 THEN 0.95 ELSE 0.90 END
ORDER BY doc_id"""


def events_windowed_agg_sql() -> str:
    """§2.9 streaming analogue: tumbling 1h window aggregation."""
    return """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
    event_type, count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""


def leven_name_pairs_sql(threshold: int) -> str:
    """F9: Levenshtein-ratio scoring over same-nation customer name pairs
    (the reference scores src vs registry names, data_processing.py:139-149).
    floor() to dodge cross-engine half-way rounding."""
    return f"""WITH pairs AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        floor(100 * (1 - levenshtein(a.c_name, b.c_name)::DOUBLE
              / greatest(length(a.c_name), length(b.c_name), 1)))::BIGINT
            AS leven_ratio
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey)
SELECT id_a, id_b, leven_ratio FROM pairs
WHERE leven_ratio >= {threshold} ORDER BY id_a, id_b"""


def manual_review_sample_sql(n: int, seed: int) -> str:
    """O6: deterministic seeded-shuffle review batch — the shuffle key is
    md5(id:seed), identical in Spark (operators/manual_review.shuffle_key)."""
    return f"""SELECT c_custkey, c_name,
    md5(c_custkey::VARCHAR || ':{seed}') AS shuffle_key
FROM customer ORDER BY shuffle_key LIMIT {n}"""


def stamped_matches_sql() -> str:
    """F12: match-date stamping (data_matching.py:294).  Day-granular so
    both engines agree when run in the same gate pass.  The Spark session
    pins its timezone to UTC (session.py), so the oracle evaluates the UTC
    date explicitly — `current_date` would read the DuckDB session TimeZone
    and diverge on a non-UTC host around midnight."""
    return """SELECT c_custkey,
    strftime(now() AT TIME ZONE 'UTC', '%Y-%m-%d') AS match_date,
    ' ' AS match_by FROM customer ORDER BY c_custkey"""


def upper_key_matches_sql() -> str:
    """F13: UPPER-key join round trip (db_calls.py:110-122)."""
    return """SELECT c.c_custkey, l.lookup_key
FROM customer c JOIN (
    SELECT lower(c_name) AS org_string, c_custkey AS lookup_key FROM customer) l
  ON upper(c.c_name) = upper(l.org_string)
ORDER BY c_custkey"""


def training_export_pairs_sql(threshold: int, match_ratio: int) -> str:
    """F17: to_json(struct(...)) labelled training pairs
    (convert_training.py:33-57).  struct_pack field order == Spark struct
    order; both serializers emit compact JSON with identical escaping."""
    return f"""WITH pairs AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        a.c_name AS n_a, b.c_name AS n_b,
        floor(100 * (1 - levenshtein(a.c_name, b.c_name)::DOUBLE
              / greatest(length(a.c_name), length(b.c_name), 1)))::BIGINT
            AS leven_ratio
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
lab AS (SELECT id_a, id_b, n_a, n_b,
        CASE WHEN leven_ratio >= {match_ratio} THEN 'match' ELSE 'distinct' END AS label
    FROM pairs WHERE leven_ratio >= {threshold})
SELECT id_a, id_b,
    to_json(struct_pack(src_name := n_a, reg_name := n_b, label := label))::VARCHAR
        AS training_json
FROM lab ORDER BY id_a, id_b"""


def events_json_extract_sql() -> str:
    """S4/F15: JSON field extraction at scan (db_calls.py:227-231)."""
    return """SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k
FROM events WHERE json_extract_string(props, '$.k')::BIGINT > 50
ORDER BY event_id"""
