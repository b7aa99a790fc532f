"""DuckDB oracle SQL, one entry per query in ``queries.py``.

The driver registers the parquet tables as views named
``region nation customer supplier part orders lineitem events documents
embeddings``. Column names AND float formulas mirror the Ray
implementations exactly (integer math until one final identical sequence
of double ops) so order-insensitive value hashes match.
"""

# documents -> token table (mirror of functions.scalar.word_tokens_np)
_TOK = """
tok AS (
  SELECT cast(doc_id AS varchar) AS doc_id,
         source,
         list_transform(string_split(text, ' '),
                        w -> cast(length(w)*31 + coalesce(ascii(w), 0) AS int)) AS tokens
  FROM documents
),
sess AS (SELECT doc_id, source, tokens, len(tokens) AS L FROM tok)
"""

_FRAME_W, _FRAME_H = 16, 8
_SEG_W, _SEG_H = 24, 12

# frame windows: k in [0, ceil(L/H)), slice [kH, min(kH+W, L))
_FRAME_WINDOWS = f"""
win AS (
  SELECT doc_id, source, tokens, L,
         unnest(range(0, cast(ceil(L / {_FRAME_H}.0) AS bigint))) AS win_id
  FROM sess
),
frame AS (
  SELECT doc_id, source,
         win_id,
         win_id * {_FRAME_H} AS ts_start,
         least(win_id * {_FRAME_H} + {_FRAME_W}, L) AS ts_end,
         tokens[win_id * {_FRAME_H} + 1 : least(win_id * {_FRAME_H} + {_FRAME_W}, L)] AS seg_tokens,
         tokens, L
  FROM win
)
"""

SQL = {}

SQL["w1_frame_windows"] = f"""
WITH {_TOK}, {_FRAME_WINDOWS}
SELECT doc_id, source, win_id, ts_start, ts_end, seg_tokens,
       tokens[greatest(ts_start - 8, 0) + 1 : ts_start] AS lag_tokens,
       tokens[ts_end + 1 : least(ts_end + 8, L)] AS lead_tokens
FROM frame
"""

SQL["w2c_blockref_sessions"] = f"""
WITH {_TOK}, {_FRAME_WINDOWS}
SELECT doc_id, source, win_id, ts_start, ts_end, seg_tokens FROM frame
"""

# segment windows: s = k*H for k in [0, ceil((L-1)/H)), inclusive ticks [s, s+W]
SQL["w3_segment_windows"] = f"""
WITH {_TOK},
win AS (
  SELECT doc_id, source, tokens, L,
         unnest(range(0, cast(ceil((L - 1) / {_SEG_H}.0) AS bigint))) AS win_id
  FROM sess
),
segw AS (
  SELECT doc_id, source, win_id,
         win_id * {_SEG_H} AS ts_start,
         least(win_id * {_SEG_H} + {_SEG_W} + 1, L) AS ts_end,
         tokens[win_id * {_SEG_H} + 1 : least(win_id * {_SEG_H} + {_SEG_W} + 1, L)] AS seg_tokens
  FROM win
)
SELECT doc_id, source, win_id, ts_start, ts_end, seg_tokens,
       cast(len(seg_tokens) AS bigint) AS n_tokens,
       cast(len(list_distinct(seg_tokens)) AS bigint) AS n_distinct
FROM segw
"""

SQL["g_window_aggs"] = f"""
WITH {_TOK}, {_FRAME_WINDOWS},
agg AS (
  SELECT doc_id, source, win_id, ts_start, ts_end, seg_tokens,
         cast(len(seg_tokens) AS bigint) AS n_tokens,
         cast(len(list_distinct(seg_tokens)) AS bigint) AS n_distinct,
         cast(len(list_filter(seg_tokens, x -> x > 300)) AS bigint) AS freq_gt,
         cast(len(list_filter(seg_tokens, x -> x = 209)) AS bigint) AS match_count,
         cast(list_aggregate(list_transform(seg_tokens, x -> cast(x AS bigint)), 'sum') AS bigint) AS tok_sum,
         cast(list_aggregate(list_transform(seg_tokens, x -> cast(x AS bigint) * cast(x AS bigint)), 'sum') AS bigint) AS tok_sq,
         cast(list_aggregate(seg_tokens, 'max') AS bigint) AS tok_max,
         cast(list_aggregate(seg_tokens, 'min') AS bigint) AS tok_min,
         list_sort(seg_tokens) AS sorted_tokens,
         cast(list_aggregate(list_transform(seg_tokens,
              (x, i) -> (cast(i AS bigint) - 1) * cast(x AS bigint)), 'sum') AS bigint) AS tok_s1
  FROM frame
),
fn AS (
  SELECT *,
         n_tokens * (n_tokens - 1) // 2 AS tok_si,
         (n_tokens - 1) * n_tokens * (2 * n_tokens - 1) // 6 AS tok_sii
  FROM agg
)
SELECT doc_id, source, win_id, ts_start, ts_end, seg_tokens,
       n_tokens, n_distinct, freq_gt, match_count, tok_sum,
       tok_sum / n_tokens AS tok_mean,
       sqrt(greatest(tok_sq / n_tokens - (tok_sum / n_tokens) * (tok_sum / n_tokens), 0.0)) AS tok_std,
       tok_max, tok_min,
       cast(sorted_tokens[cast((n_tokens - 1) // 5 AS bigint) + 1] AS bigint) AS tok_p20,
       cast(sorted_tokens[cast((n_tokens - 1) // 2 AS bigint) + 1] AS bigint) AS tok_p50,
       cast(sorted_tokens[cast(4 * (n_tokens - 1) // 5 AS bigint) + 1] AS bigint) AS tok_p80,
       CASE WHEN n_tokens * tok_sii - tok_si * tok_si > 0
            THEN cast(n_tokens * tok_s1 - tok_si * tok_sum AS double)
                 / cast(n_tokens * tok_sii - tok_si * tok_si AS double)
            ELSE 0.0 END AS tok_slope
FROM fn
"""


SQL["asof_backfill_events"] = """
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       c.value AS bf_value, epoch_us(c.ts) AS bf_ts,
       coalesce(c.value, 0.0) AS bf_value_filled
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

SQL["sessionize_events_q"] = """
WITH brk AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS b
  FROM events
)
SELECT event_id, user_id, ts_us,
       cast(sum(b) OVER (PARTITION BY user_id ORDER BY ts_us
            ROWS UNBOUNDED PRECEDING) AS bigint) AS session_no
FROM brk
"""

SQL["m1_semi_join"] = """
SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity
FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 3000.0)
"""

SQL["t6_anti_join"] = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0)
"""


SQL["t2_topk_backfill"] = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY (CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) DESC,
         o_totalprice DESC, o_orderkey
LIMIT 10
"""

SQL["t4_stride_sample"] = """
WITH r AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
)
SELECT event_id, user_id, value
FROM r WHERE rn <= 60 AND (rn - 1) % 5 = 0
"""



_CENTS_STATS = """
stats AS (
  SELECT o_custkey,
         cast(sum(c) AS bigint) AS s,
         cast(sum(c * c) AS bigint) AS s2,
         max(c) AS mx, min(c) AS mn,
         cast(count(*) AS bigint) AS n
  FROM (SELECT o_custkey, cast(round(o_totalprice * 100.0) AS bigint) AS c FROM orders)
  GROUP BY o_custkey
)
"""





SQL["dedup_exact"] = """
SELECT md5(text) AS text_hash,
       cast(count(*) AS bigint) AS n_dups,
       min(doc_id) AS keep_doc_id
FROM documents
GROUP BY md5(text)
"""

SQL["dedup_ngram_jaccard"] = """
WITH w AS (SELECT doc_id, source, text, string_split(text, ' ') AS s FROM documents),
g AS (
  SELECT doc_id, source,
         list_distinct(CASE
           WHEN len(s) >= 3 THEN list_transform(generate_series(1, len(s) - 2),
                                  i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2])
           WHEN length(text) = 0 THEN []
           ELSE [array_to_string(s, ' ')] END) AS gs
  FROM w
),
p AS (
  SELECT a.source AS source, a.doc_id AS a, b.doc_id AS b,
         cast(len(list_intersect(a.gs, b.gs)) AS bigint) AS inter_n,
         cast(len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)) AS bigint) AS union_n
  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
)
SELECT source, a, b, inter_n, union_n
FROM p WHERE inter_n > 0 AND 5 * inter_n >= 1 * union_n
"""

_EMB_LONG = """
el AS (
  SELECT vec_id, label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
nn AS (
  SELECT vec_id, sqrt(sum(cast(v AS double) * cast(v AS double))) AS nrm
  FROM el GROUP BY vec_id
)
"""

SQL["ann_cosine_topk"] = f"""
WITH {_EMB_LONG},
d AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         sum(cast(q.v AS double) * cast(e.v AS double)) AS dot
  FROM el q JOIN el e ON q.i = e.i
  WHERE q.vec_id < 4
  GROUP BY q.vec_id, e.vec_id
),
s AS (
  SELECT d.query_id, d.vec_id,
         round(d.dot / (na.nrm * nb.nrm), 6) AS score
  FROM d JOIN nn na ON na.vec_id = d.query_id
         JOIN nn nb ON nb.vec_id = d.vec_id
),
r AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, score, cast(rank AS bigint) AS rank FROM r WHERE rank <= 5
"""

SQL["emb_neardup_toppairs"] = f"""
WITH {_EMB_LONG},
d AS (
  SELECT a.label AS label, a.vec_id AS a, b.vec_id AS b,
         sum(cast(a.v AS double) * cast(b.v AS double)) AS dot
  FROM el a JOIN el b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.label, a.vec_id, b.vec_id
),
s AS (
  SELECT d.label, d.a, d.b,
         round(d.dot / (na.nrm * nb.nrm), 6) AS s_r
  FROM d JOIN nn na ON na.vec_id = d.a JOIN nn nb ON nb.vec_id = d.b
),
r AS (
  SELECT label, a, b, s_r,
         row_number() OVER (PARTITION BY label ORDER BY s_r DESC, a, b) AS rn
  FROM s
)
SELECT label, a, b, s_r FROM r WHERE rn <= 3
"""

_STOP_SQL = "('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by')"


SQL["text_signals"] = r"""
WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS s FROM documents),
a AS (
  SELECT doc_id, text,
         cast(len(s) AS bigint) AS n_words,
         cast(len(list_filter(s, x -> x IN ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by'))) AS bigint) AS n_stop,
         cast(len(list_filter(s, x -> regexp_full_match(x, '[a-z]+'))) AS bigint) AS n_alpha,
         cast(list_aggregate(list_transform(s, x -> length(x)), 'sum') AS bigint) AS sum_len
  FROM w
),
lid AS (
  SELECT doc_id, lower(text) AS t FROM documents
),
sc AS (
  SELECT doc_id,
         cast((length(t) - length(replace(t, ' th', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'the', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, ' an', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'ing', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, ' of', ''))) / 3 AS bigint) AS s_en,
         cast((length(t) - length(replace(t, 'der', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'ein', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'sch', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, ' un', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'ich', ''))) / 3 AS bigint) AS s_de,
         cast((length(t) - length(replace(t, ' le', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'les', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, ' de', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'ent', ''))) / 3 AS bigint) + cast((length(t) - length(replace(t, 'que', ''))) / 3 AS bigint) AS s_fr
  FROM lid
)
SELECT a.doc_id, n_words, n_stop,
       n_stop / n_words AS stop_ratio,
       n_alpha,
       sum_len / n_words AS mean_word_len,
       (n_stop / n_words) > 0.09 AS is_en,
       cast(len(string_split(a.text, ' ')) AS bigint) AS n_ws_tokens,
       cast(len(regexp_extract_all(a.text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS bigint) AS n_re_tokens,
       s_en, s_de, s_fr,
       CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en' WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang
FROM a JOIN sc ON a.doc_id = sc.doc_id
"""

SQL["s4_json_extract"] = """
SELECT event_id,
       cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS bigint) AS k,
       value / 32768.0 AS norm_value
FROM events
"""

SQL["scalar_functions"] = """
WITH p AS (
  SELECT doc_id,
         'show_' || lpad(cast(doc_id AS varchar), 6, '0') AS prefix,
         'spotify:doc:' || cast(doc_id AS varchar) || '_' || cast(n_chars AS varchar) AS seg_id
  FROM documents
)
SELECT doc_id,
       upper(substr(prefix, 6, 1)) || '/' || upper(substr(prefix, 7, 1)) || '/' || prefix AS shard_path,
       seg_id,
       regexp_extract(seg_id, '^(.*)_([0-9]+)$', 1) AS uri,
       cast(regexp_extract(seg_id, '^(.*)_([0-9]+)$', 2) AS bigint) AS seg_start
FROM p
"""

SQL["g6_g7_metrics"] = f"""
WITH {_CENTS_STATS}
SELECT o_custkey, n AS n_orders,
       sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)) / 142.52017
         + 12.0 * mx / 0.0155821005 AS debate_metric,
       2.0 * (s / n) / 0.8239882 + mx / 556.0259 + mn / 1586.24 AS disapproval_metric
FROM stats
"""

SQL["s11_format_roundtrips"] = """
SELECT cast(doc_id AS bigint) AS doc_id, source, text, cast(n_chars AS bigint) AS n_chars
FROM documents
"""

SQL["w4_point_lookup"] = """
WITH tok AS (
  SELECT cast(doc_id AS varchar) AS doc_id, doc_id AS id_num,
         cast(n_chars AS bigint) AS n_chars,
         list_transform(string_split(text, ' '),
                        w -> cast(length(w)*31 + coalesce(ascii(w), 0) AS int)) AS tokens
  FROM documents
)
SELECT doc_id,
       tokens[17 : least(32, len(tokens))] AS seg_tokens,
       n_chars
FROM tok WHERE id_num % 8 = 0
"""

SQL["g8_collect"] = """
SELECT source,
       list(doc_id ORDER BY doc_id) AS doc_ids,
       cast(count(*) AS bigint) AS n_docs
FROM documents
GROUP BY source
"""


SQL["j5_hash_join"] = """
SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""



SQL["m7_mood_filter"] = f"""
WITH {_TOK}, {_FRAME_WINDOWS},
agg AS (
  SELECT doc_id, source, win_id, ts_start,
         cast(len(seg_tokens) AS bigint) AS n_tokens,
         cast(len(list_distinct(seg_tokens)) AS bigint) AS n_distinct,
         cast(list_aggregate(list_transform(seg_tokens, x -> cast(x AS bigint)), 'sum') AS bigint) AS tok_sum
  FROM frame
)
SELECT doc_id, source, win_id, ts_start, n_tokens, n_distinct,
       tok_sum / n_tokens AS tok_mean
FROM agg
WHERE tok_sum / n_tokens > 250.0 AND n_distinct < 15
"""


SQL["hopping_window_agg"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         cast(round(value * 100.0) AS bigint) AS c
  FROM events
),
x AS (
  SELECT user_id, t, c,
         unnest(range(greatest(t // 1800000000 - 1, 0), t // 1800000000 + 1)) AS j
  FROM e
)
SELECT user_id, j * 1800000000 AS win_start_us,
       cast(count(*) AS bigint) AS n_events,
       cast(sum(c) AS bigint) AS sum_cents,
       min(t) AS min_ts_us,
       max(t) AS max_ts_us
FROM x
GROUP BY user_id, j
"""


SQL["range_join_count"] = """
SELECT o.o_orderkey,
       epoch_us(o.o_orderdate) AS lo_us,
       cast(count(e.ts) AS bigint) AS n_in_range
FROM orders o LEFT JOIN events e
  ON epoch_us(e.ts) >= epoch_us(o.o_orderdate)
 AND epoch_us(e.ts) < epoch_us(o.o_orderdate) + 86400000000
GROUP BY o.o_orderkey, epoch_us(o.o_orderdate)
"""


SQL["train_test_split"] = """
SELECT doc_id,
       CASE WHEN substr(md5(cast(doc_id AS varchar)), 1, 1) IN ('0','1','2')
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def _model_score_sql() -> str:
    """Inline the SAME deterministic weight matrix the actor np.loads, as
    integer literals — exact int64 math both sides, first-of-max argmax
    via ordered CASE (numpy argmax tie rule)."""
    from podcast_audio_feature_extraction_ray.stages.model import (
        DEFAULT_FEATURES,
        weight_matrix,
    )

    W = weight_matrix()
    feats = list(DEFAULT_FEATURES)
    logit_defs = ",\n         ".join(
        "cast("
        + " + ".join(f"({int(W[ci, fi])}) * {f}" for fi, f in enumerate(feats))
        + f" AS bigint) AS l{ci}"
        for ci in range(W.shape[0])
    )
    return f"""
WITH {_TOK}, {_FRAME_WINDOWS},
agg AS (
  SELECT doc_id, source, win_id, ts_start, ts_end,
         cast(len(seg_tokens) AS bigint) AS n_tokens,
         cast(len(list_distinct(seg_tokens)) AS bigint) AS n_distinct,
         cast(len(list_filter(seg_tokens, x -> x > 300)) AS bigint) AS freq_gt,
         cast(len(list_filter(seg_tokens, x -> x = 209)) AS bigint) AS match_count,
         cast(list_aggregate(list_transform(seg_tokens, x -> cast(x AS bigint)), 'sum') AS bigint) AS tok_sum,
         cast(list_aggregate(seg_tokens, 'max') AS bigint) AS tok_max,
         cast(list_aggregate(seg_tokens, 'min') AS bigint) AS tok_min
  FROM frame
),
logits AS (
  SELECT doc_id, source, win_id, ts_start, ts_end,
         {logit_defs}
  FROM agg
)
SELECT doc_id, source, win_id, ts_start, ts_end,
       cast(CASE WHEN l0 >= l1 AND l0 >= l2 AND l0 >= l3 THEN 0
                 WHEN l1 >= l2 AND l1 >= l3 THEN 1
                 WHEN l2 >= l3 THEN 2 ELSE 3 END AS bigint) AS class_id,
       greatest(l0, l1, l2, l3) AS class_score
FROM logits
"""


SQL["model_score_windows"] = _model_score_sql()


# real-PNG decode: width/height from the size rule; pixel_sum recomputed
# by summing the synthesized gradient (3x + 7y + doc_id%251) % 256 over
# the image grid with two generate_series (exact integer math; the Ray
# side sums the ACTUAL decoded pixels of a real zlib-compressed PNG)

# frame sampling over multi-frame motion-PNG payloads: sampled frames
# are f in {0, 2} below n_frames = 1 + doc_id%4; pixel_sum recomputes
# frame f's gradient (3x + 7y + doc_id%251 + 11f) % 256 over the grid
SQL["multimodal_frame_sample"] = """
WITH dims AS (
  SELECT doc_id,
         cast(16 + (doc_id * 7) % 48 AS bigint) AS width,
         cast(16 + (doc_id * 13) % 32 AS bigint) AS height,
         cast(1 + doc_id % 4 AS bigint) AS n_frames
  FROM documents
), frames AS (
  SELECT d.doc_id, d.width, d.height, f.g AS frame_idx
  FROM dims d JOIN generate_series(0, 3) f(g)
    ON f.g < d.n_frames AND f.g % 2 = 0
)
SELECT fr.doc_id, fr.frame_idx, fr.width, fr.height,
       cast(sum((3 * x.g + 7 * y.g + fr.doc_id % 251 + 11 * fr.frame_idx) % 256)
            AS bigint) AS pixel_sum
FROM frames fr
CROSS JOIN generate_series(0, 63) x(g)
CROSS JOIN generate_series(0, 47) y(g)
WHERE x.g < fr.width AND y.g < fr.height
GROUP BY fr.doc_id, fr.frame_idx, fr.width, fr.height
"""

SQL["t5_resumable_roundtrip"] = f"""
WITH {_TOK}, {_FRAME_WINDOWS}
SELECT doc_id, source, win_id, ts_start,
       cast(8 AS bigint) AS first_run_partitions,
       cast(0 AS bigint) AS resume_partitions
FROM frame
"""

SQL["m3_clean_text"] = r"""
WITH c AS (
  SELECT doc_id, text,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(lower(text), '\[[^\]]*\]', '', 'g'),
             '\b[0-9]+\b', '', 'g'),
           ' +', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT doc_id, clean_text,
       cast(length(text) - length(clean_text) AS bigint) AS n_chars_removed
FROM c
"""



# BM25 constants interpolated from the SAME Python doubles the engine
# computes at runtime (repr round-trips, DuckDB parses correctly-rounded
# double literals) — the op sequence below mirrors stages/text.bm25_topk
_K1 = 1.2
_B = 0.75
# multi-field boosted BM25 (text^2, source^1 — ES most_fields sum):
# each field keeps its own df / dl / total-token stats; the per-field
# quantizer constant is boost*scale computed in Python (2.0*2^20 and
# 1.0*2^20 are exact doubles) exactly as stages/text.bm25_topk does
_BM25_F0 = 2.0 * 1048576.0  # text boost 2
_BM25_F1 = 1.0 * 1048576.0  # source boost 1
SQL["t3_bm25"] = f"""
WITH tokb AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        w -> cast(length(w)*31 + coalesce(ascii(w), 0) AS int)) AS toks0,
         list_transform(string_split(source, ' '),
                        w -> cast(length(w)*31 + coalesce(ascii(w), 0) AS int)) AS toks1
  FROM documents
),
q(query_id, term) AS (VALUES (0, 209), (0, 173), (1, 128), (1, 209), (2, 173), (2, 128), (2, 239)),
stats AS (
  SELECT cast(count(*) AS bigint) AS n_docs,
         cast(sum(len(toks0)) AS bigint) AS tt0,
         cast(sum(len(toks1)) AS bigint) AS tt1
  FROM tokb
),
terms AS (SELECT DISTINCT term FROM q),
tft AS (
  SELECT terms.term, t.doc_id,
         cast(len(t.toks0) AS bigint) AS dl0,
         cast(len(t.toks1) AS bigint) AS dl1,
         cast(len(list_filter(t.toks0, x -> x = terms.term)) AS bigint) AS tf0,
         cast(len(list_filter(t.toks1, x -> x = terms.term)) AS bigint) AS tf1
  FROM tokb t CROSS JOIN terms
),
dfq AS (
  SELECT term,
         cast(count(*) FILTER (WHERE tf0 > 0) AS bigint) AS df0,
         cast(count(*) FILTER (WHERE tf1 > 0) AS bigint) AS df1
  FROM tft GROUP BY term
),
contrib AS (
  SELECT q.query_id, f.doc_id, f.tf0 + f.tf1 AS tf,
         cast(floor(
           (((s.n_docs - d.df0 + cast(0.5 AS double)) / (d.df0 + cast(0.5 AS double)))
            * (f.tf0 * cast({_K1 + 1.0!r} AS double))
            / (f.tf0 + cast({_K1!r} AS double)
               * (cast({1.0 - _B!r} AS double)
                  + cast({_B!r} AS double)
                    * (cast(f.dl0 AS double) * s.n_docs / s.tt0))))
           * cast({_BM25_F0!r} AS double)
         ) AS bigint)
         + cast(floor(
           (((s.n_docs - d.df1 + cast(0.5 AS double)) / (d.df1 + cast(0.5 AS double)))
            * (f.tf1 * cast({_K1 + 1.0!r} AS double))
            / (f.tf1 + cast({_K1!r} AS double)
               * (cast({1.0 - _B!r} AS double)
                  + cast({_B!r} AS double)
                    * (cast(f.dl1 AS double) * s.n_docs / s.tt1))))
           * cast({_BM25_F1!r} AS double)
         ) AS bigint) AS c
  FROM q
  JOIN tft f ON f.term = q.term
  JOIN dfq d ON d.term = q.term
  CROSS JOIN stats s
),
perdoc AS (
  SELECT query_id, doc_id, cast(sum(c) AS bigint) AS score_q, sum(tf) AS tf_tot
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_q,
         cast(row_number() OVER (
           PARTITION BY query_id ORDER BY score_q DESC, doc_id
         ) AS bigint) AS rank
  FROM perdoc WHERE tf_tot > 0
)
SELECT query_id, doc_id, score_q, rank FROM ranked WHERE rank <= 10
"""


SQL["j4_qrels_eval"] = f"""
WITH {_TOK},
q(query_id, term) AS (VALUES (0, 209), (1, 128), (2, 173)),
counts AS (
  SELECT q.query_id, t.doc_id,
         cast(len(list_filter(t.tokens, x -> x = q.term)) AS bigint) AS score
  FROM tok t CROSS JOIN q
),
ranked AS (
  SELECT query_id, doc_id, score,
         cast(row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id
         ) AS bigint) AS rank
  FROM counts WHERE score > 0
),
results AS (SELECT query_id, doc_id FROM ranked WHERE rank <= 10),
qrels AS (SELECT query_id, doc_id FROM counts WHERE score >= 2)
SELECT r.query_id,
       cast(count(*) AS bigint) AS n_retrieved,
       cast(sum(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_relevant_retrieved,
       sum(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END) / 10.0 AS p_at_10
FROM results r
LEFT JOIN qrels g ON r.query_id = g.query_id AND r.doc_id = g.doc_id
GROUP BY r.query_id
"""

SQL["s12_dead_letter"] = """
SELECT event_id,
       cast(CASE WHEN value >= 0
                 THEN floor(value * 100.0 + 0.5)
                 ELSE -floor(-value * 100.0 + 0.5) END AS bigint) AS value_cents,
       (SELECT cast(count(*) AS bigint) FROM events WHERE event_id % 97 = 13)
         AS n_dead_total
FROM events WHERE event_id % 97 <> 13
"""


SQL["contamination_check_q"] = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
mx AS (SELECT max(len(w)) AS m FROM ws),
idx AS (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS i),
grams AS (
  SELECT ws.doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
  FROM ws CROSS JOIN idx WHERE i + 2 <= len(w)
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 13 = 0),
tr AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 13 <> 0)
SELECT cast(doc_id AS bigint) AS doc_id,
       cast(count(*) AS bigint) AS n_grams,
       cast(count(*) FILTER (WHERE g IN (SELECT g FROM ev)) AS bigint) AS n_contam
FROM tr GROUP BY doc_id
"""

SQL["unk_remap"] = f"""
WITH {_TOK},
flat AS (SELECT doc_id, source, cast(unnest(tokens) AS bigint) AS token FROM tok),
cnt AS (SELECT token, count(*) AS n FROM flat GROUP BY token),
ranked AS (SELECT token, row_number() OVER (ORDER BY n DESC, token) AS rank FROM cnt),
vocab AS (SELECT token FROM ranked WHERE rank <= 16)
SELECT doc_id, source, cast(count(*) AS bigint) AS n_tok,
       cast(count(*) FILTER (WHERE token NOT IN (SELECT token FROM vocab)) AS bigint) AS n_unk
FROM flat GROUP BY doc_id, source
"""


SQL["repetition_signals_q"] = """
WITH tok AS (
  SELECT cast(doc_id AS varchar) AS doc_id,
         list_transform(string_split(text, ' '),
                        w -> cast(length(w)*31 + coalesce(ascii(w), 0) AS int)) AS tokens
  FROM documents
),
t AS (
  SELECT doc_id, len(tokens) AS L,
         cast(unnest(tokens) AS bigint) AS tok,
         generate_subscripts(tokens, 1) AS pos
  FROM tok WHERE len(tokens) >= 3
),
big AS (
  SELECT a.doc_id, a.L, a.tok AS t0, b.tok AS t1
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bcnt AS (SELECT doc_id, L, t0, t1, cast(count(*) AS bigint) AS n FROM big GROUP BY 1,2,3,4),
btop AS (
  SELECT doc_id, L, t0, t1, n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, t0, t1) AS rk
  FROM bcnt
),
tri AS (
  SELECT a.doc_id, a.tok AS t0, b.tok AS t1, c.tok AS t2
  FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           JOIN t c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
tcnt AS (SELECT doc_id, t0, t1, t2, cast(count(*) AS bigint) AS n FROM tri GROUP BY 1,2,3,4),
tdup AS (
  SELECT doc_id,
         cast(coalesce(sum(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS bigint) AS dup_n
  FROM tcnt GROUP BY 1
)
SELECT b.doc_id,
       cast(b.L AS bigint) AS n_tok,
       b.t0 AS top_bigram_a,
       b.t1 AS top_bigram_b,
       b.n AS top_bigram_n,
       cast(b.n AS double) / cast(b.L - 1 AS double) AS top_bigram_frac,
       d.dup_n AS dup_trigram_n,
       cast(d.dup_n AS double) / cast(b.L - 2 AS double) AS dup_trigram_frac
FROM btop b JOIN tdup d USING (doc_id)
WHERE b.rk = 1
"""


SQL["audio_frame_energy"] = """
WITH syn AS (
  SELECT cast(doc_id AS varchar) AS doc_id,
         1 + cast(doc_id AS bigint) % 97 AS a,
         cast(doc_id AS bigint) % 251 AS b,
         800 + (cast(doc_id AS bigint) * 37) % 800 AS n
  FROM documents
),
samp AS (
  SELECT doc_id, n AS L,
         list_transform(range(0, n), j -> cast((a * j + b) % 65536 AS int)) AS tokens
  FROM syn
),
win AS (
  SELECT doc_id, tokens, L,
         unnest(range(0, cast(ceil(L / 80.0) AS bigint))) AS win_id
  FROM samp
),
frame AS (
  SELECT doc_id, win_id, win_id * 80 AS ts_start,
         least(win_id * 80 + 160, L) AS ts_end,
         tokens[win_id * 80 + 1 : least(win_id * 80 + 160, L)] AS seg_tokens
  FROM win
),
agg AS (
  SELECT doc_id, win_id, ts_start, ts_end,
         cast(len(seg_tokens) AS bigint) AS n_tokens,
         cast(list_aggregate(list_transform(seg_tokens, x -> cast(x AS bigint)), 'sum') AS bigint) AS tok_sum,
         cast(list_aggregate(list_transform(seg_tokens, x -> cast(x AS bigint) * cast(x AS bigint)), 'sum') AS bigint) AS tok_sq,
         cast(list_aggregate(seg_tokens, 'max') AS bigint) AS tok_max,
         cast(list_aggregate(seg_tokens, 'min') AS bigint) AS tok_min
  FROM frame
)
SELECT doc_id, win_id, ts_start, ts_end, n_tokens, tok_sum,
       tok_sum / n_tokens AS tok_mean,
       sqrt(greatest(tok_sq / n_tokens - (tok_sum / n_tokens) * (tok_sum / n_tokens), 0.0)) AS tok_std,
       tok_max, tok_min
FROM agg
"""

SQL["dup_span_grams_q"] = """
WITH tok AS (
  SELECT cast(doc_id AS varchar) AS doc_id,
         list_transform(string_split(text, ' '),
                        w -> cast(length(w)*31 + coalesce(ascii(w), 0) AS int)) AS tokens
  FROM documents
),
t AS (SELECT doc_id, tokens, len(tokens) AS L FROM tok WHERE len(tokens) >= 6),
pos AS (SELECT doc_id, tokens, unnest(range(0, L - 5)) AS i FROM t),
g AS (
  SELECT doc_id,
         cast(tokens[i+1] AS bigint) * 1125899906842624
       + cast(tokens[i+2] AS bigint) * 1099511627776
       + cast(tokens[i+3] AS bigint) * 1073741824
       + cast(tokens[i+4] AS bigint) * 1048576
       + cast(tokens[i+5] AS bigint) * 1024
       + cast(tokens[i+6] AS bigint) AS gram
  FROM pos
),
agg AS (
  SELECT gram,
         cast(count(DISTINCT doc_id) AS bigint) AS n_docs,
         cast(count(*) AS bigint) AS n_occurrences
  FROM g GROUP BY 1
),
rk AS (
  SELECT gram, n_docs, n_occurrences,
         row_number() OVER (ORDER BY n_docs DESC, n_occurrences DESC, gram) AS r
  FROM agg WHERE n_docs >= 2
)
SELECT gram, n_docs, n_occurrences, cast(r AS bigint) AS rank
FROM rk WHERE r <= 100
"""

SQL["grouped_topk_docs"] = """
WITH rk AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS r
  FROM documents
)
SELECT doc_id, source, n_chars, cast(r AS bigint) AS rank
FROM rk WHERE r <= 3
"""

SQL["quantiles_by_source"] = """
WITH c AS (
  SELECT source, cast(n_chars AS bigint) AS v, count(*) AS cnt
  FROM documents GROUP BY 1, 2
),
w AS (
  SELECT source, v,
         sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
         sum(cnt) OVER (PARTITION BY source) AS tot
  FROM c
),
p AS (SELECT unnest([25, 50, 75, 99]) AS pct)
SELECT w.source, cast(p.pct AS bigint) AS pct, cast(min(w.v) AS bigint) AS value
FROM w CROSS JOIN p
WHERE cast(w.cum AS double) >= ceil(p.pct * cast(w.tot AS double) / 100.0)
GROUP BY 1, 2
"""



SQL["ordered_export"] = """
SELECT doc_id, cast(n_chars AS int) AS n_chars,
       cast(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS bigint) AS seq
FROM documents
"""

SQL["curation_pipeline"] = """
WITH w AS (
  SELECT doc_id, source, text, string_split(lower(text), ' ') AS words
  FROM documents
),
q AS (
  SELECT doc_id, source, text,
         cast(len(words) AS bigint) AS n_words,
         cast(len(list_filter(words, x -> x IN
           ('the','a','an','and','or','of','to','in','is','are','was','were',
            'be','been','it','this','that','for','on','with','as','at','by'))) AS bigint) AS n_stop,
         cast(list_aggregate(list_transform(words, x -> cast(length(x) AS bigint)), 'sum') AS bigint) AS sum_len
  FROM w
),
gated AS (
  SELECT doc_id, source, text, n_words
  FROM q
  WHERE n_stop / n_words > 0.09 AND n_words >= 50
    AND sum_len / n_words >= 3.0 AND sum_len / n_words <= 12.0
    AND CASE source
          WHEN 'src0' THEN TRUE
          WHEN 'src1' THEN substr(md5(cast(doc_id AS varchar)), 1, 2) < '10'
          ELSE substr(md5(cast(doc_id AS varchar)), 1, 2) < '40'
        END
)
SELECT md5(text) AS text_hash,
       cast(min(cast(doc_id AS bigint)) AS bigint) AS keep_doc_id,
       cast(count(*) AS bigint) AS n_dups,
       cast(min(n_words) AS bigint) AS n_words
FROM gated
GROUP BY md5(text)
"""
