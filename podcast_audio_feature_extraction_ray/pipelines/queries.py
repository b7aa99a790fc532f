"""The operator catalog: one callable per implemented operator/pipeline
(SURVEY §2 inventory), each taking ``sf_dir`` and returning a Dataset /
pandas DataFrame / pyarrow Table.

Every query here has a matching ANSI-SQL oracle in ``sql_oracles.py``
(or is explicitly rows-only for non-SQL-expressible ops); column names
and numeric formulas are kept in lock-step with the SQL — float results
are produced by the IDENTICAL sequence of IEEE double ops on exact
integers so value-hashes match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray.sources.token_table import documents_to_tokens
from podcast_audio_feature_extraction_ray.stages import asof, segment as seg, topk
from podcast_audio_feature_extraction_ray.stages.sessionize import sessionize_events
from podcast_audio_feature_extraction_ray.functions import scalar

FRAME_Q = WindowSpec(16, 8, "frame")
SEG_Q = WindowSpec(24, 12, "segment")
GT_THRESHOLD = 300
MATCH_TOKEN = 209  # "the" -> 3*31 + ord('t')

WIN_COLS = ["doc_id", "source", "win_id", "ts_start", "ts_end", "seg_tokens"]


def _docs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])


def _tokens(sf_dir: str):
    return documents_to_tokens(_docs(sf_dir))


# ---------------------------------------------------------------- W1/W2/W3

def w1_frame_windows(sf_dir: str):
    """W1: stateless fixed-stride frames, zero shuffle, with bounded
    lag/lead context slices (the W2 lookahead generalized; reference
    ``data/custom_FrameModeFunctionals.conf.inc:8-11`` +
    ``src/features/YAMNetExtractor.py:78-95``)."""
    out = seg.segment_rows(_tokens(sf_dir), FRAME_Q, lag=8, lead=8)
    return out.select_columns(WIN_COLS + ["lag_tokens", "lead_tokens"])


def w2c_blockref_sessions(sf_dir: str):
    """W2 on the block-reference exchange (``payload="blockref"``,
    ``stages/segment.py``): token values stay in the ORIGINAL read blocks
    (no ray.put copy — pointers into registered block refs), hot-key
    discovery shares the same materialized blocks. Output must be
    bit-identical to W1, hash-verified against the same SQL oracle."""
    return seg.segment_sessions(
        _tokens(sf_dir), FRAME_Q, payload="blockref", num_buckets=32
    ).select_columns(WIN_COLS)


def w3_segment_windows(sf_dir: str):
    """W3: inclusive-bound transcript-style segments + per-window counts
    (reference ``src/search/index.py:55-110``)."""
    out = seg.segment_rows(_tokens(sf_dir), SEG_Q, with_aggregates=True)
    return out.select_columns(WIN_COLS + ["n_tokens", "n_distinct"])


def g_window_aggs(sf_dir: str):
    """G1-G7 aggregate + functional family per frame window
    (reference ``src/search/metrics.py:8-57``; percentile/slope
    functionals from the eGeMAPS family,
    ``src/features/OpenSmileExtractor.py:21-27``)."""
    out = seg.segment_rows(
        _tokens(sf_dir), FRAME_Q, with_aggregates=True, functionals=True,
        gt_threshold=GT_THRESHOLD, match_token=MATCH_TOKEN,
    )
    return out.select_columns(
        WIN_COLS
        + ["n_tokens", "n_distinct", "freq_gt", "match_count",
           "tok_sum", "tok_mean", "tok_std", "tok_max", "tok_min",
           "tok_p20", "tok_p50", "tok_p80", "tok_slope"]
    )


# ---------------------------------------------------------------- as-of / sessionize

def asof_backfill_events(sf_dir: str):
    """J3 point-in-time attach: each purchase gets the last click value
    at-or-before it, per user (reference zip-join
    ``src/search/search.py:112-116`` generalized to a true as-of join)."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type", "value"]
    )

    def to_us(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("ts"), "ts_us", batch["ts"].cast(pa.int64())
        )

    ev = ev.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts_us"]
    )
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["user_id", "ts_us", "value"]
    )
    out = asof.backfill_join(
        purchases, clicks, key=("user_id",), ts_col="ts_us", value_col="value",
        cutoff_col="ts_us",
    )

    def fill(batch: pa.Table) -> pa.Table:
        # M8 fillna over the join's nullable output
        # (reference ``src/search/search.py:162``)
        return batch.append_column(
            "bf_value_filled", pc.fill_null(batch["bf_value"], 0.0)
        )

    out = out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(
        ["event_id", "user_id", "ts_us", "bf_value", "bf_ts", "bf_value_filled"]
    )


def sessionize_events_q(sf_dir: str):
    """Gap-based sessionization (30 min) over the event log."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    out = sessionize_events(ev, ("user_id",), "ts", gap=pd.Timedelta("30min"))

    def to_us(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("ts"), "ts_us", batch["ts"].cast(pa.int64())
        )

    return out.map_batches(to_us, batch_format="pyarrow").select_columns(
        ["event_id", "user_id", "ts_us", "session_no"]
    )


# ---------------------------------------------------------------- joins / filters / topk

def m1_semi_join(sf_dir: str):
    """M1/J1 broadcast semi-join: lineitem of well-capitalized suppliers
    (reference ``create_opensmile_features.py:22-23``)."""
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    keys = set(
        sup.filter(expr="s_acctbal > 3000.0").to_pandas()["s_suppkey"].tolist()
    )  # small side: driver materialize + closure broadcast
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"],
    )
    key_arr = pa.array(sorted(keys), type=pa.int64())

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["l_suppkey"], value_set=key_arr))

    return li.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def t6_anti_join(sf_dir: str):
    """T6 anti-join resume analog: orders whose customer is NOT in the
    negative-balance set (reference ``src/search/index.py:124-160``)."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    bad = set(cust.filter(expr="c_acctbal < 0.0").to_pandas()["c_custkey"].tolist())
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    bad_arr = pa.array(sorted(bad), type=pa.int64())

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch["o_custkey"], value_set=bad_arr)))

    return orders.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def t1_topk(sf_dir: str):
    """T1 global top-k (reference ``src/search/search.py:355-358``)."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    return topk.top_k(orders, "o_totalprice", 10, tiebreak=["o_orderkey"])


def t2_topk_backfill(sf_dir: str):
    """T2 filter→top-k with rank-ordered backfill
    (reference ``src/search/search.py:360-455``)."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )
    return topk.top_k_backfill(
        orders, "o_totalprice", 10,
        predicate=lambda b: pc.equal(b["o_orderpriority"], "1-URGENT"),
        tiebreak=["o_orderkey"],
    )


def t4_stride_sample(sf_dir: str):
    """T4 every-k-th-within-first-m per entity
    (reference ``create_vggish_features.py:27`` ``[:6000:5]``).

    Ordered by the unique ``event_id`` so the slice is well-defined."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return topk.stride_sample(ev, ("user_id",), ("event_id",), first=60, step=5)


# ---------------------------------------------------------------- scalar fns

def scalar_functions(sf_dir: str):
    """The S3/M9 scalar-function family in ONE scan: shard-path
    derivation (reference ``src/data.py:16-23``) and segment-id
    format/parse round-trip (reference ``src/search/search.py:293-299``)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def f(batch: pa.Table) -> pa.Table:
        prefix = pc.binary_join_element_wise(
            pa.array(["show"] * batch.num_rows),
            pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), 6, "0"),
            "_",
        )
        base = pc.binary_join_element_wise(
            pa.array(["spotify:doc"] * batch.num_rows),
            pc.cast(batch["doc_id"], pa.string()),
            ":",
        )
        seg_id = scalar.format_segment_id(base, batch["n_chars"])
        uri, start = scalar.parse_segment_id(seg_id)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shard_path": scalar.shard_key(prefix),
                "seg_id": seg_id,
                "uri": uri,
                "seg_start": start,
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- grouped metrics (combiner pattern)

def _cents(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    # half-away-from-zero, matching DuckDB round() (pc.round defaults to
    # half-to-even: 112.5 -> 112 vs DuckDB 113)
    v = col.to_numpy(zero_copy_only=False) if not isinstance(col, pa.ChunkedArray) else col.combine_chunks().to_numpy(zero_copy_only=False)
    return (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)


def _grouped_cents_stats(sf_dir: str):
    """Pre-aggregate (combiner) inside map_batches, then a SMALL groupby —
    the shuffle only moves one row per (custkey, batch)."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"k": batch["o_custkey"].to_numpy(), "c": _cents(batch["o_totalprice"])}
        )
        g = df.groupby("k", sort=False)["c"]
        out = pd.DataFrame(
            {
                "o_custkey": g.sum().index.to_numpy(),
                "s": g.sum().to_numpy(),
                "s2": df.assign(c2=df.c * df.c).groupby("k", sort=False)["c2"].sum().to_numpy(),
                "mx": g.max().to_numpy(),
                "mn": g.min().to_numpy(),
                "n": g.count().to_numpy().astype(np.int64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    partials = orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("o_custkey").aggregate(
        Sum("s", alias_name="sum_cents"),
        Sum("s2", alias_name="sumsq_cents"),
        Max("mx", alias_name="max_cents"),
        Min("mn", alias_name="min_cents"),
        Sum("n", alias_name="n_orders"),
    )


def g6_g7_metrics(sf_dir: str):
    """G6 + G7 composite grouped metrics in ONE pass over the shared
    integer-cents combiner stats (reference ``src/search/metrics.py:33-57``)."""
    stats = _grouped_cents_stats(sf_dir)

    def final(batch: pa.Table) -> pa.Table:
        s = batch["sum_cents"].to_numpy().astype(np.int64)
        s2 = batch["sumsq_cents"].to_numpy().astype(np.int64)
        mx = batch["max_cents"].to_numpy().astype(np.int64)
        mn = batch["min_cents"].to_numpy().astype(np.int64)
        n = batch["n_orders"].to_numpy().astype(np.int64)
        mean = s / n
        std = np.sqrt(np.maximum(s2 / n - mean * mean, 0.0))
        debate = std / 142.52017 + 12.0 * mx / 0.0155821005
        disapproval = 2.0 * mean / 0.8239882 + mx / 556.0259 + mn / 1586.24
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "n_orders": pa.array(n),
                "debate_metric": pa.array(debate),
                "disapproval_metric": pa.array(disapproval),
            }
        )

    return stats.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def g4_thresholded_freq(sf_dir: str):
    """G4/G5 thresholded + match counts per group
    (reference ``src/search/metrics.py:8-30``)."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity", "l_linenumber"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": batch["l_orderkey"].to_numpy(),
                "hi": pc.greater(batch["l_quantity"], pa.scalar(45.0)).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
                "m1": pc.equal(batch["l_linenumber"], pa.scalar(1, pa.int32())).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
            }
        )
        g = df.groupby("k", sort=False).sum().reset_index()
        g["n"] = df.groupby("k", sort=False).size().to_numpy().astype(np.int64)
        return pa.Table.from_pandas(
            g.rename(columns={"k": "l_orderkey"}), preserve_index=False
        )

    from ray.data.aggregate import Sum

    return (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(
            Sum("hi", alias_name="freq_gt"),
            Sum("m1", alias_name="match_count"),
            Sum("n", alias_name="n_lines"),
        )
    )


def q1_agg(sf_dir: str):
    """Classic wide-group aggregate with exact integer cents (pre-agg
    combiner before the shuffle)."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "q": _cents(batch["l_quantity"]),
                "p": _cents(batch["l_extendedprice"]),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sq=("q", "sum"), sp=("p", "sum"), n=("q", "size")
        ).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sq", alias_name="sum_qty_cents"),
            Sum("sp", alias_name="sum_price_cents"),
            Sum("n", alias_name="n_rows"),
        )
    )


# ---------------------------------------------------------------- dedup family

def dedup_exact(sf_dir: str):
    """Exact dedup groups by content hash."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup.exact_dedup(docs)


def dedup_ngram_jaccard(sf_dir: str):
    """Exact within-block n-gram Jaccard near-dup pairs (integer threshold)."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return dedup.ngram_jaccard_pairs(docs, thresh_num=1, thresh_den=5)


def _pair_driver_max() -> int:
    """Candidate-pair count above which the LSH compositions switch
    from the broadcast-small-side path (collect pairs to the driver,
    ``ray.put`` the memberships) to the fully distributed path
    (``ngram_jaccard_verify_ds`` / ``neardup_clusters_ds`` — pairs stay
    a Dataset, resolution is joins + label propagation). The default
    keeps the driver collect comfortably under a GiB; a 30-50 %-dup
    crawl at corpus scale crosses it and runs distributed."""
    import os

    return int(os.environ.get("TOKWIN_PAIR_DRIVER_MAX") or 5_000_000)


def dedup_minhash_lsh(sf_dir: str):
    """The full MinHash+LSH near-dup pipeline, end to end: banded LSH
    candidates (recall) → exact n-gram Jaccard verification (precision)
    → cluster resolution → per-doc (cluster_id, keep). Rows-only (LSH
    banding and transitive closure aren't SQL-expressible); every stage
    is loop-oracle tested in tests/test_trainops.py. Above
    ``_pair_driver_max()`` candidate pairs the verification and
    clustering run fully distributed (pairs never land on the driver)."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    docs = _docs(sf_dir)
    cands_ds = dedup.minhash_lsh_pairs(docs, est_threshold=0.3).materialize()
    docs2 = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    if cands_ds.count() <= _pair_driver_max():
        cands = cands_ds.to_pandas()
        ver = dedup.ngram_jaccard_verify(_docs(sf_dir), cands).to_pandas()
        passing = ver[5 * ver["inter_n"] >= 1 * ver["union_n"]][["a", "b"]]
        return dedup.neardup_clusters(docs2, passing)
    ver_ds = dedup.ngram_jaccard_verify_ds(_docs(sf_dir), cands_ds)

    def passing_filter(batch: pa.Table) -> pa.Table:
        inter = batch["inter_n"].to_numpy(zero_copy_only=False)
        union = batch["union_n"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(5 * inter >= union)).select(["a", "b"])

    passing_ds = ver_ds.map_batches(
        passing_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    return dedup.neardup_clusters_ds(docs2, passing_ds)


def dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs, hamming <= 3 (rows-only)."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup.simhash_pairs(docs)


# ---------------------------------------------------------------- similarity search

def _query_vectors(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], 4))
    q = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    return q, t["vec_id"].to_numpy(zero_copy_only=False)


def ann_cosine_topk(sf_dir: str):
    """Brute-force cosine top-5 for 4 query vectors (broadcast matmul)."""
    from podcast_audio_feature_extraction_ray.stages import ann

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir)
    return ann.cosine_topk(emb, q, qids, k=5)


def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate top-5 (rows-only; recall tested vs brute)."""
    from podcast_audio_feature_extraction_ray.stages import ann

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir)
    return ann.lsh_bucketed_topk(emb, q, qids, k=5)


def ann_ivf_topk(sf_dir: str):
    """IVF approximate top-5 (coarse k-means quantizer trained on a
    bounded sample; rows-only — recall tested vs brute force)."""
    from podcast_audio_feature_extraction_ray.stages import ann

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir)
    return ann.ivf_topk(emb, q, qids, k=5)


def emb_neardup_toppairs(sf_dir: str):
    """Per-label top-3 most-similar embedding pairs."""
    from podcast_audio_feature_extraction_ray.stages import ann

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    return ann.neardup_toppairs(emb, top_n=3)


# ---------------------------------------------------------------- text analysis

def lang_quality(sf_dir: str):
    from podcast_audio_feature_extraction_ray.stages import text as t

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.lang_quality(docs)


def token_count(sf_dir: str):
    from podcast_audio_feature_extraction_ray.stages import text as t

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.token_count(docs)


def doc_fingerprint(sf_dir: str):
    """Winnowing rolling-hash fingerprints (rows-only)."""
    from podcast_audio_feature_extraction_ray.stages import text as t

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.doc_fingerprint(docs)


# ---------------------------------------------------------------- multimodal (stubbed decode)

def multimodal_decode(sf_dir: str):
    """Binary payload plumbing + stubbed actor-pool decode. The decoded
    header fields (width/height/n_frames) are pure arithmetic on doc_id,
    so this IS oracle-verified; the byte-histogram media_embedding stays
    pytest-checked (tests/test_trainops.py)."""
    from podcast_audio_feature_extraction_ray.stages import multimodal as mm

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = mm.decode_media(mm.attach_fake_payload(docs))
    return out.select_columns(["doc_id", "media_type", "width", "height", "n_frames"])


# ---------------------------------------------------------------- more reference ops

def multimodal_png_decode(sf_dir: str):
    """REAL codec path: synthesize an actual PNG per doc (stdlib-zlib
    encoder), decode it with the pure-numpy PNG decoder in the actor
    pool, and emit fields the oracle recomputes from doc_id arithmetic —
    width/height from the size rule and pixel_sum over the deterministic
    gradient ``(3x + 7y + doc_id % 251) % 256`` (the SQL does the same
    double generate_series sum)."""
    from podcast_audio_feature_extraction_ray.stages import multimodal as mm

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    out = mm.decode_media(mm.attach_png_payload(docs), want_real=True)
    return out.select_columns(["doc_id", "width", "height", "pixel_sum"])


def multimodal_frame_sample(sf_dir: str):
    """Real frame-sampling pipeline: multi-frame motion-PNG payloads →
    per-frame explode with stride 2 (skipped frames are never inflated)
    → REAL per-frame PNG decode in the actor pool. The oracle recomputes
    each sampled frame's geometry and pixel_sum from doc_id arithmetic."""
    from podcast_audio_feature_extraction_ray.stages import multimodal as mm

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    sampled = mm.frame_sample(mm.attach_video_payload(docs), every=2)
    out = mm.decode_media(sampled, want_real=True)
    return out.select_columns(["doc_id", "frame_idx", "width", "height", "pixel_sum"])


def s4_json_extract(sf_dir: str):
    """S4 JSON tree navigation analog (reference ``src/data.py:50-62``):
    pull ``k`` out of the events ``props`` JSON column (regex kernel —
    identical RE2 semantics in Arrow and DuckDB), plus the M2 numeric
    normalize map (reference stereo→mono + /32768.0,
    ``src/features/YAMNetExtractor.py:70``) in the same scan."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "props", "value"]
    )

    def f(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch["props"], r'"k": (?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        return pa.table(
            {
                "event_id": batch["event_id"],
                "k": k,
                "norm_value": pc.divide(batch["value"], pa.scalar(32768.0)),
            }
        )

    return ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def w4_point_lookup(sf_dir: str):
    """W4 ranged window fetch + J2 broadcast hash lookup in one scan:
    re-derive one window from (entity, start_tick) alone (reference
    ``src/search/search.py:301-353``) and attach per-doc metadata via a
    broadcast sorted id→value array resolved with ONE vectorized
    searchsorted per batch (reference ``src/search/search.py:296-298``)."""
    import pyarrow.parquet as pq

    import ray as _ray

    toks = _tokens(sf_dir)
    start, width = 16, 16
    meta = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    mids = meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mvals = meta["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    morder = np.argsort(mids, kind="stable")
    ref = _ray.put((mids[morder], mvals[morder]))

    def f(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64())
        keep = pc.equal(pc.bit_wise_and(ids, 7), 0)  # doc_id % 8 == 0
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.string()),
                 "seg_tokens": pa.array([], type=pa.list_(pa.int32())),
                 "n_chars": pa.array([], type=pa.int64())}
            )
        from podcast_audio_feature_extraction_ray.arrow_utils import list_buffers, list_array
        values, offsets = list_buffers(b["tokens"])
        lens = np.diff(offsets)
        lo = np.minimum(start, lens)
        hi = np.minimum(start + width, lens)
        from podcast_audio_feature_extraction_ray.kernels import concat_ranges
        idx, out_off = concat_ranges(offsets[:-1] + lo, hi - lo)
        ids_s, vals_s = _ray.get(ref)
        bi = pc.cast(b["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ids_s, bi), 0, max(len(ids_s) - 1, 0))
        hit = ids_s[pos] == bi
        nch = np.where(hit, vals_s[pos], -1)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "seg_tokens": list_array(values[idx], out_off),
                "n_chars": pa.array(nch),
            }
        )

    return toks.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def g8_collect(sf_dir: str):
    """G8 grouped collect/export (reference ``create_vggish_features.py:17-32``):
    ordered doc_id list per source."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def per_source(group: pa.Table) -> pa.Table:
        # vectorized in-group work: numpy sort + one ListArray wrap —
        # no Python per element (a source can hold billions of ids)
        ids = np.sort(group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        # int64 offsets: a source can hold > 2^31 ids, which would
        # overflow plain ListArray's int32 offsets
        lst = pa.LargeListArray.from_arrays(
            pa.array([0, len(ids)], type=pa.int64()), pa.array(ids)
        )
        return pa.table(
            {
                "source": group["source"].slice(0, 1),
                "doc_ids": lst,
                "n_docs": pa.array([len(ids)], type=pa.int64()),
            }
        )

    return docs.groupby("source").map_groups(per_source, batch_format="pyarrow")


def j2_point_lookup(sf_dir: str):
    """J2 id→metadata hash lookup via broadcast map
    (reference ``src/search/search.py:296-298``)."""
    import pyarrow.parquet as pq

    meta = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    import ray as _ray

    # broadcast a sorted id -> value array; batches resolve with ONE
    # vectorized searchsorted (no per-row dict lookups)
    ids = meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = meta["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ref = _ray.put((ids[order], vals[order]))
    ev_docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    class Lookup:
        def __init__(self):
            self.ids, self.vals = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.ids, q)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "source": batch["source"],
                    "n_chars": pa.array(self.vals[pos], type=pa.int64()),
                }
            )

    return ev_docs.map_batches(Lookup, batch_format="pyarrow", concurrency=2)


def j5_hash_join(sf_dir: str):
    """Large-large hash join via Dataset.join (orders ⋈ customer)."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    j = orders.join(cust, join_type="inner", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",))
    return j.select_columns(["o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"])


def sessionize_assemble(sf_dir: str):
    """Session assembly summary: per (doc_id, source) stream length and
    row count (sessionize stage, tokens dropped for the compare)."""
    from podcast_audio_feature_extraction_ray.stages.sessionize import assemble_sessions

    out = assemble_sessions(_tokens(sf_dir))
    return out.select_columns(["doc_id", "source", "n_tok", "n_rows"])


def t5_resumable_roundtrip(sf_dir: str):
    """T5 resumable sink: write hash-partitioned windows with manifests
    to scratch, resume (0 pending), read back (rows-only; resume
    byte-identity is pytest-verified)."""
    import shutil
    import tempfile

    from podcast_audio_feature_extraction_ray.state import manifest as mf

    out_dir = tempfile.mkdtemp(prefix="tokwin_t5_")
    try:
        win = seg.segment_rows(_tokens(sf_dir), FRAME_Q, key_cols=("doc_id", "source"))
        n1 = mf.write_resumable(win, out_dir, key_cols=("doc_id", "source"), num_partitions=8)
        win2 = seg.segment_rows(_tokens(sf_dir), FRAME_Q, key_cols=("doc_id", "source"))
        n2 = mf.write_resumable(win2, out_dir, key_cols=("doc_id", "source"), num_partitions=8)
        back = mf.read_output(out_dir).select_columns(["doc_id", "source", "win_id", "ts_start"])
        df = back.to_pandas()
        df["first_run_partitions"] = np.int64(n1)
        df["resume_partitions"] = np.int64(n2)
        return df
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def m7_mood_filter(sf_dir: str):
    """M6/M7 compound mood-predicate filter over window aggregates
    (reference ``src/search/search.py:368-437``)."""
    out = seg.segment_rows(
        _tokens(sf_dir), FRAME_Q, with_aggregates=True, emit_tokens=False,
        gt_threshold=GT_THRESHOLD, match_token=MATCH_TOKEN,
    )

    def f(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(batch["tok_mean"], pa.scalar(250.0)),
            pc.less(batch["n_distinct"], pa.scalar(15, pa.int64())),
        )
        b = batch.filter(keep)
        return b.select(["doc_id", "source", "win_id", "ts_start", "n_tokens",
                         "n_distinct", "tok_mean"])

    return out.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def tumbling_window_agg(sf_dir: str):
    """Event-time tumbling (1h) window aggregates per user."""
    from podcast_audio_feature_extraction_ray.stages.timewin import tumbling_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return tumbling_aggregate(ev, "user_id", "ts", "value", width_us=3_600_000_000)


def hopping_window_agg(sf_dir: str):
    """Event-time hopping windows (1h width, 30min hop) per user."""
    from podcast_audio_feature_extraction_ray.stages.timewin import tumbling_aggregate

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return tumbling_aggregate(
        ev, "user_id", "ts", "value", width_us=3_600_000_000, hop_us=1_800_000_000
    )


def distinct_values(sf_dir: str):
    """Set op: distinct (source, lang) combos with counts over documents."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": batch["source"].to_pandas(), "lang": batch["lang"].to_pandas()})
        g = df.groupby(["source", "lang"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def range_join_count(sf_dir: str):
    """Range join: events falling inside each order's first 24h window."""
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    ev_df = pd.DataFrame({"ts_us": ev["ts"].cast(pa.int64()).to_numpy()})
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])

    def prep(batch: pa.Table) -> pa.Table:
        lo = batch["o_orderdate"].cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "lo_us": lo,
                "hi_us": pc.add(lo, pa.scalar(86_400_000_000, pa.int64())),
            }
        )

    prepped = orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = asof.range_count_broadcast(prepped, ev_df)
    return out.select_columns(["o_orderkey", "lo_us", "n_in_range"])


def session_window_rollup(sf_dir: str):
    """Second-stage aggregation: per-session rollup of window features
    (exact integer sums so the oracle hash-matches)."""
    win = seg.segment_rows(
        _tokens(sf_dir), FRAME_Q, with_aggregates=True, emit_tokens=False,
        gt_threshold=GT_THRESHOLD, match_token=MATCH_TOKEN,
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_pandas(),
                "source": batch["source"].to_pandas(),
                "w": np.ones(batch.num_rows, dtype=np.int64),
                "toks": batch["n_tokens"].to_numpy(zero_copy_only=False),
                "s": batch["tok_sum"].to_numpy(zero_copy_only=False),
                "fg": batch["freq_gt"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["doc_id", "source"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    rolled = (
        win.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["doc_id", "source"])
        .aggregate(
            Sum("w", alias_name="n_windows"),
            Sum("toks", alias_name="sum_window_tokens"),
            Sum("s", alias_name="sum_tok_sum"),
            Sum("fg", alias_name="sum_freq_gt"),
        )
    )
    return rolled


T3_QUERIES = {0: 209, 1: 128, 2: 173}  # "the", "a", "of" token ids
BM25_QUERIES = {0: [209, 173], 1: [128, 209], 2: [173, 128, 239]}  # multi-term


def t3_bm25(sf_dir: str):
    """T3 with a REAL lexical scorer: multi-field boosted Okapi BM25
    over the toy-tokenizer terms — the self-contained replacement for
    the reference's external ES ``multi_match`` with field boosts
    (``src/search/search.py:177-183`` boosts ``seg_words^2, epis_name,
    epis_desc``; here ``text^2, source^1``, ES ``most_fields`` sum
    semantics): per-(field, term) df / corpus stats from one bounded
    partial shuffle, broadcast; scoring streams the corpus once with a
    local top-k prune; int64-quantized contributions make the DuckDB
    oracle bit-exact. Term 239 ("src0".."src9") scores via the source
    field, so the multi-field path is exercised by the driver compare."""
    from podcast_audio_feature_extraction_ray.stages.text import bm25_topk

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return bm25_topk(
        docs, BM25_QUERIES, k=10, fields=[("text", 2.0), ("source", 1.0)]
    )


def t3_scored_source(sf_dir: str):
    """T3 analog: the external search engine modeled as a SCORED SOURCE —
    each (query, doc) candidate carries a deterministic relevance score
    (term-frequency proxy), then top-10 per query with ranks (reference
    ES retrieve-then-rerank, ``src/search/search.py:296-358``). Per-batch
    local top-k pruning bounds the merge input to k-ish rows per query
    per batch; ties at the cut are kept so the global (score desc,
    doc_id asc) order is exact."""
    from podcast_audio_feature_extraction_ray.arrow_utils import list_buffers

    K = 10
    toks = _tokens(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        values, offsets = list_buffers(batch["tokens"])
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        qs, ds_, ss = [], [], []
        for qid, term in T3_QUERIES.items():
            eq = (values == term).astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(eq)])
            cnt = cs[offsets[1:]] - cs[offsets[:-1]]
            nz = np.flatnonzero(cnt > 0)
            if len(nz) > K:  # keep score ties at the boundary (exactness)
                kth = -np.partition(-cnt[nz], K - 1)[K - 1]
                nz = nz[cnt[nz] >= kth]
            qs.append(np.full(len(nz), qid, dtype=np.int64))
            ds_.append(doc[nz])
            ss.append(cnt[nz])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs)),
                "doc_id": pa.array(np.concatenate(ds_)),
                "score": pa.array(np.concatenate(ss).astype(np.int64)),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(K).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    cand = toks.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return cand.groupby("query_id").map_groups(merge, batch_format="pandas")


def j4_qrels_eval(sf_dir: str):
    """J4 qrels evaluation join (reference trec_eval usage): join the
    T3 scored-source run against a relevance set (docs with term count
    >= 2 for the query) and compute per-query precision@10. The qrels
    side is broadcast (eval sets are small); the single division is the
    identical IEEE op in the SQL oracle."""
    results = t3_scored_source(sf_dir).to_pandas()
    from podcast_audio_feature_extraction_ray.arrow_utils import list_buffers

    toks = _tokens(sf_dir)

    def qrels_batch(batch: pa.Table) -> pa.Table:
        values, offsets = list_buffers(batch["tokens"])
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        qs, ds_ = [], []
        for qid, term in T3_QUERIES.items():
            eq = (values == term).astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(eq)])
            cnt = cs[offsets[1:]] - cs[offsets[:-1]]
            rel = np.flatnonzero(cnt >= 2)
            qs.append(np.full(len(rel), qid, dtype=np.int64))
            ds_.append(doc[rel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs)),
                "doc_id": pa.array(np.concatenate(ds_)),
            }
        )

    qrels = (
        toks.map_batches(qrels_batch, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    # vectorized set membership: merge the (query, doc) pairs on one
    # sorted composite key (query ids are tiny ints, doc ids int64 —
    # qid * 2^48 + doc cannot collide for doc < 2^48)
    enc = lambda q, d: q.astype(np.int64) * np.int64(1 << 48) + d.astype(np.int64)
    rel_keys = np.sort(enc(qrels.query_id.to_numpy(), qrels.doc_id.to_numpy()))
    run_keys = enc(results.query_id.to_numpy(), results.doc_id.to_numpy())
    if len(rel_keys):
        pos = np.clip(np.searchsorted(rel_keys, run_keys), 0, len(rel_keys) - 1)
        hits = (rel_keys[pos] == run_keys).astype(np.int64)
    else:
        hits = np.zeros(len(run_keys), dtype=np.int64)
    out = (
        pd.DataFrame(
            {"query_id": results.query_id.to_numpy(), "hit": hits}
        )
        .groupby("query_id", sort=True)
        .agg(n_retrieved=("hit", "size"), n_relevant_retrieved=("hit", "sum"))
        .reset_index()
    )
    out["n_retrieved"] = out["n_retrieved"].astype(np.int64)
    out["n_relevant_retrieved"] = out["n_relevant_retrieved"].astype(np.int64)
    out["p_at_10"] = out["n_relevant_retrieved"].to_numpy(dtype=np.float64) / 10.0
    return out


def vocab_topk(sf_dir: str, k: int = 50):
    """Corpus vocabulary builder (the BPE-prep shape): global token
    frequencies via per-batch ``bincount`` partials (token ids are a
    bounded vocab, so each batch contributes at most |vocab| rows no
    matter how many tokens it holds) → small groupby → top-50 by
    (count desc, token asc). The canonical pre-aggregation pattern: the
    shuffle moves per-batch partial counts, never tokens."""
    from podcast_audio_feature_extraction_ray.arrow_utils import list_buffers

    toks = _tokens(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        values, _ = list_buffers(batch["tokens"])
        if len(values) == 0:
            return pa.table(
                {"token": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        counts = np.bincount(values.astype(np.int64))
        nz = np.flatnonzero(counts)
        return pa.table({"token": pa.array(nz), "n": pa.array(counts[nz])})

    from ray.data.aggregate import Sum

    totals = (
        toks.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n_occurrences"))
    )
    out = topk.top_k(totals, "n_occurrences", k, tiebreak=["token"])
    # rank the k-row result driver-side (the top-k output can span
    # multiple blocks, and a per-block rank would restart at 1)
    df = out.to_pandas()
    df = df.sort_values(
        ["n_occurrences", "token"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df


def quality_filter(sf_dir: str):
    """Quality-filter composition (the C4-style keep/drop gate): keep
    docs that look English and well-formed — stop_ratio > 0.09,
    n_words >= 50, 3.0 <= mean_word_len <= 12.0 — emitting the kept ids
    with their scores. Float comparisons use the identical single
    divisions as the SQL oracle."""
    from podcast_audio_feature_extraction_ray.stages.text import lang_quality

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    q = lang_quality(docs)

    def keep(batch: pa.Table) -> pa.Table:
        sr = batch["stop_ratio"].to_numpy(zero_copy_only=False)
        nw = batch["n_words"].to_numpy(zero_copy_only=False)
        ml = batch["mean_word_len"].to_numpy(zero_copy_only=False)
        m = (sr > 0.09) & (nw >= 50) & (ml >= 3.0) & (ml <= 12.0)
        return batch.filter(pa.array(m)).select(
            ["doc_id", "n_words", "stop_ratio", "mean_word_len"]
        )

    return q.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def contamination_check_q(sf_dir: str):
    """Benchmark-decontamination primitive (GPT-3 appendix C / C4 rule):
    per TRAIN doc, distinct word 3-grams and how many also occur in the
    EVAL split (``doc_id % 13 == 0`` — a deterministic stand-in for a
    held-out benchmark). Eval gram-hash set reduced per batch, collected
    once, broadcast via ``ray.put``; train side streams one map_batches
    (``stages/contam.py``). Counts use 64-bit gram hashes; the string-
    based SQL oracle matches barring 2^-64 collisions."""
    from podcast_audio_feature_extraction_ray.stages import contam

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def split(want_eval: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((ids % 13 == 0) == want_eval))

        return fn

    ev = docs.map_batches(split(True), batch_format="pyarrow", zero_copy_batch=True)
    tr = docs.map_batches(split(False), batch_format="pyarrow", zero_copy_batch=True)
    grams = contam.eval_gram_hashes(ev, n=3)
    return contam.contamination_check(tr, grams, n=3)


def unk_remap(sf_dir: str):
    """Rare-token -> UNK remap counts (the vocabulary-pruning step before
    training): build the top-16 vocabulary (same ranking as
    ``vocab_topk``), broadcast the sorted token ids via ``ray.put``, and
    stream the token table once counting per doc how many tokens fall
    outside the vocabulary — one ``searchsorted`` per batch, per-row
    counts by offset-diff of a cumulative sum (zero Python row loops)."""
    import ray as _ray

    from podcast_audio_feature_extraction_ray.arrow_utils import list_buffers

    vdf = vocab_topk(sf_dir, k=16)
    vocab = np.sort(vdf["token"].to_numpy().astype(np.int64))
    ref = _ray.put(vocab)

    def fn(batch: pa.Table) -> pa.Table:
        values, offsets = list_buffers(batch["tokens"])
        v = _ray.get(ref)
        vals = values.astype(np.int64)
        pos = np.searchsorted(v, vals)
        safe = np.minimum(pos, len(v) - 1)
        unk = ~((pos < len(v)) & (v[safe] == vals))
        cs = np.concatenate([[0], np.cumsum(unk, dtype=np.int64)])
        n_unk = cs[offsets[1:]] - cs[offsets[:-1]]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tok": pa.array(np.diff(offsets).astype(np.int64)),
                "n_unk": pa.array(n_unk),
            }
        )

    return _tokens(sf_dir).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def s12_dead_letter(sf_dir: str):
    """S12 failure-log sink (reference catch-log-skip + index_failed.txt,
    ``src/features/FeatureExtractor.py:57-65``): a UDF that raises on
    deterministic poison rows (event_id % 97 == 13) runs under
    ``safe_map_batches``; poison rows land in the dead-letter parquet,
    good rows flow through, and the dead count is attached so the oracle
    checks BOTH paths."""
    import shutil
    import tempfile

    from podcast_audio_feature_extraction_ray.stages import errors

    dl_dir = tempfile.mkdtemp(prefix="tokwin_s12_")
    try:
        ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

        def fn(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy(zero_copy_only=False)
            if (eid % 97 == 13).any():
                raise ValueError("poison event")
            return pa.table(
                {
                    "event_id": batch["event_id"],
                    "value_cents": pa.array(_cents(batch["value"])),
                }
            )

        ok = errors.safe_map_batches(ev, fn, dl_dir).to_pandas()
        dead = errors.read_dead_letters(dl_dir)
        n_dead = int(dead.count()) if dead is not None else 0
        ok["n_dead_total"] = np.int64(n_dead)
        return ok
    finally:
        shutil.rmtree(dl_dir, ignore_errors=True)


def langid_ngram_q(sf_dir: str):
    """Char-n-gram-profile language ID over documents (first-of-max
    argmax across en/de/fr signature-trigram scores)."""
    from podcast_audio_feature_extraction_ray.stages.text import langid_ngram

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return langid_ngram(docs)


def text_signals(sf_dir: str):
    """The per-document text-analysis family in ONE scan: quality
    counters, whitespace + regex token counts, and n-gram language ID
    (folds the former lang_quality / token_count / langid_ngram_q
    queries — one corpus read instead of three)."""
    from podcast_audio_feature_extraction_ray.stages import text as t

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.text_signals(docs)


def m3_clean_text(sf_dir: str):
    """M3 text-cleaning kernel (lower/strip/regex-replace; reference
    ``src/search/index.py:39-52`` ad & episode-number stripping)."""
    from podcast_audio_feature_extraction_ray.stages.text import clean_text

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return clean_text(docs)


def s11_json_roundtrip(sf_dir: str):
    """S11 JSON results sink (reference ``src/search/search.py:485-488``):
    write a projection as JSON-lines, read it back, return the rows —
    the sink path itself is what's under test; values oracle-compare to
    the source table."""
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="tokwin_s11_")
    try:
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
        docs.write_json(out_dir)
        return rd.read_json(out_dir).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def s11_format_roundtrips(sf_dir: str):
    """S11 + S13 format coverage in ONE chain: a projection rides
    JSON-lines (write → read) and then CSV (write → read); values must
    still equal the source table after BOTH roundtrips (reference JSON
    results sink ``src/search/search.py:485-488``; CSV is the sibling
    source format). Empty-string text survives via
    ``strings_can_be_null=False``."""
    import shutil
    import tempfile

    from pyarrow import csv as _pcsv

    root = tempfile.mkdtemp(prefix="tokwin_s11c_")
    try:
        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "text", "n_chars"],
        )
        jdir, cdir = f"{root}/json", f"{root}/csv"
        docs.write_json(jdir)
        back_j = rd.read_json(jdir)
        back_j.write_csv(cdir)
        back = rd.read_csv(
            cdir, convert_options=_pcsv.ConvertOptions(strings_can_be_null=False)
        )

        def shape(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "source": batch["source"].cast(pa.string()),
                    "text": batch["text"].cast(pa.string()),
                    "n_chars": batch["n_chars"].cast(pa.int64()),
                }
            )

        return back.map_batches(shape, batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def dedup_lsh_verified(sf_dir: str):
    """The 100-TB near-dup composition: MinHash-LSH candidates (recall)
    → exact n-gram Jaccard verification (precision). Rows-only (LSH
    banding isn't SQL-expressible); the verifier itself is loop-oracle
    tested (tests/test_trainops.py)."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    docs = _docs(sf_dir)
    cands_ds = dedup.minhash_lsh_pairs(docs, est_threshold=0.3).materialize()
    docs2 = _docs(sf_dir)
    if cands_ds.count() <= _pair_driver_max():
        return dedup.ngram_jaccard_verify(docs2, cands_ds.to_pandas())
    return dedup.ngram_jaccard_verify_ds(docs2, cands_ds)


def dedup_clusters(sf_dir: str):
    """Near-dup pipeline final step: LSH candidate pairs → union-find
    clusters → per-doc (cluster_id, keep). Rows-only (cluster
    transitive closure isn't SQL-expressible without recursion);
    union-find is loop-tested in tests/test_trainops.py."""
    from podcast_audio_feature_extraction_ray.stages import dedup

    docs = _docs(sf_dir)
    cands_ds = dedup.minhash_lsh_pairs(docs, est_threshold=0.5).materialize()
    docs2 = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    if cands_ds.count() <= _pair_driver_max():
        return dedup.neardup_clusters(docs2, cands_ds.to_pandas())
    return dedup.neardup_clusters_ds(docs2, cands_ds)


def model_score_windows(sf_dir: str):
    """A2/A3 analog: heavy-state model actor stage — an integer weight
    matrix np.load-ed once per actor scores every window's feature vector
    with one matmul per batch (reference
    ``src/features/YAMNetExtractor.py:43-49``). Exact int64 math, so the
    DuckDB oracle reproduces logits + first-of-max argmax bit-for-bit."""
    import os
    import tempfile

    from podcast_audio_feature_extraction_ray.stages import model

    wpath = os.path.join(tempfile.gettempdir(), "tokwin_weights_v1.npy")
    model.make_weights(wpath)
    win = seg.segment_rows(
        _tokens(sf_dir), FRAME_Q, with_aggregates=True, emit_tokens=False,
        gt_threshold=GT_THRESHOLD, match_token=MATCH_TOKEN,
    )
    out = model.score_windows(win, wpath)
    return out.select_columns(
        ["doc_id", "source", "win_id", "ts_start", "ts_end", "class_id", "class_score"]
    )


def train_test_split(sf_dir: str):
    """Deterministic hash-based train/test split of documents."""
    from podcast_audio_feature_extraction_ray.stages.text import train_test_split as tts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return tts(docs)


def pack_training_sequences(sf_dir: str):
    """Pack documents-derived tokens into fixed-length training sequences
    (rows-only: bucket layout isn't SQL-expressible; loop oracle in
    tests/test_packing.py). Summary columns only for the driver compare."""
    from podcast_audio_feature_extraction_ray.stages.packing import pack_sequences

    packed = pack_sequences(_tokens(sf_dir), seq_len=256, num_buckets=16)
    return packed.select_columns(["bucket", "seq_no", "n_tok", "n_doc_boundaries"])


def repetition_signals_q(sf_dir: str):
    """Gopher-style repetition filters over documents: most-frequent-bigram
    fraction + duplicated-trigram fraction per doc (stateless zero-shuffle;
    the boilerplate/template-page drop signal from Rae et al. 2021)."""
    from podcast_audio_feature_extraction_ray.stages.text import repetition_signals

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_signals(docs)


def tfidf_top_terms(sf_dir: str, k: int = 10):
    """Per-source TF-IDF top terms: per-batch vectorized (source, token)
    tf partials AND (token) doc-frequency partials from ONE lexsort pass
    each -> one small groupby (<= n_sources x |vocab| rows rides the
    shuffle, never tokens) -> driver-side rank of the tiny result (the
    vocab_topk bound). The idf is the rational ``N / df`` (not ``ln``):
    exact-rounded IEEE division both sides, so the DuckDB oracle matches
    bit-for-bit, and the ranking is the same monotone order."""
    import pyarrow.parquet as pq

    docs = _docs(sf_dir)
    # doc count from parquet METADATA only — no data read, any corpus size
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def partial(batch: pa.Table) -> pa.Table:
        vals, offs = scalar.word_tokens_arrow(batch["text"])
        L = np.diff(offs)
        t = vals.astype(np.int64)
        src = batch["source"].to_numpy(zero_copy_only=False)
        src_u, src_code = np.unique(src, return_inverse=True)
        doc_idx = np.repeat(np.arange(len(L), dtype=np.int64), L)
        sidx = src_code[doc_idx].astype(np.int64)
        if len(t) == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "token": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int64()),
                 "df": pa.array([], pa.int64())}
            )

        # tf per (source, token): one lexsort run-length pass
        order = np.lexsort((t, sidx))
        ts, ss = t[order], sidx[order]
        chg = np.append(True, (ts[1:] != ts[:-1]) | (ss[1:] != ss[:-1]))
        rs = np.flatnonzero(chg)
        tf = np.diff(np.append(rs, len(order)))

        # df partial: distinct (doc, token) pairs — each document lives
        # wholly inside one batch (documents in = one row out per doc),
        # so batch-local distinct counts SUM to the corpus df
        order2 = np.lexsort((t, doc_idx))
        td, tt = doc_idx[order2], t[order2]
        new = np.append(True, (tt[1:] != tt[:-1]) | (td[1:] != td[:-1]))
        pair_s, pair_t = src_code[td[new]].astype(np.int64), tt[new]
        order3 = np.lexsort((pair_t, pair_s))
        ps, pt = pair_s[order3], pair_t[order3]
        chg3 = np.append(True, (pt[1:] != pt[:-1]) | (ps[1:] != ps[:-1]))
        rs3 = np.flatnonzero(chg3)
        df_part = np.diff(np.append(rs3, len(order3)))
        # (source, token) key sets and sort orders coincide between the
        # two passes (df>=1 wherever tf>0), so positions align
        assert len(rs3) == len(rs)
        return pa.table(
            {
                "source": pa.array(src_u[ss[rs]], pa.string()),
                "token": pa.array(ts[rs]),
                "tf": pa.array(tf.astype(np.int64)),
                "df": pa.array(df_part.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "token"])
        .aggregate(Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))
    )
    # driver-side finish on the tiny (n_sources x |vocab|) aggregate —
    # the same documented bound as vocab_topk
    pdf = totals.to_pandas()
    df_tok = pdf.groupby("token")["df"].sum()
    pdf["df"] = pdf["token"].map(df_tok).astype(np.int64)
    pdf["tfidf"] = (pdf["tf"].to_numpy() * n_docs) / pdf["df"].to_numpy()
    pdf = pdf.sort_values(
        ["source", "tfidf", "token"], ascending=[True, False, True], kind="mergesort"
    ).reset_index(drop=True)
    pdf["rank"] = (pdf.groupby("source").cumcount() + 1).astype(np.int64)
    return pdf[pdf["rank"] <= k][
        ["source", "token", "tf", "df", "tfidf", "rank"]
    ].reset_index(drop=True)


AUDIO_SPEC = WindowSpec(160, 80, "frame")  # 20 ms frames / 10 ms hop at 8 kHz


def audio_frame_energy(sf_dir: str):
    """The reference's core pipeline shape — audio -> fixed-stride frames
    -> per-frame functionals (``src/features/FeatureExtractor.py:36-67``,
    opensmile frame functionals) — as three engine stages: synthesize a
    REAL PCM16 WAV per doc, decode it with the stdlib RIFF codec
    (actor pool), then run the UNCHANGED window engine over the sample
    stream (``segment_rows``, zero shuffle). Every functional is exact
    integer math until the same final double ops as the SQL oracle."""
    from podcast_audio_feature_extraction_ray.stages import multimodal

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    tok = multimodal.decode_wav(multimodal.attach_wav_payload(docs))
    win = seg.segment_rows(tok, AUDIO_SPEC, with_aggregates=True, emit_tokens=False)
    return win.select_columns(
        ["doc_id", "win_id", "ts_start", "ts_end", "n_tokens",
         "tok_sum", "tok_mean", "tok_std", "tok_max", "tok_min"]
    )


def dup_span_grams_q(sf_dir: str):
    """Exact duplicate 6-token spans across documents (Lee et al. 2022
    exact-substring dedup at n-gram granularity), top-100 by
    (n_docs desc, n_occurrences desc, gram asc)."""
    from podcast_audio_feature_extraction_ray.stages.dedup import dup_span_grams

    return dup_span_grams(_docs(sf_dir), gram=6, base=1024, top=100)


def grouped_topk_docs(sf_dir: str, k: int = 3):
    """Per-group quota selection: the k longest docs per source
    (n_chars desc, doc_id asc) with a dense per-group rank — T1's
    ranking partitioned by key; per-batch per-key prune bounds the
    shuffle to k x n_keys x n_batches rows."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return topk.grouped_top_k(
        docs, key_cols=["source"], score_col="n_chars", k=k, tiebreak=["doc_id"]
    )


def quantiles_by_source(sf_dir: str):
    """EXACT distributed quantiles (p25/p50/p75/p99 of doc length per
    source) over a bounded value domain: per-batch (source, value)
    histogram partials -> ONE small groupby -> driver-side cumulative
    walk over the tiny (sources x distinct-values) table. The shuffle
    moves counts, never rows — the sketch-free exact path that works
    whenever the domain is bounded (lengths, scores, categorical codes);
    open domains would swap the histogram for a t-digest. Quantile
    definition shared with the oracle: smallest v with
    cum_count >= ceil(pct * total / 100.0)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        v = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        su, sc = np.unique(src, return_inverse=True)
        order = np.lexsort((v, sc))
        vs, ss = v[order], sc[order]
        chg = np.append(True, (vs[1:] != vs[:-1]) | (ss[1:] != ss[:-1])) if len(order) else np.zeros(0, bool)
        rs = np.flatnonzero(chg)
        cnt = np.diff(np.append(rs, len(order)))
        return pa.table(
            {
                "source": pa.array(su[ss[rs]], pa.string()),
                "v": pa.array(vs[rs]),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    pdf = totals.to_pandas().sort_values(["source", "v"], kind="mergesort")
    out_rows = []
    for src, g in pdf.groupby("source", sort=True):
        cum = g["cnt"].to_numpy().cumsum()
        tot = int(cum[-1])
        vals = g["v"].to_numpy()
        for pct in (25, 50, 75, 99):
            thr = np.ceil(pct * tot / 100.0)
            out_rows.append((src, pct, int(vals[np.searchsorted(cum, thr)])))
    return pd.DataFrame(out_rows, columns=["source", "pct", "value"]).astype(
        {"pct": np.int64, "value": np.int64}
    )


def mix_sample_q(sf_dir: str):
    """Data-mixture sampling: keep all of src0, 16/256 of src1, 64/256
    of everything else — hash-deterministic, so the surviving set is
    identical across runs/cluster sizes."""
    from podcast_audio_feature_extraction_ray.stages.text import mix_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    kept = mix_sample(docs, rates={"src0": 1.0, "src1": 16 / 256}, default_rate=64 / 256)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.string()), "source": batch["source"]}
        )

    return kept.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


def s13_csv_roundtrip(sf_dir: str):
    """CSV source-format coverage (sibling of the S11 JSON sink): write a
    projection as CSV shards, read it back with ``read_csv``, return the
    rows — the format path is under test; values oracle-compare to the
    source table. Text goes through quoting/escaping, so the doc text
    column itself rides the roundtrip."""
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="tokwin_s13_")
    try:
        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        )
        docs.write_csv(out_dir)
        # empty-string text must survive the trip as '' (not null):
        # without this an empty document would read back null and fail
        # the value compare against the source table
        from pyarrow import csv as _pcsv

        back = rd.read_csv(
            out_dir,
            convert_options=_pcsv.ConvertOptions(strings_can_be_null=False),
        )

        def shape(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "text": batch["text"].cast(pa.string()),
                    "n_chars": batch["n_chars"].cast(pa.int64()),
                }
            )

        return back.map_batches(shape, batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


_NLL_SCALE = 2 ** 28  # logprob quantization grid (exact int64 doc sums)


def unigram_nll_scores(sf_dir: str, k_smooth: int = 1):
    """Unigram language-model quality scoring (the perplexity-filter
    shape): corpus token frequencies -> per-token add-one-smoothed
    logprob table (built ONCE on the tiny vocab aggregate, broadcast) ->
    per-doc mean negative log-likelihood in one stateless pass.
    Rows-only: ``ln`` is not correctly-rounded across libms, so the
    oracle is the pytest loop implementation, and the driver records
    the rows-only check. The scale shape is the vocab_topk partial
    (counts ride the shuffle) + a j2-style broadcast lookup."""
    import math

    import ray

    from podcast_audio_feature_extraction_ray.arrow_utils import list_buffers

    toks = _tokens(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        values, _ = list_buffers(batch["tokens"])
        if len(values) == 0:
            return pa.table(
                {"token": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        counts = np.bincount(values.astype(np.int64))
        nz = np.flatnonzero(counts)
        return pa.table({"token": pa.array(nz), "n": pa.array(counts[nz])})

    from ray.data.aggregate import Sum

    vocab = (
        toks.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: |vocab| rows (the documented vocab_topk bound)
    )
    total = int(vocab["n"].sum())
    V = len(vocab)
    denom = total + k_smooth * (V + 1)  # +1: one shared OOV bucket
    sorted_tok = np.sort(vocab["token"].to_numpy())
    order = np.argsort(vocab["token"].to_numpy())
    # libm log on the small table once, QUANTIZED to 2^-28 units: per-doc
    # sums are then exact int64 — order-independent, layout-invariant,
    # and reproducible by any oracle (the repo's exact-integer-until-one-
    # final-double-op idiom). Safe for docs up to ~1M tokens
    # (|logp| < 64 => |sum_q| < 2^52, one exact int->double conversion).
    logp_q = np.array(
        [
            round(math.log((int(n) + k_smooth) / denom) * _NLL_SCALE)
            for n in vocab["n"].to_numpy()[order]
        ],
        dtype=np.int64,
    )
    oov_q = round(math.log(k_smooth / denom) * _NLL_SCALE)
    ref = ray.put((sorted_tok, logp_q, oov_q))

    def score(batch: pa.Table) -> pa.Table:
        st, lpq, oq = ray.get(ref)
        values, offs = list_buffers(batch["tokens"])
        v = values.astype(np.int64)
        pos = np.searchsorted(st, v)
        pos_c = np.minimum(pos, len(st) - 1)
        hit = (len(st) > 0) & (st[pos_c] == v)
        tok_q = np.where(hit, lpq[pos_c], oq)
        # per-doc EXACT int64 segment sum via cumsum-diff (the
        # quality_arrays idiom): integers sum exactly in any order, and
        # zero-length segments come out 0 — no reduceat empty-segment
        # hazard
        n = np.diff(offs)
        keep = n > 0
        csum = np.concatenate(([0], np.cumsum(tok_q, dtype=np.int64)))
        doc_q = csum[offs[1:]] - csum[offs[:-1]]
        nll = -(doc_q / _NLL_SCALE)  # ONE exact int->double op per doc
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.string()),
                "n_tok": pa.array(n.astype(np.int64)),
                "nll_sum": pa.array(nll),
                "mean_nll": pa.array(np.where(keep, nll / np.maximum(n, 1), 0.0)),
            }
        )

    return toks.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def hll_distinct_tokens(sf_dir: str):
    """Approximate distinct token count per source via HyperLogLog
    (m=256 registers) — the open-domain sibling of ``distinct_values``:
    partials are a fixed 256-int register set per key per batch, so the
    shuffle cost is independent of corpus size. Rows-only (a sketch has
    no SQL equal); accuracy + layout-invariance are pytest-checked
    against the exact count."""
    from podcast_audio_feature_extraction_ray.arrow_utils import list_buffers
    from podcast_audio_feature_extraction_ray.stages.sketch import hll_distinct

    toks = _tokens(sf_dir)

    def values(batch: pa.Table):
        vals, offs = list_buffers(batch["tokens"])
        row_idx = np.repeat(np.arange(batch.num_rows), np.diff(offs))
        return vals.astype(np.int64), row_idx

    return hll_distinct(toks, values, key_col="source", p=8)


def semdedup_q(sf_dir: str):
    """Semantic dedup over the embeddings table (SemDeDup, Abbas et al.
    2023): k-means clusters -> drop items with a >= 0.9 rounded cosine
    to a lower-id cluster member. Rows-only (k-means + chained drop
    aren't SQL-expressible); exactness vs a loop oracle and layout
    invariance are pytest-checked."""
    from podcast_audio_feature_extraction_ray.stages.ann import semdedup

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semdedup(emb, threshold=0.9)


def ordered_export(sf_dir: str):
    """Reproducible training-order export: global sort by
    (n_chars desc, doc_id asc) with a contiguous 0-based global sequence
    number attached — identical on any cluster size / block layout."""
    from podcast_audio_feature_extraction_ray.stages.topk import global_order_index

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    out = global_order_index(
        docs, [("n_chars", "descending"), ("doc_id", "ascending")]
    )
    return out.select_columns(["doc_id", "n_chars", "seq"])


def curation_pipeline(sf_dir: str):
    """The composed curation chain a training-data run actually executes
    — quality gate (C4 rule) → data-mixture sample → exact dedup — as
    ONE pass over documents plus ONE tiny groupby, end-to-end
    SQL-oracle-verified. The quality math is the shared
    ``text.quality_arrays`` kernel (same formulas as ``lang_quality``),
    the mixture rule is ``mix_sample``'s md5-byte decision, dedup keeps
    the smallest surviving doc_id per text hash. Survivor rows carry
    only (hash, id, source-agnostic counters) into the shuffle — text
    never leaves the scan stage."""
    import hashlib

    from podcast_audio_feature_extraction_ray.stages.text import quality_arrays

    md5 = hashlib.md5
    docs = _docs(sf_dir)

    def gate(batch: pa.Table) -> pa.Table:
        qa = quality_arrays(batch["text"])
        n_words, n_stop, sum_len = qa["n_words"], qa["n_stop"], qa["sum_len"]
        stop_ratio = n_stop / n_words
        mean_word_len = sum_len / n_words
        quality = (
            (stop_ratio > 0.09) & (n_words >= 50)
            & (mean_word_len >= 3.0) & (mean_word_len <= 12.0)
        )
        # md5 only where it can matter: the mix decision is evaluated on
        # QUALITY-PASSING rows only (the gate fails most rows first), so
        # the per-row digest loop runs on the survivors, not the batch
        q_idx = np.flatnonzero(quality)
        ids = batch["doc_id"].take(pa.array(q_idx)).cast(pa.string()).to_pylist()
        b0 = np.fromiter(
            (md5(s.encode()).digest()[0] for s in ids), np.int64, count=len(ids)
        )
        src = batch["source"].to_numpy(zero_copy_only=False)[q_idx]
        lim = np.where(src == "src0", 256, np.where(src == "src1", 16, 64))
        kept = q_idx[b0 < lim]
        kept_texts = batch["text"].take(pa.array(kept)).to_pylist()
        th = [md5(t.encode()).hexdigest() for t in kept_texts]
        return pa.table(
            {
                "text_hash": pa.array(th, pa.string()),
                "doc_int": pa.array(
                    batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)[kept]
                ),
                "n_words": pa.array(n_words[kept]),
            }
        )

    from ray.data.aggregate import Count, Min

    out = (
        docs.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(
            Min("doc_int", alias_name="keep_doc_id"),
            Count(alias_name="n_dups"),
            Min("n_words", alias_name="n_words"),
        )
    )
    return out


def dup_span_hashed_q(sf_dir: str):
    """Open-vocabulary duplicate-span detection (64-bit hashed 6-gram
    codes — the path for real BPE vocabularies where mixed-radix exact
    codes overflow). Rows-only; span sets must equal the exact encoder's
    (pytest), modulo the hash relabeling."""
    from podcast_audio_feature_extraction_ray.stages.dedup import dup_span_grams

    return dup_span_grams(_docs(sf_dir), gram=6, top=100, hashed=True)
