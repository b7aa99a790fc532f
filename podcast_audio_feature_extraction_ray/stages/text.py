"""Text analysis stages: language-ID heuristic, quality scoring, token
counting, document fingerprinting.

All per-doc computations are Arrow-vectorized (``pyarrow.compute`` string
kernels + numpy reduceat over list offsets) — no Python loop over rows in
``lang_quality``/``token_count``. The fingerprint stage is loop-per-doc
(rolling hash is inherently sequential per doc) but vectorized across
the window minimum (winnowing) per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on with as at by"
).split()

MERSENNE61 = (1 << 61) - 1
TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


_STOP_SET = None  # built once per process, not per batch


def quality_arrays(txt) -> dict[str, np.ndarray]:
    """The per-doc quality/language counters (shared kernel: used by
    ``lang_quality`` and by composed pipelines that must apply the SAME
    gate without re-deriving the formulas). Returns exact int64 arrays
    ``n_words, n_stop, n_alpha, sum_len``."""
    global _STOP_SET
    if _STOP_SET is None:
        _STOP_SET = pa.array(STOPWORDS, type=pa.string())
    stop_set = _STOP_SET
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    # null texts -> "": split of a null yields a null list whose
    # offsets don't advance, which would make reduceat absorb the
    # next row's first word — fill first, then lens >= 1 everywhere
    txt = pc.fill_null(txt, "")
    words = pc.split_pattern(pc.utf8_lower(txt), " ")
    offsets = words.offsets.to_numpy().astype(np.int64)
    flat = words.values
    lens = np.diff(offsets)  # always >= 1: split("") -> [""]

    def per_row_sum(flat_arr) -> np.ndarray:
        # cumsum-diff segmented sum: exact for zero-length segments
        # (np.add.reduceat would return arr[offset] for those)
        arr = flat_arr.to_numpy(zero_copy_only=False)[: offsets[-1]]
        cs = np.concatenate([[0], np.cumsum(arr, dtype=np.int64)])
        return cs[offsets[1:]] - cs[offsets[:-1]]

    return {
        "n_words": lens.astype(np.int64),
        "n_stop": per_row_sum(pc.is_in(flat, value_set=stop_set)),
        "n_alpha": per_row_sum(pc.match_substring_regex(flat, r"^[a-z]+$")),
        "sum_len": per_row_sum(pc.utf8_length(flat)),
    }


def lang_quality(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Quality/language heuristics per document.

    Columns (names shared with the SQL oracle): n_words, n_stop,
    stop_ratio (= n_stop/n_words, identical single division in SQL),
    n_alpha, mean_word_len, is_en (stop_ratio > 0.09).
    """

    def fn(batch: pa.Table) -> pa.Table:
        qa = quality_arrays(batch[text_col])
        n_words, n_stop, n_alpha, sum_len = (
            qa["n_words"], qa["n_stop"], qa["n_alpha"], qa["sum_len"]
        )
        stop_ratio = n_stop / n_words  # n_words >= 1 (split of "" -> [""])
        mean_word_len = sum_len / n_words
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words),
                "n_stop": pa.array(n_stop),
                "stop_ratio": pa.array(stop_ratio),
                "n_alpha": pa.array(n_alpha),
                "mean_word_len": pa.array(mean_word_len),
                "is_en": pa.array(stop_ratio > 0.09),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def token_count(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Whitespace + BPE-ish regex token counts (reference G2 analog,
    ``src/search/index.py:33-36``). Columns: n_ws_tokens, n_re_tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")  # null counts as "" in BOTH columns
        ws = pc.list_value_length(pc.split_pattern(txt, " ")).cast(pa.int64())
        re_n = pc.count_substring_regex(txt, TOKEN_RE).cast(pa.int64())
        return pa.table(
            {id_col: batch[id_col], "n_ws_tokens": ws, "n_re_tokens": re_n}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


LANG_PROFILES = {
    # tiny char-trigram signatures; order fixes the argmax tie rule
    "en": [" th", "the", " an", "ing", " of"],
    "de": ["der", "ein", "sch", " un", "ich"],
    "fr": [" le", "les", " de", "ent", "que"],
}


def langid_arrays(txt) -> dict[str, np.ndarray | object]:
    """Shared language-ID kernel: per-language trigram-profile scores +
    first-of-max language label (Arrow substring kernels, zero per-row
    Python). Returns ``{"s_en": ..., "s_de": ..., "s_fr": ..., "lang": pa.Array}``."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.utf8_lower(pc.fill_null(txt, ""))
    scores = {}
    for lang, grams in LANG_PROFILES.items():
        tot = np.zeros(len(txt), dtype=np.int64)
        for g in grams:
            tot += (
                pc.count_substring(txt, g)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        scores[lang] = tot
    langs = list(LANG_PROFILES)
    mat = np.stack([scores[l] for l in langs], axis=1)
    best = np.argmax(mat, axis=1)  # first-of-max
    out: dict = {f"s_{l}": scores[l] for l in langs}
    out["lang"] = pa.array(np.array(langs, dtype=object)[best], type=pa.string())
    return out


def langid_ngram(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Language-ID by char-n-gram profile scoring: per-language score =
    total count of that profile's signature trigrams (non-overlapping,
    matching DuckDB ``replace``-based counting), lang = first-of-max in
    profile order. Columns: s_en, s_de, s_fr, lang."""

    def fn(batch: pa.Table) -> pa.Table:
        la = langid_arrays(batch[text_col])
        out = {id_col: batch[id_col]}
        for k in ("s_en", "s_de", "s_fr"):
            out[k] = pa.array(la[k])
        out["lang"] = la["lang"]
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def text_signals(ds, id_col: str = "doc_id", text_col: str = "text"):
    """The full per-document text-analysis family in ONE scan: quality
    counters (``lang_quality``), whitespace + BPE-ish regex token counts
    (``token_count``) and n-gram language-ID (``langid_ngram``) — a user
    running the text-quality stage gets every signal without re-reading
    the corpus. Columns are the union of the three stages'."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        qa = quality_arrays(txt)
        n_words, n_stop = qa["n_words"], qa["n_stop"]
        stop_ratio = n_stop / n_words
        mean_word_len = qa["sum_len"] / n_words
        la = langid_arrays(txt)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words),
                "n_stop": pa.array(n_stop),
                "stop_ratio": pa.array(stop_ratio),
                "n_alpha": pa.array(qa["n_alpha"]),
                "mean_word_len": pa.array(mean_word_len),
                "is_en": pa.array(stop_ratio > 0.09),
                # identical to the whitespace split quality_arrays already
                # did (lowering doesn't change whitespace) — don't pay the
                # corpus's most expensive kernel twice in one scan. Null
                # texts count as "" (1 token), consistent with the quality
                # counters in the same row.
                "n_ws_tokens": pa.array(n_words),
                "n_re_tokens": pc.count_substring_regex(
                    pc.fill_null(txt, ""), TOKEN_RE
                ).cast(pa.int64()),
                "s_en": pa.array(la["s_en"]),
                "s_de": pa.array(la["s_de"]),
                "s_fr": pa.array(la["s_fr"]),
                "lang": la["lang"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def clean_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """M3 text-cleaning kernel (reference ad/episode-number stripping,
    ``src/search/index.py:39-52``): lower → drop [bracketed] spans →
    drop standalone digit runs → collapse spaces → trim. All Arrow RE2
    kernels, bit-identical to DuckDB ``regexp_replace(..., 'g')``.
    Columns: clean_text, n_chars_removed."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        c = pc.utf8_lower(txt)
        c = pc.replace_substring_regex(c, pattern=r"\[[^\]]*\]", replacement="")
        c = pc.replace_substring_regex(c, pattern=r"\b[0-9]+\b", replacement="")
        c = pc.replace_substring_regex(c, pattern=r" +", replacement=" ")
        c = pc.utf8_trim_whitespace(c)
        removed = pc.subtract(
            pc.utf8_length(txt).cast(pa.int64()), pc.utf8_length(c).cast(pa.int64())
        )
        return pa.table(
            {id_col: batch[id_col], "clean_text": c, "n_chars_removed": removed}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# fixed redaction order: URLs first (they may embed @ and digits), then
# emails, then IPv4, then phone-ish digit groups — each later pattern
# sees the earlier placeholders, so counts are well-defined
_PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("n_urls", r"https?://[^\s]+", "<URL>"),
    ("n_emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ips", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("n_phones", r"\+?[0-9][0-9()\-. ]{6,}[0-9]\b", "<PHONE>"),
)


def redact_pii(ds, id_col: str = "doc_id", text_col: str = "text"):
    """PII scrubbing (the C4/Dolma pre-training hygiene pass): replace
    URLs, emails, IPv4 addresses and phone-number-shaped digit runs with
    typed placeholders, emitting per-doc match counts as quality
    signals. All Arrow RE2 kernels (``replace_substring_regex`` /
    ``count_substring_regex``), RE2-only syntax (no lookaround) so a
    DuckDB RE2 oracle replays the exact rewrite; zero shuffle, zero
    per-row Python. Columns: ``redacted_text, n_urls, n_emails, n_ips,
    n_phones``. Reference analog: the M3 cleaning family
    (``src/search/index.py:39-52``), extended to the PII rules a
    100-TB crawl pipeline runs before training."""

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        c = pc.fill_null(txt, "")
        cols = {id_col: batch[id_col]}
        counts = {}
        for name, pat, repl in _PII_RULES:
            counts[name] = pc.count_substring_regex(c, pattern=pat).cast(pa.int64())
            c = pc.replace_substring_regex(c, pattern=pat, replacement=repl)
        cols["redacted_text"] = c
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _winnow(hs: np.ndarray, w: int) -> list[int]:
    """Winnowing selection: distinct sorted minima of width-w windows."""
    if len(hs) == 0:
        return []
    if len(hs) <= w:
        return [int(hs.min())]
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(hs, w).min(axis=1)
    return sorted({int(x) for x in mins})


def rolling_fingerprints(words: list[str], k: int = 5, w: int = 8) -> list[int]:
    """Winnowing reference (the loop-oracle primitive): word k-gram
    hashes via ``hashing.combine_hashes`` of per-word polynomial hashes,
    then distinct window-of-w minima. Identical values to the batch path
    in ``doc_fingerprint`` (which computes the same hashes with zero
    per-char Python via ``hashing.hash_words``/``ngram_hashes``)."""
    from podcast_audio_feature_extraction_ray import hashing

    if len(words) < k:
        return []
    whs = [hashing.word_hash(x) for x in words]
    hs = np.array(
        [hashing.combine_hashes(whs[i : i + k]) for i in range(len(words) - k + 1)],
        dtype=np.uint64,
    )
    return _winnow(hs, w)


def doc_fingerprint(ds, id_col: str = "doc_id", text_col: str = "text", k: int = 5, w: int = 8):
    """Per-doc winnowing fingerprint set + compact signature.

    Hashing is batch-vectorized; the remaining per-doc work is a numpy
    sliding-window minimum over that doc's gram hashes. Stored
    fingerprints are masked to int63 for the Arrow int64 column (raw
    order is preserved before masking, matching the loop oracle).
    """
    from podcast_audio_feature_extraction_ray import hashing

    MASK = 0x7FFFFFFFFFFFFFFF

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        wh, toff = hashing.hash_words(batch[text_col])
        gh, goff = hashing.ngram_hashes(wh, toff, k, short_gram=False)
        fps = [_winnow(gh[goff[i] : goff[i + 1]], w) for i in range(len(ids))]
        sig = [int(min(f)) & MASK if f else -1 for f in fps]
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_fingerprints": pa.array([len(f) for f in fps], type=pa.int64()),
                "min_fingerprint": pa.array(sig, type=pa.int64()),
                "fingerprints": pa.array(
                    [[x & MASK for x in f] for f in fps],
                    type=pa.list_(pa.int64()),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def train_test_split(ds, id_col: str = "doc_id", test_hex: str = "012"):
    """Deterministic split by content-stable hash of the id: docs whose
    ``md5(id)`` first hex digit falls in ``test_hex`` go to 'test'
    (~len(test_hex)/16 fraction). Stable across runs/machines/cluster
    sizes — the property a training pipeline needs from its split."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # md5 itself is a per-string digest (kept for oracle parity: DuckDB
    # recomputes md5(doc_id)); everything around it is vectorized — the
    # first hex digit is the high nibble of digest byte 0, labels come
    # from one boolean LUT gather + pc.if_else, no Python string building.
    md5 = hashlib.md5
    nib_test = np.zeros(16, dtype=bool)
    for c in test_hex:
        nib_test[int(c, 16)] = True

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = col.cast(pa.string())
        ids = col.to_pylist()
        nibs = np.fromiter(
            (md5(s.encode()).digest()[0] for s in ids), np.uint8, count=len(ids)
        ) >> 4
        is_test = pa.array(nib_test[nibs])
        lab = pc.if_else(is_test, pa.scalar("test"), pa.scalar("train"))
        return pa.table({id_col: batch[id_col], "split": lab})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def repetition_signals(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition quality signals, one row per document with
    >= 3 words (reference analog: the per-episode text-feature family,
    ``src/features/`` — same one-doc-in, one-feature-row-out shape):

    - ``top_bigram_n`` / ``top_bigram_frac`` — occurrences of the most
      frequent word bigram and its fraction of all ``L-1`` bigrams (ties
      broken by smallest ``(t0, t1)``; Rae et al. 2021 "Gopher" §A1.1
      uses this to drop template/boilerplate pages),
    - ``dup_trigram_n`` / ``dup_trigram_frac`` — number of trigram
      positions whose trigram occurs more than once in the doc, over
      ``L-2``.

    Fully vectorized: tokens via ``word_tokens_arrow`` (the SQL-replicable
    toy vocabulary), then lexsort run-length counting per (doc, n-gram) —
    no Python loop over rows or grams. Per-doc state never leaves the
    batch, so the stage is stateless/zero-shuffle: the 100-TB shape.
    Fractions are single int64→float64 divisions, bit-identical to the
    DuckDB oracle's ``cast(x AS double) / cast(y AS double)``.
    """
    from podcast_audio_feature_extraction_ray.functions.scalar import word_tokens_arrow

    def _runs(keys: tuple[np.ndarray, ...]) -> tuple[np.ndarray, np.ndarray]:
        # sorted run starts + lengths for composite keys (last key primary)
        n = len(keys[0])
        order = np.lexsort(keys)
        srt = [k[order] for k in keys]
        chg = np.zeros(n, dtype=bool)
        chg[0] = True
        for k in srt:
            chg[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(chg)
        lens = np.diff(np.append(starts, n))
        return order, starts, lens

    def fn(batch: pa.Table) -> pa.Table:
        vals, offs = word_tokens_arrow(batch[text_col])
        L = np.diff(offs)
        ndoc = len(L)
        t = vals.astype(np.int64)
        doc_idx = np.repeat(np.arange(ndoc, dtype=np.int64), L)

        top_a = np.zeros(ndoc, np.int64)
        top_b = np.zeros(ndoc, np.int64)
        top_n = np.zeros(ndoc, np.int64)
        dup_tri = np.zeros(ndoc, np.int64)

        if len(t) >= 2:
            same = doc_idx[:-1] == doc_idx[1:]
            bd, b0, b1 = doc_idx[:-1][same], t[:-1][same], t[1:][same]
            if len(bd):
                order, rs, rlen = _runs((b1, b0, bd))
                rdoc = bd[order][rs]
                # doc segments over the (doc-major) sorted runs
                seg = np.flatnonzero(np.append(True, rdoc[1:] != rdoc[:-1]))
                mx = np.maximum.reduceat(rlen, seg)
                # first (= smallest (t0,t1)) run attaining the per-doc max
                ismax = np.flatnonzero(rlen == np.repeat(mx, np.diff(np.append(seg, len(rlen)))))
                first = ismax[np.searchsorted(ismax, seg)]
                d = rdoc[seg]
                top_a[d] = b0[order][rs[first]]
                top_b[d] = b1[order][rs[first]]
                top_n[d] = rlen[first]
        if len(t) >= 3:
            same = doc_idx[:-2] == doc_idx[2:]
            td = doc_idx[:-2][same]
            u0, u1, u2 = t[:-2][same], t[1:-1][same], t[2:][same]
            if len(td):
                order, rs, rlen = _runs((u2, u1, u0, td))
                rdoc = td[order][rs]
                seg = np.flatnonzero(np.append(True, rdoc[1:] != rdoc[:-1]))
                contrib = np.where(rlen > 1, rlen, 0)
                dup_tri[rdoc[seg]] = np.add.reduceat(contrib, seg)

        keep = L >= 3
        ids = batch[id_col].cast(pa.string()).to_numpy(zero_copy_only=False)[keep]
        n_big = (L[keep] - 1).astype(np.int64)
        n_tri = (L[keep] - 2).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.string()),
                "n_tok": pa.array(L[keep].astype(np.int64)),
                "top_bigram_a": pa.array(top_a[keep]),
                "top_bigram_b": pa.array(top_b[keep]),
                "top_bigram_n": pa.array(top_n[keep]),
                "top_bigram_frac": pa.array(top_n[keep] / n_big),
                "dup_trigram_n": pa.array(dup_tri[keep]),
                "dup_trigram_frac": pa.array(dup_tri[keep] / n_tri),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def mix_sample(ds, rates: dict[str, float], default_rate: float = 1.0,
               id_col: str = "doc_id", source_col: str = "source"):
    """Deterministic data-mixture sampling: keep each doc with a
    per-source rate (the corpus-mixing step of a training pipeline —
    upweight curated sources, downsample crawl), decided by a stable
    content hash of the id so the SAME docs survive on any cluster
    size, any run, any shard layout (the train_test_split property).

    Rates quantize to k/256 (keep iff md5(id) byte 0 < k) so the DuckDB
    oracle can replicate the decision as a 2-hex-digit string compare.
    Stateless zero-shuffle map_batches; md5 is a per-row C digest kept
    for oracle parity (same trade as ``train_test_split``)."""
    import hashlib

    import pyarrow as pa

    thr = {s: min(256, int(r * 256)) for s, r in rates.items()}
    dflt = min(256, int(default_rate * 256))
    md5 = hashlib.md5

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.string()).to_pylist()
        b0 = np.fromiter(
            (md5(s.encode()).digest()[0] for s in ids), np.int64, count=len(ids)
        )
        src = batch[source_col].to_numpy(zero_copy_only=False)
        lim = np.fromiter((thr.get(s, dflt) for s in src), np.int64, count=len(src))
        return batch.filter(pa.array(b0 < lim))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _tf_per_doc(t64: np.ndarray, offs: np.ndarray, term: int) -> np.ndarray:
    """Per-doc frequency of ``term`` via padded-cumsum offset-diff (exact
    for zero-length docs, unlike ``np.add.reduceat``). Shared by BOTH
    BM25 passes — the df stats broadcast from pass 1 are only consistent
    with pass 2's scoring if the two tokenize and count identically."""
    eq = (t64 == term).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(eq)])
    return cs[offs[1:]] - cs[offs[:-1]]


def bm25_topk(
    ds,
    queries: dict[int, list[int]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1 << 20,
    fields: list[tuple[str, float]] | None = None,
):
    """BM25 lexical scoring + top-k retrieval (the self-contained
    replacement for the reference's external ES ``multi_match`` scorer,
    ``src/search/search.py:174-214``): ``queries`` maps query_id -> list
    of term token ids; each (query, doc) pair gets the Okapi BM25 score
    over the toy-tokenizer terms, and the top ``k`` docs per query are
    returned with ranks.

    ``fields`` is the multi-field boosted form (the reference boosts
    ``seg_words^2, epis_name, epis_desc`` — ``search.py:177-183``): a
    list of ``(column, boost)``; each field keeps its OWN df / length
    stats and the doc score is ``sum_field boost * BM25_field`` (ES
    ``most_fields`` semantics). ``None`` means ``[(text_col, 1.0)]`` —
    the single-field behavior, bit-identical to before.

    Scale shape: pass 1 computes per-(field, term) document frequencies
    and the corpus (n_docs, per-field total_tokens) as tiny per-batch
    partials folded by ONE bounded groupby (rows <= |fields| x
    (|query terms| + 1) + 1 per batch); the stats broadcast via
    ``ray.put``; pass 2 streams the corpus once, scoring every query
    vectorized per batch, pruning to a local top-k (score ties kept),
    and ONE per-query merge ranks the k survivors. Nothing larger than
    (k-ish x batches x queries) rides the shuffle.

    Exactness: per-term contributions are computed with a FIXED IEEE op
    sequence from exact ints (rational idf ``(N-df+0.5)/(df+0.5)``, no
    ``ln``), then quantized to an int64 grid of ``scale`` so per-doc
    sums are order-free — the DuckDB oracle matches bit-for-bit.
    ``score_q = sum_f sum_t floor((idf_ft * (tf*(k1+1)) / (tf + k1*(1-b+b*dl_f*N/T_f))) * (boost_f*scale))``.
    """
    import ray

    from ray.data.aggregate import Sum

    from podcast_audio_feature_extraction_ray.functions import scalar

    if fields is None:
        fields = [(text_col, 1.0)]
    terms = np.unique(np.concatenate([np.asarray(v, np.int64) for v in queries.values()]))

    def stats_partial(batch: pa.Table) -> pa.Table:
        out_f = [np.array([-1], dtype=np.int64)]
        out_t = [np.array([-1], dtype=np.int64)]
        out_n = [np.array([batch.num_rows], dtype=np.int64)]
        for fi, (col, _boost) in enumerate(fields):
            vals, offs = scalar.word_tokens_arrow(batch[col])
            t64 = vals.astype(np.int64)
            out_f.append(np.array([fi], dtype=np.int64))
            out_t.append(np.array([-2], dtype=np.int64))
            out_n.append(np.array([len(t64)], dtype=np.int64))
            for term in terms:
                tf = _tf_per_doc(t64, offs, term)
                out_f.append(np.array([fi], dtype=np.int64))
                out_t.append(np.array([term], dtype=np.int64))
                out_n.append(np.array([int((tf > 0).sum())], dtype=np.int64))
        return pa.table(
            {"field": pa.array(np.concatenate(out_f)),
             "term": pa.array(np.concatenate(out_t)),
             "n": pa.array(np.concatenate(out_n))}
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["field", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(stats) == 0 or "term" not in stats.columns:
        # empty corpus: the partial stream produced no blocks at all, so
        # the groupby result is schema-less — no docs, no hits
        import ray.data as _rd

        from podcast_audio_feature_extraction_ray.arrow_utils import typed_empty_table

        sch = dict(zip(ds.schema().names, ds.schema().types))
        return _rd.from_arrow(
            typed_empty_table(
                {
                    "query_id": pa.int64(),
                    id_col: sch[id_col],
                    "score_q": pa.int64(),
                    "rank": pa.int64(),
                }
            )
        )
    lut = {
        (int(f), int(t)): int(n)
        for f, t, n in zip(stats["field"], stats["term"], stats["n"])
    }
    n_docs = int(lut[(-1, -1)])
    total_toks = np.array(
        [int(lut[(fi, -2)]) for fi in range(len(fields))], dtype=np.int64
    )
    for fi, (col, _boost) in enumerate(fields):
        # fail loudly: a zero-token field makes the length norm 0/0 (nan
        # contribs -> garbage int64 scores) and diverges from the SQL
        # oracle, so it is a caller error, not a degenerate-input case
        if total_toks[fi] <= 0:
            raise ValueError(
                f"bm25_topk: field {col!r} has zero tokens across the corpus"
            )
    df_arr = np.array(
        [[int(lut.get((fi, int(t)), 0)) for t in terms] for fi in range(len(fields))],
        dtype=np.int64,
    )
    stats_ref = ray.put((terms, df_arr, n_docs, total_toks))

    def score(batch: pa.Table) -> pa.Table:
        terms_s, df_s, N, T_f = ray.get(stats_ref)
        doc = batch[id_col].to_numpy(zero_copy_only=False)
        # per-field per-doc length norms + term frequencies
        norms: list[np.ndarray] = []
        tf_by_field: list[dict[int, np.ndarray]] = []
        for fi, (col, _boost) in enumerate(fields):
            vals, offs = scalar.word_tokens_arrow(batch[col])
            t64 = vals.astype(np.int64)
            dl = np.diff(offs).astype(np.int64)
            # fixed op sequence (see docstring)
            norms.append((1.0 - b) + b * (dl.astype(np.float64) * N / int(T_f[fi])))
            tf_by_field.append(
                {int(term): _tf_per_doc(t64, offs, term) for term in terms_s}
            )
        qs, ds_, sc_ = [], [], []
        for qid, qterms in queries.items():
            score_q = np.zeros(batch.num_rows, dtype=np.int64)
            any_tf = np.zeros(batch.num_rows, dtype=np.int64)
            for term in qterms:
                ti = int(np.searchsorted(terms_s, term))
                for fi, (_col, boost) in enumerate(fields):
                    df = int(df_s[fi, ti])
                    tf = tf_by_field[fi][int(term)]
                    any_tf += tf
                    idf = (N - df + 0.5) / (df + 0.5)
                    tff = tf.astype(np.float64)
                    contrib = idf * (tff * (k1 + 1.0)) / (tff + k1 * norms[fi])
                    score_q += np.floor(contrib * (float(boost) * float(scale))).astype(
                        np.int64
                    )
            nz = np.flatnonzero(any_tf > 0)
            if len(nz) > k:  # keep ties at the cut (exact global order)
                kth = -np.partition(-score_q[nz], k - 1)[k - 1]
                nz = nz[score_q[nz] >= kth]
            qs.append(np.full(len(nz), qid, dtype=np.int64))
            ds_.append(doc[nz])
            sc_.append(score_q[nz])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qs)),
                id_col: pa.array(np.concatenate(ds_)),
                "score_q": pa.array(np.concatenate(sc_)),
            }
        )

    import pandas as pd

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["score_q", id_col], ascending=[False, True], kind="mergesort"
        ).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.groupby("query_id").map_groups(merge, batch_format="pandas")
