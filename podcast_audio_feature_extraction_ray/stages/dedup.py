"""Deduplication family for large-scale training-data pipelines.

- ``exact_dedup``        — content-hash exact dedup: md5 per doc, partial
  per-batch combine, small groupby. The T5 skip-if-done idea applied to
  content identity (reference ``src/features/FeatureExtractor.py:68-90``).
- ``minhash_lsh_pairs``  — shingle → minhash → banded LSH buckets →
  candidate pairs → signature-estimated Jaccard filter. One groupby on
  (band, band_hash); signatures ride the shuffle, never the full text.
- ``simhash_pairs``      — 64-bit simhash + 4x16-bit band blocking →
  hamming-verified near-dup pairs.
- ``ngram_jaccard_pairs``— exact within-block pairwise n-gram Jaccard
  (integer cross-multiplied threshold: no float boundary ambiguity).

Scale notes: pair generation is always blocked (source block, LSH
bucket, simhash band) — never a global cross product. Hot buckets are
the skew risk; bucket size is capped and overflow logged rather than
silently exploded.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MERSENNE61 = (1 << 61) - 1


def _md5_hex(texts) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Group identical texts: (text_hash, n_dups, keep_doc_id=min id)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "text_hash": _md5_hex(batch[text_col].to_pylist()),
                "id": batch[id_col].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("text_hash", sort=False)["id"].agg(["count", "min"]).reset_index()
        g.columns = ["text_hash", "n", "mn"]
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Min, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Sum("n", alias_name="n_dups"), Min("mn", alias_name="keep_doc_id"))
    )


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Stable 64-bit hashes of word n-grams (blake2b, deterministic)."""
    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = struct.unpack(
            "<Q", hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest()
        )[0]
    return out


def minhash_signature(text: str, num_perm: int, shingle: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of universal hashes over the shingle set."""
    h = _shingle_hashes(text, shingle)
    if len(h) == 0:
        return np.full(num_perm, np.uint64(MERSENNE61), dtype=np.uint64)
    # (a * h + b) mod p, vectorized over shingles x perms
    hh = (h % MERSENNE61).astype(np.uint64)
    vals = (a[:, None] * hh[None, :] + b[:, None]) % MERSENNE61
    return vals.min(axis=1).astype(np.uint64)


def _perm_params(num_perm: int, seed: int = 1717):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    est_threshold: float = 0.5,
    max_bucket: int = 200,
    seed: int = 1717,
):
    """Near-dup candidate pairs with signature-estimated Jaccard.

    Pipeline: per-batch signatures -> explode to (band, band_hash, id,
    signature) -> groupby band bucket -> pairs within bucket -> dedupe
    pairs -> estimate jaccard = mean(equal signature rows) and keep
    >= est_threshold. Buckets above ``max_bucket`` are truncated (logged
    via the ``truncated`` column on emitted pairs) — no silent quadratic
    blowup.
    """
    a, b = _perm_params(num_perm, seed)
    r = num_perm // bands

    def sigs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        n = len(ids)
        sig = np.empty((n, num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sig[i] = minhash_signature(t, num_perm, shingle, a, b)
        # explode to one row per (doc, band)
        band_id = np.tile(np.arange(bands, dtype=np.int64), n)
        rep_ids = np.repeat(np.asarray(ids), bands)
        bh = np.empty(n * bands, dtype=np.uint64)
        for i in range(n):
            for bi in range(bands):
                bh[i * bands + bi] = struct.unpack(
                    "<Q",
                    hashlib.blake2b(
                        sig[i, bi * r : (bi + 1) * r].tobytes(), digest_size=8
                    ).digest(),
                )[0]
        sig_list = pa.FixedSizeListArray.from_arrays(
            pa.array(np.repeat(sig, bands, axis=0).reshape(-1).view(np.int64)), num_perm
        )
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_hash": pa.array(bh.view(np.int64)),
                "id": pa.array(rep_ids),
                "sig": sig_list,
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        g = group.sort_by([("id", "ascending")])
        n = min(g.num_rows, max_bucket)
        ids = g["id"].to_numpy(zero_copy_only=False)[:n]
        sig = np.stack(
            [np.asarray(x) for x in g["sig"].to_pylist()[:n]]
        ).view(np.uint64) if n else np.empty((0, num_perm), np.uint64)
        rows = {"a": [], "b": [], "est_jaccard": [], "truncated": []}
        trunc = g.num_rows > max_bucket
        for i in range(n):
            eq = (sig[i + 1 :] == sig[i]).mean(axis=1)
            keep = np.flatnonzero(eq >= est_threshold)
            for j in keep:
                rows["a"].append(ids[i])
                rows["b"].append(ids[i + 1 + j])
                rows["est_jaccard"].append(float(eq[j]))
                rows["truncated"].append(trunc)
        return pa.table(
            {
                "a": pa.array(rows["a"], type=pa.int64()),
                "b": pa.array(rows["b"], type=pa.int64()),
                "est_jaccard": pa.array(rows["est_jaccard"], type=pa.float64()),
                "truncated": pa.array(rows["truncated"], type=pa.bool_()),
            }
        )

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair can match in several bands -> dedupe
    def first_only(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pairs.groupby(["a", "b"]).map_groups(first_only, batch_format="pandas")


def simhash64(text: str) -> int:
    """64-bit simhash over word unigrams (stable blake2b word hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = struct.unpack(
            "<Q", hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest()
        )[0]
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_pairs(
    ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
):
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: 4 bands of 16 bits — any pair within hamming 3 shares at
    least one exact 16-bit band (pigeonhole), so candidate recall is 1.
    """

    def sh(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hs = np.array([simhash64(t) for t in batch[text_col].to_pylist()], dtype=np.uint64)
        out = {"id": pa.array(ids), "simhash": pa.array(hs.view(np.int64))}
        for bi in range(4):
            out[f"band{bi}"] = pa.array(
                ((hs >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            )
        return pa.table(out)

    # materialize: four band-groupbys consume this small table (ids+hashes)
    hashed = ds.map_batches(sh, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def band_pairs(bi):
        def fn(group: pa.Table) -> pa.Table:
            g = group.sort_by([("id", "ascending")])
            ids = g["id"].to_numpy(zero_copy_only=False)
            hs = g["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
            a_out, b_out, d_out = [], [], []
            for i in range(len(ids)):
                x = hs[i + 1 :] ^ hs[i]
                d = np.array([bin(int(v)).count("1") for v in x])
                keep = np.flatnonzero(d <= max_hamming)
                for j in keep:
                    a_out.append(ids[i])
                    b_out.append(ids[i + 1 + j])
                    d_out.append(int(d[j]))
            return pa.table(
                {
                    "a": pa.array(a_out, type=pa.int64()),
                    "b": pa.array(b_out, type=pa.int64()),
                    "hamming": pa.array(d_out, type=pa.int64()),
                }
            )

        return fn

    parts = []
    for bi in range(4):
        parts.append(
            hashed.groupby(f"band{bi}").map_groups(band_pairs(bi), batch_format="pyarrow")
        )
    allp = parts[0].union(*parts[1:])

    def first_only(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return allp.groupby(["a", "b"]).map_groups(first_only, batch_format="pandas")


def ngram_jaccard_pairs(
    ds,
    block_key: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    thresh_num: int = 1,
    thresh_den: int = 5,
):
    """Exact n-gram Jaccard pairs within blocks; threshold compared as
    ``thresh_den * inter >= thresh_num * union`` (pure integer math, so
    the DuckDB oracle matches bit-for-bit)."""

    def block(group: pa.Table) -> pa.Table:
        g = group.sort_by([(id_col, "ascending")])
        ids = g[id_col].to_numpy(zero_copy_only=False)
        texts = g[text_col].to_pylist()
        sets = []
        for t in texts:
            words = t.split(" ")
            sets.append(
                {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
                if len(words) >= n
                else ({" ".join(words)} if t else set())
            )
        key = g[block_key][0].as_py() if g.num_rows else None
        rows = {"a": [], "b": [], "inter_n": [], "union_n": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                if inter == 0:
                    continue
                uni = len(sets[i]) + len(sets[j]) - inter
                if thresh_den * inter >= thresh_num * uni:
                    rows["a"].append(ids[i])
                    rows["b"].append(ids[j])
                    rows["inter_n"].append(inter)
                    rows["union_n"].append(uni)
        t = pa.table(
            {
                block_key: pa.array([key] * len(rows["a"]), type=g[block_key].type),
                "a": pa.array(rows["a"], type=pa.int64()),
                "b": pa.array(rows["b"], type=pa.int64()),
                "inter_n": pa.array(rows["inter_n"], type=pa.int64()),
                "union_n": pa.array(rows["union_n"], type=pa.int64()),
            }
        )
        return t

    return ds.groupby(block_key).map_groups(block, batch_format="pyarrow")
