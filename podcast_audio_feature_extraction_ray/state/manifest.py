"""Resumable partitioned output with per-partition manifests.

Semantic recast of the reference's skip-if-output-exists resume
(``src/features/FeatureExtractor.py:68-90``) and retry-only-failed
anti-join (``src/search/index.py:124-160``), at partition granularity
instead of per-episode files (SURVEY §4 "checkpoint granularity"):

- output layout: ``{out_dir}/part={pid:05d}/data.parquet`` — one
  directory per hash partition of the session key, written ATOMICALLY
  (temp file + rename) inside the task that owns the partition;
- manifest:      ``{out_dir}/_manifest/part-{pid:05d}.json`` with
  lineage (key columns, partition count, row/byte counts, wall time,
  per-partition rows/sec throughput) —
  written only after the data rename succeeds;
- resume:        a rerun lists completed manifests and filters BOTH the
  input rows and the output exchange down to the pending complement
  (``pending = all EXCEPT completed``), then writes only those
  partitions. Output bytes are byte-identical across kill/restart
  because the partition hash is deterministic (stable 64-bit hash, not
  Python ``hash``) and the per-partition sort key fixes row order.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from podcast_audio_feature_extraction_ray import hashing


# version tag for the partition-hash function; recorded in every
# manifest and checked by the resume layout guard, so output written
# with an OLDER hash is refused instead of silently mis-resumed
HASH_VERSION = "ckh1"  # hashing.combined_key_hash (rotate-XOR combine)


def partition_of(batch: pa.Table, key_cols, num_partitions: int) -> np.ndarray:
    """Deterministic partition id per row: stable hash of key columns
    (the shared rotate-XOR combine — equal-valued key columns must not
    collapse into one straggler partition)."""
    h = hashing.combined_key_hash(
        pd.Series(batch[c].to_pandas()) for c in key_cols
    )
    return (h % np.uint64(num_partitions)).astype(np.int64)


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    m = json.load(fh)
                done.add(int(m["partition_id"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # torn manifest -> treat partition as pending
    return done


_FEATURE_DTYPES = {None: None, "float64": None,
                   "float32": "float32", "float16": "float16"}


def resume_complete(
    out_dir: str,
    key_cols=("doc_id", "source"),
    num_partitions: int = 64,
    feature_dtype: str | None = None,
    done: set[int] | None = None,
) -> bool:
    """True iff a prior run of the SAME layout finished completely.

    Public no-op-resume probe: ``job.py`` (and any caller) can skip
    pipeline construction entirely — no ``read_parquet``, no exchange —
    when this returns True. Two checks, in order:

    1. **Layout guard** (raises ``ValueError``): if any manifests exist,
       a sample manifest's recorded ``num_partitions``/``key_cols``/
       hash version/``feature_dtype`` must match this call — resuming
       with a different partitioning would silently drop rows whose
       new-layout pid collides with an old completed pid, so we refuse.
    2. **Run marker**: a completed run leaves ``_run_complete.json``
       recording how many partitions held data; if every one of them
       still has its manifest there is nothing pending (a crashed run
       has no marker and resumes normally ⇒ False).
    """
    key_cols = tuple(key_cols)
    dtype_label = feature_dtype or "float64"
    if done is None:  # callers holding the set already pass it in —
        done = completed_partitions(out_dir)  # one manifest scan per submit
    if not done:
        return False
    mdir = manifest_dir(out_dir)
    # completed_partitions tolerates torn manifests (power loss mid-json
    # -> partition pending), so the layout sample must skip them too —
    # taking [0] unconditionally would make one zero-length file render
    # the whole output unresumable with a JSONDecodeError
    prev = None
    for sample in sorted(
        f for f in os.listdir(mdir) if f.startswith("part-") and f.endswith(".json")
    ):
        try:
            with open(os.path.join(mdir, sample)) as fh:
                prev = json.load(fh)
            break
        except (json.JSONDecodeError, OSError):
            continue
    if prev is None:  # every manifest torn — nothing trustworthy: resume all
        return False
    prev_hash = prev.get("hash", "pre-ckh1")
    # single-column keys hash identically under every combine version
    # (the combine only touches column 2+), so pre-upgrade layouts
    # with one key column stay resumable
    hash_ok = prev_hash == HASH_VERSION or (
        prev_hash == "pre-ckh1" and len(key_cols) == 1
    )
    if (
        prev.get("num_partitions") != num_partitions
        or tuple(prev.get("key_cols", ())) != key_cols
        or not hash_ok
        or prev.get("feature_dtype", "float64") != dtype_label
    ):
        raise ValueError(
            f"resume layout mismatch for {out_dir}: existing manifests were "
            f"written with num_partitions={prev.get('num_partitions')} "
            f"key_cols={prev.get('key_cols')} hash={prev.get('hash', 'pre-ckh1')} "
            f"feature_dtype={prev.get('feature_dtype', 'float64')}, "
            f"this call uses num_partitions={num_partitions} "
            f"key_cols={list(key_cols)} hash={HASH_VERSION} "
            f"feature_dtype={dtype_label}"
        )
    marker = os.path.join(mdir, "_run_complete.json")
    if not os.path.exists(marker):
        return False
    with open(marker) as fh:
        mk = json.load(fh)
    return mk.get("n_manifests") == len(done)


def write_resumable(
    ds,
    out_dir: str,
    key_cols=("doc_id", "source"),
    num_partitions: int = 64,
    sort_within=("doc_id", "source", "ts_start"),
    input_lineage: list[str] | None = None,
    feature_dtype: str | None = None,
):
    """Write ``ds`` as resumable hash-partitioned Parquet.

    Returns the number of partitions written this run. Safe to re-invoke
    after a crash: completed partitions are skipped before the exchange.

    ``feature_dtype``: optional compact encoding for feature columns —
    every float64 column is cast to ``"float32"`` or ``"float16"``
    BEFORE the exchange (the reference stores features as float16 HDF5
    at ~4 % of input size, ``src/features/OpenSmileExtractor.py:54``;
    this is that storage knob, and casting early also halves/quarters
    the shuffle bytes). Keys/ints/strings are untouched. The dtype is
    recorded per manifest and resume refuses a mismatch — mixing widths
    across partitions would corrupt the read schema."""
    key_cols = tuple(key_cols)
    if feature_dtype not in _FEATURE_DTYPES:
        raise ValueError(
            f"feature_dtype must be one of {sorted(k for k in _FEATURE_DTYPES if k)} "
            f"or None, got {feature_dtype!r}"
        )
    dtype_label = feature_dtype or "float64"
    cast_to = {"float32": pa.float32(), "float16": pa.float16()}.get(
        _FEATURE_DTYPES[feature_dtype] or ""
    )
    done = completed_partitions(out_dir)
    if resume_complete(
        out_dir, key_cols=key_cols, num_partitions=num_partitions,
        feature_dtype=feature_dtype, done=done,
    ):
        return 0
    # hoisted out of tag(): np.isin would rebuild + sort this per batch
    done_arr = np.fromiter(done, dtype=np.int64) if done else None
    os.makedirs(manifest_dir(out_dir), exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        if cast_to is not None:
            # cast feature (float64) columns BEFORE the exchange: the
            # compact bytes ride the shuffle, not just the disk
            for i, field in enumerate(batch.schema):
                if pa.types.is_float64(field.type):
                    batch = batch.set_column(
                        i, field.name, batch[field.name].cast(cast_to)
                    )
        pid = partition_of(batch, key_cols, num_partitions)
        batch = batch.append_column("__part", pa.array(pid))
        if done_arr is not None:
            batch = batch.filter(pa.array(~np.isin(pid, done_arr)))
        return batch

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    sort_cols = [c for c in (sort_within or ()) ]

    def write_group(group: pa.Table) -> pa.Table:
        t0 = time.time()
        pid = int(group["__part"][0].as_py())
        if sort_cols:
            order = pa.compute.sort_indices(
                group.select(sort_cols),
                sort_keys=[(c, "ascending") for c in sort_cols],
            )
            group = group.take(order)
        group = group.drop_columns(["__part"])
        pdir = os.path.join(out_dir, f"part={pid:05d}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        dst = os.path.join(pdir, "data.parquet")
        pq.write_table(group, tmp)
        os.replace(tmp, dst)  # atomic on POSIX
        elapsed = max(time.time() - t0, 1e-9)
        man = {
            "partition_id": pid,
            "key_cols": list(key_cols),
            "num_partitions": num_partitions,
            "hash": HASH_VERSION,
            "feature_dtype": dtype_label,
            "rows_out": group.num_rows,
            "bytes_out": os.path.getsize(dst),
            "wall_time_s": round(elapsed, 4),
            # per-partition throughput: lets an operator spot straggler
            # partitions (skewed keys, slow disks) straight from the
            # manifest directory without re-running anything
            "rows_per_sec": round(group.num_rows / elapsed, 1),
            "input_lineage": input_lineage or [],
        }
        mtmp = os.path.join(manifest_dir(out_dir), f".part-{pid:05d}.tmp")
        mdst = os.path.join(manifest_dir(out_dir), f"part-{pid:05d}.json")
        with open(mtmp, "w") as fh:
            json.dump(man, fh)
        os.replace(mtmp, mdst)
        return pa.table({"partition_id": pa.array([pid], type=pa.int64()),
                         "rows_out": pa.array([group.num_rows], type=pa.int64())})

    written = tagged.groupby("__part").map_groups(write_group, batch_format="pyarrow")
    n = written.count()
    # run-completion marker (atomic) enables the no-op resume fast path
    total_manifests = len(completed_partitions(out_dir))
    marker = os.path.join(manifest_dir(out_dir), "_run_complete.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"n_manifests": total_manifests, "num_partitions": num_partitions,
             "key_cols": list(key_cols)},
            fh,
        )
    os.replace(tmp, marker)
    return n


def pending_fragments(files, out_dir: str) -> list[int]:
    """Fragment indices not yet covered by a completed-partition manifest
    whose recorded lineage matches the file (torn/mismatched manifests
    count as pending)."""
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return list(range(len(files)))
    pending = []
    for i, f in enumerate(files):
        mpath = os.path.join(mdir, f"part-{i:05d}.json")
        try:
            with open(mpath) as fh:
                m = json.load(fh)
            ok = m.get("input_lineage") == [os.path.abspath(f)] and m.get(
                "num_partitions"
            ) == len(files)
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            ok = False
        if not ok:
            pending.append(i)
    return pending


def write_resumable_fragments(
    files,
    batch_fn,
    out_dir: str,
    read_columns=None,
    sort_within=("doc_id", "source", "ts_start"),
):
    """Fragment-aligned resumable write: partition id = input FILE index.

    The reference's whole resume story is about not redoing the work
    (skip-if-output-exists ``src/features/FeatureExtractor.py:68-90``,
    failed-set anti-join ``src/search/index.py:124-160``: one output
    file per input episode, rerun processes only the missing ones). This
    is that semantics at fragment granularity: each input parquet file
    maps to one output partition + manifest recording its lineage, and a
    crashed-run resume builds the read from ``pending = all_fragments
    EXCEPT completed`` BEFORE ``read_parquet`` — the resume's read task
    count is proportional to pending fragments, not total input.

    ``batch_fn`` must be a stateless per-batch transform (pa.Table ->
    pa.Table) whose output rows derive only from the batch's rows — true
    for the row-per-session segmenter family. Output is byte-identical
    across kill/restart: per-partition sort + atomic rename.

    Returns the number of partitions written this run (0 = no-op resume,
    in which case NO input is read at all).
    """
    import ray.data as rd

    files = [os.path.abspath(f) for f in files]
    pending = pending_fragments(files, out_dir)
    if not pending:
        return 0
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    pid_of_path = {f: i for i, f in enumerate(files)}
    n_files = len(files)
    sort_cols = [c for c in (sort_within or ())]

    ds = rd.read_parquet(
        [files[i] for i in pending], columns=read_columns, include_paths=True
    )

    def transform(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # a legitimately 0-row fragment yields a 0-row (possibly
            # schema-less) block; pids[s] below would IndexError and the
            # fragment could never complete — emit a typed empty (the
            # zero-window backstop writes its manifest after the run)
            from podcast_audio_feature_extraction_ray.arrow_utils import (
                typed_empty_table,
            )

            return typed_empty_table({"__part": pa.int64()})
        paths = batch["path"].to_pylist()
        pids = np.array(
            [pid_of_path[os.path.abspath(p)] for p in paths], dtype=np.int64
        )
        out_parts = []
        # a batch is almost always single-fragment (blocks come from one
        # read task); split defensively on fragment change
        bounds = np.flatnonzero(np.concatenate([[True], pids[1:] != pids[:-1]]))
        bounds = np.append(bounds, len(pids))
        body = batch.drop_columns(["path"])
        for s, e in zip(bounds[:-1], bounds[1:]):
            out = batch_fn(body.slice(s, e - s))
            out_parts.append(
                out.append_column(
                    "__part", pa.array(np.full(out.num_rows, pids[s], dtype=np.int64))
                )
            )
        return pa.concat_tables(out_parts)

    def write_group(group: pa.Table) -> pa.Table:
        t0 = time.time()
        pid = int(group["__part"][0].as_py())
        if sort_cols:
            order = pa.compute.sort_indices(
                group.select(sort_cols),
                sort_keys=[(c, "ascending") for c in sort_cols],
            )
            group = group.take(order)
        group = group.drop_columns(["__part"])
        pdir = os.path.join(out_dir, f"part={pid:05d}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        dst = os.path.join(pdir, "data.parquet")
        pq.write_table(group, tmp)
        os.replace(tmp, dst)
        elapsed = max(time.time() - t0, 1e-9)
        man = {
            "partition_id": pid,
            "key_cols": [],
            "num_partitions": n_files,
            "rows_out": group.num_rows,
            "bytes_out": os.path.getsize(dst),
            "wall_time_s": round(elapsed, 4),
            "rows_per_sec": round(group.num_rows / elapsed, 1),
            "input_lineage": [files[pid]],
        }
        mtmp = os.path.join(manifest_dir(out_dir), f".part-{pid:05d}.tmp")
        mdst = os.path.join(manifest_dir(out_dir), f"part-{pid:05d}.json")
        with open(mtmp, "w") as fh:
            json.dump(man, fh)
        os.replace(mtmp, mdst)
        return pa.table(
            {
                "partition_id": pa.array([pid], type=pa.int64()),
                "rows_out": pa.array([group.num_rows], type=pa.int64()),
            }
        )

    written = (
        ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(write_group, batch_format="pyarrow")
    )
    n = written.count()
    # a fragment whose rows all segment to ZERO windows never reaches
    # write_group (the groupby has no group for it), so without a
    # manifest it would stay "pending" forever and every resume would
    # re-read and re-segment it. The pipeline completing without raising
    # means every pending fragment WAS processed — record the empty ones
    # so a finished run's resume is the advertised no-op. Re-check with
    # pending_fragments (lineage-aware), not completed_partitions: a pid
    # can hold a STALE manifest from an earlier layout (file renamed /
    # fragment count changed) that parses fine but mismatches lineage —
    # such a fragment was re-processed this run and must get a corrected
    # manifest, or it stays pending forever.
    still_pending = set(pending_fragments(files, out_dir))
    for pid in pending:
        if pid not in still_pending:
            continue
        man = {
            "partition_id": pid,
            "key_cols": [],
            "num_partitions": n_files,
            "rows_out": 0,
            "bytes_out": 0,
            "wall_time_s": 0.0,
            "rows_per_sec": 0.0,
            "input_lineage": [files[pid]],
        }
        # a STALE pid can still hold the previous layout's data file;
        # leaving it would make read_output return phantom rows that the
        # corrected rows_out=0 manifest (and the job summary) disclaim
        stale = os.path.join(out_dir, f"part={pid:05d}", "data.parquet")
        if os.path.exists(stale):
            os.remove(stale)
        mtmp = os.path.join(manifest_dir(out_dir), f".part-{pid:05d}.tmp")
        mdst = os.path.join(manifest_dir(out_dir), f"part-{pid:05d}.json")
        with open(mtmp, "w") as fh:
            json.dump(man, fh)
        os.replace(mtmp, mdst)
        n += 1
    return n


def read_output(out_dir: str):
    """Read back a resumable output directory as a Dataset."""
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    return rd.read_parquet(files)
