"""Cluster job entry point: the `ray job submit` deployment surface.

The engine deploys to a fixed-size multi-node Ray cluster as a Ray JOB —
one command that reads the pre-tokenized Parquet corpus, runs a flagship
windowing pipeline, writes resumable per-partition output, and prints a
one-line JSON metrics summary::

    ray job submit --address http://<head>:8265 --working-dir . -- \\
        python -m podcast_audio_feature_extraction_ray.job \\
            --input /data/tokens --output /data/windows \\
            --pipeline sessions --events /data/events.parquet

Inside the job supervisor the runtime exports ``RAY_ADDRESS``, so the
default ``ray.init(address=$RAY_ADDRESS)`` attaches to the submitting
cluster; run standalone it falls back to a local session. The module
owns its Ray session per the repo contract (only CLI entry points,
``bench.py`` and the test fixture call ``ray.init``), and only shuts
down a session it created — safe to call ``main()`` in-process under an
existing session (that path is what the tests drive).

Reference parity: this is the analog of the reference's batch drivers —
``src/features/feature_extraction.py`` (podcast_processing + a YAML of
extractor settings, run per show over the corpus) and the index/search
CLIs — collapsed into one idempotent command. Its resume semantics are
the reference's skip-if-output-exists rule
(``src/features/FeatureExtractor.py:68-90``): re-submitting the SAME
job after a crash skips completed partitions (``--pipeline rows``
skips completed input fragments before the read even starts) and a
fully-complete run is a sub-second no-op.

Output layout (all under ``--output``):

- ``windows/part=NNNNN/data.parquet``  — the windowed features, hash-
  partitioned (sessions) or fragment-aligned (rows), each with a JSON
  manifest carrying lineage (input fragments), row/byte counts and
  per-partition throughput — the north-star "per-partition checkpoints
  carrying lineage + metrics".
- ``backfill/*.parquet``  — (only with ``--events``) the point-in-time
  as-of attachment (win_id, bf_value, bf_ts) for every window.

The summary line aggregates the per-partition manifests so an operator
can spot stragglers (skewed sessions, slow disks) without touching the
output directory.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _parse_args(argv):
    p = argparse.ArgumentParser(
        prog="python -m podcast_audio_feature_extraction_ray.job",
        description="Windowed token feature extraction as a Ray job.",
    )
    p.add_argument("--input", required=True,
                   help="Parquet file or directory of the token table "
                        "(doc_id, tokens, n_tok, source, seq_no)")
    p.add_argument("--output", required=True, help="output root directory")
    p.add_argument("--pipeline", choices=("rows", "sessions"), default="rows",
                   help="rows: stateless per-row segmentation (zero shuffle, "
                        "fragment-aligned resume); sessions: sessionize multi-"
                        "row streams first (one hash shuffle)")
    p.add_argument("--window", type=int, default=96)
    p.add_argument("--hop", type=int, default=48)
    p.add_argument("--window-mode", choices=("frame", "segment"),
                   default="frame")
    p.add_argument("--emit-tokens", action="store_true",
                   help="carry the seg_tokens list column into the output "
                        "(default: aggregates only, the compact feature sink)")
    p.add_argument("--feature-dtype", choices=("float32", "float16"),
                   default=None,
                   help="compact feature encoding on the sink (sessions "
                        "pipeline only; the reference's float16 storage knob)")
    p.add_argument("--num-partitions", type=int, default=None,
                   help="output hash partitions (sessions pipeline only; "
                        "default 64)")
    p.add_argument("--events", default=None,
                   help="optional events parquet (doc_id, source, ts, value) "
                        "for a point-in-time backfill over the windows "
                        "(sessions pipeline only: rows-pipeline window "
                        "timestamps are fragment-local, so a stream-global "
                        "event time axis cannot attach to them)")
    p.add_argument("--address", default=None,
                   help="Ray address (default: $RAY_ADDRESS, else local)")
    args = p.parse_args(argv)
    if args.pipeline == "rows":
        # refuse sessions-only knobs instead of silently ignoring them:
        # an operator who asked for float16 must not get 4x the bytes
        for flag, val in (("--feature-dtype", args.feature_dtype),
                          ("--num-partitions", args.num_partitions),
                          ("--events", args.events)):
            if val is not None:
                p.error(f"{flag} requires --pipeline sessions "
                        "(the rows pipeline is fragment-aligned: its "
                        "partitioning mirrors the input files and its "
                        "window timestamps are fragment-local)")
    if args.num_partitions is None:
        args.num_partitions = 64
    return args


def _check_job_spec(args) -> None:
    """Refuse a re-submit whose geometry differs from the output's.

    The per-partition manifests guard the SINK layout (partition count,
    key columns, dtype), but not the WINDOW geometry: a re-submit of the
    same --output with a different --window/--hop/--window-mode/
    --emit-tokens — or the other pipeline, whose partitioning scheme is
    incompatible — would no-op against (or interleave with) data of the
    old shape and silently mislabel it. A job-level spec marker at the
    output root records the geometry on first submit; later submits
    must match or choose a fresh --output."""
    spec_path = os.path.join(args.output, "_job_spec.json")
    spec = {
        "pipeline": args.pipeline,
        # input identity: the sessions run-complete marker would
        # otherwise make a re-submit with a DIFFERENT --input a silent
        # successful no-op whose summary claims the new input
        "input": os.path.abspath(args.input),
        "window": args.window,
        "hop": args.hop,
        "window_mode": args.window_mode,
        "emit_tokens": bool(args.emit_tokens),
        "feature_dtype": args.feature_dtype,
        "num_partitions": args.num_partitions,
    }
    if os.path.exists(spec_path):
        with open(spec_path) as fh:
            prev = json.load(fh)
        if prev != spec:
            diffs = sorted(
                k for k in spec if prev.get(k, object()) != spec[k]
            )
            raise SystemExit(
                f"job spec mismatch for {args.output!r} on {diffs}: "
                f"existing output was written with {prev}, this submit "
                f"asks for {spec}; resume must use the same geometry, or "
                "point --output at a fresh directory"
            )
        return
    os.makedirs(args.output, exist_ok=True)
    tmp = spec_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(spec, fh)
    os.replace(tmp, spec_path)


def _manifest_stats(out_dir: str) -> dict:
    """Aggregate per-partition manifests into operator-facing stats."""
    mans = []
    for f in sorted(glob.glob(os.path.join(out_dir, "_manifest", "part-*.json"))):
        with open(f) as fh:
            mans.append(json.load(fh))
    if not mans:
        return {"partitions": 0}
    stats = {
        "partitions": len(mans),
        "rows_out": sum(m.get("rows_out", 0) for m in mans),
        "bytes_out": sum(m.get("bytes_out", 0) for m in mans),
    }
    # empty partitions (zero-window fragments) did no work: ranking them
    # as "stragglers" (rows_per_sec 0.0) would hide the actual slow ones
    busy = [m for m in mans if m.get("rows_out", 0) > 0]
    if busy:
        rps = sorted(m.get("rows_per_sec", 0.0) for m in busy)
        worst = sorted(busy, key=lambda m: m.get("rows_per_sec", 0.0))[:3]
        stats["rows_per_sec"] = {
            "min": rps[0],
            "p50": rps[len(rps) // 2],
            "max": rps[-1],
        }
        stats["straggler_partitions"] = [m["partition_id"] for m in worst]
    return stats


def run_job(args) -> dict:
    """Execute the pipeline under an ALREADY-INITIALIZED Ray session."""
    import ray.data as rd

    from podcast_audio_feature_extraction_ray.config import WindowSpec
    from podcast_audio_feature_extraction_ray.stages import asof
    from podcast_audio_feature_extraction_ray.stages import segment as seg
    from podcast_audio_feature_extraction_ray.state import manifest as mf

    spec = WindowSpec(window=args.window, hop=args.hop, mode=args.window_mode)
    win_dir = os.path.join(args.output, "windows")
    summary: dict = {
        "pipeline": args.pipeline,
        "input": os.path.abspath(args.input),
        "output": os.path.abspath(args.output),
        "spec": {"window": spec.window, "hop": spec.hop, "mode": spec.mode},
        "wall_s": {},
    }

    inp = args.input
    files = (
        sorted(glob.glob(os.path.join(inp, "*.parquet")))
        if os.path.isdir(inp) else [inp]
    )
    if not files:
        raise SystemExit(f"no parquet files under {inp!r}")
    # fail at submit time with a clear message, not with a KeyError in
    # every read task: both pipelines key/order on seq_no (rows carries
    # it as a key column; sessions sorts sessions by it)
    import pyarrow.parquet as _pq

    need = {"doc_id", "tokens", "source", "seq_no"}
    if args.pipeline == "sessions":
        # the sessionizer's metadata pre-pass selects n_tok explicitly
        # (stages/segment.py select_columns) — catch its absence here,
        # not inside distributed read tasks after the cluster spun up
        need.add("n_tok")
    # EVERY file, not just files[0]: mixed export versions in one input
    # directory would otherwise pass here and die mid-run inside
    # distributed read tasks — footer-only reads, cheap even at 10k files
    for f in files:
        have = set(_pq.read_schema(f).names)
        if not need <= have:
            raise SystemExit(
                f"input file {f!r} is missing {sorted(need - have)} "
                f"(found {sorted(have)}); expected the token-table shape "
                "(doc_id, tokens, n_tok, source, seq_no)"
            )
    # validate input BEFORE writing the spec marker: a typo'd submit must
    # not pin the geometry of an (empty) output directory
    _check_job_spec(args)

    t0 = time.time()
    if args.pipeline == "rows":
        # fragment-aligned resume: pending = input files minus completed
        # partitions, decided BEFORE read_parquet — a resumed run's read
        # task count is proportional to remaining work
        n_written = mf.write_resumable_fragments(
            files,
            lambda b: seg.segment_batch(
                b, spec, key_cols=("doc_id", "source", "seq_no"),
                with_aggregates=True, emit_tokens=args.emit_tokens,
            ),
            win_dir,
            # seq_no is load-bearing: segment_batch restarts ts_start at
            # 0 per row, so without it the sort key is not a total order
            # and crash-resume bytes would depend on shuffle arrival order
            sort_within=("doc_id", "source", "seq_no", "ts_start"),
        )
    elif mf.resume_complete(
        win_dir, key_cols=("doc_id", "source"),
        num_partitions=args.num_partitions,
        feature_dtype=args.feature_dtype,
    ):
        # idempotent re-submit: the run marker says every partition is
        # done, so skip pipeline CONSTRUCTION too (no read tasks, no
        # exchange actors — a sub-second no-op on the cluster)
        n_written = 0
    else:
        ds = rd.read_parquet(files)
        win = seg.segment_sessions(
            ds, spec, with_aggregates=True, emit_tokens=args.emit_tokens,
            payload="blockref",
        )
        n_written = mf.write_resumable(
            win, win_dir, key_cols=("doc_id", "source"),
            num_partitions=args.num_partitions,
            sort_within=("doc_id", "source", "ts_start"),
            input_lineage=files,
            feature_dtype=args.feature_dtype,
        )
    summary["wall_s"]["windows"] = round(time.time() - t0, 3)
    summary["partitions_written_this_run"] = n_written
    summary["windows"] = _manifest_stats(win_dir)

    if args.events:
        import shutil

        import pyarrow.parquet as pq

        t0 = time.time()
        bf_dir = os.path.join(args.output, "backfill")
        # derived data, rebuilt whole each submit: clearing first keeps
        # re-submission idempotent (write_parquet appends uniquely-named
        # files, so a stale directory would double every row)
        shutil.rmtree(bf_dir, ignore_errors=True)
        win_files = sorted(
            glob.glob(os.path.join(win_dir, "part=*", "data.parquet"))
        )
        if not win_files:
            # zero window partitions (every stream shorter than one
            # window): an empty backfill, not ray's opaque
            # "Must provide at least one path" ValueError
            summary["wall_s"]["backfill"] = round(time.time() - t0, 3)
            summary["backfill_rows"] = 0
            return summary
        events = pq.read_table(args.events)
        win_ds = rd.read_parquet(
            win_files, columns=["doc_id", "source", "win_id", "ts_end"],
        )
        bf = asof.backfill_broadcast(
            win_ds, events, key=("doc_id", "source"), mode="tasks",
        )
        bf.write_parquet(bf_dir, compression="zstd")
        summary["wall_s"]["backfill"] = round(time.time() - t0, 3)
        summary["backfill_rows"] = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(bf_dir, "*.parquet"))
        )
    return summary


def main(argv=None) -> dict:
    args = _parse_args(sys.argv[1:] if argv is None else argv)
    import ray

    owned = False
    if not ray.is_initialized():
        ray.init(
            address=args.address or os.environ.get("RAY_ADDRESS", "local"),
            ignore_reinit_error=True,
        )
        owned = True
    try:
        summary = run_job(args)
    finally:
        if owned:
            ray.shutdown()
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
