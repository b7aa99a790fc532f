"""The `ray job submit` entry point (job.py): end-to-end through main().

Drives the CLI surface in-process under the shared test session (main()
only owns a Ray session it created itself), asserting the north-star job
contract: windows written resumable with per-partition lineage+metrics
manifests, idempotent no-op re-submit, and the optional point-in-time
backfill stage. Reference resume analog:
src/features/FeatureExtractor.py:68-90 (skip-if-output-exists)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from podcast_audio_feature_extraction_ray import fixtures, job


@pytest.fixture(scope="module")
def token_dir(tmp_path_factory):
    """(tokens dir with 3 fragments, path to an events parquet)."""
    root = tmp_path_factory.mktemp("jobtok")
    tok = root / "tokens"
    tbl = fixtures.token_table(800, n_docs=40, seed=7)
    step = -(-tbl.num_rows // 3)
    for i in range(3):
        part = tbl.slice(i * step, step)
        fixtures.write_fixture(part, str(tok / f"part-{i}.parquet"))
    ev = fixtures.event_table(tbl, rate=1 / 50.0)
    pq.write_table(ev, str(root / "events.parquet"))
    return str(tok), str(root / "events.parquet")


def _run(argv):
    return job.main(argv)


def test_rows_job_writes_manifests_and_resumes(token_dir, tmp_path):
    tok, _ = token_dir
    out = str(tmp_path / "out")
    s1 = _run(["--input", tok, "--output", out, "--pipeline", "rows"])
    assert s1["partitions_written_this_run"] == 3  # one per input fragment
    assert s1["windows"]["partitions"] == 3
    assert s1["windows"]["rows_out"] > 0

    # every manifest carries lineage + throughput metrics
    mans = sorted(glob.glob(os.path.join(out, "windows", "_manifest", "part-*.json")))
    assert len(mans) == 3
    for m in (json.load(open(f)) for f in mans):
        assert m["input_lineage"] and m["input_lineage"][0].endswith(".parquet")
        assert m["rows_out"] > 0 and m["rows_per_sec"] > 0

    data = sorted(glob.glob(os.path.join(out, "windows", "part=*", "data.parquet")))
    before = [(f, os.path.getsize(f), os.path.getmtime(f)) for f in data]

    # re-submit: no pending fragments -> zero partitions rewritten,
    # output bytes untouched (idempotent resume)
    s2 = _run(["--input", tok, "--output", out, "--pipeline", "rows"])
    assert s2["partitions_written_this_run"] == 0
    after = [(f, os.path.getsize(f), os.path.getmtime(f)) for f in data]
    assert before == after


def test_sessions_job_with_backfill(token_dir, tmp_path):
    tok, events = token_dir
    out = str(tmp_path / "out")
    s = _run([
        "--input", tok, "--output", out,
        "--pipeline", "sessions", "--num-partitions", "8",
        "--events", events,
    ])
    assert s["windows"]["partitions"] == 8
    assert s["windows"]["rows_out"] > 0
    assert s["backfill_rows"] == s["windows"]["rows_out"]  # one bf row per window
    bf = sorted(glob.glob(os.path.join(out, "backfill", "*.parquet")))
    cols = set(pq.read_schema(bf[0]).names)
    assert {"win_id", "bf_value", "bf_ts"} <= cols

    # rows written match a direct read-back of the partitioned output
    from podcast_audio_feature_extraction_ray.state import manifest as mf

    assert mf.read_output(os.path.join(out, "windows")).count() == s["windows"]["rows_out"]

    # re-submit with --events: windows no-op AND backfill is rebuilt, not
    # appended — row count must not double
    s2 = _run([
        "--input", tok, "--output", out,
        "--pipeline", "sessions", "--num-partitions", "8",
        "--events", events,
    ])
    assert s2["partitions_written_this_run"] == 0
    assert s2["backfill_rows"] == s["backfill_rows"]


def test_job_rejects_wrong_schema(token_dir, tmp_path):
    _, events = token_dir
    out = str(tmp_path / "out")
    with pytest.raises(SystemExit, match="seq_no"):
        _run(["--input", events, "--output", out, "--pipeline", "rows"])


def test_job_refuses_spec_change_on_resubmit(token_dir, tmp_path):
    """A re-submit with a different window geometry must refuse, not
    silently no-op against (or interleave with) old-shape output."""
    tok, _ = token_dir
    out = str(tmp_path / "out")
    _run(["--input", tok, "--output", out, "--pipeline", "rows"])
    with pytest.raises(SystemExit, match="spec mismatch.*window"):
        _run(["--input", tok, "--output", out, "--pipeline", "rows",
              "--window", "48"])
    # ... and the OTHER pipeline over the same output is a layout change
    with pytest.raises(SystemExit, match="spec mismatch.*pipeline"):
        _run(["--input", tok, "--output", out, "--pipeline", "sessions"])
    # same geometry still resumes as a no-op
    s = _run(["--input", tok, "--output", out, "--pipeline", "rows"])
    assert s["partitions_written_this_run"] == 0


def test_job_refuses_input_change_on_resubmit(token_dir, tmp_path):
    """Same --output, different --input must refuse: the run-complete
    marker would otherwise make it a silent successful no-op whose
    summary claims the new input while all data is from the old one."""
    import shutil

    tok, _ = token_dir
    out = str(tmp_path / "out")
    _run(["--input", tok, "--output", out, "--pipeline", "rows"])
    other = str(tmp_path / "othertok")
    os.makedirs(other)
    shutil.copy(sorted(glob.glob(os.path.join(tok, "*.parquet")))[0], other)
    with pytest.raises(SystemExit, match="spec mismatch.*input"):
        _run(["--input", other, "--output", out, "--pipeline", "rows"])


def test_failed_submit_does_not_pin_spec(token_dir, tmp_path):
    """A submit refused on input validation (typo'd path, wrong schema)
    must not write _job_spec.json — otherwise the failed attempt's
    geometry pins an EMPTY output dir and the corrected re-submit is
    refused with a spec mismatch."""
    tok, events = token_dir
    out = str(tmp_path / "out")
    with pytest.raises(SystemExit, match="seq_no"):
        _run(["--input", events, "--output", out, "--pipeline", "rows",
              "--window", "48"])
    assert not os.path.exists(os.path.join(out, "_job_spec.json"))
    # corrected submit with the intended default geometry succeeds
    s = _run(["--input", tok, "--output", out, "--pipeline", "rows"])
    assert s["partitions_written_this_run"] == 3


def test_sessions_job_requires_n_tok_at_submit(token_dir, tmp_path):
    """segment_sessions' metadata pre-pass selects n_tok explicitly; its
    absence must fail at submit time with a clear message, not inside
    distributed read tasks. The rows pipeline (list-offset segmenter)
    has no such requirement and must still run."""
    tok, _ = token_dir
    src = sorted(glob.glob(os.path.join(tok, "*.parquet")))[0]
    stripped = pq.read_table(src).drop_columns(["n_tok"])
    notok = tmp_path / "no_ntok"
    os.makedirs(notok)
    pq.write_table(stripped, str(notok / "f.parquet"))
    with pytest.raises(SystemExit, match="n_tok"):
        _run(["--input", str(notok), "--output", str(tmp_path / "o1"),
              "--pipeline", "sessions"])
    s = _run(["--input", str(notok), "--output", str(tmp_path / "o2"),
              "--pipeline", "rows"])
    assert s["windows"]["rows_out"] > 0


def test_manifest_stats_excludes_empty_partitions(tmp_path):
    """Zero-row partitions (empty-fragment backstop manifests, rows_per_sec
    0.0) did no work: they must not occupy the straggler list or drag the
    throughput minimum to 0."""
    mdir = tmp_path / "out" / "_manifest"
    os.makedirs(mdir)
    for pid, rows, rps in ((0, 100, 10.0), (1, 0, 0.0), (2, 100, 99.0)):
        with open(mdir / f"part-{pid:05d}.json", "w") as fh:
            json.dump({"partition_id": pid, "rows_out": rows,
                       "bytes_out": rows * 8, "rows_per_sec": rps}, fh)
    st = job._manifest_stats(str(tmp_path / "out"))
    assert st["partitions"] == 3
    assert st["rows_per_sec"]["min"] == 10.0
    assert st["straggler_partitions"] == [0, 2]  # pid 1 excluded


def test_job_refuses_sessions_only_flags_with_rows(token_dir, tmp_path):
    """--feature-dtype / --num-partitions / --events are sessions-only:
    silently ignoring them would hand back 4x the bytes (dtype) or
    fragment-local-timestamp backfill values (events)."""
    tok, events = token_dir
    out = str(tmp_path / "out")
    for extra in (["--feature-dtype", "float16"],
                  ["--num-partitions", "8"],
                  ["--events", events]):
        with pytest.raises(SystemExit):
            _run(["--input", tok, "--output", out, "--pipeline", "rows",
                  *extra])
    assert not os.path.exists(out)  # refused before touching the output


def test_job_rejects_mixed_schema_directory(token_dir, tmp_path):
    """EVERY input file's schema is validated at submit time — one
    stray mixed-export-version file must fail with the clear message,
    not a mid-run KeyError in a read task."""
    import shutil

    tok, events = token_dir
    mixed = tmp_path / "mixed"
    shutil.copytree(tok, mixed)
    # a later fragment with the token schema minus seq_no
    good = pq.read_table(os.path.join(tok, "part-0.parquet"))
    pq.write_table(good.drop_columns(["seq_no"]), str(mixed / "part-9.parquet"))
    out = str(tmp_path / "out")
    with pytest.raises(SystemExit, match="part-9.*seq_no"):
        _run(["--input", str(mixed), "--output", out, "--pipeline", "rows"])
    # the failed submit must not have pinned the spec
    assert not os.path.exists(os.path.join(out, "_job_spec.json"))


def test_backfill_with_zero_window_partitions(token_dir, tmp_path):
    """All streams shorter than one window -> the sessions pipeline
    writes zero partitions; --events must produce an EMPTY backfill, not
    ray's 'Must provide at least one path' ValueError."""
    import numpy as np
    import pyarrow as pa

    _, events = token_dir
    short = tmp_path / "short"
    os.makedirs(short)
    tmpl = fixtures.token_table(50, n_docs=2, seed=1)
    tiny = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array([[], []], type=tmpl["tokens"].type),
            "n_tok": pa.array(np.array([0, 0]), type=tmpl["n_tok"].type),
            "source": pa.array(["s", "s"]),
            "seq_no": pa.array(np.array([0, 0]), type=tmpl["seq_no"].type),
        }
    ).select(tmpl.column_names).cast(tmpl.schema)
    pq.write_table(tiny, str(short / "part-0.parquet"))
    out = str(tmp_path / "out")
    s = _run([
        "--input", str(short), "--output", out, "--pipeline", "sessions",
        "--num-partitions", "4", "--events", events,
    ])
    # zero window partitions -> no manifests (partitions 0) and an
    # empty backfill instead of the read_parquet([]) crash
    assert s["windows"].get("rows_out", 0) == 0
    assert s["windows"]["partitions"] == 0
    assert s["backfill_rows"] == 0
    assert not glob.glob(os.path.join(out, "backfill", "*.parquet"))
