"""Resume idempotence (FIXTURES.md plan 5): kill/restart ⇒ identical output."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import pyarrow.parquet as pq
import ray.data as rd

from podcast_audio_feature_extraction_ray.config import WindowSpec
from podcast_audio_feature_extraction_ray.stages import segment as seg
from podcast_audio_feature_extraction_ray.state import manifest as mf


def _run(tokens, out_dir, num_partitions=8):
    ds = rd.from_arrow(tokens)
    win = seg.segment_rows(ds, WindowSpec(16, 8, "frame"), key_cols=("doc_id", "source", "seq_no"))
    return mf.write_resumable(
        win, out_dir, key_cols=("doc_id", "source"), num_partitions=num_partitions,
        sort_within=("doc_id", "source", "seq_no", "ts_start"),
    )


def _hash_dir(out_dir) -> dict:
    out = {}
    for f in sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet"))):
        out[os.path.relpath(f, out_dir)] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_resume_skips_done_and_is_byte_identical(tiny_tokens, tmp_path):
    full = str(tmp_path / "full")
    n1 = _run(tiny_tokens, full)
    assert n1 > 0
    h_full = _hash_dir(full)
    assert len(h_full) == n1
    assert mf.completed_partitions(full) == set(range(n1)) or len(mf.completed_partitions(full)) == n1

    # simulate a crash: drop half the partitions + their manifests
    crashed = str(tmp_path / "crashed")
    shutil.copytree(full, crashed)
    victims = sorted(mf.completed_partitions(crashed))[::2]
    for pid in victims:
        shutil.rmtree(os.path.join(crashed, f"part={pid:05d}"))
        os.remove(os.path.join(mf.manifest_dir(crashed), f"part-{pid:05d}.json"))

    n2 = _run(tiny_tokens, crashed)
    assert n2 == len(victims)  # only the pending complement was rewritten
    assert _hash_dir(crashed) == h_full  # byte-identical after resume

    # third run: everything done -> nothing written
    n3 = _run(tiny_tokens, crashed)
    assert n3 == 0


def test_read_back_roundtrip(tiny_tokens, tmp_path):
    out = str(tmp_path / "o")
    _run(tiny_tokens, out)
    ds = mf.read_output(out)
    direct = seg.segment_rows(
        rd.from_arrow(tiny_tokens), WindowSpec(16, 8, "frame"),
        key_cols=("doc_id", "source", "seq_no"),
    )
    assert ds.count() == direct.count()


def test_resume_layout_mismatch_refused(tiny_tokens, tmp_path):
    """Re-invoking write_resumable with a different num_partitions or
    key_cols must raise, not silently drop colliding partitions."""
    import pytest

    out = str(tmp_path / "layout")
    _run(tiny_tokens, out, num_partitions=8)
    with pytest.raises(ValueError, match="layout mismatch"):
        _run(tiny_tokens, out, num_partitions=16)
    ds = rd.from_arrow(tiny_tokens)
    win = seg.segment_rows(
        ds, WindowSpec(16, 8, "frame"), key_cols=("doc_id", "source", "seq_no")
    )
    with pytest.raises(ValueError, match="layout mismatch"):
        mf.write_resumable(win, out, key_cols=("doc_id",), num_partitions=8)


def test_fragment_resume_reads_only_pending(tiny_tokens, tmp_path):
    """Partial-crash resume with input-fragment exclusion: partitions map
    1:1 to input files via manifest lineage; resuming after k of n
    partitions were lost (i) re-reads ONLY the pending fragments, (ii)
    leaves completed partitions untouched, (iii) reproduces the full run
    byte-for-byte."""
    import numpy as np
    import pyarrow as pa

    spec = WindowSpec(16, 8, "frame")

    def batch_fn(b: pa.Table) -> pa.Table:
        return seg.segment_batch(
            b, spec, key_cols=("doc_id", "source", "seq_no"), with_aggregates=True,
            emit_tokens=False,
        )

    # 6 input fragments
    frag_dir = tmp_path / "frags"
    os.makedirs(frag_dir)
    n = tiny_tokens.num_rows
    bounds = np.linspace(0, n, 7).astype(int)
    files, frag_rows = [], []
    for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        p = str(frag_dir / f"f{i}.parquet")
        pq.write_table(tiny_tokens.slice(s, e - s), p)
        files.append(p)
        frag_rows.append(e - s)

    sortw = ("doc_id", "source", "seq_no", "ts_start")
    full = str(tmp_path / "full")
    assert mf.write_resumable_fragments(files, batch_fn, full, sort_within=sortw) == 6
    h_full = _hash_dir(full)
    assert len(h_full) == 6

    # crashed run: 6 written, then partitions 1 and 4 lost (data+manifest)
    crash = str(tmp_path / "crash")
    assert mf.write_resumable_fragments(files, batch_fn, crash, sort_within=sortw) == 6
    for pid in (1, 4):
        os.remove(os.path.join(crash, f"part={pid:05d}", "data.parquet"))
        os.remove(os.path.join(crash, "_manifest", f"part-{pid:05d}.json"))
    keep_mtimes = {
        pid: os.path.getmtime(os.path.join(crash, f"part={pid:05d}", "data.parquet"))
        for pid in (0, 2, 3, 5)
    }
    assert mf.pending_fragments(files, crash) == [1, 4]

    # resume with a counting transform: only pending fragments' rows flow
    cnt_dir = tmp_path / "cnt"
    os.makedirs(cnt_dir)

    def counting_fn(b: pa.Table) -> pa.Table:
        import uuid

        with open(cnt_dir / f"{uuid.uuid4().hex}", "w") as fh:
            fh.write(str(b.num_rows))
        return batch_fn(b)

    assert mf.write_resumable_fragments(files, counting_fn, crash, sort_within=sortw) == 2
    rows_seen = sum(int(open(f).read()) for f in glob.glob(str(cnt_dir / "*")))
    assert rows_seen == frag_rows[1] + frag_rows[4]  # NOT the full input
    for pid, mt in keep_mtimes.items():
        assert os.path.getmtime(os.path.join(crash, f"part={pid:05d}", "data.parquet")) == mt
    assert _hash_dir(crash) == h_full
    # no-op resume: nothing pending, nothing read
    assert mf.write_resumable_fragments(files, batch_fn, crash, sort_within=sortw) == 0


def test_zero_row_fragment_gets_manifest(tiny_tokens, tmp_path):
    """A fragment whose rows all segment to zero windows must still get
    a (rows_out=0) manifest: without one it stays pending forever and
    every resume of a FINISHED run re-reads and re-segments it — the
    job's sub-second-no-op contract would never be reached."""
    import pyarrow as pa

    spec = WindowSpec(16, 8, "frame")

    def batch_fn(b: pa.Table) -> pa.Table:
        return seg.segment_batch(
            b, spec, key_cols=("doc_id", "source", "seq_no"),
            with_aggregates=True, emit_tokens=False,
        )

    frag_dir = tmp_path / "frags"
    os.makedirs(frag_dir)
    # fragment 1 holds only empty token lists -> zero windows out
    empty = pa.table(
        {
            "doc_id": pa.array(["ed1", "ed2"]),
            "tokens": pa.array([[], []], type=tiny_tokens["tokens"].type),
            "n_tok": pa.array([0, 0], type=pa.int64()),
            "source": pa.array(["s", "s"]),
            "seq_no": pa.array([0, 0], type=pa.int64()),
        }
    ).select(tiny_tokens.column_names).cast(tiny_tokens.schema)
    half = tiny_tokens.num_rows // 2
    frags = [tiny_tokens.slice(0, half), empty, tiny_tokens.slice(half)]
    files = []
    for i, t in enumerate(frags):
        p = str(frag_dir / f"f{i}.parquet")
        pq.write_table(t, p)
        files.append(p)

    sortw = ("doc_id", "source", "seq_no", "ts_start")
    out = str(tmp_path / "out")
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 3
    # the empty fragment: manifest yes, data file no
    man = os.path.join(out, "_manifest", "part-00001.json")
    assert os.path.exists(man)
    import json as _json

    m = _json.load(open(man))
    assert m["rows_out"] == 0 and m["input_lineage"] == [files[1]]
    assert not os.path.exists(os.path.join(out, "part=00001", "data.parquet"))
    # finished run -> nothing pending, resume is a true no-op
    assert mf.pending_fragments(files, out) == []
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 0
    assert mf.read_output(out).count() > 0


def test_stale_lineage_zero_window_fragment_corrected(tiny_tokens, tmp_path):
    """A pid holding a STALE manifest (lineage mismatch — file renamed,
    fragment set changed) whose re-read segments to zero windows must get
    a CORRECTED manifest from the backstop: manifest presence alone must
    not suppress it, or the fragment stays pending forever and the no-op
    resume is never reached."""
    import json as _json

    import pyarrow as pa

    spec = WindowSpec(16, 8, "frame")

    def batch_fn(b: pa.Table) -> pa.Table:
        return seg.segment_batch(
            b, spec, key_cols=("doc_id", "source", "seq_no"),
            with_aggregates=True, emit_tokens=False,
        )

    frag_dir = tmp_path / "frags"
    os.makedirs(frag_dir)
    empty = pa.table(
        {
            "doc_id": pa.array(["ed1"]),
            "tokens": pa.array([[]], type=tiny_tokens["tokens"].type),
            "n_tok": pa.array([0], type=pa.int64()),
            "source": pa.array(["s"]),
            "seq_no": pa.array([0], type=pa.int64()),
        }
    ).select(tiny_tokens.column_names).cast(tiny_tokens.schema)
    files = []
    for i, t in enumerate((tiny_tokens, empty)):
        p = str(frag_dir / f"f{i}.parquet")
        pq.write_table(t, p)
        files.append(p)

    sortw = ("doc_id", "source", "seq_no", "ts_start")
    out = str(tmp_path / "out")
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 2

    # stale the empty fragment's manifest: wrong lineage path
    man = os.path.join(out, "_manifest", "part-00001.json")
    m = _json.load(open(man))
    m["input_lineage"] = ["/nonexistent/old.parquet"]
    with open(man, "w") as fh:
        _json.dump(m, fh)
    assert mf.pending_fragments(files, out) == [1]

    # re-run: fragment 1 re-segments to zero windows; the backstop must
    # overwrite the stale manifest with the correct lineage
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 1
    m2 = _json.load(open(man))
    assert m2["rows_out"] == 0 and m2["input_lineage"] == [files[1]]
    assert mf.pending_fragments(files, out) == []
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 0


def test_resume_hash_version_mismatch_refused(tiny_tokens, tmp_path):
    """Output written with an OLDER partition-hash (manifests lacking the
    hash field) must be refused — resuming onto it with the current hash
    would route rows to different partitions and silently drop some."""
    import json
    import os

    import pytest

    out = str(tmp_path / "hashver")
    _run(tiny_tokens, out, num_partitions=8)
    # simulate a pre-ckh1 manifest: strip the hash field from every one
    mdir = mf.manifest_dir(out)
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            p = os.path.join(mdir, f)
            with open(p) as fh:
                m = json.load(fh)
            m.pop("hash", None)
            with open(p, "w") as fh:
                json.dump(m, fh)
    os.remove(os.path.join(mdir, "_run_complete.json"))  # force a resume path
    with pytest.raises(ValueError, match="layout mismatch"):
        _run(tiny_tokens, out, num_partitions=8)


def test_resume_pre_ckh1_single_key_still_resumable(tiny_tokens, tmp_path):
    """Single-column keys hash identically under every combine version,
    so a pre-upgrade layout (manifests without the hash field) must stay
    resumable — only multi-key layouts are refused."""
    import json

    ds = rd.from_arrow(tiny_tokens)
    win = seg.segment_rows(
        ds, WindowSpec(16, 8, "frame"), key_cols=("doc_id", "source", "seq_no")
    )
    out = str(tmp_path / "singlekey")
    mf.write_resumable(win, out, key_cols=("doc_id",), num_partitions=8)
    mdir = mf.manifest_dir(out)
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            p = os.path.join(mdir, f)
            with open(p) as fh:
                m = json.load(fh)
            m.pop("hash", None)
            with open(p, "w") as fh:
                json.dump(m, fh)
    os.remove(os.path.join(mdir, "_run_complete.json"))
    # resumes without error (and writes nothing new: all partitions done)
    n = mf.write_resumable(win, out, key_cols=("doc_id",), num_partitions=8)
    assert n == 0


def test_backfill_join_rejects_unknown_payload(tiny_tokens):
    import pytest

    from podcast_audio_feature_extraction_ray.stages import asof

    ds = rd.from_arrow(tiny_tokens)
    win = seg.segment_rows(ds, WindowSpec(16, 8, "frame"))
    with pytest.raises(ValueError, match="payload mode"):
        asof.backfill_join(win, ds, payload="Blockref")


def _run_dtype(tokens, out_dir, feature_dtype=None):
    ds = rd.from_arrow(tokens)
    win = seg.segment_rows(
        ds, WindowSpec(16, 8, "frame"),
        key_cols=("doc_id", "source", "seq_no"), with_aggregates=True,
        emit_tokens=False,
    )
    return mf.write_resumable(
        win, out_dir, key_cols=("doc_id", "source"), num_partitions=8,
        sort_within=("doc_id", "source", "seq_no", "ts_start"),
        feature_dtype=feature_dtype,
    )


def test_feature_dtype_compact_sink(tiny_tokens, tmp_path):
    """float16 feature sink: float64 columns cast before the exchange,
    bytes shrink, values equal the float64 output cast to f16, resume
    stays byte-identical, and dtype mismatch on resume is refused."""
    import numpy as np
    import pytest

    full = str(tmp_path / "f64")
    half = str(tmp_path / "f16")
    _run_dtype(tiny_tokens, full)
    _run_dtype(tiny_tokens, half, feature_dtype="float16")

    size = lambda d: sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(d, "part=*", "data.parquet"))
    )
    assert size(half) < size(full)

    a = rd.read_parquet(full).to_pandas().sort_values(
        ["doc_id", "source", "seq_no", "ts_start"]).reset_index(drop=True)
    b = rd.read_parquet(half).to_pandas().sort_values(
        ["doc_id", "source", "seq_no", "ts_start"]).reset_index(drop=True)
    f64_cols = [c for c in a.columns if a[c].dtype == np.float64]
    assert f64_cols  # aggregates produce float features
    for c in f64_cols:
        assert b[c].dtype == np.float16
        np.testing.assert_array_equal(
            a[c].to_numpy().astype(np.float16), b[c].to_numpy()
        )
    # non-float columns untouched
    for c in a.columns:
        if c not in f64_cols:
            assert a[c].dtype == b[c].dtype

    # crash-resume at f16 is byte-identical
    h_half = _hash_dir(half)
    victims = sorted(mf.completed_partitions(half))[::2]
    for pid in victims:
        shutil.rmtree(os.path.join(half, f"part={pid:05d}"))
        os.remove(os.path.join(mf.manifest_dir(half), f"part-{pid:05d}.json"))
    n2 = _run_dtype(tiny_tokens, half, feature_dtype="float16")
    assert n2 == len(victims)
    assert _hash_dir(half) == h_half

    # resuming with a DIFFERENT dtype must refuse
    victims = sorted(mf.completed_partitions(half))[:1]
    for pid in victims:
        shutil.rmtree(os.path.join(half, f"part={pid:05d}"))
        os.remove(os.path.join(mf.manifest_dir(half), f"part-{pid:05d}.json"))
    with pytest.raises(ValueError, match="feature_dtype"):
        _run_dtype(tiny_tokens, half)  # default float64 vs stored float16
    with pytest.raises(ValueError, match="feature_dtype"):
        mf.write_resumable(
            rd.from_arrow(tiny_tokens), str(tmp_path / "bad"),
            feature_dtype="float8",
        )


def test_stale_fragment_data_file_removed_on_zero_window_correction(
    tiny_tokens, tmp_path
):
    """When the backstop corrects a stale-lineage pid to rows_out=0, the
    pid's PREVIOUS data.parquet must be removed — otherwise read_output
    returns phantom rows belonging to no current fragment while the
    manifest claims 0."""
    import json as _json

    import pyarrow as pa

    spec = WindowSpec(16, 8, "frame")

    def batch_fn(b: pa.Table) -> pa.Table:
        return seg.segment_batch(
            b, spec, key_cols=("doc_id", "source", "seq_no"),
            with_aggregates=True, emit_tokens=False,
        )

    frag_dir = tmp_path / "frags"
    os.makedirs(frag_dir)
    half = tiny_tokens.slice(0, max(1, tiny_tokens.num_rows // 2))
    files = []
    for i, t in enumerate((tiny_tokens, half)):
        p = str(frag_dir / f"f{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    sortw = ("doc_id", "source", "seq_no", "ts_start")
    out = str(tmp_path / "out")
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 2
    data1 = os.path.join(out, "part=00001", "data.parquet")
    assert os.path.exists(data1)  # pid 1 wrote real windows

    # the fragment set changes: pid 1 now maps to a ZERO-window fragment
    # (all-empty token streams) and its manifest lineage is stale
    empty = pa.table(
        {
            "doc_id": pa.array(["ed1"]),
            "tokens": pa.array([[]], type=tiny_tokens["tokens"].type),
            "n_tok": pa.array([0], type=pa.int64()),
            "source": pa.array(["s"]),
            "seq_no": pa.array([0], type=pa.int64()),
        }
    ).select(tiny_tokens.column_names).cast(tiny_tokens.schema)
    pq.write_table(empty, str(frag_dir / "f1_new.parquet"))
    files = [files[0], str(frag_dir / "f1_new.parquet")]
    assert mf.pending_fragments(files, out) == [1]

    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 1
    man = _json.load(open(os.path.join(out, "_manifest", "part-00001.json")))
    assert man["rows_out"] == 0 and man["input_lineage"] == [files[1]]
    assert not os.path.exists(data1)  # phantom rows gone
    total = mf.read_output(out).count()
    want = pq.read_metadata(os.path.join(out, "part=00000", "data.parquet")).num_rows
    assert total == want


def test_zero_row_fragment_file_completes(tiny_tokens, tmp_path):
    """A fragment parquet with ZERO rows (a producer wrote an empty
    file) must flow through write_resumable_fragments — the per-batch
    pid slicing used to IndexError on the empty block, wedging the
    fragment as forever-pending."""
    import pyarrow as pa

    from podcast_audio_feature_extraction_ray.config import WindowSpec
    spec = WindowSpec(16, 8, "frame")

    def batch_fn(b: pa.Table) -> pa.Table:
        return seg.segment_batch(
            b, spec, key_cols=("doc_id", "source", "seq_no"),
            with_aggregates=True, emit_tokens=False,
        )

    frag_dir = tmp_path / "frags"
    os.makedirs(frag_dir)
    zero = tiny_tokens.slice(0, 0)
    files = []
    for i, t in enumerate((tiny_tokens, zero)):
        p = str(frag_dir / f"f{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    sortw = ("doc_id", "source", "seq_no", "ts_start")
    out = str(tmp_path / "out")
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 2
    assert mf.pending_fragments(files, out) == []
    # and the resume is the advertised no-op
    assert mf.write_resumable_fragments(files, batch_fn, out, sort_within=sortw) == 0


def test_torn_first_manifest_still_resumes(tiny_tokens, tmp_path):
    """A zero-length part-00000.json (power loss mid-write) must leave
    the output RESUMABLE: the layout sample skips torn manifests the
    same way completed_partitions does."""
    out = str(tmp_path / "out")
    _run(tiny_tokens, out)
    mans = sorted(glob.glob(os.path.join(out, "_manifest", "part-*.json")))
    assert len(mans) > 1
    open(mans[0], "w").close()  # tear the lexicographically-first one
    # resume: only the torn partition is redone, bytes end identical
    n = _run(tiny_tokens, out)
    assert n == 1
    assert _run(tiny_tokens, out) == 0
