"""Snapshot METADATA must scale like the data does (r7 VERDICT #2):

- Commits between checkpoints store delta manifests (files added/
  removed + per-file metadata set/unset), so the durable payload per
  commit is O(files touched), not O(total files) — pinned here on a
  1,000-commit synthetic table.
- Delta resolution is exact: every version resolves to byte-identical
  metadata whether stored as a chain of deltas or as full manifests.
- vacuum re-checkpoints kept deltas before dropping their ancestors,
  so retention never strands an unresolvable manifest.
- compact_txns bounds the retention-independent ``_txns`` log while
  preserving the exactly-once membership and ivm's last-applied
  order — model-checked over random schedules with hypothesis.

Spark is deliberately NOT in the loop (same rationale as
test_snapshots_property.py): manifests and the _txns log are pure
metadata, so hypothesis can run hundreds of schedules in seconds.
"""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ensembl_lakehouse_spark import snapshots as S


def _commit_files(tdir, files, op="append", stats=None, blooms=None):
    cur = S.current_version(tdir)
    return S._commit(tdir, files, op, None, cur, stats or {}, blooms or {})


def _manifest_size(tdir, v):
    return os.path.getsize(
        os.path.join(tdir, "_manifests", f"v{v}.json")
    )


def test_commit_payload_is_o_files_touched(tmp_path):
    """1,000 commits each adding ONE file to an ever-growing table:
    delta manifests stay O(1) regardless of the accumulated file
    count, checkpoints land every CHECKPOINT_INTERVAL commits, and
    every sampled version resolves to exactly the model's prefix."""
    tdir = str(tmp_path / "tbl")
    n = 1000
    files: list[str] = []
    stats: dict = {}
    for i in range(n):
        rel = f"data/v{i}/part-{i}.parquet"
        files.append(rel)
        stats[rel] = {"k": [i, i]}
        v = _commit_files(tdir, list(files), stats=dict(stats))
        assert v == i
    # checkpoint cadence: v0 full, then every INTERVAL-th commit
    fulls = [
        v for v in range(n)
        if S._raw_manifest(tdir, v).get("kind") != "delta"
    ]
    assert fulls == list(range(0, n, S.CHECKPOINT_INTERVAL))
    # a late delta is no bigger than an early one: payload tracks
    # files TOUCHED (one), not files accumulated (hundreds)
    late = _manifest_size(tdir, n - 2)  # delta (n-1 could be too)
    early = _manifest_size(tdir, 30)
    assert S._raw_manifest(tdir, n - 2).get("kind") == "delta"
    assert late < 3 * early
    # while a full manifest of the same era is ~two orders bigger
    assert _manifest_size(tdir, 975) > 20 * late
    # resolution is exact at arbitrary depths into the chain
    for v in (0, 24, 25, 26, 499, 733, n - 1):
        m = S._read_manifest(tdir, v)
        assert m["files"] == sorted(
            f"data/v{i}/part-{i}.parquet" for i in range(v + 1)
        )
        assert m["stats"][f"data/v{v}/part-{v}.parquet"] == {"k": [v, v]}
        assert m["version"] == v and m["op"] == "append"


def test_delta_resolution_equals_full_write(tmp_path, monkeypatch):
    """The same mixed schedule (adds, removes, metadata loss, an
    everything-changes overwrite) committed twice — once with deltas,
    once with CHECKPOINT_INTERVAL=1 (every manifest full) — resolves
    identically at EVERY version, modulo the commit timestamp and
    chain counter."""
    schedule = []
    files: list[str] = []
    for i in range(40):
        if i % 7 == 3 and files:
            files = files[len(files) // 2:]  # drop the older half
        if i % 11 == 5:
            files = [f"data/ow{i}/p.parquet"]  # overwrite-everything
        else:
            files = files + [f"data/v{i}/p.parquet"]
        # metadata: even commits record stats for all, odd commits
        # LOSE stats for one carried file (the pre-feature shape)
        stats = {f: {"k": [i, i]} for f in files}
        if i % 2 and len(files) > 1:
            stats.pop(files[0])
        schedule.append((list(files), dict(stats)))

    def run(tdir):
        for fl, stt in schedule:
            _commit_files(tdir, fl, stats=stt)
        return [
            S._read_manifest(tdir, v) for v in range(len(schedule))
        ]

    a = run(str(tmp_path / "delta"))
    monkeypatch.setattr(S, "CHECKPOINT_INTERVAL", 1)
    b = run(str(tmp_path / "full"))

    def norm(m):
        m = dict(m)
        m.pop("committed_at")
        m.pop("chain", None)
        m.pop("kind", None)
        return m

    assert [norm(m) for m in a] == [norm(m) for m in b]


def test_vacuum_recheckpoints_kept_deltas(tmp_path):
    """vacuum must rewrite kept delta manifests as full checkpoints
    BEFORE dropping the ancestors they resolve through — retention
    can never strand an unreadable version."""
    tdir = str(tmp_path / "tbl")
    files: list[str] = []
    for i in range(10):
        files.append(f"data/v{i}/part.parquet")
        _commit_files(tdir, list(files))
    assert S._raw_manifest(tdir, 9).get("kind") == "delta"
    S.vacuum(tdir, keep_versions=2)
    present = sorted(
        int(n[1:-5])
        for n in os.listdir(os.path.join(tdir, "_manifests"))
        if n.endswith(".json")
    )
    assert present == [8, 9]
    for v in present:
        assert S._raw_manifest(tdir, v).get("kind") != "delta"
        assert S._read_manifest(tdir, v)["files"] == sorted(
            f"data/v{i}/part.parquet" for i in range(v + 1)
        )
    # the chain restarts cleanly from the rewritten checkpoint
    files.append("data/v10/part.parquet")
    v = _commit_files(tdir, list(files))
    assert S._raw_manifest(tdir, v).get("kind") == "delta"
    assert len(S._read_manifest(tdir, v)["files"]) == 11


# --- _txns compaction -------------------------------------------------

_op_strategy = st.one_of(
    st.just("merge"),
    st.just("append"),
    st.builds(lambda i: f"ingest:batch{i}", st.integers(0, 6)),
    st.builds(lambda i: f"ivm:src_v{i}", st.integers(0, 6)),
)


def _last_occurrence_seq(records):
    """The subsequence of last occurrences per op — the order- and
    membership-carrying view every _txns consumer depends on
    (committed_ops membership; ivm's last-applied stamp)."""
    last = {}
    for i, (_, op) in enumerate(records):
        last[op] = i
    return [r for i, r in enumerate(records) if last[r[1]] == i]


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(_op_strategy, min_size=1, max_size=20),
    compact_at=st.sets(st.integers(0, 19), max_size=3),
    keep=st.integers(1, 4),
)
def test_compact_txns_model_check(tmp_path_factory, ops, compact_at, keep):
    """Any schedule of commits, vacuums, and loss-free compactions
    preserves (1) committed_ops as a SET, and (2) the last-occurrence
    subsequence of committed_op_records — i.e. exactly-once replays
    and ivm's last-applied both read identically before and after."""
    tdir = str(tmp_path_factory.mktemp("txns") / "tbl")
    model: list[tuple[int, str]] = []
    for i, op in enumerate(ops):
        v = _commit_files(tdir, [f"data/v{i}/p.parquet"], op=op)
        model.append((v, op))
        if i in compact_at:
            S.vacuum(tdir, keep_versions=keep)
            S.compact_txns(tdir)
            assert set(S.committed_ops(tdir)) == {op for _, op in model}
            assert _last_occurrence_seq(
                S.committed_op_records(tdir)
            ) == _last_occurrence_seq(model)
    # idempotent: a second pass is a byte-level no-op
    S.compact_txns(tdir)
    before = open(S._txns_path(tdir)).read()
    S.compact_txns(tdir)
    assert open(S._txns_path(tdir)).read() == before
    assert set(S.committed_ops(tdir)) == {op for _, op in model}


def test_compact_txns_bounds_log_and_keeps_exactly_once(tmp_path):
    """300 stamped commits + aggressive vacuum: loss-free compaction
    shrinks the log (dup generic ops fold away) while EVERY distinct
    stamp stays a member — a replayed pre-retention batch is still a
    no-op. The explicit keep_stamps_since horizon then drops old
    stamps and reports how many."""
    tdir = str(tmp_path / "tbl")
    for i in range(300):
        op = f"ingest:batch{i}" if i % 3 == 0 else "merge"
        _commit_files(tdir, [f"data/v{i}/p.parquet"], op=op)
    S.vacuum(tdir, keep_versions=2)
    out = S.compact_txns(tdir)
    assert out["before"] == 300 and out["dropped_stamps"] == 0
    # 100 distinct stamps + 1 folded "merge" + 2 retained tail lines
    assert out["after"] <= 104
    ops = set(S.committed_ops(tdir))
    assert all(f"ingest:batch{i}" in ops for i in range(0, 300, 3))
    # operator-asserted replay horizon: stamps below it may go
    out2 = S.compact_txns(tdir, keep_stamps_since=250)
    assert out2["dropped_stamps"] > 0
    remaining = set(S.committed_ops(tdir))
    assert "ingest:batch0" not in remaining
    assert "ingest:batch297" in remaining


def test_compact_txns_plan_projects_the_actual_compaction(tmp_path):
    """One planner, two consumers: the dry-run's projected count is
    exactly what a loss-free compact_txns then produces."""
    tdir = str(tmp_path / "tbl")
    for i in range(60):
        op = f"ingest:batch{i}" if i % 4 == 0 else "merge"
        _commit_files(tdir, [f"data/v{i}/p.parquet"], op=op)
    S.vacuum(tdir, keep_versions=3)
    plan = S.compact_txns_plan(tdir)
    assert plan["records"] == 60
    assert plan["foldable_prefix"] == 57
    out = S.compact_txns(tdir)
    assert out["after"] == plan["projected"]
    # a fresh dry-run on the compacted log projects a no-op
    plan2 = S.compact_txns_plan(tdir)
    assert plan2["projected"] == plan2["records"] == out["after"]


# random-schedule twin of the fixed-schedule identity test above
_sched_op = st.tuples(
    st.sampled_from(["add", "drop_half", "overwrite", "lose_stats"]),
    st.integers(0, 3),
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_sched_op, min_size=2, max_size=30),
       interval=st.integers(2, 7))
def test_delta_identity_model_check(tmp_path_factory, ops, interval, monkeypatch):
    """Hypothesis twin of the fixed-schedule identity: ANY schedule
    of adds/halving drops/overwrites/metadata losses resolves
    identically whether stored as deltas (random checkpoint
    interval) or as all-full manifests, at every version, and
    vacuum-at-the-end re-checkpoints without changing resolution."""
    monkeypatch.setattr(S, "CHECKPOINT_INTERVAL", interval)
    schedule = []
    files: list[str] = []
    for i, (kind, arg) in enumerate(ops):
        if kind == "drop_half" and files:
            files = files[len(files) // 2:]
        elif kind == "overwrite":
            files = [f"data/ow{i}/p.parquet"]
        else:
            files = files + [f"data/v{i}-{arg}/p.parquet"]
        stats = {f: {"k": [i, arg]} for f in files}
        if kind == "lose_stats" and files:
            stats.pop(files[arg % len(files)])
        schedule.append((list(files), dict(stats)))

    def norm(m):
        m = dict(m)
        m.pop("committed_at")
        m.pop("chain", None)
        m.pop("kind", None)
        return m

    def run(tdir):
        for fl, stt in schedule:
            _commit_files(tdir, fl, stats=stt)
        return [
            norm(S._read_manifest(tdir, v))
            for v in range(len(schedule))
        ]

    base = tmp_path_factory.mktemp("delta_id")
    a = run(str(base / "delta"))
    kept = str(base / "delta")
    # vacuum re-checkpoints; resolution of kept versions unchanged
    keep = min(3, len(schedule))
    pre = [
        norm(S._read_manifest(kept, v))
        for v in range(len(schedule) - keep, len(schedule))
    ]
    S.vacuum(kept, keep_versions=keep)
    post = [
        norm(S._read_manifest(kept, v))
        for v in range(len(schedule) - keep, len(schedule))
    ]
    assert pre == post
    monkeypatch.setattr(S, "CHECKPOINT_INTERVAL", 1)
    b = run(str(base / "full"))
    assert a == b


def test_concurrent_reads_resolve_consistently_during_commits(tmp_path):
    """Readers racing writers over the delta layer: every resolved
    manifest a reader observes must be internally consistent (the
    version's exact file prefix) — a torn read would surface as a
    wrong file set. Commits serialize on the table lock; reads are
    lock-free and cache through the mtime/size key."""
    import threading

    tdir = str(tmp_path / "tbl")
    _commit_files(tdir, ["data/v0/p.parquet"])
    stop = threading.Event()
    errors: list = []

    def reader():
        # EVERY failure mode must land in errors — a torn read is as
        # likely to raise (JSONDecodeError on a partial file, KeyError
        # on a half-applied delta) as to return a wrong list (r8
        # review: the narrow except let raising tears pass silently)
        try:
            while not stop.is_set():
                cur = S.current_version(tdir)
                if cur is None:
                    continue
                m = S._read_manifest(tdir, cur)
                v = m["version"]
                want = sorted(
                    f"data/v{i}/p.parquet" for i in range(v + 1)
                )
                if m["files"] != want:
                    errors.append((v, m["files"]))
                    return
        except Exception as exc:  # noqa: BLE001 — the assertion target
            errors.append(repr(exc))

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    files = ["data/v0/p.parquet"]
    for i in range(1, 120):
        files.append(f"data/v{i}/p.parquet")
        _commit_files(tdir, list(files))
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
    assert S.current_version(tdir) == 119


def test_vacuum_crash_between_recheckpoint_and_drop_is_resumable(
    tmp_path, monkeypatch
):
    """Crash window inside vacuum: kept deltas were rewritten as
    checkpoints, then the process died mid-drop. Every kept version
    must still resolve (checkpoints need no ancestors), and a
    resumed vacuum completes the drop — the same crash discipline
    the commit protocol and the mirror pin."""
    import os as _os

    tdir = str(tmp_path / "tbl")
    files: list[str] = []
    for i in range(12):
        files.append(f"data/v{i}/p.parquet")
        _commit_files(tdir, list(files))

    real_remove = _os.remove
    calls = {"n": 0}

    def dying_remove(path):
        # let the first manifest drop through, then "crash"
        if "_manifests" in path and path.endswith(".json"):
            calls["n"] += 1
            if calls["n"] > 1:
                raise OSError("simulated crash mid-vacuum")
        return real_remove(path)

    monkeypatch.setattr(S.os, "remove", dying_remove)
    with pytest.raises(OSError, match="simulated"):
        S.vacuum(tdir, keep_versions=2)
    monkeypatch.setattr(S.os, "remove", real_remove)

    # kept versions resolve standalone (already re-checkpointed)
    for v in (10, 11):
        assert S._raw_manifest(tdir, v).get("kind") != "delta"
        assert len(S._read_manifest(tdir, v)["files"]) == v + 1
    # resumed vacuum completes; the table is fully healthy
    S.vacuum(tdir, keep_versions=2)
    present = sorted(
        int(n[1:-5])
        for n in _os.listdir(_os.path.join(tdir, "_manifests"))
        if n.endswith(".json")
    )
    assert present == [10, 11]
    files.append("data/v12/p.parquet")
    assert _commit_files(tdir, list(files)) == 12


def test_read_manifest_retries_across_a_racing_vacuum(
    tmp_path, monkeypatch
):
    """r8 ADVICE: a lock-free resolve walk that opened a kept
    version's raw DELTA form just before vacuum's rewrite can
    recurse into an ancestor manifest deleted moments later —
    FileNotFoundError for a still-retained version. _read_manifest
    retries once from the requested version, whose manifest vacuum
    has by then rewritten self-contained, so the read succeeds; a
    GENUINELY vacuumed version still raises after the retry."""
    tdir = str(tmp_path / "tbl")
    files: list[str] = []
    for i in range(6):
        files.append(f"data/v{i}/part.parquet")
        _commit_files(tdir, list(files))
    assert S._raw_manifest(tdir, 5).get("kind") == "delta"
    real = S._resolve_manifest
    state = {"fired": False}

    def racing(table_dir, version):
        # first entry simulates the window: vacuum lands between the
        # walk's stat of v5 and its recursion into the ancestors,
        # and the stale walk surfaces the ancestor's absence
        if not state["fired"]:
            state["fired"] = True
            S.vacuum(tdir, keep_versions=2)
            raise FileNotFoundError(
                os.path.join(tdir, "_manifests", "v3.json")
            )
        return real(table_dir, version)

    monkeypatch.setattr(S, "_resolve_manifest", racing)
    got = S._read_manifest(tdir, 5)
    assert got["files"] == sorted(
        f"data/v{i}/part.parquet" for i in range(6)
    )
    # vacuumed-history semantics unchanged: a dropped version raises
    # even through the retry
    with pytest.raises(FileNotFoundError):
        S._read_manifest(tdir, 2)
