"""Incremental view maintenance (IVM) over snapshot-table CDC: keep
a grouped rollup in sync with a source snapshot table by applying
``snapshot_diff`` deltas, never re-scanning the source (EXT X10/X6
composition; the reference has no mutable tables at all — its
results are immutable per-query objects, app/tasks.py:16-21).

Why this module is the scale story: at 100 TB the source table
changes by a few GB per commit; recomputing a rollup scans 100 TB,
while applying the CDC delta costs O(changed rows). That asymmetry
is what Materialize/Delta Live Tables sell; here it falls out of
parts the repo already has — ``snapshot_diff`` (row-level CDC from
two immutable file lists), ``merge_snapshot`` (keyed copy-on-write
upsert), and the retention-independent ``_txns`` op stamps for
exactly-once application (a replayed maintenance run is a no-op
— see the failure-window notes below for the one exception).

Semantics: the rollup stores per group ``n_rows`` and ``sum_val``
(COUNT/SUM — the self-maintainable aggregates; MIN/MAX would need
the per-group re-scan on deletes, the classic IVM limitation).
Groups whose count reaches zero stay as TOMBSTONE rows (merge
cannot delete); ``read_rollup`` filters them, and the equivalence
test pins read_rollup == full recompute at every version.

Constraints and failure windows, stated plainly:

- **Group keys must be non-NULL** (the dimension-key NOT NULL
  constraint every warehouse rollup imposes): NULL never
  equi-joins, so both the delta join and the keyed merge would
  duplicate the NULL group. Enforced with an explicit error.
- **Vacuumed history falls back to a rebuild**: if the source's
  last-applied manifest is gone, the delta cannot be computed; the
  maintenance run recomputes the full aggregate and tombstones
  vanished groups (mode "rebuild") instead of wedging forever.
- **Concurrent ticks are OCC-fenced**: the rollup version read at
  plan time is passed as ``expect_version``, so of two racing
  maintenance runs one commits and one raises SnapshotConflict —
  never a double-applied delta.
- The exactly-once stamp survives vacuum via the ``_txns`` log;
  the one residual window is a crash BETWEEN the commit's pointer
  swap and its log append, followed by enough commits + a vacuum
  to drop that manifest before the resume — then the resumed run
  re-applies a delta that is NOT idempotent. Run maintenance
  before vacuuming its own rollup dir (or rebuild) to close it.
"""

from __future__ import annotations

import json
import math
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark import snapshots as SN

_STAMP = "ivm:src_v{v}"

#: Whitelisted time-bucket vocabulary for ``maintain_rollup``'s
#: ``key_exprs`` (r10 VERDICT #2 — the /sql rewrite matches a
#: ``GROUP BY date_trunc('day', ts)`` statement against a rollup by
#: CANONICAL-STRING equality of these expressions, so the vocabulary
#: must be closed and deterministic: every member is a pure function
#: of one column given a fixed session timezone).
BUCKET_UNITS = frozenset(
    {"year", "quarter", "month", "week", "day", "hour"}
)

_BUCKET_RE = re.compile(
    r"^\s*(?:"
    r"date_trunc\s*\(\s*'([A-Za-z]+)'\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)"
    r"|(year|month)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)"
    r")\s*$",
    re.I,
)


def canonical_bucket_expr(expr: str) -> tuple[str, str]:
    """Validate a bucket expression against the closed vocabulary and
    return ``(canonical form, source column)``. The canonical form is
    lowercase with no interior whitespace (``date_trunc('day',ts)``)
    — the exact string the /sql recognizer produces, so spec matching
    is plain equality. Raises ValueError outside the vocabulary:
    arbitrary SQL here would break both the delta soundness argument
    (the expression re-buckets diff rows and must be deterministic)
    and the rewrite's semantic proof."""
    m = _BUCKET_RE.match(expr)
    if m is None:
        raise ValueError(
            f"bucket expression {expr!r} is outside the vocabulary "
            "(date_trunc('<unit>', col) | year(col) | month(col))"
        )
    if m.group(1) is not None:
        unit, col = m.group(1).lower(), m.group(2).lower()
        if unit not in BUCKET_UNITS:
            raise ValueError(
                f"date_trunc unit {unit!r} not in {sorted(BUCKET_UNITS)}"
            )
        return f"date_trunc('{unit}',{col})", col
    fn, col = m.group(3).lower(), m.group(4).lower()
    return f"{fn}({col})", col


def read_bucketspec(rollup_dir: str) -> dict | None:
    """The ``_bucketspec`` marker a bucket-keyed rollup carries
    ({"exprs": {col: canonical}, "tz": zone}) or None for plain
    rollups — the one accessor every consumer (the guard below, the
    rewrite catalog's registration check) reads through, so the
    filename and format live in exactly one place. A corrupt marker
    is a loud ValueError, not a raw JSONDecodeError."""
    path = os.path.join(rollup_dir, "_bucketspec")
    try:
        with open(path) as f:
            raw = f.read().strip()
    except FileNotFoundError:
        return None
    try:
        return json.loads(raw)
    except ValueError as exc:
        raise ValueError(
            f"{path} is not valid JSON ({exc}) — the bucket-key "
            "encoding is unknowable; restore the marker or rebuild"
        ) from None


def _bucket_stamp(canon: dict[str, str] | None, tz: str) -> str | None:
    return (
        json.dumps({"exprs": canon, "tz": tz}, sort_keys=True)
        if canon
        else None
    )


def _bucket_guard(
    rollup_dir: str,
    canon: dict[str, str] | None,
    tz: str,
    rebuild: bool,
) -> None:
    """VERIFY the ``_bucketspec`` marker against this tick's
    encoding: the stored group-key values of a bucket-keyed rollup
    are only meaningful under ONE (expression set, session timezone)
    pair — ``date_trunc`` over a TIMESTAMP truncates in the session
    zone, so a tick under a different zone (or different
    expressions) would delta-merge keys from two incompatible
    encodings into one table, the exact mixed-key corruption the
    ``_qformat`` guard stops for sketches. Mismatch demands
    ``rebuild=True``; committed state with NO marker is unknowable
    and also demands a rebuild.

    Verification ONLY — the caller stamps via ``_bucket_commit``
    AFTER the rebuild's commit succeeds (r11 code review: stamping
    up front left a failed rebuild's marker describing an encoding
    the committed rows do not have, and the next non-rebuild tick
    would then silently merge mixed encodings — the guard defeating
    itself)."""
    if rebuild:
        # a rebuild replaces ALL committed state, so the stored
        # marker is irrelevant — and must not even be READ: a
        # corrupt _bucketspec raises in read_bucketspec, and probing
        # it first would make the advertised remedy ("restore the
        # marker or rebuild") unreachable (r11 code review —
        # rebuild=True could never get past the guard it was sent to
        # satisfy)
        return
    stamp = _bucket_stamp(canon, tz)
    spec = read_bucketspec(rollup_dir)
    stored = (
        json.dumps(spec, sort_keys=True) if spec is not None else None
    )
    if stored == stamp:
        return
    if stored is not None:
        raise ValueError(
            f"{rollup_dir} was maintained under bucket spec "
            f"{stored} but this tick uses {stamp} — group-key "
            "encodings are not mergeable; rerun with rebuild=True"
        )
    if canon and _applied_versions(rollup_dir):
        raise ValueError(
            f"{rollup_dir} holds committed state but no "
            "_bucketspec marker — its group-key encoding is "
            "unknown and cannot be delta-merged under bucket "
            "expressions; rerun with rebuild=True"
        )


def _bucket_commit(
    rollup_dir: str, canon: dict[str, str] | None, tz: str
) -> None:
    """Stamp (or remove) the marker — called only after the tick's
    commit lands, so the marker always describes COMMITTED state."""
    stamp = _bucket_stamp(canon, tz)
    path = os.path.join(rollup_dir, "_bucketspec")
    if stamp is None:
        if os.path.exists(path):
            os.remove(path)
        return
    os.makedirs(rollup_dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(stamp)


def _applied_versions(rollup_dir: str) -> list[int]:
    """Applied source versions in APPLICATION order (raw ``_txns``
    log order), not numeric order. The distinction matters after a
    source ``rollback``: the source's current version can then be a
    LOWER number than a previously applied one, and numeric sorting
    would pin "last applied" at the higher number forever — every
    tick would recompute and re-apply the same delta, corrupting the
    rollup unboundedly (r4 ADVICE). Log order makes the latest stamp
    the actual last-applied state, so the noop check holds."""
    return [
        int(op.rsplit("v", 1)[1])
        for _, op in SN.committed_op_records(rollup_dir)
        if op.startswith("ivm:src_v")
    ]


def read_rollup(
    spark: SparkSession, rollup_dir: str, version: int | None = None
) -> DataFrame:
    """The maintained view, tombstones filtered. ``version`` pins a
    specific rollup snapshot — callers that cache or stamp an answer
    with a version identity (plans/rewrite.py) MUST resolve the
    version first and pass it here, or a racing maintenance commit
    can pair one version's identity with another's data."""
    return SN.read_snapshot(spark, rollup_dir, version=version).where(
        F.col("n_rows") > 0
    )


def rollup_lineage(rollup_dir: str) -> str | None:
    """Absolute path of the PARENT rollup this dir is maintained
    from (``maintain_rollup_from_rollup`` stamps it), or None for a
    direct base-fed rollup. The marker is what lets freshness
    checks walk a hierarchy of ANY depth without guessing which
    version space a ``ivm:src_v{N}`` stamp lives in — a child's
    stamps are PARENT versions, a root's are base versions, and the
    two are indistinguishable from the stamp text alone."""
    import json as _json

    try:
        with open(os.path.join(rollup_dir, "_lineage")) as f:
            return _json.load(f)["parent"]
    except (FileNotFoundError, KeyError, ValueError):
        return None


def _write_lineage(rollup_dir: str, parent_dir: str) -> None:
    import json as _json
    import uuid as _uuid

    os.makedirs(rollup_dir, exist_ok=True)
    path = os.path.join(rollup_dir, "_lineage")
    tmp = path + f".tmp-{_uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        _json.dump({"parent": parent_dir}, f)
    os.replace(tmp, path)


def _bind_child_lineage(child_dir: str, parent_abs: str) -> None:
    """Bind (or verify) a hierarchical child's ``_lineage`` marker.
    Stamped on first use; a child with prior stamps refuses to be
    re-pointed or to be reinterpreted across version spaces; a marker
    with ZERO applied stamps (first tick failed before any merge
    committed) is re-pointable instead of bricked (r7 ADVICE,
    ivm.py:349)."""
    lin = rollup_lineage(child_dir)
    applied = _applied_versions(child_dir)
    if lin is None and applied:
        raise ValueError(
            f"{child_dir} already has ivm stamps but no lineage marker "
            "— it was maintained directly from a base table; its "
            "stamps are base versions and cannot be reinterpreted as "
            "parent-rollup versions. Build a fresh child dir."
        )
    if lin is not None and lin != parent_abs and applied:
        raise ValueError(
            f"{child_dir} is lineage-marked as a child of {lin}, "
            f"not {parent_abs} — re-pointing a child would mix "
            "version spaces; build a fresh child dir"
        )
    if lin is None or lin != parent_abs:
        _write_lineage(child_dir, parent_abs)


def _reject_null_group_keys(df, cols: list[str], hint: str) -> None:
    null_pred = None
    for c in cols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    if df.where(null_pred).head(1):  # bounded: grouped relation
        raise ValueError(
            f"NULL in group column(s) {cols}: IVM group keys must be "
            f"non-NULL (NULL never equi-joins, so the NULL group would "
            f"duplicate) — {hint}"
        )


def _tick(
    spark: SparkSession,
    target_dir: str,
    key_cols: list[str],
    src_v: int,
    rebuild: bool,
    full_fn,
    delta_fn,
    null_hint: str,
) -> dict:
    """The shared maintenance protocol both maintainers run: stamp/
    noop/OCC-fence/full/rebuild-with-tombstones/delta-join-merge.
    ``full_fn()`` returns the complete (keys..., n_rows, sum_val)
    state; ``delta_fn(last_applied)`` returns per-group
    (keys..., d_rows, d_sum) or raises FileNotFoundError when the
    source history needed for the delta is gone (→ rebuild). One
    copy of the protocol means the next protocol fix lands once
    (r7 code review)."""
    stamp = _STAMP.format(v=src_v)
    applied = _applied_versions(target_dir)
    # OCC fence captured at PLAN time: a racing tick that commits
    # first moves the target version, and this tick's merge then
    # raises SnapshotConflict instead of double-applying its delta.
    target_v = SN.current_version(target_dir)
    if not rebuild and applied and applied[-1] == src_v:
        return {"applied": None, "mode": "noop"}

    if not applied:
        full = full_fn()
        _reject_null_group_keys(full, key_cols, null_hint)
        SN.merge_snapshot(
            spark, target_dir, full, key=key_cols, op=stamp,
            expect_version=target_v,
        )
        return {"applied": src_v, "mode": "full"}

    def _rebuild():
        # delta unusable (vacuumed source history, or an explicit
        # rebuild after a target rollback): recompute the full
        # state, tombstoning groups that vanished entirely
        full = full_fn()
        _reject_null_group_keys(full, key_cols, null_hint)
        current = SN.read_snapshot(spark, target_dir)
        gone = current.join(full, on=key_cols, how="left_anti").select(
            *key_cols,
            F.lit(0).cast("bigint").alias("n_rows"),
            F.lit(0).cast("bigint").alias("sum_val"),
        )
        SN.merge_snapshot(
            spark, target_dir, full.unionByName(gone), key=key_cols,
            op=stamp, expect_version=target_v,
        )
        return {"applied": src_v, "mode": "rebuild"}

    if rebuild:
        return _rebuild()
    try:
        delta = delta_fn(applied[-1])
    except FileNotFoundError:
        return _rebuild()
    _reject_null_group_keys(delta, key_cols, null_hint)
    current = SN.read_snapshot(spark, target_dir)
    updated = delta.join(current, on=key_cols, how="left").select(
        *key_cols,
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_rows")).alias(
            "n_rows"
        ),
        (F.coalesce(F.col("sum_val"), F.lit(0)) + F.col("d_sum")).alias(
            "sum_val"
        ),
    )
    SN.merge_snapshot(
        spark, target_dir, updated, key=key_cols, op=stamp,
        expect_version=target_v,
    )
    return {"applied": src_v, "mode": "delta"}


def maintain_rollup(
    spark: SparkSession,
    source_dir: str,
    rollup_dir: str,
    group_cols: list[str],
    sum_col: str,
    rebuild: bool = False,
    key_exprs: dict[str, str] | None = None,
) -> dict:
    """Bring the rollup up to the source's CURRENT version.

    First call: one full aggregate of the source (unavoidable — the
    initial state). Every later call: ``snapshot_diff`` between the
    last applied source version and the current one, aggregated to
    per-group (±count, ±sum) deltas — cost ∝ changed rows — merged
    into the rollup keyed on the group columns. The commit is
    stamped ``ivm:src_v{V}``, so re-running after a crash (or a
    duplicate scheduler tick) is a no-op. "Last applied" is tracked
    in ``_txns`` LOG order, so a source ``rollback`` (which makes the
    current state correspond to an earlier applied version) noops or
    deltas correctly instead of re-applying a stale delta forever.

    ``rebuild=True`` forces the full-aggregate path (with vanished
    groups tombstoned) regardless of stamps. Use it after rolling
    back the ROLLUP table itself: rollback reverts the rollup's
    *content* but not its ``_txns`` stamp history, so delta
    maintenance would resume from a base the content no longer
    matches.

    ``key_exprs`` (optional) maps a group column to a whitelisted
    TIME-BUCKET expression over the source's columns
    (``canonical_bucket_expr`` vocabulary: ``date_trunc('<unit>',
    col)`` / ``year(col)`` / ``month(col)``) — the rollup is then
    keyed on the computed bucket, e.g. ``{"day":
    "date_trunc('day', ts)"}`` maintains a daily view of an event
    table with no materialized day column (r10 VERDICT #2: the /sql
    rewrite serves ``GROUP BY date_trunc('day', ts)`` from exactly
    this). Remaining group columns are identity. Delta soundness is
    unchanged — the expression deterministically re-buckets each
    diff row to the same key the full build produced — PROVIDED the
    session timezone is stable across ticks (``date_trunc`` over
    TIMESTAMP truncates in the session zone), which the
    ``_bucketspec`` marker enforces: a tick under a different zone
    or expression set refuses loudly and demands ``rebuild=True``.

    Returns {"applied": from_v_exclusive..to_v or None, "mode":
    "full"|"delta"|"rebuild"|"noop"}.
    """
    src_v = SN.current_version(source_dir)
    if src_v is None:
        raise FileNotFoundError(f"no committed snapshot in {source_dir}")
    canon: dict[str, str] | None = None
    if key_exprs:
        extra = set(key_exprs) - set(group_cols)
        if extra:
            raise ValueError(
                f"key_exprs names {sorted(extra)}, not in group_cols "
                f"{group_cols}"
            )
        canon = {c: canonical_bucket_expr(e)[0] for c, e in key_exprs.items()}
        if sum_col in canon:
            raise ValueError(
                f"bucket key {sum_col!r} is also the measure column"
            )
        # pinned at src_v like the build itself — a schema-changing
        # commit racing this tick must not make the shadow check
        # inspect a different version than full_fn aggregates
        src_cols = {
            f.lower()
            for f in SN.read_snapshot(
                spark, source_dir, version=src_v
            ).columns
        }
        shadowed = {c for c in canon if c.lower() in src_cols}
        if shadowed:
            # a bucket key named after a real source column would
            # silently replace it in the keyed projection — the
            # rollup would store different data than the name claims
            raise ValueError(
                f"bucket key(s) {sorted(shadowed)} shadow existing "
                "source columns — pick fresh names"
            )
    tz = spark.conf.get("spark.sql.session.timeZone")
    _bucket_guard(rollup_dir, canon, tz, rebuild)
    if rollup_lineage(rollup_dir) is not None:
        if _applied_versions(rollup_dir):
            raise ValueError(
                f"{rollup_dir} is lineage-marked as a hierarchical "
                "child (maintain_rollup_from_rollup) — its stamps are "
                "PARENT versions; maintaining it directly from a base "
                "table would mix version spaces"
            )
        # Marker with zero applied stamps = the first hierarchical
        # tick failed before any merge committed; nothing binds the
        # dir to the parent's version space, so reclaim it for
        # direct maintenance (r7 ADVICE, ivm.py:349).
        os.remove(os.path.join(rollup_dir, "_lineage"))

    def _keyed(df: DataFrame) -> DataFrame:
        """Materialize the bucket keys (identity columns pass
        through): explicit withColumn per bucket so every other
        column — the measure, the diff's _change marker — survives
        for the aggregates below."""
        for c, e in (canon or {}).items():
            df = df.withColumn(c, F.expr(e))
        return df

    def full_fn():
        # version pinned: a source commit landing mid-run must not
        # be aggregated under the earlier stamp (it would be
        # re-applied by the next delta — double count)
        return (
            _keyed(SN.read_snapshot(spark, source_dir, version=src_v))
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.col(sum_col).cast("bigint")), F.lit(0)
                ).alias("sum_val"),
            )
        )

    def delta_fn(last: int):
        diff = _keyed(SN.snapshot_diff(spark, source_dir, last, src_v))
        sign = F.when(F.col("_change") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        return diff.groupBy(*group_cols).agg(
            F.coalesce(F.sum(sign), F.lit(0)).alias("d_rows"),
            # all-NULL measure values must contribute 0, not NULL —
            # NULL here would overwrite the group's standing sum
            F.coalesce(
                F.sum(sign * F.col(sum_col).cast("bigint")), F.lit(0)
            ).alias("d_sum"),
        )

    out = _tick(
        spark, rollup_dir, group_cols, src_v, rebuild, full_fn, delta_fn,
        "filter or coalesce upstream",
    )
    # stamp only AFTER the tick's commit: a failed rebuild must leave
    # the marker describing the encoding the rows actually have (r11
    # code review — the crash window now demands a rebuild instead of
    # silently merging mixed encodings)
    if canon or read_bucketspec(rollup_dir) is not None:
        _bucket_commit(rollup_dir, canon, tz)
    return out


def maintain_rollup_from_rollup(
    spark: SparkSession,
    parent_dir: str,
    child_dir: str,
    key_exprs: dict[str, str],
    rebuild: bool = False,
) -> dict:
    """Hierarchical IVM: keep a COARSER rollup in sync with a
    maintained PARENT rollup — the classic rollup lattice (events →
    daily → weekly → monthly) where each level consumes the level
    below's CDC feed instead of ever touching the base table. At
    100 TB the weekly view then costs O(changed daily groups) per
    tick, which is itself O(changed base rows) — the lattice
    multiplies the delta advantage instead of re-paying the scan
    per level.

    ``key_exprs`` maps each child group column to a SQL expression
    over the PARENT's columns (e.g. ``{"week": "day DIV 7",
    "event_type": "event_type"}``). Child measures are the
    sign-weighted sums of the parent's (n_rows, sum_val) partials —
    COUNT/SUM are what make this exact (the same self-maintainable
    set as maintain_rollup; a parent row UPDATE arrives as
    delete(old)+insert(new) in the full-row diff, so the weighted
    sum applies the net change, including a group tombstoning to
    zero).

    Same protocol as maintain_rollup: stamped ``ivm:src_v{V}`` with
    the PARENT version (replay = no-op; rollback-safe via log
    order), OCC-fenced merges, vacuumed-parent-history falls back
    to a rebuild with vanished-group tombstones. ``read_rollup``
    reads the child unchanged. The first call stamps a ``_lineage``
    marker naming the parent, so freshness checks can walk the
    chain (any depth) and the direct maintainer refuses to mix
    version spaces on this dir; re-pointing a child at a DIFFERENT
    parent is refused (build a fresh child instead).

    To serve base-table aggregates through the MV rewrite, register
    the child against the BASE table with ``parent_dir=`` (or let
    the lineage marker be discovered): ``plans/rewrite.py`` composes
    freshness through every hop of the chain. Run the chain
    bottom-up per batch (streaming/ivm_stream.py's tick shape) —
    the child is fresh w.r.t. the base only after the parent's own
    tick for the base commit.
    """
    src_v = SN.current_version(parent_dir)
    if src_v is None:
        raise FileNotFoundError(f"no committed snapshot in {parent_dir}")
    if not key_exprs:
        raise ValueError("key_exprs must map at least one child column")
    parent_abs = os.path.abspath(parent_dir)
    _bind_child_lineage(child_dir, parent_abs)
    child_cols = list(key_exprs)
    key_aliases = [
        F.expr(e).alias(c) for c, e in key_exprs.items()
    ]

    def full_fn():
        parent = read_rollup(spark, parent_dir, version=src_v)
        return (
            parent.select(*key_aliases, "n_rows", "sum_val")
            .groupBy(*child_cols)
            .agg(
                F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows"),
                F.coalesce(F.sum("sum_val"), F.lit(0)).alias("sum_val"),
            )
        )

    def delta_fn(last: int):
        diff = SN.snapshot_diff(spark, parent_dir, last, src_v)
        sign = F.when(F.col("_change") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        return (
            diff.select(*key_aliases, "n_rows", "sum_val", "_change")
            .groupBy(*child_cols)
            .agg(
                F.coalesce(F.sum(sign * F.col("n_rows")), F.lit(0)).alias(
                    "d_rows"
                ),
                F.coalesce(
                    F.sum(sign * F.col("sum_val")), F.lit(0)
                ).alias("d_sum"),
            )
        )

    return _tick(
        spark, child_dir, child_cols, src_v, rebuild, full_fn, delta_fn,
        "filter or coalesce the parent keys in key_exprs",
    )


#: Measure recipes for ``maintain_aux_rollup``: aggregates that are
#: self-maintainable under INSERTS (merge = least/greatest or HLL
#: register-max union) but need a per-group recompute on DELETES —
#: the classic IVM limitation, priced explicitly: groups a delete
#: touched are re-aggregated from the base pinned at src_v via a
#: group-key semi join (cost ∝ rows of changed groups, never a full
#: rescan), while insert-only groups merge in O(changed groups).
AUX_KINDS = ("minmax", "hll", "quantile")

#: DDSketch-style log-bucket quantile sketch (Masson, Lee & Rister,
#: "DDSketch: a fast and fully-mergeable quantile sketch with
#: relative-error guarantees", VLDB 2019 — public algorithm). γ is
#: fixed ENGINE-WIDE so every stored sketch is mergeable with every
#: other; the quantile estimate's relative error is bounded by
#: α = (γ-1)/(γ+1) ≈ 0.99 % at γ = 1.02. State per group is a
#: map<int,bigint> of bucket→count: bucket ceil(log_γ v)+1 for
#: v > 0, 0 for v = 0, mirrored negative for v < 0 — fully ADDITIVE
#: (bucket-wise BIGINT adds), so sketches merge exactly across
#: commits, partitions, and hierarchy hops; size is bounded by the
#: value DOMAIN (≤ 2·log_γ(max|v|)+1 ≈ 2.3k entries for the full
#: bigint range), never by row count.
#:
#: Storage is a key-SORTED array<struct<k:int,v:bigint>> rather than
#: a map: Spark refuses MAP columns in set operations, and the
#: hierarchical delta path diffs PARENT rollup rows through
#: snapshot_diff's exceptAll — the canonical sorted-entries form
#: keeps row equality (and the stored artifact) deterministic.
Q_GAMMA = 1.02
_Q_LN_G = math.log(Q_GAMMA)
#: Key-space offset separating the sign ranges: |ceil(log_γ |v|)| ≤
#: ~36,000 over the full double range at γ = 1.02, so shifting the
#: log index by 40,000 keeps every positive-value key > 0 and every
#: negative-value key < 0 EVEN FOR |v| < 1 (whose raw log index is
#: negative — the r10 code-review hole: an unshifted 0.5 landed in
#: the negative key space and decoded as ≈ −1.9). Key order is value
#: order by construction: mirrored negatives < 0 < positives.
Q_KEY_OFFSET = 40_000


def q_bucket_expr(col: str):
    """The DDSketch bucket key of one value (NULL for NULL values —
    SQL percentile semantics ignore NULLs): OFFSET + ceil(log_γ v)
    for v > 0, 0 for v = 0, the mirrored negative for v < 0. log/ceil
    run on the JVM; determinism is per-engine, which is all the
    rollup needs (the estimate tier never claims cross-engine
    bit-equality)."""
    v = F.col(col).cast("double")
    pos = (
        F.ceil(F.log(v) / F.lit(_Q_LN_G)) + F.lit(Q_KEY_OFFSET)
    ).cast("int")
    neg = (
        -(F.ceil(F.log(-v) / F.lit(_Q_LN_G)) + F.lit(Q_KEY_OFFSET))
    ).cast("int")
    return (
        F.when(v > 0, pos)
        .when(v < 0, neg)
        .when(v == 0, F.lit(0).cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )


def q_merge_expr(a: str, b: str):
    """Bucket-wise addition of two non-NULL sketch entry arrays —
    the DDSketch merge, as one higher-order-function expression
    (JVM-side; the per-key map lookup bounds the cost at O(B²) over
    the bucket count B, which the domain bounds at ~2.3k — never
    row-scaled)."""
    return F.expr(
        f"sort_array(transform(array_distinct(concat("
        f"transform({a}, x -> x.k), transform({b}, x -> x.k))), "
        f"kk -> named_struct("
        f"'k', kk, "
        f"'v', coalesce(element_at(map_from_entries({a}), kk), 0L) + "
        f"coalesce(element_at(map_from_entries({b}), kk), 0L))))"
    )


def q_rank_expr(qsk: str, q: float):
    """Target rank for quantile ``q`` over one sketch map column:
    ceil(q·N) over the non-NULL count N (type-1 / lower order
    statistic), floored at 1. Computed as its OWN column so the
    bucket walk's lambda references a plain value instead of
    re-summing the map per entry (O(B), not O(B²))."""
    return F.expr(
        f"greatest(1L, CAST(ceil({q!r} * aggregate("
        f"transform({qsk}, x -> x.v), 0L, (a, v) -> a + v)) AS BIGINT))"
    )


def q_key_expr(qsk: str, rank: str):
    """The bucket key holding the ``rank``-th value: one ordered
    walk over the sorted entries accumulating counts (bucket keys
    sort in VALUE order by construction: mirrored negatives < 0 <
    positives). NULL for an empty sketch."""
    return F.expr(
        f"aggregate({qsk}, "
        f"named_struct('c', 0L, 'k', CAST(NULL AS INT)), "
        f"(acc, e) -> CASE WHEN acc.k IS NOT NULL THEN acc "
        f"WHEN acc.c + e.v >= {rank} THEN "
        f"named_struct('c', acc.c + e.v, 'k', e.k) "
        f"ELSE named_struct('c', acc.c + e.v, "
        f"'k', CAST(NULL AS INT)) END, "
        f"acc -> acc.k)"
    )


def q_value_expr(key: str):
    """Bucket key → the DDSketch midpoint estimate 2γ^i/(γ+1) with
    i = |key| − Q_KEY_OFFSET (sign from the key's sign, 0 → 0.0):
    relative error ≤ (γ-1)/(γ+1) ≈ 0.99 % at γ = 1.02 against the
    true order statistic at the same rank — for EVERY magnitude,
    including |v| < 1 (negative log index)."""
    g = repr(Q_GAMMA)
    off = Q_KEY_OFFSET
    return F.expr(
        f"CASE WHEN {key} IS NULL THEN CAST(NULL AS DOUBLE) "
        f"WHEN {key} = 0 THEN 0.0D "
        f"WHEN {key} > 0 THEN "
        f"2.0D * power({g}D, {key} - {off}) / ({g}D + 1.0D) "
        f"ELSE -2.0D * power({g}D, -{key} - {off}) / ({g}D + 1.0D) END"
    )


#: Persisted-format stamp for quantile sketch rollups: the stored
#: bucket keys are only meaningful under ONE (γ, offset) encoding, so
#: every maintainer writes this marker on the first build and refuses
#: to DELTA-MERGE into a rollup stamped with a different encoding
#: (r10 second review: an encoding change silently mixed old and new
#: keys in one map — garbage percentiles with every freshness stamp
#: claiming health). A mismatch demands an explicit rebuild.
_Q_FORMAT = f"ddsketch:v2:gamma={Q_GAMMA!r}:offset={Q_KEY_OFFSET}"


def _q_format_guard(rollup_dir: str, rebuild: bool) -> None:
    """Write/verify the sketch-encoding marker. Raises when the dir
    holds sketches under a DIFFERENT encoding and the caller did not
    ask for a rebuild; a rebuild (or first build) re-stamps."""
    path = os.path.join(rollup_dir, "_qformat")
    try:
        with open(path) as f:
            stored = f.read().strip()
    except FileNotFoundError:
        stored = None
    if stored is not None and stored != _Q_FORMAT and not rebuild:
        raise ValueError(
            f"{rollup_dir} holds quantile sketches under encoding "
            f"{stored!r} but this build uses {_Q_FORMAT!r} — bucket "
            "keys are not mergeable across encodings; rerun with "
            "rebuild=True to recompute the rollup"
        )
    if stored is None and not rebuild and _applied_versions(rollup_dir):
        # committed sketch state with NO marker (lost in a partial
        # copy/restore, or written by an encoding that predates
        # markers): the encoding of the stored bucket keys is
        # unknowable, so re-stamping and delta-merging would be
        # exactly the mixed-key corruption this guard exists to stop
        # (r10 ADVICE low #4) — demand an explicit rebuild instead.
        raise ValueError(
            f"{rollup_dir} holds committed quantile sketch state but "
            "no _qformat marker — the stored bucket-key encoding is "
            "unknown and cannot be delta-merged safely; rerun with "
            "rebuild=True to recompute the rollup"
        )
    if stored != _Q_FORMAT:
        os.makedirs(rollup_dir, exist_ok=True)
        with open(path, "w") as f:
            f.write(_Q_FORMAT)


def _quantile_state(df: DataFrame, group_cols: list[str], col: str):
    """(group_cols, n_rows, qsk) from BASE rows: per-bucket counts
    then a bounded collect into the map (Spark has no map-merge
    aggregate; the collect_list is bounded by the bucket count, never
    by rows). n_rows counts ALL rows (NULL values included — the aux
    contract), the sketch covers non-NULL values only."""
    b = df.select(*group_cols, q_bucket_expr(col).alias("_qb"))
    per_bucket = b.groupBy(*group_cols, "_qb").agg(
        F.count(F.lit(1)).cast("bigint").alias("_qn")
    )
    return per_bucket.groupBy(*group_cols).agg(
        F.coalesce(F.sum("_qn"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("_qb").isNotNull(),
                    F.struct(
                        F.col("_qb").alias("k"),
                        F.col("_qn").alias("v"),
                    ),
                )
            )
        ).alias("qsk"),
    )


def _quantile_state_from_partials(df: DataFrame, group_cols: list[str]):
    """(group_cols, n_rows, qsk) re-aggregated from PARENT partial
    rows (n_rows, qsk): explode the bounded maps, sum per (group,
    bucket), re-collect — every exchange bounded by groups × buckets.
    Groups whose every partial map is empty (all-NULL measure) keep
    an empty map via the left join + typed coalesce."""
    rows = df.groupBy(*group_cols).agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_rows")
    )
    sk = (
        df.select(*group_cols, F.explode("qsk").alias("_e"))
        .select(
            *group_cols,
            F.col("_e.k").alias("_qk"),
            F.col("_e.v").alias("_qv"),
        )
        .groupBy(*group_cols, "_qk")
        .agg(F.sum("_qv").cast("bigint").alias("_qn"))
        .groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_qk").alias("k"),
                        F.col("_qn").alias("v"),
                    )
                )
            ).alias("qsk")
        )
    )
    joined = (
        rows.join(sk, on=group_cols, how="left")
        if group_cols
        # global: both sides are exactly one row (a global aggregate
        # always returns one)
        else rows.crossJoin(sk)
    )
    return joined.select(
        *group_cols,
        "n_rows",
        F.coalesce(
            F.col("qsk"),
            F.expr("cast(array() as array<struct<k:int,v:bigint>>)"),
        ).alias("qsk"),
    )


def _aux_measures(kind: str, col: str) -> list:
    if kind == "minmax":
        return [
            F.min(F.col(col)).alias("min_val"),
            F.max(F.col(col)).alias("max_val"),
        ]
    # Spark's Apache-DataSketches HLL: deterministic and
    # order-insensitive (register-wise max), so a sketch unioned
    # from per-commit partials estimates identically to any
    # PARTITION-PARALLEL single pass over the same rows (whose agg
    # is itself a union of per-partition sketches). A strictly
    # serial build uses the HIP estimator instead and can differ
    # within sketch error past exact/coupon mode (r8 ADVICE; pinned
    # by test_hll_union_vs_single_pass_drift) — the rollup tier is
    # estimate-equivalent, exact only while sketches stay in
    # exact mode.
    return [F.hll_sketch_agg(F.col(col)).alias("hll")]


def _aux_measure_cols(kind: str) -> list[str]:
    if kind == "minmax":
        return ["min_val", "max_val"]
    return ["hll"] if kind == "hll" else ["qsk"]


def _aux_state(
    df: DataFrame, group_cols: list[str], col: str, kind: str
) -> DataFrame:
    """Exact per-group aux state from BASE rows, kind-dispatched:
    the single-agg form for minmax/hll, the two-level bucket form
    for quantile (whose map measure has no single-pass aggregate)."""
    if kind == "quantile":
        return _quantile_state(df, group_cols, col)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *_aux_measures(kind, col),
    )


def maintain_aux_rollup(
    spark: SparkSession,
    source_dir: str,
    rollup_dir: str,
    group_cols: list[str],
    col: str,
    kind: str = "minmax",
    rebuild: bool = False,
) -> dict:
    """Maintain a per-group (n_rows, MIN/MAX | HLL-sketch) rollup —
    the measures ``maintain_rollup``'s (count, sum) contract cannot
    carry (module docstring: "MIN/MAX would need the per-group
    re-scan on deletes"). This maintainer prices that re-scan
    instead of refusing it:

    - insert-only groups: merged in place (least/greatest of the
      stored extreme and the inserted batch's; HLL union) — no base
      read at all.
    - groups with any delete (updates arrive as delete+insert in
      the full-row diff): exact re-aggregate of JUST those groups
      from the base pinned at src_v (semi join on group keys —
      partition-prunable when the table clusters on them); groups
      that vanished entirely become tombstones (n_rows=0, NULL
      measures), filtered by ``read_aux_rollup``.

    Protocol identical to ``_tick`` (same ``ivm:src_v{V}`` stamps —
    replay no-op, rollback-safe log order, OCC fence, vacuumed
    history → rebuild); kept separate because the merge algebra is
    absolute-state, not additive. ``kind``: "minmax" stores
    (min_val, max_val) in the column's natural type; "hll" stores
    one Apache-DataSketches HLL binary per group
    (plans/rewrite.py answers approx COUNT(DISTINCT) from it);
    "quantile" stores one DDSketch log-bucket map<int,bigint> per
    group (plans/rewrite.py answers approx percentiles from it —
    bucket counts are fully additive, so insert-only deltas merge
    exactly; deletes re-aggregate like the other kinds to keep one
    delete story, though the map algebra could even subtract)."""
    if kind not in AUX_KINDS:
        raise ValueError(f"kind must be one of {AUX_KINDS}, got {kind!r}")
    src_v = SN.current_version(source_dir)
    if src_v is None:
        raise FileNotFoundError(f"no committed snapshot in {source_dir}")
    if rollup_lineage(rollup_dir) is not None:
        if _applied_versions(rollup_dir):
            raise ValueError(
                f"{rollup_dir} is lineage-marked as a hierarchical "
                "child (maintain_aux_rollup_from_rollup) — its stamps "
                "are PARENT versions; maintaining it directly from a "
                "base table would mix version spaces"
            )
        # marker with zero stamps: first hierarchical tick failed
        # before any merge — reclaimable, same rule as maintain_rollup
        os.remove(os.path.join(rollup_dir, "_lineage"))
    if kind == "quantile":
        _q_format_guard(rollup_dir, rebuild)
    stamp = _STAMP.format(v=src_v)
    applied = _applied_versions(rollup_dir)
    target_v = SN.current_version(rollup_dir)
    hint = "filter or coalesce NULL group keys before rolling up"
    mcols = _aux_measure_cols(kind)

    def full_state():
        return _aux_state(
            SN.read_snapshot(spark, source_dir, version=src_v),
            group_cols, col, kind,
        )

    if not rebuild and applied and applied[-1] == src_v:
        return {"applied": None, "mode": "noop"}

    if not applied:
        full = full_state()
        _reject_null_group_keys(full, group_cols, hint)
        SN.merge_snapshot(
            spark, rollup_dir, full, key=group_cols, op=stamp,
            expect_version=target_v,
        )
        return {"applied": src_v, "mode": "full"}

    def _rebuild():
        full = full_state()
        _reject_null_group_keys(full, group_cols, hint)
        current = SN.read_snapshot(spark, rollup_dir)
        gone = current.join(
            full, on=group_cols, how="left_anti"
        ).select(
            *group_cols,
            F.lit(0).cast("bigint").alias("n_rows"),
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in full.select(*mcols).dtypes
            ],
        )
        SN.merge_snapshot(
            spark, rollup_dir, full.unionByName(gone), key=group_cols,
            op=stamp, expect_version=target_v,
        )
        return {"applied": src_v, "mode": "rebuild"}

    if rebuild:
        return _rebuild()
    try:
        diff = SN.snapshot_diff(spark, source_dir, applied[-1], src_v)
    except FileNotFoundError:
        return _rebuild()
    ins = F.col("_change") == "insert"
    if kind == "minmax":
        ins_measures = [
            F.min(F.when(ins, F.col(col))).alias("ins_min"),
            F.max(F.when(ins, F.col(col))).alias("ins_max"),
        ]
    elif kind == "hll":
        ins_measures = [
            F.hll_sketch_agg(F.when(ins, F.col(col))).alias("ins_hll")
        ]
    else:
        # the map measure has no single-pass aggregate — the insert
        # sketches come from a separate bounded two-level aggregation
        # joined in below
        ins_measures = []
    per_group = (
        diff.select(*group_cols, col, "_change")
        .groupBy(*group_cols)
        .agg(
            F.coalesce(
                F.sum(F.when(ins, 1).otherwise(-1)), F.lit(0)
            ).cast("bigint").alias("d_rows"),
            F.max((~ins).cast("int")).alias("has_del"),
            *ins_measures,
        )
    )
    # shared by the null-key check, the del-recompute, AND the
    # ins-merge below — persisted FIRST so the diff-side aggregation
    # runs once, not once per consumer (r8 code review)
    per_group.persist()
    try:
        _reject_null_group_keys(per_group, group_cols, hint)
        del_keys = per_group.where("has_del = 1").select(*group_cols)
        recomputed = _aux_state(
            SN.read_snapshot(spark, source_dir, version=src_v).join(
                del_keys, on=group_cols, how="leftsemi"
            ),
            group_cols, col, kind,
        )
        gone = del_keys.join(
            recomputed, on=group_cols, how="left_anti"
        ).select(
            *group_cols,
            F.lit(0).cast("bigint").alias("n_rows"),
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in recomputed.select(*mcols).dtypes
            ],
        )
        current = SN.read_snapshot(spark, rollup_dir)
        ins_groups = per_group.where("has_del = 0")
        if kind == "quantile":
            ins_groups = ins_groups.join(
                _quantile_state(
                    diff.where(ins).select(*group_cols, col),
                    group_cols, col,
                ).select(*group_cols, F.col("qsk").alias("ins_qsk")),
                on=group_cols,
                how="left",
            )
        merged = ins_groups.join(current, on=group_cols, how="left").select(
            *group_cols,
            (
                F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_rows")
            ).cast("bigint").alias("n_rows"),
            *_merged_aux_measures(kind),
        )
        updated = recomputed.unionByName(gone).unionByName(merged)
        SN.merge_snapshot(
            spark, rollup_dir, updated, key=group_cols, op=stamp,
            expect_version=target_v,
        )
    finally:
        per_group.unpersist()
    return {"applied": src_v, "mode": "delta"}


def _merged_aux_measures(kind: str, ins_prefix: str = "ins_") -> list:
    """stored ⊕ inserted measure merge for insert-only groups, per
    kind: least/greatest, register-union, or bucket-wise map add —
    NULL on either side passes the other through (a brand-new group
    has no stored state; an all-NULL insert batch adds nothing)."""
    if kind == "minmax":
        return [
            F.least(F.col("min_val"), F.col(f"{ins_prefix}min")).alias(
                "min_val"
            ),
            F.greatest(
                F.col("max_val"), F.col(f"{ins_prefix}max")
            ).alias("max_val"),
        ]
    if kind == "hll":
        return [
            F.when(F.col("hll").isNull(), F.col(f"{ins_prefix}hll"))
            .when(F.col(f"{ins_prefix}hll").isNull(), F.col("hll"))
            .otherwise(
                F.hll_union(F.col("hll"), F.col(f"{ins_prefix}hll"))
            )
            .alias("hll")
        ]
    return [
        F.when(F.col("qsk").isNull(), F.col(f"{ins_prefix}qsk"))
        .when(F.col(f"{ins_prefix}qsk").isNull(), F.col("qsk"))
        .otherwise(q_merge_expr("qsk", f"{ins_prefix}qsk"))
        .alias("qsk")
    ]


def maintain_aux_rollup_from_rollup(
    spark: SparkSession,
    parent_dir: str,
    child_dir: str,
    key_exprs: dict[str, str],
    kind: str = "minmax",
    rebuild: bool = False,
) -> dict:
    """Hierarchical IVM for the aux measures (r8 VERDICT #3): keep a
    COARSER (n_rows, MIN/MAX | HLL) rollup in sync with a maintained
    PARENT aux rollup of the same kind, so the weekly←daily←base
    lattice that count/sum already enjoy works for extremes and
    approx-distinct too. The composition is exact by the measures'
    own algebra:

    - MIN/MAX re-aggregate over partials (min-of-mins) — a parent
      INSERT merges via least/greatest; any parent DELETE in a child
      group (updates arrive as delete+insert) falls back to a
      re-aggregate of JUST that child group from the PARENT rollup
      pinned at src_v — the first-hop re-scan costs O(parent rows of
      changed groups), never a base-table read, which is the whole
      point of the lattice.
    - HLL sketches union register-wise (order-insensitive), so a
      child sketch unioned from parent partials covers exactly the
      parent's rows; deletes can't be subtracted from a sketch, so
      delete-touched child groups re-union from the pinned parent.

    Same protocol as ``maintain_aux_rollup`` (``ivm:src_v{V}`` stamps
    in the PARENT's version space — replay no-op, rollback-safe log
    order, OCC fence, vacuumed parent history → rebuild with
    vanished-group tombstones) and the same ``_lineage`` binding as
    ``maintain_rollup_from_rollup``, so ``plans/rewrite.py`` composes
    freshness through the chain unchanged and the direct maintainer
    refuses to mix version spaces. ``key_exprs`` maps each child
    group column to a SQL expression over the PARENT's columns."""
    if kind not in AUX_KINDS:
        raise ValueError(f"kind must be one of {AUX_KINDS}, got {kind!r}")
    src_v = SN.current_version(parent_dir)
    if src_v is None:
        raise FileNotFoundError(f"no committed snapshot in {parent_dir}")
    if not key_exprs:
        raise ValueError("key_exprs must map at least one child column")
    parent_abs = os.path.abspath(parent_dir)
    mcols = _aux_measure_cols(kind)
    # the parent must be an aux rollup of the SAME kind — its stored
    # partials are what the child's measures compose from; a wrong
    # kind must fail loudly before any lineage marker binds the dir
    pcols = set(SN.read_snapshot(spark, parent_dir, version=src_v).columns)
    missing = ({"n_rows", *mcols}) - pcols
    if missing:
        raise ValueError(
            f"parent {parent_dir} lacks column(s) {sorted(missing)} — "
            f"not a maintained {kind!r} aux rollup"
        )
    _bind_child_lineage(child_dir, parent_abs)
    if kind == "quantile":
        _q_format_guard(child_dir, rebuild)
    child_cols = list(key_exprs)
    key_aliases = [F.expr(e).alias(c) for c, e in key_exprs.items()]
    stamp = _STAMP.format(v=src_v)
    applied = _applied_versions(child_dir)
    target_v = SN.current_version(child_dir)
    hint = "filter or coalesce the parent keys in key_exprs"

    def _partial_measures():
        """Re-aggregate child measures from parent PARTIALS (exact:
        min-of-mins / register-union; quantile dispatches through
        _quantile_state_from_partials instead — map merge has no
        single-pass aggregate)."""
        if kind == "minmax":
            return [
                F.min("min_val").alias("min_val"),
                F.max("max_val").alias("max_val"),
            ]
        return [F.hll_union_agg("hll").alias("hll")]

    def _child_state(partials: DataFrame) -> DataFrame:
        if kind == "quantile":
            return _quantile_state_from_partials(partials, child_cols)
        return partials.groupBy(*child_cols).agg(
            F.coalesce(F.sum("n_rows"), F.lit(0))
            .cast("bigint")
            .alias("n_rows"),
            *_partial_measures(),
        )

    def full_state():
        parent = read_rollup(spark, parent_dir, version=src_v)
        return _child_state(parent.select(*key_aliases, "n_rows", *mcols))

    if not rebuild and applied and applied[-1] == src_v:
        return {"applied": None, "mode": "noop"}

    if not applied:
        full = full_state()
        _reject_null_group_keys(full, child_cols, hint)
        SN.merge_snapshot(
            spark, child_dir, full, key=child_cols, op=stamp,
            expect_version=target_v,
        )
        return {"applied": src_v, "mode": "full"}

    def _rebuild():
        full = full_state()
        _reject_null_group_keys(full, child_cols, hint)
        current = SN.read_snapshot(spark, child_dir)
        gone = current.join(
            full, on=child_cols, how="left_anti"
        ).select(
            *child_cols,
            F.lit(0).cast("bigint").alias("n_rows"),
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in full.select(*mcols).dtypes
            ],
        )
        SN.merge_snapshot(
            spark, child_dir, full.unionByName(gone), key=child_cols,
            op=stamp, expect_version=target_v,
        )
        return {"applied": src_v, "mode": "rebuild"}

    if rebuild:
        return _rebuild()
    try:
        diff = SN.snapshot_diff(spark, parent_dir, applied[-1], src_v)
    except FileNotFoundError:
        return _rebuild()
    ins = F.col("_change") == "insert"
    if kind == "minmax":
        ins_measures = [
            F.min(F.when(ins, F.col("min_val"))).alias("ins_min"),
            F.max(F.when(ins, F.col("max_val"))).alias("ins_max"),
        ]
    elif kind == "hll":
        ins_measures = [
            F.hll_union_agg(F.when(ins, F.col("hll"))).alias("ins_hll")
        ]
    else:
        ins_measures = []  # joined in below (no map-merge aggregate)
    per_group = (
        diff.select(*key_aliases, "n_rows", *mcols, "_change")
        .groupBy(*child_cols)
        .agg(
            F.coalesce(
                F.sum(
                    F.when(ins, F.col("n_rows")).otherwise(-F.col("n_rows"))
                ),
                F.lit(0),
            ).cast("bigint").alias("d_rows"),
            F.max((~ins).cast("int")).alias("has_del"),
            *ins_measures,
        )
    )
    # one diff-side aggregation for all three consumers (the same
    # persist discipline as maintain_aux_rollup — r8 code review)
    per_group.persist()
    try:
        _reject_null_group_keys(per_group, child_cols, hint)
        del_keys = per_group.where("has_del = 1").select(*child_cols)
        parent_now = read_rollup(spark, parent_dir, version=src_v)
        recomputed = _child_state(
            parent_now.select(*key_aliases, "n_rows", *mcols).join(
                del_keys, on=child_cols, how="leftsemi"
            )
        )
        gone = del_keys.join(
            recomputed, on=child_cols, how="left_anti"
        ).select(
            *child_cols,
            F.lit(0).cast("bigint").alias("n_rows"),
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in recomputed.select(*mcols).dtypes
            ],
        )
        current = SN.read_snapshot(spark, child_dir)
        ins_groups = per_group.where("has_del = 0")
        if kind == "quantile":
            ins_groups = ins_groups.join(
                _quantile_state_from_partials(
                    diff.where(ins).select(*key_aliases, "n_rows", *mcols),
                    child_cols,
                ).select(*child_cols, F.col("qsk").alias("ins_qsk")),
                on=child_cols,
                how="left",
            )
        merged = ins_groups.join(
            current, on=child_cols, how="left"
        ).select(
            *child_cols,
            (
                F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_rows")
            ).cast("bigint").alias("n_rows"),
            *_merged_aux_measures(kind),
        )
        updated = recomputed.unionByName(gone).unionByName(merged)
        SN.merge_snapshot(
            spark, child_dir, updated, key=child_cols, op=stamp,
            expect_version=target_v,
        )
    finally:
        per_group.unpersist()
    return {"applied": src_v, "mode": "delta"}


def read_aux_rollup(
    spark: SparkSession, rollup_dir: str, version: int | None = None
) -> DataFrame:
    """The maintained aux view — read_rollup's contract verbatim
    (one tombstone/version-pin rule, one place to change it)."""
    return read_rollup(spark, rollup_dir, version=version)
