"""Per-request parameter validation for the /analytics operator
library.

The reference's one query surface lets each request choose its own
``fields``/``condition`` (app/main.py:460-466); the analytics
library deserves the same per-request freedom — "search for MY
terms" — without widening it into an injection surface. Every
parameterizable operator declares a spec here: the parameter's
type, its coercion from the HTTP query-string string form, its
bounds, and its default. Anything not declared is refused.

Defaults are the oracle-pinned demo constants, and resolution DROPS
values equal to the default, so a request that spells out the
defaults shares its semantic-cache entry (and query id) with a bare
submission of the same operator.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Callable

from ensembl_lakehouse_spark.operators import chunking as _chunk
from ensembl_lakehouse_spark.operators import dedup as _dedup
from ensembl_lakehouse_spark.operators import graph as _graph
from ensembl_lakehouse_spark.operators import relational as _rel
from ensembl_lakehouse_spark.operators import reports as _rep
from ensembl_lakehouse_spark.operators import search as _search
from ensembl_lakehouse_spark.operators import similarity as _sim
from ensembl_lakehouse_spark.operators import text as _text


class ParamError(ValueError):
    """A request parameter failed validation (HTTP 400)."""


#: Bound on any requested top-K / fan-out style integer: keeps a
#: request from turning a bounded top-N heap into an unbounded sort
#: or a preview into a full-table collect.
MAX_K = 10_000

#: Bound on requested term lists (a 10k-term query is a scan DoS).
MAX_TERMS = 64


def _coerce_int(raw: Any, lo: int, hi: int, name: str) -> int:
    try:
        val = int(raw)
    except (TypeError, ValueError):
        raise ParamError(f"{name} must be an integer, got {raw!r}")
    if not lo <= val <= hi:
        raise ParamError(f"{name} must be in [{lo}, {hi}], got {val}")
    return val


def _coerce_terms(raw: Any, name: str) -> tuple[str, ...]:
    """Comma-separated string (HTTP) or list of strings (python).

    Terms are matched against the tokenizer's lowercase output, so
    they are case-folded here; empties are dropped. The values are
    DATA (they end up inside `array_contains`-style Column
    expressions, never interpolated into SQL text), so any
    characters are safe — only count is bounded.
    """
    if isinstance(raw, str):
        parts = [t.strip().lower() for t in raw.split(",")]
    elif isinstance(raw, (list, tuple)):
        parts = [str(t).strip().lower() for t in raw]
    else:
        raise ParamError(f"{name} must be a comma-separated string or list")
    terms = tuple(t for t in parts if t)
    if not terms:
        raise ParamError(f"{name} must contain at least one term")
    if len(terms) > MAX_TERMS:
        raise ParamError(f"{name} accepts at most {MAX_TERMS} terms")
    return terms


@dataclass(frozen=True)
class ParamSpec:
    """One operator parameter: coercion + bounds + pinned default."""

    coerce: Callable[[Any], Any]
    default: Any


def _int_spec(default: int, lo: int = 1, hi: int = MAX_K) -> ParamSpec:
    return ParamSpec(
        coerce=lambda raw, _lo=lo, _hi=hi: _coerce_int(raw, _lo, _hi, "value"),
        default=default,
    )


def _coerce_float(raw: Any, lo: float, hi: float, name: str) -> float:
    try:
        val = float(raw)
    except (TypeError, ValueError):
        raise ParamError(f"{name} must be a number, got {raw!r}")
    if not lo <= val <= hi:
        raise ParamError(f"{name} must be in [{lo}, {hi}], got {val}")
    return val


def _float_spec(default: float, lo: float, hi: float) -> ParamSpec:
    return ParamSpec(
        coerce=lambda raw, _lo=lo, _hi=hi: _coerce_float(raw, _lo, _hi, "value"),
        default=default,
    )


#: operator name -> {param name -> spec}. Operators not listed accept
#: no parameters (fail closed). Keep defaults EQUAL to the operator
#: keyword defaults — tests/test_params.py pins that equality so the
#: oracle-checked zero-param behavior can never drift from the spec.
PARAM_SPECS: dict[str, dict[str, ParamSpec]] = {
    "bm25_search": {
        "terms": ParamSpec(
            coerce=lambda raw: _coerce_terms(raw, "terms"),
            default=_search.QUERY_TERMS,
        ),
        "topk": _int_spec(_search.BM25_TOPK),
    },
    "similarity_topk": {
        "n_queries": _int_spec(_sim.N_QUERIES, lo=1, hi=MAX_K),
        "topk": _int_spec(_sim.TOP_K),
    },
    "rank_fusion": {
        "k": _int_spec(_search.RRF_K, lo=1, hi=1000),
        "topk": _int_spec(_search.RRF_TOPK, lo=1, hi=200),
    },
    "mmr_rerank": {
        # select_k > pool degrades gracefully (returns <= pool rows)
        "select_k": _int_spec(_search.MMR_SELECT, lo=1, hi=20),
        "pool": _int_spec(_search.MMR_POOL, lo=2, hi=200),
    },
    "chunk_documents": {
        "width": _int_spec(_chunk.CHUNK_W, lo=1, hi=8192),
        "stride": _int_spec(_chunk.CHUNK_S, lo=1, hi=8192),
    },
    "pack_sequences": {
        "seq_len": _int_spec(_chunk.SEQ_LEN, lo=16, hi=1_048_576),
    },
    "dedup_near": {
        # verification threshold only — the LSH band geometry (and
        # thus candidate recall) is fixed; see the operator docstring
        "threshold": _float_spec(_dedup.JACCARD_THRESHOLD, 0.0, 1.0),
    },
    "dedup_embedding": {
        "threshold": _float_spec(_sim.EMBED_DUP_THRESHOLD, -1.0, 1.0),
    },
    "dedup_semantic": {
        "threshold": _float_spec(_sim.SEMANTIC_THRESHOLD, -1.0, 1.0),
    },
    "similarity_ivf": {
        "n_probe": _int_spec(_sim.IVF_NPROBE, lo=1, hi=256),
        "topk": _int_spec(_sim.TOP_K),
    },
    "events_topk_per_hour": {
        "k": _int_spec(_rel.TRENDING_K, lo=1, hi=100),
    },
    "doc_jaccard_knn": {
        "k": _int_spec(_dedup.JKNN_K, lo=1, hi=50),
    },
    "cooccur_pmi": {
        "top_n": _int_spec(_text.COOCCUR_TOP_N, lo=1, hi=500),
    },
    # round-5 continuation report pack + events/graph additions
    "orders_rfm_segments": {
        "quantiles": _int_spec(_rep.RFM_QUANTILES, lo=2, hi=10),
    },
    "target_encoding": {
        # prior=0 is plain per-category means (no shrinkage)
        "prior": _int_spec(_rep.TE_PRIOR, lo=0, hi=10_000),
    },
    "feature_bin_lift": {
        "bin_width": _int_spec(_rep.BIN_WIDTH, lo=1_000, hi=1_000_000),
    },
    "events_level_shift": {
        "window": _int_spec(_rel.SHIFT_WINDOW, lo=2, hi=30),
    },
    "session_concurrency": {
        "gap_minutes": _int_spec(_rel.SESSION_GAP_MIN, lo=1, hi=1_440),
    },
    "graph_link_predict": {
        "top_n": _int_spec(_graph.LINKPRED_TOP_N, lo=1, hi=500),
    },
}


def _check_chunk_geometry(p: dict[str, Any]) -> None:
    if p["stride"] > p["width"]:
        raise ParamError(
            f"stride ({p['stride']}) must be <= width ({p['width']}) — "
            "a larger stride would silently DROP the tokens between windows"
        )


#: Cross-field validators, run on the FULL resolved view (defaults +
#: overrides) after per-param coercion.
POST_CHECKS: dict[str, Callable[[dict], None]] = {
    "chunk_documents": _check_chunk_geometry,
}


def resolve_params(name: str, raw: dict[str, Any] | None) -> dict[str, Any]:
    """Validate+coerce a request's params for operator ``name``.

    Returns only the NON-DEFAULT resolved values (so cache keys for
    explicit-default requests collapse onto the bare entry). Unknown
    parameter names and out-of-bounds values raise ParamError —
    fail closed, nothing unvalidated ever reaches an operator.
    """
    if not raw:
        return {}
    spec = PARAM_SPECS.get(name)
    if spec is None:
        raise ParamError(f"operator {name!r} accepts no parameters")
    out: dict[str, Any] = {}
    for key, value in raw.items():
        if key not in spec:
            raise ParamError(
                f"unknown parameter {key!r} for {name!r}; "
                f"accepted: {sorted(spec)}"
            )
        try:
            coerced = spec[key].coerce(value)
        except ParamError as exc:
            raise ParamError(f"{key}: {exc}") from exc
        if coerced != spec[key].default:
            out[key] = coerced
    check = POST_CHECKS.get(name)
    if check is not None:
        check({k: ps.default for k, ps in spec.items()} | out)
    return out


def params_cache_suffix(resolved: dict[str, Any]) -> str:
    """Deterministic cache-key fragment for resolved (non-default)
    params; empty string for the bare submission."""
    if not resolved:
        return ""
    canon = {
        k: list(v) if isinstance(v, tuple) else v
        for k, v in sorted(resolved.items())
    }
    return "\x1f" + json.dumps(canon, sort_keys=True, separators=(",", ":"))
