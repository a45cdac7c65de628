"""Semantic cache-key canonicalization.

The reference's one real optimization is a semantic query cache: it
canonicalizes (data_type, species, fields, condition) so that
``a=1 AND b=2`` hits the cache entry created by ``b=2 AND a=1``
(app/main.py:78-86). Its algorithm — regex-lowercase every token not
adjacent to a quote (:80), split the condition on whitespace, sort
the tokens, base64 the concatenation (:82-86) — is unsound: sorting
*tokens* scrambles operator/operand association (``a > 1 AND b < 2``
and ``a < 1 AND b > 2`` collide) and ignores OR precedence.

This module keeps the reference's cache-hit *equivalences* (conjunct
order and keyword/identifier case don't matter; quoted literals keep
case) but canonicalizes whole top-level AND conjuncts instead of
individual tokens, so operator/operand association is preserved and
the collisions above cannot happen. Disjunctions are normalized only
by whitespace/case inside the conjunct, which is safe (two queries
map to one key only if their conjunct multisets match).
"""

from __future__ import annotations

import base64
import hashlib
import re


def _fold_case_outside_quotes(text: str) -> str:
    """Lowercase everything outside single-quoted string literals.

    Mirrors the *intent* of the reference's regex (app/main.py:80):
    keywords/identifiers are case-insensitive, quoted values are not.
    Handles '' escapes inside literals.
    """
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":  # escaped ''
                        j += 2
                        continue
                    break
                j += 1
            out.append(text[i : min(j + 1, n)])
            i = j + 1
        else:
            out.append(ch.lower())
            i += 1
    return "".join(out)


def _split_top_level_and(condition: str) -> list[str]:
    """Split on AND tokens not inside quotes or parentheses."""
    parts: list[str] = []
    depth = 0
    in_quote = False
    buf: list[str] = []
    tokens = re.split(r"(\s+|\(|\)|')", condition)
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok == "'":
            in_quote = not in_quote
            buf.append(tok)
        elif not in_quote and tok == "(":
            depth += 1
            buf.append(tok)
        elif not in_quote and tok == ")":
            depth -= 1
            buf.append(tok)
        elif not in_quote and depth == 0 and tok.lower() == "and":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(tok)
        i += 1
    parts.append("".join(buf))
    return [p for p in (part.strip() for part in parts) if p]


def canonical_condition(condition: str | None) -> str:
    """Canonical form of a WHERE-fragment: case-folded outside
    quotes, whitespace-normalized, top-level conjuncts sorted."""
    if condition is None or not condition.strip():
        return ""
    folded = _fold_case_outside_quotes(condition.strip())
    conjuncts = _split_top_level_and(folded)
    normalized = [re.sub(r"\s+", " ", c).strip() for c in conjuncts]
    normalized.sort()
    return " and ".join(normalized)


def canonical_fields(fields: str | None) -> str:
    """Canonical form of the projection list: lowercased, trimmed,
    sorted; '*'/blank both mean all columns.

    Note: sorting fields changes output column *order*, not content;
    the reference sorts too (its whitespace-split+sort covers the
    fields string, app/main.py:82-84). Cache hits therefore reuse a
    result whose columns may be ordered differently than requested —
    callers that care re-project, which is free.
    """
    if fields is None or fields.strip() in ("", "*"):
        return "*"
    names = sorted(f.strip().lower() for f in fields.split(",") if f.strip())
    return ",".join(names)


def cache_key(
    data_type: str,
    key_value: str,
    fields: str | None = None,
    condition: str | None = None,
) -> str:
    """Semantic cache key (reference cache_key_generator,
    app/main.py:78-86 — base64 of the canonical string; we hash the
    canonical string to keep keys short and add a sha256 for
    collision resistance)."""
    canonical = "|".join(
        [
            data_type.strip().lower(),
            key_value.strip(),  # key value is data, like a quoted literal: keep case
            canonical_fields(fields),
            canonical_condition(condition),
        ]
    )
    digest = hashlib.sha256(canonical.encode("utf-8")).digest()
    return base64.urlsafe_b64encode(digest).decode("ascii").rstrip("=")


def canonical_sql_text(sql: str) -> str:
    """Cache-key canonicalization for a raw SQL statement: lowercase
    and whitespace-collapse everything OUTSIDE single-quoted string
    literals, leave literal contents byte-exact ('' escapes
    honored) — ``WHERE lang = 'EN'`` and ``where  lang='en'`` must
    NOT collide (same rationale as _fold_case_outside_quotes for
    conditions)."""
    out: list[str] = []
    i, n = 0, len(sql)
    pending_space = False
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            if pending_space and out:
                out.append(" ")
            pending_space = False
            out.append(sql[i : min(j + 1, n)])
            i = j + 1
        elif ch.isspace():
            pending_space = True
            i += 1
        else:
            if pending_space and out:
                out.append(" ")
            pending_space = False
            out.append(ch.lower())
            i += 1
    return "".join(out)
