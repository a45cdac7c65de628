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


#: Quote characters that open a string literal under Spark's default
#: parser: '...' always; "..." too, because
#: spark.sql.ansi.doubleQuotedIdentifiers defaults to false, so
#: ``WHERE flag = "R"`` compares against the STRING 'R'. Both span
#: kinds must stay byte-exact in cache keys — case-folding "R" to "r"
#: would make two different queries share a key and serve wrong rows.
_QUOTES = ("'", '"')


def _scan_literal(text: str, i: int) -> int:
    """Return j such that ``text[i:j]`` is the complete quoted
    literal opening at ``text[i]``.

    Honors the two escape forms Spark's default (non-ANSI) string
    parser accepts: doubled quotes (``''`` / ``""``) and backslash
    escapes (``\\'`` / ``\\"`` / ``\\\\``). Without the backslash rule
    a scanner ends ``'It\\'s fine'`` at the escaped quote and then
    case-folds the real literal tail — another wrong-key collision.
    Unterminated literals consume to end of string (conservative:
    nothing after them is folded).
    """
    quote = text[i]
    j, n = i + 1, len(text)
    while j < n:
        ch = text[j]
        if ch == "\\" and j + 1 < n:
            j += 2
            continue
        if ch == quote:
            if j + 1 < n and text[j + 1] == quote:  # doubled-quote escape
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _fold_case_outside_quotes(text: str) -> str:
    """Lowercase everything outside string literals.

    Mirrors the *intent* of the reference's regex (app/main.py:80):
    keywords/identifiers are case-insensitive, quoted values are not.
    Literal spans (single- OR double-quoted, with escapes — see
    _scan_literal) are kept byte-exact. If a deployment runs with
    ANSI double-quoted *identifiers*, not folding them merely loses a
    cache-hit equivalence; folding them under the default parser
    serves wrong data, so byte-exact is the safe direction.
    """
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        if text[i] in _QUOTES:
            j = _scan_literal(text, i)
            out.append(text[i:j])
            i = j
        else:
            out.append(text[i].lower())
            i += 1
    return "".join(out)


def _split_top_level_and(condition: str) -> list[str]:
    """Split on AND tokens not inside literals or parentheses."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    i, n = 0, len(condition)
    while i < n:
        ch = condition[i]
        if ch in _QUOTES:
            j = _scan_literal(condition, i)
            buf.append(condition[i:j])
            i = j
        elif ch == "(":
            depth += 1
            buf.append(ch)
            i += 1
        elif ch == ")":
            depth -= 1
            buf.append(ch)
            i += 1
        elif (
            depth == 0
            and condition[i : i + 3].lower() == "and"
            and (i == 0 or not (condition[i - 1].isalnum() or condition[i - 1] == "_"))
            and (
                i + 3 >= n
                or not (condition[i + 3].isalnum() or condition[i + 3] == "_")
            )
        ):
            parts.append("".join(buf))
            buf = []
            i += 3
        else:
            buf.append(ch)
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
    and whitespace-collapse everything OUTSIDE string literals, leave
    literal contents byte-exact — ``WHERE lang = 'EN'`` and
    ``where  lang='en'`` must NOT collide. Literals are scanned with
    _scan_literal, so double-quoted spans (string literals under
    Spark's default doubleQuotedIdentifiers=false) and
    backslash-escaped quotes are also kept byte-exact; see that
    helper for why folding either serves wrong cached rows."""
    out: list[str] = []
    i, n = 0, len(sql)
    pending_space = False
    while i < n:
        ch = sql[i]
        if ch in _QUOTES:
            j = _scan_literal(sql, i)
            if pending_space and out:
                out.append(" ")
            pending_space = False
            out.append(sql[i:j])
            i = j
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
