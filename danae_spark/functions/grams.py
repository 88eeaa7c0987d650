"""Word n-gram array construction — the shared gram builder.

Every gram-based operator (shingle dedup, repetition signals, frequent
n-grams, span fingerprints, DSIR features) needs "the array of n-token
windows of a token array". The obvious Spark expression,

    transform(sequence(0, size(t) - n), i -> concat_ws(' ', slice(t, i+1, n)))

evaluates a per-ELEMENT lambda whose body re-touches the captured
array (and allocates an n-element slice per window); measured on the
sf0.1 documents table this costs ~8× more than pairing n SHIFTED
SLICES of the array with zip_with — per-row array operations only,
no per-element subscripts or slices:

    zip_with(slice(t,1,m), slice(t,2,m), (a,b) -> concat(a, ' ', b))
    with m = greatest(size(t) - n + 1, 0)

(measured: 2-gram build 3.85 s slice-lambda vs 0.49 s zip_with; the
element-subscript form t[i] is worse still at 6.9 s). The fold below
generalizes to any n: n slices, n−1 zip_with levels. Output values and
order are IDENTICAL to the transform form — short arrays produce [] —
so DuckDB oracles and batch/stream parity are unaffected.
"""

from __future__ import annotations


def ngram_expr(tk: str, n: int, sep: str = " ") -> str:
    """SQL expression: array of n-token grams of token-array column/expr
    `tk`, joined by `sep`. Arrays shorter than n yield an empty array.

    `sep` is escaped before interpolation into the SQL string literal —
    a separator containing a quote or backslash would otherwise produce
    a broken (or injected) expression."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        return tk
    sep = sep.replace("\\", "\\\\").replace("'", "\\'")
    m = f"greatest(size({tk}) - {n - 1}, 0)"
    acc = f"slice({tk}, 1, {m})"
    for k in range(1, n):
        acc = (
            f"zip_with({acc}, slice({tk}, {k + 1}, {m}),"
            f" (a, b) -> concat(a, '{sep}', b))"
        )
    return acc
