"""Portable keyed hashing (LCG) — identical in Spark SQL, DuckDB SQL, Python.

Everything stochastic in this engine (planted corpus content, sampling,
keyed synthetic substitution a la Faker — see reference
``faker_generator.py:120-596``) is a pure function of a 64-bit row key
through this hash chain, so that:

  * every stage is deterministic and resumable (north_rule),
  * DuckDB oracles can recompute the exact same values in plain SQL,
  * pytest goldens can recompute them in pure Python.

Arithmetic is kept inside int64 (operands < 2^31 before multiply) so it
is safe under Spark 4's default ANSI mode and DuckDB's checked overflow.
"""

from __future__ import annotations

# modulus: the largest prime below 2^31. An earlier 2^31 (power-of-two)
# modulus made every `h % n` reduction with even n a function of the key's
# low bits only (mul/add/mod-2^k is a ring homomorphism on low bits), which
# capped planted-corpus diversity at ~120 person keys regardless of corpus
# size; an odd prime modulus mixes all bits into every reduction.
M = 2_147_483_629
PHI = 2_654_435_761  # Knuth multiplicative constant (fits the first multiply)
A = 1_103_515_245  # glibc LCG multiplier for chained re-hash
C = 12_345


# ---------------------------------------------------------------- python
def h1(key: int, salt: int) -> int:
    """First-level hash of a non-negative int key. SQL-side bound:
    key * PHI must fit int64, so key <= ~3.47e9 ((2^63-1)/PHI); stay
    below 2^31 to honor the module invariant with ample margin (every
    engine key — doc_id incl. bench replication and the +2e6 dup
    offsets, vec_id + 1e5, strhash < M — is far below it)."""
    return (key * PHI + salt * 97 + C) % M


def h2(prev: int, salt: int) -> int:
    """Chained re-hash of a previous hash value (< 2^31).

    The cross term (prev % 3037) * salt * 97 makes the salt's contribution
    depend on prev: without it, hv(i) - hv(j) would be a constant for every
    key (the chain is affine with a shared slope), locking reductions like
    first-name %24 and last-name %40 together and capping planted-corpus
    diversity. Operands stay < 2^61, safe for ANSI int64."""
    return (prev * A + (prev % 3037) * (salt * 97) + C) % M


def hn(key: int, *salts: int) -> int:
    """h1 then h2-chain through the given salts."""
    v = h1(key, salts[0] if salts else 0)
    for s in salts[1:]:
        v = h2(v, s)
    return v


# ------------------------------------------------------------ sql (both)
# The same expressions are valid Spark SQL and DuckDB SQL: `%` on
# non-negative int64, `*`, `+` only.
def sql_h1(key_expr: str, salt: int) -> str:
    return f"((({key_expr}) * {PHI} + {salt * 97 + C}) % {M})"


def sql_h2(prev_expr: str, salt: int | str) -> str:
    """`salt` may be an int or a SQL integer expression (e.g. ``"j + 1"``).
    Mirrors h2() exactly (incl. the prev-dependent cross term)."""
    s97 = salt * 97 if isinstance(salt, int) else f"(({salt}) * 97)"
    return (
        f"((({prev_expr}) * {A} + (({prev_expr}) % 3037) * {s97} + {C}) % {M})"
    )


def sql_hn(key_expr: str, *salts: int) -> str:
    v = sql_h1(key_expr, salts[0] if salts else 0)
    for s in salts[1:]:
        v = sql_h2(v, s)
    return v


# ------------------------------------------------------------- string keys
STRHASH_CHARS = 12
_POW31 = [pow(31, i + 1, M) for i in range(STRHASH_CHARS)]


def strhash(s: str) -> int:
    """Portable string -> int key (polynomial over the first 12 chars +
    length); identical in Python / Spark SQL / DuckDB SQL. Used to key
    deterministic masking by original surface form so every occurrence of
    the same value maps to the same synthetic replacement (referential
    stability — stronger than the reference's global-RNG Faker draws)."""
    s = s or ""
    v = len(s) * 97
    for i in range(min(len(s), STRHASH_CHARS)):
        v += ord(s[i]) * _POW31[i]
    return v % M


def fullhash(s: str | None) -> int:
    """Portable FULL-string hash: modular 31-polynomial fold over every
    char of '#' || s (the sentinel makes the empty string a 1-char fold,
    so the Spark/DuckDB sequence bounds never go descending), seeded
    with the length. Unlike strhash (first 12 chars + length — right for
    short masking keys, structurally collision-prone on long
    shared-prefix strings like word shingles), this distinguishes any
    two distinct ASCII strings up to the 2^31 modulus. Python mirror of
    sql_fullhash."""
    t = "#" + (s or "")
    v = (len(t) * 97) % M
    for ch in t:
        v = (v * 31 + ord(ch)) % M
    return v


def sql_fullhash(expr: str, dialect: str = "spark") -> str:
    """fullhash() as SQL. Dialect-specific (the char fold needs each
    engine's HOF spelling): Spark `aggregate` over a char-index
    sequence, DuckDB `list_reduce` over a seed-prepended codepoint list.
    NULL-safe like the mirror. PERF NOTE (Spark): the prefixed string is
    inlined in the lambda body, which interpreted HOFs re-evaluate per
    element (CLAUDE.md no-CSE) — concat of a column ref is cheap, but
    callers hashing a long/derived text expression should project it to
    a plain column first and pass that column's name."""
    e = f"concat('#', coalesce({expr}, ''))"
    if dialect == "spark":
        return (
            f"aggregate(sequence(1, length({e})),"
            f" cast(length({e}) * 97 % {M} as bigint),"
            f" (acc, i) -> (acc * 31 + ascii(substring({e}, i, 1))) % {M})"
        )
    e = f"('#' || coalesce({expr}, ''))"
    return (
        f"list_reduce(list_prepend(cast(length({e}) * 97 % {M} as bigint),"
        f" list_transform(range(1, length({e}) + 1),"
        f" i -> ascii(substring({e}, i::INT, 1))::BIGINT)),"
        f" (acc, c) -> (acc * 31 + c) % {M})"
    )


def sql_strhash(expr: str) -> str:
    """Same polynomial as strhash(), valid in Spark SQL and DuckDB SQL.
    Terms stay < 2^42, safe for int64 ANSI arithmetic. NULL-safe like the
    Python mirror (strhash(None) == strhash('') == 0): the input is
    coalesced to '' so a NULL cell hashes to 0 instead of poisoning the
    whole expression to NULL."""
    e = f"coalesce({expr}, '')"
    terms = [f"cast(length({e}) as bigint) * 97"]
    for i in range(STRHASH_CHARS):
        c = (
            f"cast(coalesce(ascii(nullif(substring({e}, {i + 1}, 1), '')), 0)"
            " as bigint)"
        )
        terms.append(f"{c} * {_POW31[i]}")
    return f"(({' + '.join(terms)}) % {M})"
