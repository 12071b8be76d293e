"""Cross-engine deterministic hashing helpers.

The driver's correctness gate compares Spark output against DuckDB output,
so any hash an operator exposes must be computable identically in both
engines. md5 is the common denominator (identical lowercase hex in both);
to get a NUMERIC hash we parse the first 12 hex chars into a 48-bit BIGINT
with a pure-arithmetic expression (ascii math — no engine-specific conv()),
emitted as a SQL string both engines parse identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 12  # 48 bits — collision-safe for corpus-scale dedup buckets


def _hexval(c: str) -> str:
    # CAST keeps the multiplication in 64-bit (DuckDB would otherwise
    # overflow INT32 on the high-order 16^k terms)
    return (
        f"CAST(ascii({c}) - (CASE WHEN ascii({c}) >= 97 THEN 87 ELSE 48 END) AS BIGINT)"
    )


def hex_to_long_sql(col_sql: str, n: int = HEX_CHARS) -> str:
    """SQL expression turning the first n hex chars of ``col_sql`` into a
    BIGINT. Same text valid in Spark SQL and DuckDB."""
    terms = [
        f"{_hexval(f'substr({col_sql}, {i + 1}, 1)')} * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def md5_long_sql(expr_sql: str, n: int = HEX_CHARS) -> str:
    """BIGINT hash of an arbitrary SQL string expression via md5."""
    return hex_to_long_sql(f"substr(md5({expr_sql}), 1, {n})", n)


def md5_long(col: Column | str, n: int = HEX_CHARS) -> Column:
    """Spark Column version of md5_long_sql (same bits)."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("pass a column NAME so the SQL text is embeddable")
    return F.expr(md5_long_sql(name, n))


# ---- engine-neutral bit-trick SQL text (valid in Spark SQL and DuckDB) ----

def lowest_set_bit_pos_sql(x_sql: str) -> str:
    """Index of the lowest SET bit of a nonzero integer expression.
    ``x & -x`` isolates the bit (two's complement, sign-safe in both
    engines); LOG2 of an exact power of two is exact in IEEE doubles."""
    return f"CAST(ROUND(LOG2(({x_sql}) & -({x_sql}))) AS INT)"


def lowest_unset_bit_pos_sql(m_sql: str) -> str:
    """Index of the lowest ZERO bit of a (non-all-ones) mask expression —
    the Flajolet-Martin estimator's b; lowest set bit of ~m."""
    return lowest_set_bit_pos_sql(f"~({m_sql})")


def fm_init_mask_sql(hash_sql: str, width: int) -> str:
    """Flajolet-Martin initial bitmask from a 48-bit uniform hash: set bit
    i with P = 0.5^(i+1) (i = #trailing zeros of the hash), zero when the
    position falls outside ``width`` (EffectiveDiameterApproximation.cpp:54-60
    init semantics, derandomized by hash). POWER(2, i) is exact in doubles
    for i < 52, so the text stays engine-neutral (no shift-operator
    dialect differences)."""
    pos = lowest_set_bit_pos_sql(hash_sql)
    return (
        f"CAST(CASE WHEN ({hash_sql}) = 0 OR {pos} >= {width} THEN 0 "
        f"ELSE POWER(2, {pos}) END AS BIGINT)"
    )
