"""Deterministic cross-engine hashing primitives.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` disagree, so
every sketch here (minhash, simhash, LSH) derives integers from md5 — which
both engines compute identically — then does plain int64 arithmetic that is
also identical on both sides. Parameters are pinned constants (seed=42
offline) so signatures are stable across runs, engines, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus and ranges chosen so (a * x' + b) stays < 2^60: no int64 overflow
# in either engine. P is prime; x is reduced mod P before the affine map.
MINHASH_P = 1_000_000_007
MINHASH_A = (
    686579304, 119540832, 26855093, 796233791, 295310486, 262950629,
    239670712, 149827707, 790779947, 110053354, 726600540, 795285933,
    957970517, 585582862, 93349857, 634036507,
)
MINHASH_B = (
    453035110, 34126396, 31994523, 100604502, 234760738, 249817734,
    542621108, 646412689, 28492780, 602632297, 213500298, 768820204,
    697808098, 753041955, 585126461, 450455977,
)
MINHASH_K = len(MINHASH_A)
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS

SIMHASH_BITS = 16


def md5_int(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative int64 (< 2^60).

    DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_value(x_mod_p: Column, i: int) -> Column:
    """i-th universal-hash value for a shingle already reduced mod P."""
    return (F.lit(MINHASH_A[i]) * x_mod_p + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)


def simhash_bit_weight(x: Column, bit: int) -> Column:
    """+1 / -1 contribution of token-hash x to a simhash bit."""
    return F.when(F.shiftright(x, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))


# --- DuckDB SQL twins (kept adjacent so drift is caught in review) --------

def md5_int_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_value_sql(x_expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * {x_expr} + {MINHASH_B[i]}) % {MINHASH_P})"
