"""Number-theoretic transform (exact integer FFT) over array columns.

Polynomial/sequence convolution in O(n log n) EXACT modular
arithmetic — the integer-lattice form of the FFT (mod P = 998244353,
the standard NTT prime with 2^23 | P-1, generator 3). Floating FFT is
ungateable cross-engine; the NTT is bit-exact everywhere, which is
the point.

Spark-first shape: the transform of a length-64 series is a
bit-reversal gather plus SIX butterfly rounds, each ONE JVM
`transform()` expression over the row's array column. The butterfly
wiring (pair indices, twiddle factors with subtraction folded into
mod-P twiddles) is precomputed in Python and baked in as literal
arrays, so the engine runs a straight-line gather-multiply-add
program per row: no shuffle, no Python in the hot path. Each round
lives in its OWN .select projection — a butterfly references its
input array twice, and letting Catalyst collapse the projection chain
would duplicate the subtree 2^rounds times (the same explosion the
Hilbert encoder hit; per-level projections are the fix,
functions/hilbert.py).

Products stay below 2^60 (twiddle < P ~ 2^30, values < P), so BIGINT
pmod arithmetic never overflows. Rows are independent — 100 TB of
bounded series is embarrassingly parallel; longer series run the
identical rounds on exploded (series, idx) rows with equi-joins on
the same precomputed wiring, one shuffle per round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

P = 998244353
N = 64
_G = 3


def _bit_rev(i: int, bits: int = 6) -> int:
    r = 0
    for b in range(bits):
        r = (r << 1) | ((i >> b) & 1)
    return r


def _tables(invert: bool):
    w = pow(_G, (P - 1) // N, P)
    if invert:
        w = pow(w, P - 2, P)
    perm = [_bit_rev(i) for i in range(N)]
    rounds = []
    size = 2
    while size <= N:
        wlen = pow(w, N // size, P)
        p0 = [0] * N
        p1 = [0] * N
        tw = [0] * N
        for start in range(0, N, size):
            cur = 1
            for j in range(size // 2):
                i0, i1 = start + j, start + j + size // 2
                p0[i0], p1[i0], tw[i0] = i0, i1, cur
                p0[i1], p1[i1], tw[i1] = i0, i1, P - cur
                cur = cur * wlen % P
        rounds.append((p0, p1, tw))
        size *= 2
    return perm, rounds


def _arr(vals) -> str:
    return "array(" + ",".join(f"{v}L" for v in vals) + ")"


def add_ntt(df: DataFrame, src: str, out: str, invert: bool = False) -> DataFrame:
    """Append column `out` = NTT(df[src]) (or inverse when `invert`),
    where src is a length-64 array<bigint> with entries in [0, P).
    One projection per butterfly round (see module docstring)."""
    perm, rounds = _tables(invert)
    tmp = f"__ntt_{out}_"
    df = df.withColumn(
        tmp + "0",
        F.expr(
            f"transform(sequence(0, {N - 1}), i -> element_at({src}, "
            f"cast(element_at({_arr(perm)}, i + 1) + 1 as int)))"
        ),
    )
    for r, (p0, p1, tw) in enumerate(rounds, start=1):
        prev = tmp + str(r - 1)
        df = df.select(
            "*",
            F.expr(
                f"transform(sequence(0, {N - 1}), i -> pmod("
                f"element_at({prev}, cast(element_at({_arr(p0)}, i + 1) + 1 as int)) + "
                f"element_at({_arr(tw)}, i + 1) * "
                f"element_at({prev}, cast(element_at({_arr(p1)}, i + 1) + 1 as int)), {P}))"
            ).alias(tmp + str(r)),
        ).drop(prev)
    last = tmp + str(len(rounds))
    if invert:
        ninv = pow(N, P - 2, P)
        df = df.withColumn(last, F.expr(f"transform({last}, v -> pmod(v * {ninv}L, {P}))"))
    return df.withColumnRenamed(last, out)


def ntt_convolve(df: DataFrame, a: str, b: str, out: str) -> DataFrame:
    """Append `out` = exact mod-P circular convolution of length-64
    arrays a and b (zero-pad top halves for linear 32x32 products)."""
    df = add_ntt(df, a, "__fa", invert=False)
    df = add_ntt(df, b, "__fb", invert=False)
    df = df.withColumn(
        "__fc", F.expr(f"zip_with(__fa, __fb, (x, y) -> pmod(x * y, {P}))")
    ).drop("__fa", "__fb")
    df = add_ntt(df, "__fc", out, invert=True)
    return df.drop("__fc")
