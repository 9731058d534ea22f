"""Vector (embedding-column) primitives over ``array<float>``.

JVM-side higher-order functions — no UDF, no collect. ``dot_decimal`` is
the oracle-exact variant: both Spark and DuckDB produce bit-identical
decimals because decimal arithmetic is exact and order-independent
(a double fold can differ in the last ulp between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_double(a: Column, b: Column) -> Column:
    """Dot product in double (fast path for ranking/thresholding)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_decimal(a: Column, b: Column, scale: str = "decimal(10,6)") -> Column:
    """Exact dot product: each component rounds to a fixed decimal grid
    (identical rounding in any engine — no IEEE double sits exactly on a
    10⁻⁶ tie), products/sums stay exact."""
    # accumulator stays at (28,12) so each add keeps scale 12 exactly
    # (a (38,12)+(38,12) add would be rescaled to (38,11) by Spark);
    # values are bounded (components < 10^4) so 28 digits never overflow
    # float→decimal must go THROUGH double: Spark's direct float→decimal
    # rounds the float's 7-digit shortest string (which often ends on a
    # rounding tie), while value-based engines (DuckDB) round the numeric
    # value — double's 17-digit repr never ties at the 10⁻⁶ grid
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: x.cast("double").cast(scale) * y.cast("double").cast(scale),
        ),
        F.lit(0).cast("decimal(28,12)"),
        lambda acc, v: (acc + v).cast("decimal(28,12)"),
        lambda acc: acc.cast("decimal(38,12)"),
    )


def dot_decimal_int64(a: Column, b: Column) -> Column:
    """Bit-identical fast form of :func:`dot_decimal` (r15, VERDICT r14
    #9 — the oracle-tier comparison leg of every ANN accuracy contract
    ranks on this): components round to the SAME 10⁻⁶ grid —
    ``F.round(double, 6)`` and the ``decimal(10,6)`` cast are the same
    value-based HALF_UP rounding (both go through the double's shortest
    BigDecimal representation, which never sits on a 10⁻⁶ tie) — but
    the grid values then multiply and sum as plain int64 (q = value ×
    10⁶), with ONE decimal division at the end restoring the exact
    ``decimal(38,12)``. Integer arithmetic is exact while |component| ≤
    100 (|q| ≤ 10⁸ ⇒ |q·q| ≤ 10¹⁶; thousands of terms stay far under
    2⁶³); rows where either vector exceeds that bound — or carries
    NaN/±Inf, whose decimal-cast semantics differ — fall back to
    :func:`dot_decimal` unchanged, so the result is equal by
    construction there and by the grid identity everywhere else
    (pinned bit-for-bit by tests/test_dot_int64.py)."""

    def q(v: Column) -> Column:
        return F.transform(
            v,
            lambda x: F.round(
                F.round(x.cast("double"), 6) * F.lit(1e6)
            ).cast("long"),
        )

    s = F.aggregate(
        F.zip_with(q(a), q(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    exact = (
        s.cast("decimal(38,12)") / F.lit(1_000_000_000_000)
    ).cast("decimal(38,12)")

    def in_bounds(v: Column) -> Column:
        # max |component| ≤ 100; NaN/Inf compare false → decimal path
        return (
            F.aggregate(
                v,
                F.lit(0.0),
                lambda m, x: F.greatest(m, F.abs(x.cast("double"))),
            )
            <= F.lit(100.0)
        )

    return F.when(in_bounds(a) & in_bounds(b), exact).otherwise(
        dot_decimal(a, b)
    )


def l2_norm_sq(a: Column) -> Column:
    """Squared L2 norm (double)."""
    return dot_double(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double. A zero vector yields NaN (0/0 in
    IEEE double — Spark and DuckDB agree, so oracle parity holds);
    filter empty embeddings upstream if NaN ordering (greatest in
    Spark's sort) would pollute a top-k."""
    return dot_double(a, b) / F.sqrt(l2_norm_sq(a) * l2_norm_sq(b))


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: q_i = floor(x_i · 127 /
    max|x| + 0.5) ∈ [-127, 127] — the 4× storage/bandwidth reduction
    every embedding store at scale applies before ANN serving. The
    formula is spelled in floor-arithmetic (not ``round``) because
    floor is defined identically in every engine, while round's
    tie-breaking (half-up vs half-even) is not; exact replayability is
    what lets the contract hash-check quantized values.

    Returns struct(q: array<int>, scale: double) where
    dequantized_i = q_i · scale and scale = max|x| / 127. An all-zero
    vector quantizes to zeros with scale 0.
    """
    mx = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    q = F.transform(
        vec,
        lambda x: F.when(mx == 0.0, F.lit(0))
        .otherwise(
            F.floor(x.cast("double") * 127.0 / mx + 0.5).cast("int")
        )
        .cast("int"),
    )
    return F.struct(
        q.alias("q"), (mx / 127.0).alias("scale")
    )


def dequantize_int8(qstruct: Column) -> Column:
    """Inverse of :func:`quantize_int8`: array<double> approximation."""
    return F.transform(
        qstruct["q"], lambda qi: qi.cast("double") * qstruct["scale"]
    )


def projection_signs(
    in_dim: int, out_dim: int, seed: int = 0
) -> list[list[int]]:
    """Deterministic ±1 sign matrix (md5-derived, engine-independent) for
    :func:`random_projection`. Computed once on the driver — the matrix
    depends only on (dims, seed), never on data — and embedded as plan
    literals, so the identical matrix is trivially replayable in an
    oracle engine (or a future re-run) without shipping any state."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:2], 16
            )
            < 128
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    vec: Column, signs: list[list[int]], grid: int = 1_000_000
) -> Column:
    """Sign (Achlioptas/JL-style) random projection of an
    ``array<float>`` onto ``len(signs)`` dimensions, in EXACT fixed-point
    arithmetic: components snap to a 1/``grid`` integer lattice
    (``floor(x·grid + 0.5)`` — one IEEE multiply, bit-identical in every
    engine), then each output is a ±1-signed BIGINT sum. Output
    ``array<bigint>``; the real-valued projection is
    ``out_j / (grid · √out_dim)``, but distances/dot-products on the raw
    integers rank identically (common positive scale), which is all the
    ANN prefilter needs — so no float ever enters the hot path.

    Cuts ANN bandwidth in half beyond int8 quantization (64 floats →
    8–16 longs) at a JL-bounded distance distortion; the standard cheap
    projection for bucketing/prefiltering before exact re-ranking.
    Expression-only: no UDF, no shuffle, applies in the scan stage.
    """
    out_dim = len(signs)
    if not out_dim or any(len(r) != len(signs[0]) for r in signs):
        raise ValueError("signs must be a non-empty rectangular matrix")
    ints = F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * float(grid) + 0.5).cast(
            "long"
        ),
    )
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    ints,
                    F.array(*[F.lit(s).cast("long") for s in row]),
                    lambda x, s: x * s,
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            for row in signs
        ]
    )
