"""Data-quality expectations — declarative validation over any frame
(source extracts before populate, reconstructed state after apply,
corpus tables before packing), summarized as one row per rule.

The reference validates inputs procedurally (RAISERROR guards,
usp_cdc_populate_changelog.sql:73–101); pipelines at scale want the
declarative form every orchestrator speaks (dbt tests, Deequ, GE):
``not_null`` / ``unique`` / ``accepted_values`` / ``in_range`` /
``fk_exists`` / arbitrary predicate, each yielding a violation count
and a pass flag.

Plan shape (scale notes): every ROW-LEVEL rule (not_null, values,
range, predicate) folds into a single conditional-count aggregation —
ONE pass over the table for any number of such rules, map-side partial,
no shuffle beyond the one-row reduce. ``unique`` rides the same pass as
``count(*) − count(distinct key)`` (excess-duplicate rows; Spark plans
the distinct as a partial-dedup expand, not a second scan of the
table). ``fk_exists`` is per-rule a broadcast LEFT ANTI join count —
the child table never shuffles; keep reference sides dimension-sized
or pre-deduplicated.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    cols: tuple[str, ...] = ()
    violated: Column | None = None  # row-level violation predicate
    ref: DataFrame | None = None
    ref_col: str | None = None
    payload: tuple = field(default_factory=tuple)


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(
        name or f"not_null:{col}",
        "row",
        (col,),
        violated=F.col(col).isNull(),
    )


def accepted_values(
    col: str, values: Sequence, name: str | None = None
) -> Rule:
    """NULLs are not violations here — compose with not_null to forbid
    them (dbt's accepted_values semantics)."""
    return Rule(
        name or f"accepted_values:{col}",
        "row",
        (col,),
        violated=F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
    )


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(
        name or f"in_range:{col}",
        "row",
        (col,),
        violated=F.col(col).isNotNull()
        & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def satisfies(predicate: Column, name: str) -> Rule:
    """Arbitrary row predicate that must hold; NULL counts as violation
    (an unknown truth value fails an expectation)."""
    return Rule(name, "row", (), violated=~F.coalesce(predicate, F.lit(False)))


def unique(cols: Sequence[str], name: str | None = None) -> Rule:
    return Rule(
        name or "unique:" + ",".join(cols), "unique", tuple(cols)
    )


def fk_exists(
    col: str, ref: DataFrame, ref_col: str, name: str | None = None
) -> Rule:
    """Every non-NULL child value must exist in the reference column."""
    return Rule(
        name or f"fk_exists:{col}", "fk", (col,), ref=ref, ref_col=ref_col
    )


def check_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``. Output: ``rule`` (name),
    ``n_violations`` (long), ``passed`` (bool) — one row per rule, in
    no particular order. Row-level and unique rules share one scan;
    each fk rule adds one broadcast anti-join count."""
    if not rules:
        raise ValueError("no rules given")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    agg_exprs, agg_names = [], []
    fk_frames = []
    for r in rules:
        if r.kind == "row":
            agg_exprs.append(
                F.count(F.when(r.violated, F.lit(1))).cast("long")
            )
            agg_names.append(r.name)
        elif r.kind == "unique":
            key = F.struct(*[F.col(c) for c in r.cols])
            agg_exprs.append(
                (F.count("*") - F.count_distinct(key)).cast("long")
            )
            agg_names.append(r.name)
        elif r.kind == "fk":
            child = df.select(F.col(r.cols[0]).alias("_v")).filter(
                F.col("_v").isNotNull()
            )
            parent = r.ref.select(
                F.col(r.ref_col).alias("_v")
            ).distinct()
            orphans = child.join(F.broadcast(parent), "_v", "left_anti")
            fk_frames.append(
                orphans.agg(
                    F.lit(r.name).alias("rule"),
                    F.count("*").cast("long").alias("n_violations"),
                )
            )
        else:  # pragma: no cover - constructors only produce the above
            raise ValueError(f"unknown rule kind: {r.kind}")

    parts = []
    if agg_exprs:
        one = df.agg(
            *[e.alias(f"_r{i}") for i, e in enumerate(agg_exprs)]
        )
        stack_args = ", ".join(
            "'{}', _r{}".format(n.replace("'", "''"), i)
            for i, n in enumerate(agg_names)
        )
        parts.append(
            one.select(
                F.expr(
                    f"stack({len(agg_names)}, {stack_args}) "
                    "as (rule, n_violations)"
                )
            )
        )
    parts.extend(fk_frames)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
