"""CDC schema evolution: union event frames whose ``before``/``after``
source structs differ — the capture-instance upgrade dance.

SQL Server CDC freezes a table's column set per capture instance; adding
a column means standing up a SECOND capture instance and consuming both
until the old one drains (the reference pipeline reads a single
capture instance per table — usp_cdc_populate_changelog.sql:73's
``@capture_instance`` — and would have to be re-pointed manually).
Debezium likewise emits envelopes whose schema changes mid-topic. Either
way the consumer holds a mix of event frames with different image
structs and must align them before building one changelog.

Alignment semantics: the target struct is the UNION of all frames'
image fields (first-seen order). A frame missing a field gets a typed
NULL in BOTH images — crucially that means null-safe change detection
stays silent for the absent column (NULL ≡ NULL), so v1 events never
fabricate ``old → NULL`` change rows for columns that did not exist
when they were captured; the column's history simply begins with the
first v2 event that writes it. NULL images (insert ``before`` / delete
``after``) stay NULL, not structs-of-NULL — liveness markers depend on
that.

Type conflicts between same-named fields fail loudly; widen/cast
upstream where a column's type changed, so the decision is explicit
rather than silently lattice-resolved.

Scale: pure projection per frame + unionByName — no shuffle, no Python;
the union is a scan-level concatenation Catalyst pushes filters through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _image_fields(frames: list[DataFrame], image: str) -> list[T.StructField]:
    out: list[T.StructField] = []
    seen: dict[str, T.DataType] = {}
    for df in frames:
        for f in df.schema[image].dataType.fields:
            if f.name in seen:
                if seen[f.name] != f.dataType:
                    raise TypeError(
                        f"field {image}.{f.name} has conflicting types "
                        f"{seen[f.name].simpleString()} vs "
                        f"{f.dataType.simpleString()}; cast the frames to "
                        "a common type before aligning"
                    )
                continue
            seen[f.name] = f.dataType
            out.append(f)
    return out


def align_cdc_schemas(frames: list[DataFrame]) -> DataFrame:
    """Union CDC event frames (``lsn, seq, commit_ts, op, table_name,
    before, after``) over the union of their image fields."""
    if not frames:
        raise ValueError("align_cdc_schemas needs at least one frame")
    target = {
        image: _image_fields(frames, image) for image in ("before", "after")
    }

    def rebuild(df: DataFrame, image: str) -> F.Column:
        have = {f.name for f in df.schema[image].dataType.fields}
        cols = [
            F.col(f"{image}.{f.name}").alias(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target[image]
        ]
        # a NULL image must stay NULL (not a struct of NULLs) — delete
        # `after` / insert `before` drive the op markers downstream
        return F.when(F.col(image).isNotNull(), F.struct(*cols)).alias(image)

    other = [
        c for c in frames[0].columns if c not in ("before", "after")
    ]
    aligned = [
        df.select(*other, rebuild(df, "before"), rebuild(df, "after"))
        for df in frames
    ]
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out
