"""Fidelity/compat flags for reference quirks (SURVEY.md §7 "hard parts").

The reference embeds several behaviours that are arguably bugs; our defaults
are the *correct* behaviours, with opt-in flags to reproduce the reference
bit-for-bit where a migrating user needs that.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CompatFlags:
    """Compatibility switches.

    truncate128:
        Reference erases every value through ``CONVERT(VARCHAR(128), …)``
        (usp_cdc_populate_changelog.sql:271–277), silently truncating long
        values to 128 chars. Default False: full-length strings.
    legacy_minute_skip:
        Reference resumes incremental loads from ``MAX(commit_time) + 1
        minute`` (usp_cdc_populate_changelog.sql:203), which can silently
        drop changes committed within 60s after the last load. Default
        False: resume by strict ``lsn >`` high-watermark (exact).
    global_order:
        Reference issues a global ``ORDER BY commit_time, pk…, column_name``
        before insert (usp_cdc_populate_changelog.sql:390–394). A global
        total order into an append-only table is a T-SQL-ism that costs a
        range-partition exchange at scale; default False orders *within*
        table_name partitions only.
    swallow_errors:
        Reference TRY/CATCHes any populate failure into a "No changes were
        detected" message (usp_cdc_populate_changelog.sql:401–409). Default
        False: surface real failures.
    surrogate_id:
        Reference DDL leads with a ``<desttable>_id BIGINT IDENTITY(1,1)``
        clustered key (usp_cdc_populate_changelog.sql:144,156). No reference
        query depends on its VALUES (SURVEY.md §1.3), but ``query:50`` is a
        ``SELECT *``, so byte-compat consumers need the column present.
        True adds ``changelog_id`` (``monotonically_increasing_id()`` —
        unique and ascending per partition; IDENTITY's global contiguity is
        a single-writer T-SQL-ism that would serialize a cluster). Default
        False.
    audit_modified_cols:
        Reference DDL carries ``modified_dt``/``modified_by`` (populate:
        153–154) that nothing ever writes (the changelog is append-only) —
        they exist for hand-edits. True adds them as typed NULLs for
        ``SELECT *`` schema parity. Default False.
    """

    truncate128: bool = False
    legacy_minute_skip: bool = False
    global_order: bool = False
    swallow_errors: bool = False
    surrogate_id: bool = False
    audit_modified_cols: bool = False

    @classmethod
    def reference_faithful(cls) -> "CompatFlags":
        """Flags that reproduce the reference's exact (buggy) behaviour."""
        return cls(
            truncate128=True,
            legacy_minute_skip=True,
            global_order=True,
            swallow_errors=True,
            surrogate_id=True,
            audit_modified_cols=True,
        )
