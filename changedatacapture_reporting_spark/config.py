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
    """

    truncate128: bool = False
    legacy_minute_skip: bool = False
    global_order: bool = False
    swallow_errors: bool = False

    @classmethod
    def reference_faithful(cls) -> "CompatFlags":
        """Flags that reproduce the reference's exact (buggy) behaviour."""
        return cls(
            truncate128=True,
            legacy_minute_skip=True,
            global_order=True,
            swallow_errors=True,
        )
