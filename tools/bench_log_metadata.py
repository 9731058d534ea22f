"""Driver-side cost of Delta log metadata operations at a 10k-file log
(VERDICT r10 #8, sf1 rehearsal wave 3).

``_resolve_log`` replay, ``prune_adds`` interval checks and
``metadata_summary``'s stats fold are all O(live files) DRIVER loops —
fine at the 48-file sf0.1 tables they were built against, but the 100 TB
claim needs the cost curve at real commit counts. This script builds a
synthetic-but-spec-shaped log (N adds spread over J json commits, real
stats payloads, no data files — none of the measured paths open data)
and times each operation. Pass/fail bar from the verdict: seconds, not
minutes, at 10k files.

Usage: python tools/bench_log_metadata.py [N_FILES] [N_COMMITS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_log(root: str, n_files: int, n_commits: int) -> str:
    path = os.path.join(root, "bigmeta")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
    per = n_files // n_commits
    for c in range(n_commits):
        lines = []
        if c == 0:
            lines.append(
                json.dumps(
                    {
                        "protocol": {
                            "minReaderVersion": 1,
                            "minWriterVersion": 2,
                        }
                    }
                )
            )
            lines.append(
                json.dumps(
                    {
                        "metaData": {
                            "id": "bench",
                            "format": {
                                "provider": "parquet",
                                "options": {},
                            },
                            "schemaString": json.dumps(schema),
                            "partitionColumns": ["p"],
                            "configuration": {},
                        }
                    }
                )
            )
        for i in range(per):
            fid = c * per + i
            lines.append(
                json.dumps(
                    {
                        "add": {
                            "path": f"p={fid % 64}/part-{fid:06d}.parquet",
                            "partitionValues": {"p": str(fid % 64)},
                            "size": 1 << 20,
                            "modificationTime": 0,
                            "dataChange": True,
                            "stats": json.dumps(
                                {
                                    "numRecords": 1000,
                                    "minValues": {
                                        "id": fid * 1000,
                                        "v": float(fid),
                                    },
                                    "maxValues": {
                                        "id": fid * 1000 + 999,
                                        "v": float(fid) + 0.5,
                                    },
                                    "nullCount": {"id": 0, "v": 3},
                                }
                            ),
                        }
                    }
                )
            )
        with open(os.path.join(log, f"{c:020d}.json"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return path


def main() -> None:
    from changedatacapture_reporting_spark.session import get_spark
    from changedatacapture_reporting_spark.sources.delta_table import (
        _resolve_log,
        metadata_summary,
        prune_adds,
    )

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("bench_log_metadata")
    root = tempfile.mkdtemp(prefix="logmeta_")
    try:
        path = build_log(root, n_files, n_commits)
        t0 = time.perf_counter()
        state = _resolve_log(spark, path, None)
        t_resolve = time.perf_counter() - t0
        adds = list(state["files"].values())
        assert len(adds) == (n_files // n_commits) * n_commits

        skip = [("id", ">=", (n_files - 100) * 1000), ("v", "<", 1e12)]
        t0 = time.perf_counter()
        kept = prune_adds(adds, skip, ["p"])
        t_prune = time.perf_counter() - t0

        t0 = time.perf_counter()
        rows = metadata_summary(spark, path).collect()
        t_meta = time.perf_counter() - t0

        from changedatacapture_reporting_spark.sources.delta_table import (
            write_checkpoint,
        )

        t0 = time.perf_counter()
        cp_version = write_checkpoint(spark, path)
        t_cp = time.perf_counter() - t0
        t0 = time.perf_counter()
        state2 = _resolve_log(spark, path, None)
        t_resolve_cp = time.perf_counter() - t0
        assert len(state2["files"]) == len(adds)

        print(
            json.dumps(
                {
                    "n_files": len(adds),
                    "n_commits": n_commits,
                    "resolve_log_s": round(t_resolve, 3),
                    "prune_adds_s": round(t_prune, 3),
                    "pruned_to": len(kept),
                    "metadata_summary_s": round(t_meta, 3),
                    "summary_rows": len(rows),
                    "write_checkpoint_s": round(t_cp, 3),
                    "cp_version": cp_version,
                    "resolve_after_checkpoint_s": round(t_resolve_cp, 3),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
