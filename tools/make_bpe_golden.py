"""Generate the golden BPE merge table for the `corpus_bpe_merges`
driver contract.

The contract is iterative (per-round pair-count argmax), so it has no
single-SQL oracle; but the merge sequence is fully DETERMINISTIC
(lexicographic tie-break, no RNG), so it CAN be driver-checked: this
script runs an independent pure-Python BPE — mirroring
operators/bpe.py's exact semantics (whitespace `\\s+` tokenization on
trimmed text, lowercase, end-of-word marker fused onto the final
character, greedy left-to-right adjacent merge, (−count, left, right)
argmax ordering, min_pair_freq early stop) — over the sf0.01 documents
table and writes the resulting merge table as a committed JSON fixture.
The contract's oracle SQL is then a VALUES literal of these rows, so
the driver hash-checks the full merge sequence rows-exactly instead of
rows-only.

Regenerate (only if the fixture data or BPE semantics change):

    python tools/make_bpe_golden.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

END_OF_WORD = "</w>"
N_MERGES = 30
MIN_PAIR_FREQ = 2

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "changedatacapture_reporting_spark",
    "fixtures",
    "bpe_golden_sf001.json",
)


def ref_bpe_merges(
    texts: list[str],
    n_merges: int = N_MERGES,
    min_pair_freq: int = MIN_PAIR_FREQ,
) -> list[tuple[str, str, int]]:
    """Pure-Python BPE reference — independent of Spark; must mirror
    operators/bpe.py:bpe_train's semantics exactly."""
    words: Counter[str] = Counter()
    for t in texts:
        # functions/text.py:tokens = split(trim(text), r"\s+"), lowered
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                words[w] += 1
    hist = {
        tuple(list(w[:-1]) + [w[-1] + END_OF_WORD]): f
        for w, f in words.items()
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, f in hist.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        if n < min_pair_freq:
            break
        merges.append((a, b, n))
        new_hist: dict[tuple[str, ...], int] = {}
        for syms, f in hist.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_hist[key] = new_hist.get(key, 0) + f
        hist = new_hist
    return merges


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    merges = ref_bpe_merges(texts)
    rows = [
        {"rank": i, "left": a, "right": b, "merged": a + b, "n": n}
        for i, (a, b, n) in enumerate(merges)
    ]
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {len(rows)} merges to {FIXTURE}")


if __name__ == "__main__":
    main()
