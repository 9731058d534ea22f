"""Generate the golden per-language encode table for the
`corpus_bpe_encode` driver contract.

Encoding with a trained merge table is deterministic but iterative
(|merges| greedy rewrite passes), so like `corpus_bpe_merges` it has no
single-SQL oracle; this script runs an independent pure-Python encoder
— the same tokenizer semantics as tools/make_bpe_golden.py (whitespace
`\\s+` split on trimmed lowercased text, end-of-word marker fused onto
the final character) and the same greedy left-to-right merge pass as
operators/bpe.py:_merge_expr — applying the COMMITTED golden merges
(fixtures/bpe_golden_sf001.json) to the sf0.01 documents and writes the
per-language totals (lang, n_docs, n_words, n_bpe_units) as a JSON
fixture. The contract's oracle SQL is a VALUES literal of these rows.

Documents with zero words (whitespace-only text) produce no tokens and
are excluded from n_docs — mirroring bpe_encode's explode+filter.

Regenerate (only if the fixture data, the merges, or the tokenizer
semantics change):

    python tools/make_bpe_encode_golden.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter, defaultdict

END_OF_WORD = "</w>"

HERE = os.path.dirname(os.path.abspath(__file__))
MERGES_FIXTURE = os.path.join(
    HERE, "..", "changedatacapture_reporting_spark", "fixtures",
    "bpe_golden_sf001.json",
)
FIXTURE = os.path.join(
    HERE, "..", "changedatacapture_reporting_spark", "fixtures",
    "bpe_encode_golden_sf001.json",
)


def apply_merges(
    word: str, merges: list[tuple[str, str]]
) -> int:
    """Unit count of one word after the full merge chain — greedy
    left-to-right per merge, identical to operators/bpe.py:_merge_expr."""
    syms = list(word[:-1]) + [word[-1] + END_OF_WORD]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    merges = [
        (r["left"], r["right"])
        for r in json.load(open(MERGES_FIXTURE))
    ]
    rows = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()

    unit_cache: dict[str, int] = {}
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for lang, text in rows:
        words = [
            w for w in re.split(r"\s+", text.strip().lower()) if w
        ]
        if not words:
            continue
        n_units = 0
        for w, c in Counter(words).items():
            if w not in unit_cache:
                unit_cache[w] = apply_merges(w, merges)
            n_units += c * unit_cache[w]
        a = agg[lang]
        a[0] += 1
        a[1] += len(words)
        a[2] += n_units
    out = [
        {
            "lang": lang,
            "n_docs": v[0],
            "n_words": v[1],
            "n_bpe_units": v[2],
        }
        for lang, v in sorted(agg.items())
    ]
    with open(FIXTURE, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {len(out)} langs to {FIXTURE}")


if __name__ == "__main__":
    main()
