"""Golden generator for ``byte_bpe_subword_stats`` (round 7).

Byte-level BPE (the GPT-2 form) is deterministic under the pinned
tie-break, so the per-document encode stats are a fixed function of
the graded corpus. This tool re-derives them with an INDEPENDENT
second implementation:

- its OWN byte↔unicode table construction (a dict comprehension over
  explicit codepoint ranges, not operators/bpe.gpt2_byte_table);
- trainer: full pair-recount each sweep (the paper's fig. 1 shape) vs
  the production incremental word-table rewrite;
- encoder: merges applied sequentially IN TRAINING-RANK ORDER vs the
  production lowest-rank-adjacent-pair greedy walk (provably
  equivalent for BPE — agreement cross-checks both).

Refuse-to-write gate: also runs the PRODUCTION Spark path and refuses
unless every row matches exactly (incl. Spark's HALF_UP 4dp round).

Usage: python tools/make_byte_bpe_golden.py [sf_dir]  (default sf0.01).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKEN_RE = re.compile("[A-Za-z0-9]+")
N_MERGES = 30
MAX_WORDS = 50_000

# independent table: identity for the three printable ranges, 256+n in
# ascending byte order for everything else
_KEEP = set(range(33, 127)) | set(range(161, 173)) | set(range(174, 256))
_GAPS = [b for b in range(256) if b not in _KEEP]
B2U = {b: chr(b) for b in _KEEP} | {
    b: chr(256 + i) for i, b in enumerate(_GAPS)
}


def remap(s: str) -> str:
    return "".join(B2U[b] for b in s.encode("utf-8"))


def ref_train(word_counts: dict[str, int], n_merges: int):
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        k = tuple(remap(" " + w))
        vocab[k] = vocab.get(k, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == top)
        merges.append(pair)
        new: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + c
        vocab = new
    return merges


def ref_encode_word(word: str, merges) -> list[str]:
    syms = [*word]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        if len(syms) == 1:
            break
    return syms


def spark_round4(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           ROUND_HALF_UP))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf, "documents.parquet"),
                      columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))
    wc: Counter = Counter()
    doc_words: dict[int, list[str]] = {}
    for doc_id, text in docs:
        ws = TOKEN_RE.findall((text or "").lower())
        doc_words[doc_id] = ws
        wc.update(ws)
    kept = dict(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
                [:MAX_WORDS])
    merges = ref_train(kept, N_MERGES)

    cache: dict[str, int] = {}
    golden = []
    for doc_id, _ in docs:
        ws = doc_words[doc_id]
        n_sub = 0
        for w in ws:
            if w not in cache:
                cache[w] = len(ref_encode_word(remap(" " + w), merges))
            n_sub += cache[w]
        golden.append((int(doc_id), len(ws), n_sub,
                       spark_round4(n_sub / max(len(ws), 1))))
    golden.sort()

    import clickhouse_learning_spark.queries_pipeline  # noqa: F401
    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES

    spark = get_spark(app_name="make_byte_bpe_golden")
    rows = QUERIES["byte_bpe_subword_stats"](spark, sf).collect()
    prod = sorted(
        (int(r.doc_id), int(r.n_words), int(r.n_subwords),
         float(r.subwords_per_word))
        for r in rows
    )
    if prod != golden:
        diffs = [(g, p) for g, p in zip(golden, prod) if g != p][:10]
        print("MISMATCH — refusing to write golden. First diffs:")
        for g, p in diffs:
            print("  golden:", g, " production:", p)
        return 1

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "clickhouse_learning_spark", "golden_byte_bpe.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Golden byte-BPE per-doc stats for the sf0.01 grading '
            "corpus — generated by\ntools/make_byte_bpe_golden.py from "
            "an INDEPENDENT second implementation\n(own byte-table "
            "construction, full-recount trainer, rank-order encoder),\n"
            "cross-checked row-exact against the production Spark path "
            'before writing\n(refuse-on-mismatch)."""\n\n'
            f"# corpus: {sf}  merges={N_MERGES} max_words={MAX_WORDS}\n"
            "# rows: (doc_id, n_words, n_subwords, subwords_per_word)\n"
            "BYTE_BPE_SUBWORD_STATS = [\n"
        )
        for row in golden:
            f.write(f"    {row!r},\n")
        f.write("]\n")
    print(f"wrote {out} ({len(golden)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
