"""Golden generator for ``bpe_subword_stats`` (round-5 oracle upgrade,
VERDICT r4 task 3).

BPE training is deterministic given the pinned tie-break (max pair
count, then lexicographically smallest pair), so the per-document
encode stats are a fixed function of the graded corpus. This tool
derives them with an INDEPENDENT second implementation of the published
algorithm (Sennrich, Haddow & Birch 2016) — a different merge-loop and
a different encoder strategy from ``operators/bpe.py``:

- trainer: rebuild pair counts from the full vocab each sweep (the
  paper's fig. 1 shape, as in tests/test_bpe.py's ``ref_train``) vs the
  production incremental word-table rewrite;
- encoder: apply merges IN TRAINING-RANK ORDER, each over the whole
  symbol list (the classic apply-merges-sequentially algorithm) vs the
  production lowest-rank-adjacent-pair-first greedy walk. The two are
  provably equivalent for BPE (a learned pair's parts always have
  strictly lower rank), so agreement is a real cross-check of both.

Refuse-to-write gate (the golden_multimodal.py methodology): the tool
also runs the PRODUCTION Spark path (train_bpe + bpe_encode) over the
same parquet and refuses to write the golden module unless every row
matches exactly — including the HALF_UP 4-decimal ratio rounding, which
is computed here with Spark's BigDecimal.valueOf semantics
(Decimal(repr(x)).quantize(HALF_UP)).

Usage: python tools/make_bpe_golden.py [sf_dir]  (default sf0.01 — the
driver's grading SF; the committed golden is only meaningful there).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKEN_RE = re.compile("[A-Za-z0-9]+")
EOW = "</w>"
N_MERGES = 25
MAX_WORDS = 50_000


def ref_train(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        k = tuple([*w, EOW])
        vocab[k] = vocab.get(k, 0) + c
    merges: list[tuple[str, str]] = []
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


def ref_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sequential-by-rank application (independent of the production
    lowest-rank-pair greedy walk)."""
    syms = [*word, EOW]
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
    """Spark round(double, 4): BigDecimal.valueOf(x).setScale(4,
    HALF_UP) — valueOf goes through Double.toString's shortest repr,
    which is Python's repr."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"])
    docs = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))

    # --- independent path -------------------------------------------
    wc: Counter = Counter()
    doc_words: dict[int, list[str]] = {}
    for doc_id, text in docs:
        ws = TOKEN_RE.findall((text or "").lower())
        doc_words[doc_id] = ws
        wc.update(ws)
    # cap to the most frequent MAX_WORDS (count desc, word asc) — the
    # production trainer's orderBy(c desc, w).limit(max_words)
    kept = dict(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_WORDS])
    merges = ref_train(kept, N_MERGES)

    enc_cache: dict[str, int] = {}
    golden = []
    for doc_id, _ in docs:
        ws = doc_words[doc_id]
        n_sub = 0
        for w in ws:
            if w not in enc_cache:
                enc_cache[w] = len(ref_encode_word(w, merges))
            n_sub += enc_cache[w]
        ratio = spark_round4(n_sub / max(len(ws), 1))
        golden.append((int(doc_id), len(ws), n_sub, ratio))
    golden.sort()

    # --- production path (cross-check gate) -------------------------
    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES
    import clickhouse_learning_spark.queries_pipeline  # noqa: F401

    spark = get_spark(app_name="make_bpe_golden")
    rows = QUERIES["bpe_subword_stats"](spark, sf).collect()
    prod = sorted(
        (int(r.doc_id), int(r.n_words), int(r.n_subwords), float(r.subwords_per_word))
        for r in rows
    )
    if prod != golden:
        diffs = [
            (g, p) for g, p in zip(golden, prod) if g != p
        ][:10]
        print("MISMATCH — refusing to write golden. First diffs:")
        for g, p in diffs:
            print("  golden:", g, " production:", p)
        return 1

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "clickhouse_learning_spark",
        "golden_bpe.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Golden per-document BPE encode stats for the sf0.01 grading\n'
            "corpus — generated by tools/make_bpe_golden.py from an INDEPENDENT\n"
            "second implementation (different merge loop + different encoder\n"
            "strategy), cross-checked row-exact against the production Spark\n"
            "path before writing (refuse-on-mismatch). Regenerate after any\n"
            "change to the tokenizer spec, merge budget, or fixture corpus.\n"
            '"""\n\n'
            f"# corpus: {sf}  n_merges={N_MERGES}  max_words={MAX_WORDS}\n"
            "# rows: (doc_id, n_words, n_subwords, subwords_per_word)\n"
            "BPE_SUBWORD_STATS = [\n"
        )
        for r in golden:
            fh.write(f"    {r!r},\n")
        fh.write("]\n")
    print(f"wrote {out}: {len(golden)} rows, {len(merges)} merges")
    return 0


if __name__ == "__main__":
    sys.exit(main())
