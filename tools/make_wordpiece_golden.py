"""Golden generator for ``wordpiece_subword_stats`` (round-6).

WordPiece training is deterministic given the pinned rules (likelihood
scores compared as exact integer fractions, ties to the
lexicographically smallest pair), so the per-document encode stats are
a fixed function of the graded corpus. This tool derives them with an
INDEPENDENT second implementation of the published algorithm (Schuster
& Nakajima 2012 / the BERT greedy longest-match encoder):

- trainer: per-sweep from-scratch recount over a FLAT expanded symbol
  stream (list-concat + Counter) with Fraction score comparison, vs
  the production per-word-table walk with cross-multiplied integer
  comparison;
- encoder: longest-match via a LENGTH-BUCKETED vocabulary index
  (descending piece lengths, startswith probes) vs the production
  shrink-the-slice scan.

Refuse-to-write gate (the golden_bpe.py methodology): the tool also
runs the PRODUCTION Spark path (train_wordpiece + wordpiece_encode)
over the same parquet and refuses to write the golden module unless
every row matches exactly, including the HALF_UP 4-decimal rounding.

Usage: python tools/make_wordpiece_golden.py [sf_dir]  (default sf0.01
— the driver's grading SF).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKEN_RE = re.compile("[A-Za-z0-9]+")
N_MERGES = 25
MAX_WORDS = 50_000
UNK = "[UNK]"


def _syms(w: str) -> tuple[str, ...]:
    return (w[0], *("##" + c for c in w[1:]))


def ref_train(word_counts: dict[str, int], n_merges: int) -> list[str]:
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        k = _syms(w)
        words[k] = words.get(k, 0) + c
    vocab: list[str] = sorted({s for syms in words for s in syms})
    for _ in range(n_merges):
        # flat expanded stream: a structurally different counting pass
        flat_syms: Counter = Counter()
        flat_pairs: Counter = Counter()
        for syms, c in words.items():
            for s in syms:
                flat_syms[s] += c
            for p in zip(syms, syms[1:]):
                flat_pairs[p] += c
        if not flat_pairs:
            break
        scored = [
            (Fraction(c, flat_syms[a] * flat_syms[b]), (a, b))
            for (a, b), c in flat_pairs.items()
        ]
        best_score = max(s for s, _ in scored)
        a, b = min(p for s, p in scored if s == best_score)
        merged = a + b[2:]
        vocab.append(merged)
        out: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            k = tuple(res)
            out[k] = out.get(k, 0) + c
        words = out
    return vocab


def ref_encode(word: str, by_len: dict[int, set[str]]) -> list[str]:
    """Longest-match-first via descending length buckets."""
    lens = sorted(by_len, reverse=True)
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        hit = None
        for ln in lens:
            if hit:
                break
            for piece in ((word[i:i + ln]) if i == 0 else ("##" + word[i:i + ln - 2]),):
                if len(piece) == ln and piece in by_len[ln]:
                    hit = piece
                    break
        if hit is None:
            return [UNK]
        out.append(hit)
        i += len(hit) - (0 if i == 0 else 2)
    return out


def spark_round4(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = list(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )

    # --- independent path -------------------------------------------
    wc: Counter = Counter()
    doc_words: dict[int, list[str]] = {}
    for doc_id, text in docs:
        ws = TOKEN_RE.findall((text or "").lower())
        doc_words[doc_id] = ws
        wc.update(ws)
    kept = dict(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_WORDS])
    vocab = ref_train(kept, N_MERGES)
    by_len: dict[int, set[str]] = {}
    for p in vocab:
        by_len.setdefault(len(p), set()).add(p)

    cache: dict[str, list[str]] = {}
    golden = []
    for doc_id, _ in docs:
        ws = doc_words[doc_id]
        n_sub = n_unk = 0
        for w in ws:
            got = cache.get(w)
            if got is None:
                got = cache[w] = ref_encode(w, by_len)
            n_sub += len(got)
            n_unk += got == [UNK]
        ratio = spark_round4(n_sub / max(len(ws), 1))
        golden.append((int(doc_id), len(ws), n_sub, n_unk, ratio))
    golden.sort()

    # --- production path (cross-check gate) -------------------------
    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES
    import clickhouse_learning_spark.queries_pipeline  # noqa: F401

    spark = get_spark(app_name="make_wordpiece_golden")
    rows = QUERIES["wordpiece_subword_stats"](spark, sf).collect()
    prod = sorted(
        (
            int(r.doc_id), int(r.n_words), int(r.n_subwords),
            int(r.n_unk), float(r.subwords_per_word),
        )
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
        "clickhouse_learning_spark",
        "golden_wordpiece.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Golden per-document WordPiece encode stats for the sf0.01\n'
            "grading corpus — generated by tools/make_wordpiece_golden.py\n"
            "from an INDEPENDENT second implementation (from-scratch sweep\n"
            "recounts + Fraction scores + length-bucketed encoder),\n"
            "cross-checked row-exact against the production Spark path\n"
            "before writing (refuse-on-mismatch). Regenerate after any\n"
            "change to the tokenizer spec, merge budget, or fixture.\n"
            '"""\n\n'
            f"# corpus: {sf}  n_merges={N_MERGES}  max_words={MAX_WORDS}\n"
            "# rows: (doc_id, n_words, n_subwords, n_unk, subwords_per_word)\n"
            "WORDPIECE_SUBWORD_STATS = [\n"
        )
        for r in golden:
            fh.write(f"    {r!r},\n")
        fh.write("]\n")
    print(f"wrote {out}: {len(golden)} rows, vocab={len(vocab)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
