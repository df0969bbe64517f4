"""Golden generator for ``unigram_subword_stats``.

Hard-EM unigram training is deterministic (integer counts, pinned
tie-breaks), so the per-document encode stats are a fixed function of
the graded corpus. This tool derives them with an INDEPENDENT second
implementation of the Kudo 2018 procedure — different code shapes
from ``operators/unigram.py`` at every step:

- segmenter: TOP-DOWN memoized recursion over prefix lengths (argmin
  start among score maxima) vs the production bottom-up DP with
  backpointers;
- seeding: per-length substring bands accumulated into one dict vs
  the production single nested loop;
- EM driver: rebuilds the full count dict each iteration via the
  recursive segmenter.

Refuse-to-write gate (golden_multimodal.py methodology): the tool
also runs the PRODUCTION Spark path over the same parquet and
refuses to write the golden module unless every row matches exactly,
including Spark's HALF_UP 4-decimal rounding.

Usage: python tools/make_unigram_golden.py [sf_dir]  (default sf0.01).
"""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKEN_RE = re.compile("[A-Za-z0-9]+")
VOCAB_SIZE = 300
MAX_PIECE_LEN = 6
SEED_MULTIPLIER = 4
EM_ITERS = 2
PRUNE_KEEP = 0.75
MAX_WORDS = 50_000
UNK_LOGP = -100.0


def ref_segment(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Top-down memoized best segmentation of word[:end]; at equal
    score the smallest start (longest last piece) wins — the pinned
    tie rule, reached by a different route than the production DP."""
    memo: dict[int, float] = {0: 0.0}
    choice: dict[int, int] = {}

    def best(end: int) -> float:
        if end in memo:
            return memo[end]
        top, arg = float("-inf"), -1
        for start in range(max(0, end - max_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start == 1:
                    lp = UNK_LOGP
                else:
                    continue
            sub = best(start)
            if sub == float("-inf"):
                continue
            score = sub + lp
            if score > top:
                top, arg = score, start
        memo[end], choice[end] = top, arg
        return top

    best(len(word))
    out, pos = [], len(word)
    while pos > 0:
        start = choice[pos]
        out.append(word[start:pos])
        pos = start
    out.reverse()
    return out


def ref_train(words: list[tuple[str, int]]) -> dict[str, float]:
    # seeding by length bands
    chars: Counter = Counter()
    for w, c in words:
        for ch in w:
            chars[ch] += c
    subs: Counter = Counter()
    for length in range(2, MAX_PIECE_LEN + 1):
        for w, c in words:
            for i in range(len(w) - length + 1):
                subs[w[i:i + length]] += c
    n_multi = max(VOCAB_SIZE * SEED_MULTIPLIER - len(chars), 0)
    multi = sorted(subs.items(),
                   key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))[:n_multi]
    counts = dict(chars)
    counts.update(dict(multi))

    def to_logp(cnt: dict[str, int]) -> dict[str, float]:
        t = sum(cnt.values())
        lt = math.log(t)
        return {p: math.log(c) - lt for p, c in cnt.items()}

    logp = to_logp(counts)
    target_multi = max(VOCAB_SIZE - len(chars), 0)

    def em_counts() -> Counter:
        em: Counter = Counter()
        for w, c in words:
            for piece in ref_segment(w, logp, MAX_PIECE_LEN):
                if piece in logp:
                    em[piece] += c
        return em

    def m_step(em: Counter) -> dict[str, float]:
        cnt = {}
        for p in logp:
            c = em.get(p, 0)
            if len(p) == 1:
                cnt[p] = max(c, 1)
            elif c > 0:
                cnt[p] = c
        return to_logp(cnt)

    while True:
        for _ in range(EM_ITERS):
            logp = m_step(em_counts())
        cur = sum(1 for p in logp if len(p) > 1)
        if cur <= target_multi:
            break
        keep = max(target_multi, min(cur - 1, int(cur * PRUNE_KEEP)))
        em = em_counts()
        ranked = sorted(((p, em.get(p, 0)) for p in logp if len(p) > 1),
                        key=lambda kv: (-kv[1], kv[0]))[:keep]
        cnt = {p: max(em.get(p, 0), 1) for p in logp if len(p) == 1}
        cnt.update({p: c for p, c in ranked if c > 0})
        logp = to_logp(cnt)
    return logp


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
    kept = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_WORDS]
    logp = ref_train(kept)

    seg_cache: dict[str, tuple[int, int]] = {}
    golden = []
    for doc_id, _ in docs:
        n_p = n_u = 0
        for w in doc_words[doc_id]:
            if w not in seg_cache:
                pieces = ref_segment(w, logp, MAX_PIECE_LEN)
                seg_cache[w] = (
                    len(pieces),
                    sum(1 for p in pieces if p not in logp),
                )
            a, b = seg_cache[w]
            n_p += a
            n_u += b
        nw = len(doc_words[doc_id])
        golden.append((int(doc_id), nw, n_p, n_u,
                       spark_round4(n_p / max(nw, 1))))
    golden.sort()

    # --- production cross-check gate --------------------------------
    from clickhouse_learning_spark import get_spark
    from clickhouse_learning_spark.queries import QUERIES
    import clickhouse_learning_spark.queries_pipeline  # noqa: F401

    spark = get_spark(app_name="make_unigram_golden")
    rows = QUERIES["unigram_subword_stats"](spark, sf).collect()
    prod = sorted(
        (int(r.doc_id), int(r.n_words), int(r.n_pieces), int(r.n_unk),
         float(r.pieces_per_word))
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
        "clickhouse_learning_spark", "golden_unigram.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Golden per-document unigram-LM encode stats for the '
            "sf0.01 grading\ncorpus — generated by "
            "tools/make_unigram_golden.py from an INDEPENDENT\nsecond "
            "implementation (top-down memoized segmenter + "
            "rebuild-style EM),\ncross-checked row-exact against the "
            "production Spark path before\nwriting (refuse-on-"
            "mismatch). Regenerate after any change to the\ntokenizer "
            'spec or fixture corpus.\n"""\n\n'
            f"# corpus: {sf}  vocab_size={VOCAB_SIZE}  "
            f"max_piece_len={MAX_PIECE_LEN}  max_words={MAX_WORDS}\n"
            "# rows: (doc_id, n_words, n_pieces, n_unk, "
            "pieces_per_word)\nUNIGRAM_SUBWORD_STATS = [\n"
        )
        for row in golden:
            f.write(f"    {row!r},\n")
        f.write("]\n")
    print(f"wrote {out} ({len(golden)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
