"""Unigram-LM subword tokenizer (SentencePiece-style): distributed
word-count + bounded driver EM, map-only encoding.

Implements the unigram language-model tokenizer of Kudo 2018
("Subword Regularization", the algorithm behind SentencePiece's
default trainer and the T5/LLaMA vocabularies) in the hard-EM
(Viterbi) form, which keeps every quantity integral and therefore
bit-deterministic:

1. **Word-frequency pass (distributed)** — identical cost shape to
   operators/bpe.py: tokenize + ``groupBy(word).count()``, one
   map-side-combinable shuffle, capped to the ``max_words`` most
   frequent words (SentencePiece's own trainer EMs over the unique
   word table in memory — the corpus never enters the loop).
2. **Seeding (driver, bounded)** — every substring of table words up
   to ``max_piece_len``, scored count×length (the SentencePiece seed
   heuristic); keep all single characters plus the top multi-char
   candidates, ties lexicographic.
3. **EM + pruning rounds (driver, bounded)** — E-step: Viterbi-best
   segmentation of each table word under current piece log-probs
   (ties prefer the LONGER last piece, then fewer pieces — pinned so
   independent implementations agree exactly); M-step: piece count =
   Σ word_count over segmentations (integers); prune multi-char
   pieces by (count desc, piece asc) toward ``vocab_size``, never
   dropping single characters (coverage guarantee).
4. **Encoding (distributed, map-only)** — Arrow-batched pandas UDF
   with per-word memoization; characters outside the vocabulary
   become ``<unk>`` pieces with a pinned penalty. Zero shuffles.

Determinism: counts are integers, log-probs are ``log(c) - log(T)``
computed identically everywhere, DP compares left-to-right — the same
model falls out of any cluster layout, and an independent
reimplementation (tools/make_unigram_golden.py) reproduces it exactly
or the golden generator refuses to write.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.text import TOKEN_RE

UNK = "<unk>"
UNK_LOGP = -100.0  # pinned OOV-character penalty


@dataclass
class UnigramModel:
    logp: dict[str, float]  # piece -> log probability
    max_piece_len: int


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation under the unigram model. DP left-to-right;
    at equal score the LONGER last piece wins (checked by iterating
    start positions ascending and using strict improvement), which
    also minimizes piece count among ties. OOV characters segment as
    single-char ``<unk>`` pieces at ``UNK_LOGP``."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for end in range(1, n + 1):
        lo = max(0, end - max_piece_len)
        for start in range(lo, end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start == 1:
                    lp = UNK_LOGP
                else:
                    continue
            if best[start] == NEG:
                continue
            score = best[start] + lp
            # strict > with ascending start => the earliest start
            # (longest last piece) is retained on ties
            if score > best[end]:
                best[end] = score
                back[end] = start
    out = []
    pos = n
    while pos > 0:
        start = back[pos]
        out.append(word[start:pos])
        pos = start
    out.reverse()
    return out


def _em_counts(
    words: list[tuple[str, int]], logp: dict[str, float], max_len: int
) -> Counter:
    counts: Counter = Counter()
    for w, c in words:
        for piece in viterbi_segment(w, logp, max_len):
            if piece in logp:
                counts[piece] += c
    return counts


def _to_logp(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items()}


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    max_piece_len: int = 6,
    seed_multiplier: int = 4,
    em_iters: int = 2,
    prune_keep: float = 0.75,
    max_words: int = 100_000,
    lowercase: bool = True,
) -> UnigramModel:
    """Train the unigram vocabulary. The collect is the capped word
    table (TakeOrderedAndProject — per-partition top-k); the corpus
    contributes exactly one distributed tokenize+count shuffle."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    rows = (
        df.select(F.explode(
            F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))
        ).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    words = [(r["w"], int(r["c"])) for r in rows]

    # -- seed: substrings scored count*len, chars always in ----------
    seed: Counter = Counter()
    chars: Counter = Counter()
    for w, c in words:
        n = len(w)
        for i in range(n):
            chars[w[i]] += c
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                if j - i > 1:
                    seed[w[i:j]] += c
    n_multi = max(vocab_size * seed_multiplier - len(chars), 0)
    multi = sorted(
        seed.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0])
    )[:n_multi]
    counts: dict[str, int] = dict(chars)
    counts.update({p: c for p, c in multi})
    logp = _to_logp(counts)

    # -- EM + prune rounds -------------------------------------------
    def n_multi_now() -> int:
        return sum(1 for p in logp if len(p) > 1)

    target_multi = max(vocab_size - len(chars), 0)
    def m_step(em: Counter) -> dict[str, float]:
        # single chars keep a floor count so coverage never drops;
        # multi-char pieces the Viterbi paths abandoned fall out
        counts = {}
        for p in logp:
            c = em.get(p, 0)
            if len(p) == 1:
                counts[p] = max(c, 1)
            elif c > 0:
                counts[p] = c
        return _to_logp(counts)

    while True:
        for _ in range(em_iters):
            logp = m_step(_em_counts(words, logp, max_piece_len))
        cur = n_multi_now()
        if cur <= target_multi:
            break
        keep = max(target_multi, min(cur - 1, int(cur * prune_keep)))
        em = _em_counts(words, logp, max_piece_len)
        ranked = sorted(
            ((p, em.get(p, 0)) for p in logp if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:keep]
        counts = {p: max(em.get(p, 0), 1) for p in logp if len(p) == 1}
        counts.update({p: c for p, c in ranked if c > 0})
        logp = _to_logp(counts)
    return UnigramModel(logp=logp, max_piece_len=max_piece_len)


def unigram_encode(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document encode: ``(id, n_words, n_pieces, n_unk)``.
    Map-only Arrow-batched pandas UDF with per-word memoization —
    zero shuffles, the same cost shape as bpe_encode."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    logp = dict(model.logp)
    max_len = model.max_piece_len
    tok = _re.compile(TOKEN_RE)
    lower = lowercase

    def enc(texts):
        memo: dict[str, tuple[int, int]] = {}

        def one(t):
            if t is None:
                return (0, 0, 0)
            if lower:
                t = t.lower()
            n_words = n_pieces = n_unk = 0
            for w in tok.findall(t):
                n_words += 1
                got = memo.get(w)
                if got is None:
                    pieces = viterbi_segment(w, logp, max_len)
                    got = (
                        len(pieces),
                        sum(1 for p in pieces if p not in logp),
                    )
                    memo[w] = got
                n_pieces += got[0]
                n_unk += got[1]
            return (n_words, n_pieces, n_unk)

        vals = [one(t) for t in texts]
        return pd.DataFrame(
            vals, columns=["n_words", "n_pieces", "n_unk"]
        )

    schema = "n_words long, n_pieces long, n_unk long"
    f = pandas_udf(enc, schema)
    out = df.select(F.col(id_col).alias("id"), F.col(text_col))
    return out.select("id", f(F.col(text_col)).alias("st")).select(
        "id", "st.n_words", "st.n_pieces", "st.n_unk"
    )
