"""WordPiece tokenizer: distributed training + encoding — the BERT
tokenizer, completing the repo's subword family (BPE operators/bpe.py,
Unigram operators/unigram.py, WordPiece here: the three algorithms
every public tokenizer library ships).

Implements the published procedure (Schuster & Nakajima 2012, "Japanese
and Korean Voice Search"; the training rule and the greedy
longest-match-first encoder as specified in the BERT repo and the
HuggingFace ``tokenizers`` WordPiece trainer — all public):

1. **Word-frequency pass (distributed)** — identical cost shape to
   train_bpe: tokenize + ``groupBy(word).count()``, ONE hash shuffle,
   capped to the ``max_words`` most frequent words (logged bound, the
   standard trainer cap).
2. **Merge loop (driver, bounded)** — over the O(vocab) word table:
   unlike BPE's raw pair counts, WordPiece merges the adjacent pair
   maximizing the LIKELIHOOD score ``count(ab) / (count(a)*count(b))``
   — the pair whose merge most increases corpus likelihood under a
   unigram-over-symbols model. Scores are compared as EXACT integer
   fractions (cross-multiplication), so training is deterministic on
   any cluster layout with no float-tie hazard; ties break on the
   lexicographically smallest pair, like train_bpe's pinned rule.
   Continuation symbols carry the ``##`` prefix (word-internal pieces),
   so the learned vocab is directly BERT-shaped.
3. **Encoding (distributed, map-only)** — greedy LONGEST-MATCH-FIRST
   against the vocabulary (the WordPiece encoder is not merge-replay:
   it picks the longest vocab prefix at each position, ``##``-prefixed
   after the first piece); a word with any un-coverable position
   becomes ``[UNK]`` whole (BERT semantics). Arrow-batched pandas UDF
   with per-word memoization; zero shuffles at any corpus size.

Graded as ``wordpiece_subword_stats`` against goldens from an
independent second implementation (tools/make_wordpiece_golden.py,
refuse-on-mismatch — the golden_bpe.py methodology).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.text import TOKEN_RE

UNK = "[UNK]"
_CONT = "##"


def _word_symbols(w: str) -> tuple[str, ...]:
    return (w[0], *(_CONT + c for c in w[1:]))


def _merge_symbol(a: str, b: str) -> str:
    return a + b[len(_CONT):]  # b is always a ##-continuation piece


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 100_000,
    lowercase: bool = True,
) -> list[str]:
    """Learn a WordPiece vocabulary: initial alphabet (word-initial
    chars + ``##``-continuations present in the capped word table) plus
    ``n_merges`` likelihood-ranked merges. Returns the vocab as an
    ordered list (alphabet sorted, then merges in learned order) —
    the artifact :func:`wordpiece_encode` consumes."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    counts = (
        df.select(
            F.explode(
                F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {}
    for r in counts:
        k = _word_symbols(r["w"])
        words[k] = words.get(k, 0) + int(r["c"])

    vocab: list[str] = sorted({s for syms in words for s in syms})
    for _ in range(n_merges):
        sym_c: Counter = Counter()
        pair_c: Counter = Counter()
        for syms, cnt in words.items():
            for s in syms:
                sym_c[s] += cnt
            for a, b in zip(syms, syms[1:]):
                pair_c[(a, b)] += cnt
        if not pair_c:
            break
        # best likelihood score c_ab/(c_a*c_b), compared as exact
        # integer fractions: n1/d1 > n2/d2  <=>  n1*d2 > n2*d1
        best = None
        for (a, b), c in pair_c.items():
            num, den = c, sym_c[a] * sym_c[b]
            if (
                best is None
                or num * best[1] > best[0] * den
                or (num * best[1] == best[0] * den and (a, b) < best[2])
            ):
                best = (num, den, (a, b))
        a, b = best[2]
        merged = _merge_symbol(a, b)
        vocab.append(merged)
        out: dict[tuple[str, ...], int] = {}
        for syms, cnt in words.items():
            res = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            k = tuple(res)
            out[k] = out.get(k, 0) + cnt
        words = out
    return vocab


def encode_word(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first WordPiece encode of one word;
    ``[UNK]`` for the whole word when any position is uncoverable."""
    pieces: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        hit = None
        while j > i:
            cand = word[i:j] if i == 0 else _CONT + word[i:j]
            if cand in vocab:
                hit = cand
                break
            j -= 1
        if hit is None:
            return [UNK]
        pieces.append(hit)
        i = j
    return pieces


def wordpiece_encode(
    df: DataFrame,
    vocab: list[str] | set[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document WordPiece encoding: ``(id, n_words, n_subwords,
    n_unk, subwords)`` with subwords space-joined (scalar output for
    the driver's canonicalizer). Map-only Arrow pass, per-word
    memoization — same cost shape as bpe_encode."""
    import pandas as pd
    import re as _re

    from pyspark.sql.functions import pandas_udf

    vset = set(vocab)
    tok = _re.compile(TOKEN_RE)

    @pandas_udf(
        "struct<n_words: bigint, n_subwords: bigint, n_unk: bigint,"
        " subwords: string>"
    )
    def enc(texts):
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return (0, 0, 0, "")
            if lowercase:
                t = t.lower()
            words = tok.findall(t)
            parts: list[str] = []
            unk = 0
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, vset)
                parts.extend(got)
                unk += got == [UNK]
            return (len(words), len(parts), unk, " ".join(parts))

        rows = [one(t) for t in texts]
        return pd.DataFrame(
            rows, columns=["n_words", "n_subwords", "n_unk", "subwords"]
        )

    return df.select(
        F.col(id_col).alias("id"), enc(F.col(text_col)).alias("e")
    ).select("id", "e.n_words", "e.n_subwords", "e.n_unk", "e.subwords")
