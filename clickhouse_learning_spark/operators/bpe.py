"""Byte-pair-encoding tokenizer: distributed training + encoding.

Implements the classic BPE procedure (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm, also the shape of every modern tokenizer trainer):

1. **Word-frequency pass (distributed)** — the only corpus-sized work:
   tokenize + ``groupBy(word).count()``, one hash shuffle, optionally
   capped to the ``max_words`` most frequent words (the standard
   trainer bound: the tail adds negligible pair mass; the cap is
   logged, never silent).
2. **Merge loop (driver, bounded)** — runs on the aggregated word table
   (≤ ``max_words`` rows, like a broadcast dictionary — O(vocab) not
   O(corpus)): repeatedly count adjacent-symbol pairs weighted by word
   frequency, merge the most frequent pair (ties break lexicographically
   so training is deterministic across cluster layouts), ``n_merges``
   times. This is how real tokenizer trainers work (HuggingFace
   ``tokenizers``, sentencepiece): the corpus never participates in the
   loop.
3. **Encoding (distributed, map-only)** — ``bpe_encode`` applies the
   learned merge ranks to documents in an Arrow-batched pandas UDF with
   per-word memoization; at 100 TB this is a zero-shuffle map pass, the
   same cost shape as any regexp column.

Words carry the ``</w>`` end-of-word marker from the original paper, so
merges can capture word-final units (``est</w>``).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_learning_spark.operators.text import TOKEN_RE

_EOW = "</w>"


def _pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, cnt in words.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += cnt
    return pc


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 100_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position), the artifact ``bpe_encode``
    consumes.

    The collect here is the word-FREQUENCY table capped at
    ``max_words`` (TakeOrderedAndProject — per-partition top-k, no
    global sort), not the corpus; the corpus contributes exactly one
    distributed tokenize+count shuffle."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    counts = (
        df.select(F.explode(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {}
    for r in counts:
        words[(*r["w"], _EOW)] = words.get((*r["w"], _EOW), 0) + int(r["c"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = _pair_counts(words)
        if not pc:
            break
        # deterministic: max count, then lexicographically smallest pair
        top = max(pc.values())
        pair = min(p for p, c in pc.items() if c == top)
        merges.append(pair)
        words = {_merge_word(s, pair): c for s, c in words.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (lowest-rank adjacent pair
    first — the canonical BPE encode order)."""
    syms = [*word, _EOW]
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document BPE encoding: ``(id, n_words, n_subwords,
    subwords)`` with subwords space-joined (scalar output — the
    driver's canonicalizer can't hash list columns). Map-only
    Arrow-batched pandas UDF with per-word memoization (real corpora
    repeat words heavily, so the merge walk runs once per distinct word
    per batch)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}
    import re as _re

    tok = _re.compile(TOKEN_RE)

    # no type hints: the struct-returning scalar form (Series →
    # DataFrame) predates the hint-inference signatures
    @pandas_udf("struct<n_words: bigint, n_subwords: bigint, subwords: string>")
    def enc(texts):
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return (0, 0, "")
            if lowercase:
                t = t.lower()
            words = tok.findall(t)
            parts: list[str] = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                parts.extend(got)
            return (len(words), len(parts), " ".join(parts))

        rows = [one(t) for t in texts]
        return pd.DataFrame(rows, columns=["n_words", "n_subwords", "subwords"])

    return df.select(
        F.col(id_col).alias("id"), enc(F.col(text_col)).alias("e")
    ).select("id", "e.n_words", "e.n_subwords", "e.subwords")


# ------------------------------------------------------------- byte level
def gpt2_byte_table() -> dict[int, str]:
    """The GPT-2 byte↔unicode table (Radford et al. 2019; the exact
    public construction from the released encoder): printable ASCII and
    two Latin-1 ranges map to themselves, every other byte maps to
    256+n in first-gap order — a BIJECTION, so byte-level BPE can
    treat arbitrary bytes as ordinary characters and any merge output
    decodes back to the original bytes."""
    bs = (list(range(33, 127)) + list(range(161, 173))
          + list(range(174, 256)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_B2U = gpt2_byte_table()
_U2B = {u: b for b, u in _B2U.items()}


def byte_remap(s: str) -> str:
    """UTF-8 bytes of ``s`` through the GPT-2 table (Ġ is the space)."""
    return "".join(_B2U[b] for b in s.encode("utf-8"))


def byte_unmap(s: str) -> str:
    """Exact inverse of :func:`byte_remap`."""
    return bytes(_U2B[c] for c in s).decode("utf-8")


def train_byte_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Byte-level BPE (the GPT-2 production form): same trainer shape
    as :func:`train_bpe` — one distributed word-count shuffle, bounded
    driver merge loop — but words are the byte-remapped form of
    ``" " + word`` (the GPT-2 convention: tokens own their leading
    space as Ġ) and there is NO ``</w>`` marker (byte BPE needs none:
    the next word's Ġ is the boundary). Pre-tokenization stays the
    repo's TOKEN_RE (documented divergence from GPT-2's contraction
    regex, which needs \\p classes the stdlib lacks); deterministic
    tie-break identical to train_bpe."""
    text = F.lower(F.col(text_col))
    counts = (
        df.select(F.explode(
            F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0))
        ).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {}
    for r in counts:
        key = tuple(byte_remap(" " + r["w"]))
        words[key] = words.get(key, 0) + int(r["c"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = _pair_counts(words)
        if not pc:
            break
        top = max(pc.values())
        pair = min(p for p, c in pc.items() if c == top)
        merges.append(pair)
        words = {_merge_word(s, pair): c for s, c in words.items()}
    return merges


def encode_byte_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply byte-level merges to one pre-remapped word (no EOW)."""
    syms = [*word]
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


def byte_bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document byte-BPE encoding — same output contract as
    :func:`bpe_encode` (``n_words``, ``n_subwords``, space-joined
    ``subwords`` in the REMAPPED alphabet, which contains no real
    spaces so the join is unambiguous); map-only Arrow UDF with
    per-word memoization."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}
    tok = _re.compile(TOKEN_RE)

    @pandas_udf("struct<n_words: bigint, n_subwords: bigint, subwords: string>")
    def enc(texts):
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return (0, 0, "")
            words = tok.findall(t.lower())
            parts: list[str] = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_byte_word(
                        byte_remap(" " + w), ranks)
                parts.extend(got)
            return (len(words), len(parts), " ".join(parts))

        rows = [one(t) for t in texts]
        return pd.DataFrame(rows, columns=["n_words", "n_subwords",
                                           "subwords"])

    return df.select(
        F.col(id_col),
        enc(F.col(text_col)).alias("_e"),
    ).select(
        id_col,
        F.col("_e.n_words").alias("n_words"),
        F.col("_e.n_subwords").alias("n_subwords"),
        F.col("_e.subwords").alias("subwords"),
    )
