"""BPE trainer/encoder (operators/bpe.py) vs an INDEPENDENT in-test
reference implementation of the published algorithm, including the
original paper's worked example."""

from __future__ import annotations

from collections import Counter

from clickhouse_learning_spark.operators import bpe as B


def ref_train(word_counts: dict[str, int], n_merges: int):
    """Independent reference BPE trainer (Sennrich et al. 2016 fig. 1
    shape, same deterministic tie-break rule)."""
    vocab = {tuple([*w, "</w>"]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == top)
        merges.append(pair)
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def test_train_matches_reference_on_paper_example(spark):
    """The classic low/lower/newest/widest corpus: distributed training
    must learn exactly the merges the reference implementation derives."""
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    df = spark.createDataFrame(rows, "text string")
    got = B.train_bpe(df, n_merges=8, max_words=100)
    exp = ref_train({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 8)
    assert got == exp
    # the paper's headline behavior: 'est</w>' forms within 3 merges
    joined = ["".join(p) for p in got[:3]]
    assert any("est" in j for j in joined)


def test_train_and_encode_roundtrip(spark):
    """Encoding with the learned merges: subword concatenation restores
    the word, counts are consistent, and frequent words compress to
    fewer subwords than rare ones."""
    rows = [("the cat sat on the mat the cat",)] * 20 + [("zyxw qqqq",)]
    df = spark.createDataFrame(rows, "text string").selectExpr(
        "monotonically_increasing_id() AS doc_id", "text"
    )
    merges = B.train_bpe(df, n_merges=30, max_words=100)
    enc = B.bpe_encode(df, merges, id_col="doc_id").collect()
    assert len(enc) == 21
    for r in enc:
        subs = r.subwords.split(" ") if r.subwords else []
        assert len(subs) == r.n_subwords
        # strip the end-of-word markers: concatenation restores the text
        rebuilt = "".join(subs).replace("</w>", " ").strip()
        assert rebuilt.startswith("the cat") or rebuilt == "zyxw qqqq"
    # 'the' must have merged to a single unit
    the = B.encode_word("the", {p: i for i, p in enumerate(merges)})
    assert the == ["the</w>"]


def test_encode_word_rank_order():
    """Lower-rank merges apply first (canonical encode order)."""
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
    assert B.encode_word("abc", ranks)[:1] == ["abc"]
    # without the (ab,c) merge, b+c can't pair once ab merged
    ranks2 = {("a", "b"): 0, ("b", "c"): 1}
    assert B.encode_word("abc", ranks2)[0] == "ab"


def test_gpt2_byte_table_and_remap_laws():
    """The byte table is the exact public GPT-2 construction: a
    256-entry bijection, identity on printable ASCII and the two
    Latin-1 ranges, gap bytes mapped to 256+n in ascending order;
    remap/unmap invert each other on arbitrary bytes."""
    t = B.gpt2_byte_table()
    assert len(t) == 256 and len(set(t.values())) == 256
    for b in list(range(33, 127)) + list(range(161, 173)) + \
            list(range(174, 256)):
        assert t[b] == chr(b), b  # identity on the kept ranges
    assert t[32] == "Ġ"  # space -> Ġ
    assert t[10] == "Ċ"  # newline -> Ċ
    for s in ("hello world", "héllo wörld", "日本語 text", "a\nb\tc",
              "".join(chr(i) for i in range(1, 128))):
        assert B.byte_unmap(B.byte_remap(s)) == s, s


def test_byte_bpe_roundtrip_and_space_convention(spark):
    """Encoding is LOSSLESS: concatenating a word's subword tokens and
    unmapping yields ' ' + word; the first token of every word starts
    with Ġ (the leading-space convention); the merge loop is
    deterministic under the pinned tie-break."""
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the mat the cat"),
         (2, "catalog matting")],
        "doc_id long, text string",
    )
    merges = B.train_byte_bpe(docs, n_merges=10)
    assert merges == B.train_byte_bpe(docs, n_merges=10)  # deterministic
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("the", "cat", "mat", "catalog", "unseen", "zebra"):
        toks = B.encode_byte_word(B.byte_remap(" " + w), ranks)
        assert B.byte_unmap("".join(toks)) == " " + w, w
        assert toks[0].startswith("Ġ"), (w, toks)
    out = {r["doc_id"]: r for r in
           B.byte_bpe_encode(docs, merges).collect()}
    assert out[0]["n_words"] == 6
    # frequent words compress below one-token-per-char
    assert out[1]["n_subwords"] < len("the mat the cat".replace(" ", "")) + 4
