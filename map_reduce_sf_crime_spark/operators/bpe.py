"""Learned byte-pair-encoding tokenization (Sennrich et al. 2016,
public) — the real subword tokenizer the pipeline's token counts
stand in for (textops' ``n_bpe_tokens`` is a REGEX approximation;
this trains actual merges and encodes the corpus with them), and the
front end of the tokenize → chunk → pack → shard export chain a
training run consumes.

Split of labor at 100 TB (the same pattern as PQ codebook training):

- **Statistics are distributed.** The trainer's only corpus-wide
  input is the WORD-FREQUENCY table — a map-side-combined wordcount
  whose output is vocabulary-sized, not corpus-sized. The driver
  collects the top ``vocab_cap`` words by frequency (TakeOrdered —
  never a global sort) under a loud cap; training merges on a
  truncated frequency table is standard practice (subword-nmt/
  HuggingFace trainers operate on word-count tables, and the
  frequency tail it drops cannot win a merge argmax anyway, see
  ``train_bpe``).
- **The merge loop is driver-side on that tiny table** — pure
  integer counting over ≤ ``vocab_cap`` symbol sequences, exactly
  the bounded-sample discipline of IVF/PQ codebook training.
- **Encoding is one Arrow-batched pass.** Applying ranked merges is
  per-word greedy rank-lookup — inherently imperative (every real
  tokenizer is native code), so it runs as a ``pandas_udf`` with the
  broadcast merge table: Python confined to one batched map, no
  shuffle, composing with chunk/pack/export unchanged.

No reference counterpart (SURVEY §2.11 TOK1).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col

#: end-of-word marker (the paper's </w>, here a NEWLINE): it
#: distinguishes "est" inside a word from "est"+EOW ending one and
#: makes detokenization a pure concat+replace. A whitespace character
#: is PROVABLY collision-free — the tokenizer splits on whitespace,
#: so no token can ever contain it — where the paper's literal
#: "</w>" string can be reassembled by merges learned from
#: HTML-bearing corpora ('a</w>b' in text would detokenize to 'a b'
#: and conflate a vocab id with the marker's).
EOW = "\n"

#: loud ceiling for the driver-side word-frequency collect — far
#: beyond any real tokenizer's training table (GPT-2's BPE trained on
#: a similar-order type count), far below driver OOM.
MAX_VOCAB_COLLECT = 1_000_000


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word-frequency table ``(word, freq)`` — the ONLY
    corpus-scale input BPE training needs (map-side combined; hot
    words collapse in the combiner)."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    vocab_cap: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word-frequency
    table. Deterministic: argmax ties break on the pair itself
    (lexicographic), and the input table is truncated to the top
    ``vocab_cap`` words by ``(freq desc, word asc)`` — a TakeOrdered,
    never a global sort. Truncation is sound in the regime it's used
    in (a rank-``vocab_cap`` word's frequency bounds the error of any
    dropped pair count; with a Zipfian tail the dropped mass is
    negligible — the standard trainer trade-off, documented rather
    than hidden). Raises loudly past ``MAX_VOCAB_COLLECT``."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if vocab_cap > MAX_VOCAB_COLLECT:
        raise ValueError(
            f"vocab_cap {vocab_cap} exceeds MAX_VOCAB_COLLECT "
            f"{MAX_VOCAB_COLLECT}: refusing a driver-side collect that "
            "large; train on a capped table — the frequency tail cannot "
            "win a merge argmax"
        )
    words = _collect_word_table(docs, vocab_cap, text_col)
    return _merges_from_words(words, n_merges)


def _collect_word_table(
    docs: DataFrame, vocab_cap: int, text_col: str
) -> list[tuple[str, int]]:
    rows = (
        word_frequencies(docs, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(vocab_cap)
        .collect()
    )
    return [(r["word"], int(r["freq"])) for r in rows]


def _pair_counts(sym: list[str]) -> dict[tuple[str, str], int]:
    """Position-based adjacent-pair multiset of one symbol sequence
    (overlaps count per position — 'aaa' has (a,a) twice)."""
    c: dict[tuple[str, str], int] = {}
    for i in range(len(sym) - 1):
        p = (sym[i], sym[i + 1])
        c[p] = c.get(p, 0) + 1
    return c


def _merges_from_words(
    words: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Incremental pair-count maintenance (the standard subword-nmt /
    HF trainer shape): pair counts and a pair → containing-words index
    are built ONCE, then each merge touches only the words that
    contain the merged pair — per-merge cost is proportional to the
    merged pair's occurrences, not the vocabulary. (The naive form
    recounted every pair of every word type per merge: ~1e10 driver
    operations at the 1M-type cap with a 32k-merge vocabulary.)
    Semantics are bit-identical to the full recount — counts are
    maintained as exact deltas of the same position-based multiset —
    so the pinned merge sequences in tests/test_bpe.py are the
    regression guard."""
    # symbol sequences per word type, weighted by frequency
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [EOW], f) for w, f in words
    ]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for k, (sym, freq) in enumerate(seqs):
        for p, n in _pair_counts(sym).items():
            counts[p] = counts.get(p, 0) + n * freq
            where.setdefault(p, set()).add(k)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        # deterministic tie-break: highest count, then LEXICOGRAPHICALLY
        # SMALLEST pair
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        if top < 2:
            break  # nothing repeats: further merges are noise
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        for k in sorted(where.get(best_pair, ())):
            sym, freq = seqs[k]
            i, out = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            old, new = _pair_counts(sym), _pair_counts(out)
            for p in old.keys() | new.keys():
                o, n = old.get(p, 0), new.get(p, 0)
                if n != o:
                    c = counts.get(p, 0) + (n - o) * freq
                    if c:
                        counts[p] = c
                    else:
                        counts.pop(p, None)
                if n == 0 and o > 0:
                    s = where.get(p)
                    if s is not None:
                        s.discard(k)
                        if not s:
                            where.pop(p, None)
                elif n > 0 and o == 0:
                    where.setdefault(p, set()).add(k)
            seqs[k] = (out, freq)
        # a merged pair can never re-form: merges only create pairs
        # involving the new product symbol, never re-adjoin two old ones
        where.pop(best_pair, None)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE application: repeatedly merge the lowest-rank
    adjacent pair (the standard apply loop — identical semantics to
    replaying the merges in training order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: the document's learned-BPE token sequence
    (array<string>; join on '' and strip EOW markers to detokenize).
    One Arrow-batched ``pandas_udf`` over the broadcast merge ranks —
    no shuffle, NULL text → NULL tokens. Word splitting is
    ``functions.text.py_tokens`` — the Python mirror of the corpus
    tokenizer's exact fold AND whitespace class (Python's bare
    ``str.split()`` also splits on Unicode whitespace like NBSP,
    which the training-side ``tokens_col`` does not — the words would
    silently diverge from the frequency table the merges were
    learned on)."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.text import py_tokens

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            out: list[str] = []
            for w in py_tokens(text):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return docs.withColumn(out_col, encode(F.col(text_col)))


def detokenize_col(bpe_tokens: Column) -> Column:
    """Inverse of :func:`bpe_encode` as a column expression: concat
    the subwords and turn each end-of-word marker back into a single
    space (exactly the whitespace-tokenizer's view of the text)."""
    return F.rtrim(
        F.replace(
            F.array_join(bpe_tokens, ""), F.lit(EOW), F.lit(" ")
        )
    )


#: reserved id 0: unknown symbol (characters never seen in training)
UNK = "<unk>"


@dataclass(frozen=True)
class BpeModel:
    """A trained tokenizer as data: the ranked merges plus a STABLE
    id table — ``vocab[0] == UNK``, then the training alphabet
    (sorted) + EOW, then each merge's product in merge order (first
    occurrence wins if two merge paths produce the same string).
    Serialize the two tuples to persist the model; ids are a pure
    function of them."""

    merges: tuple[tuple[str, str], ...]
    vocab: tuple[str, ...]

    def ids(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for i, s in enumerate(self.vocab):
            out.setdefault(s, i)
        return out


def train_bpe_model(
    docs: DataFrame,
    n_merges: int = 200,
    vocab_cap: int = 50_000,
    text_col: str = "text",
) -> BpeModel:
    """Train merges AND derive the trainer-ready id table in one
    word-frequency collect (same bounds and determinism as
    :func:`train_bpe`)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if vocab_cap > MAX_VOCAB_COLLECT:
        raise ValueError(
            f"vocab_cap {vocab_cap} exceeds MAX_VOCAB_COLLECT "
            f"{MAX_VOCAB_COLLECT}"
        )
    words = _collect_word_table(docs, vocab_cap, text_col)
    merges = _merges_from_words(words, n_merges)
    alphabet = sorted({ch for w, _ in words for ch in w})
    vocab = (
        (UNK,)
        + tuple(alphabet)
        + (EOW,)
        + tuple(a + b for a, b in merges)
    )
    return BpeModel(merges=tuple(merges), vocab=vocab)


def bpe_encode_ids(
    docs: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Append ``out_col``: the document as an ``array<int>`` of
    vocabulary ids — what a training run actually consumes (compose
    with chunking/packing/`write_training_shards` for trainer-ready
    shards). Unknown symbols (characters outside the training
    alphabet) map to id 0 (= ``UNK``); NULL text → NULL. Same
    one-Arrow-pass shape as :func:`bpe_encode`."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.text import py_tokens

    ranks = {pair: i for i, pair in enumerate(model.merges)}
    ids = model.ids()
    unk = ids[UNK]

    @pandas_udf("array<int>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[int]] = {}

        def enc(text):
            if text is None:
                return None
            out: list[int] = []
            for w in py_tokens(text):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = [
                        ids.get(s, unk) for s in _encode_word(w, ranks)
                    ]
                out.extend(got)
            return out

        return texts.map(enc)

    return docs.withColumn(out_col, encode(F.col(text_col)))
