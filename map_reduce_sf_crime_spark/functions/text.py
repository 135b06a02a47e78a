"""Text-analysis column expressions for the training-data pipeline:
tokenization, shingling, language-ID, quality scoring — all built-in
Spark functions (array/lambda expressions, no Python UDFs) with DuckDB
SQL twins.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal per-language function-word lists for the n-gram/stopword
#: language-ID heuristic. Deterministic, ASCII-only on purpose.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "on"),
    "es": ("el", "la", "de", "y", "en", "los", "una", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "une", "pour"),
    "de": ("der", "die", "das", "und", "von", "mit", "ein", "fur"),
    "zh": ("de", "shi", "bu", "le", "zai", "ren", "you", "wo"),
}

#: Quality-score stopwords (English function words).
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]

#: BPE-ish token regex: word pieces OR single non-space punctuation —
#: a cheap stand-in for subword tokenization with stable counts.
BPE_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower_col(text: Column) -> Column:
    """ASCII-only case folding. Full Unicode lowercasing is
    engine-dependent (JDK maps 'İ' → "i̇" two codepoints; DuckDB's
    utf8proc maps it differently — found by the adversarial oracle
    probe), so every hashed/tokenized path folds ASCII only: byte-
    identical in any engine, and non-ASCII case is left alone as a
    documented determinism choice."""
    return F.translate(text, _UPPER, _LOWER)


def ascii_lower_sql(text: str) -> str:
    return f"translate({text}, '{_UPPER}', '{_LOWER}')"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, ASCII-case-folded; empty strings filtered."""
    return F.filter(F.split(ascii_lower_col(text), r"\s+"), lambda t: t != "")


#: Python-side mirror of :func:`ascii_lower_col` — ONE definition so
#: driver/UDF-side folding can never drift from the column expression.
PY_ASCII_FOLD = str.maketrans(_UPPER, _LOWER)

#: Java's regex \s is EXACTLY [ \t\n\x0B\f\r] — NOT Python's
#: Unicode-aware \s (which also splits on NBSP, NEL, line/paragraph
#: separators...). Python-side tokenization must use this class or a
#: word like 'foo bar' tokenizes differently in a pandas_udf than
#: in the corpus scan.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def py_tokens(text: str) -> list[str]:
    """Python-side mirror of :func:`tokens_col`: identical fold,
    identical whitespace class, empties dropped. The ONLY correct way
    to tokenize inside a UDF or on the driver."""
    return [t for t in _JAVA_WS.split(text.translate(PY_ASCII_FOLD)) if t]


def tokens_sql(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({ascii_lower_sql(text)}, '\\s+'),"
        f" t -> t != '')"
    )


def shingles_col(tok: Column, n: int) -> Column:
    """Word n-gram shingle array (distinct not applied — set-ness is
    applied where jaccard needs it).

    Guarded for short docs: ``sequence(1, 0)`` in Spark is the
    DESCENDING sequence [1, 0] (not empty!), whose 0 index then
    crashes ``slice`` — docs with fewer than ``n`` tokens must
    short-circuit to an empty array (caught by
    tests/test_text_functions.py).

    ``tok`` is bound ONCE through a single-element-array lambda
    (``transform(array(tok), t -> …)[0]``) before any per-shingle
    work touches it. Without the binding, every per-element
    reference inside the transform lambda re-inlines the whole
    ``tok`` EXPRESSION (typically ``filter(split(translate(text)))``)
    — higher-order lambdas run interpreted, outside codegen's
    common-subexpression elimination — so each document re-tokenized
    once PER SHINGLE: O(tokens²) per doc, measured 49.2 s → 4.0 s
    (12×) on the x10 bigram explode with bit-identical output
    (BASELINE.md round-8 continuation). The lambda variable is a
    bound value, so the inner size/slice references are cheap."""

    def build(t: Column) -> Column:
        count = F.size(t) - (n - 1)
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(tok), build)[0]


def shingles_sql(tok: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({tok}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({tok}, i, i + {n - 1}), ' '))"
    )


def bind_col(col: Column, fn) -> Column:
    """Let-binding for column expressions:
    ``transform(array(col), x -> fn(x))[0]`` evaluates ``col`` ONCE and
    hands the value to ``fn`` as a bound lambda variable. Needed
    because higher-order-function expressions are excluded from
    codegen subexpression elimination, so every textual reuse of a
    HOF-bearing column (``tokens_col`` is ``filter(split(...))``)
    re-evaluates the whole subtree — the exact blow-up measured 12× on
    shingles in round 8 (see :func:`shingles_col`). Value semantics
    are identical: the lambda sees exactly ``col``'s value, including
    null."""
    return F.transform(F.array(col), fn)[0]


def stopword_hits_col(tok: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tok, lambda t: t.isin(list(words))))


def stopword_hits_sql(tok: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tok}, t -> t in ({lst})))"


def lang_argmax_col(scores: dict) -> Column:
    """Argmax language over per-language score columns; ties and
    zero-score docs → 'und'. Deterministic: earlier languages in
    LANG_STOPWORDS order win ties (reversed overwrite). THE single
    tie-break rule — lang_id_col and the staged text_profile argmax
    both call this, so the rule can never drift between them."""
    best_score = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so that earlier languages win ties via later overwrite
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when(
            (scores[lang] == best_score) & (best_score > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def lang_id_col(tok: Column) -> Column:
    """Argmax language by stopword hits; ties and zero-hit docs →
    'und'. Deterministic: strictly-greater comparison in fixed lang
    order mirrors the SQL twin.

    Doubly let-bound (r11): the token array is evaluated once, then
    the five per-language hit counts are packed into one bound struct
    before the argmax references them — the unbound argmax chain
    re-inlined the hit-count HOFs ~50× (each ``greatest`` reference
    duplicates all five), which re-tokenized the document that many
    times when ``tok`` is a raw ``tokens_col`` expression. Bit-equal
    output; measured ~2× on the corpus_clean_stats filter."""

    def over_scores(t: Column) -> Column:
        fields = [
            stopword_hits_col(t, ws).alias(f"s_{lang}")
            for lang, ws in LANG_STOPWORDS.items()
        ]
        return bind_col(
            F.struct(*fields),
            lambda s: lang_argmax_col(
                {lang: s[f"s_{lang}"] for lang in LANG_STOPWORDS}
            ),
        )

    return bind_col(tok, over_scores)


def lang_id_sql(tok: str) -> str:
    scores = {
        lang: stopword_hits_sql(tok, ws) for lang, ws in LANG_STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = "\n      ".join(
        f"when {scores[lang]} = {best} and {best} > 0 then '{lang}'"
        for lang in LANG_STOPWORDS
    )
    return f"(case {whens} else 'und' end)"
