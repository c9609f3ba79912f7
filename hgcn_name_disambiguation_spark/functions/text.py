"""Text normalization & tokenization (SURVEY §2.2 P1-P4, §2.8 F1-F3).

All the relational parts are built-in `pyspark.sql.functions`
(JVM-side, whole-stage-codegen'd). The only Python crossing is the
Porter stemmer, implemented as an Arrow-batched pandas UDF over
ARRAY<STRING> (there is no built-in stemmer). Reference provenance:
- punctuation strip + lowercase: ``name_disambiguation.py:771,835-839``
- tokenize + len>1 filter:        ``name_disambiguation.py:839-848``
- Porter stem:                     ``name_disambiguation.py:18-19,847-848``
- stopword removal:                ``name_disambiguation.py:772-773,848``
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from ..config import RAW_STOPWORDS, TITLE_PUNCT_RE

# ---------------------------------------------------------------------------
# Pure-Python Porter stemmer (public algorithm, Porter 1980). Implemented
# from the published algorithm description; runs vectorized inside the
# pandas UDF worker. Kept dependency-free (no nltk in the image).
# ---------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter 'm': number of VC sequences."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if prev_vowel and cons:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    """Porter stemming algorithm (Porter, 1980), steps 1a-5b."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and _measure(w[:-3]) > 1 and w[:-3].endswith(("s", "t")):
            w = w[:-3]

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# Stemmed stoplist — the reference stems its raw 16-word list with the
# same stemmer it applies to tokens (name_disambiguation.py:773) and
# tests each token's STEM against it (:845-848). Computed here so the
# stem space is guaranteed to match this module's stemmer.
STOP_STEMS: tuple[str, ...] = tuple(
    dict.fromkeys(porter_stem(w) for w in RAW_STOPWORDS)
)


# ---------------------------------------------------------------------------
# Column-level API
# ---------------------------------------------------------------------------


def normalize_title(col: Column) -> Column:
    """P1: strip the reference punctuation class -> spaces, lowercase,
    collapse whitespace (``name_disambiguation.py:771,835-839``)."""
    c = F.lower(F.regexp_replace(col, TITLE_PUNCT_RE, " "))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokenize_keep_long(col: Column) -> Column:
    """P2: split on spaces, keep tokens with len>1 — pure higher-order
    functions, no UDF (``name_disambiguation.py:839-848``)."""
    return F.filter(F.split(col, " "), lambda x: F.length(x) > 1)


def remove_stopwords(col: Column, stopwords: tuple[str, ...] = STOP_STEMS) -> Column:
    """P4: array_except against the broadcast-literal stoplist
    (``name_disambiguation.py:772-773,848``). Default list is the
    STEMMED reference stoplist — apply AFTER stemming for parity."""
    return F.array_except(col, F.array(*[F.lit(s) for s in stopwords]))


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens(tokens: pd.Series) -> pd.Series:
    """P3: Porter-stem each token — Arrow-batched pandas UDF (the one
    text kernel Spark lacks). Cache per batch: titles repeat tokens
    heavily, so memoizing cuts Python work ~5x."""
    cache: dict[str, str] = {}

    def stem_list(lst):
        if lst is None:
            return []
        out = []
        for t in lst:
            s = cache.get(t)
            if s is None:
                s = porter_stem(t)
                cache[t] = s
            out.append(s)
        return out

    return tokens.map(stem_list)


def title_tokens(
    col: Column,
    use_stemming: bool = True,
    stopwords: tuple[str, ...] = RAW_STOPWORDS,
) -> Column:
    """Full P1->P4 chain producing the stemmed, stopword-free token array
    (distinct, since edge weights count *set* intersections — T1).

    Reference order (``name_disambiguation.py:845-848``): each token is
    STEMMED FIRST, then dropped iff its stem is in the stemmed stoplist
    — so inflected stopwords ('using'->'us', 'models'->'model') are
    dropped too, and the surviving tokens are stems. With
    use_stemming=False the raw list filters raw tokens (non-parity
    mode for already-normalized corpora).

    ``stopwords`` is the RAW list (``PipelineConfig.stopwords`` threads
    here); it is stemmed in-process when use_stemming is on so the stem
    space always matches this module's stemmer."""
    toks = tokenize_keep_long(normalize_title(col))
    if use_stemming:
        stems = (
            STOP_STEMS
            if stopwords == RAW_STOPWORDS
            else tuple(dict.fromkeys(porter_stem(w) for w in stopwords))
        )
        toks = remove_stopwords(stem_tokens(toks), stems)
    else:
        toks = remove_stopwords(toks, tuple(stopwords))
    return F.array_distinct(toks)
