"""Porter stemmer — backs the Trino ``word_stem`` dialect function.

Implements M.F. Porter's 1980 suffix-stripping algorithm ("An
algorithm for suffix stripping", Program 14(3)) from the published
definition; the reference engine passes ``word_stem`` through to Trino
(client.go:501-617), whose English stemmer is the same Porter
algorithm via Lucene/Snowball.  Pure function of its input — the
pandas-UDF wrapper in trino_compat.install_compat_functions vectorizes
it per Arrow batch.

The sandbox's DuckDB cannot load its fts extension (no network), so
there is no SQL oracle for stemming; correctness is pinned instead by
tests/test_trino_compat.py against the canonical example pairs from
the algorithm's definition (caresses→caress, ponies→poni,
relational→relat, …).
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the paper: number of VC sequences in [C](VC){m}[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if not v and prev_vowel:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _cvc(stem: str) -> bool:
    """*o in the paper: ends cvc where the final c is not w, x, or y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """word = stem+suffix and m(stem) > min_m → stem+repl, else None."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word  # suffix matched but condition failed: stop this step


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # step 1a: plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b: -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        cleaned = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            cleaned = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            cleaned = w[:-3]
        if cleaned is not None:
            w = cleaned
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c: y → i when the stem has a vowel
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0): longest-match is implicit — at most one of these
    # suffixes can match a given word ending
    for suf, repl in _STEP2:
        if w.endswith(suf):
            w = _replace(w, suf, repl, 0)
            break

    # step 3 (m > 0)
    for suf, repl in _STEP3:
        if w.endswith(suf):
            w = _replace(w, suf, repl, 0)
            break

    # step 4 (m > 1): drop the suffix entirely; -ion needs s/t before it
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a: drop trailing e when m > 1, or m == 1 and not *o
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b: -ll → -l when m > 1
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
