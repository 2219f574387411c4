"""Porter stemmer — the classic algorithm from M.F. Porter, "An
algorithm for suffix stripping", Program 14(3), 1980 (public domain
description; implemented from the paper's rule tables).

The reference indexes Snowball-stemmed shadow fields
(/root/reference/crates/core/src/schema/text_field.rs:294-326,
tokenizer/fields/stemmed.rs via rust-stemmers). Snowball English
("Porter2") differs from classic Porter on a small set of words; this
engine pins classic Porter on BOTH the index and query sides, so
matching is internally consistent (documented deviation — no stemming
library ships in this environment).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of VC sequences."""
    m = 0
    prev_cons = None
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if prev_cons and not cons:
            pass  # entering a V run
        if prev_cons is False and cons:
            m += 1  # completed a VC
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (len(stem) >= 2 and stem[-1] == stem[-2]
            and _is_cons(stem, len(stem) - 1))


def _cvc(stem: str) -> bool:
    """*o: ends cvc where the final c is not w, x or y."""
    if len(stem) < 3:
        return False
    return (_is_cons(stem, len(stem) - 3)
            and not _is_cons(stem, len(stem) - 2)
            and _is_cons(stem, len(stem) - 1)
            and stem[-1] not in "wxy")


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """word[:-len(suffix)]+repl if word ends with suffix and the stem's
    measure > min_m; else None."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word  # suffix matched but condition failed -> stop this step


def porter_stem(word: str) -> str:
    if len(word) <= 2 or not word.isalpha():
        return word

    # ---- step 1a --------------------------------------------------------
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # ---- step 1b --------------------------------------------------------
    flag_1b = False
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    elif word.endswith("ed"):
        if _has_vowel(word[:-2]):
            word = word[:-2]
            flag_1b = True
    elif word.endswith("ing"):
        if _has_vowel(word[:-3]):
            word = word[:-3]
            flag_1b = True
    if flag_1b:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif _ends_double_cons(word) and word[-1] not in "lsz":
            word = word[:-1]
        elif _measure(word) == 1 and _cvc(word):
            word += "e"

    # ---- step 1c --------------------------------------------------------
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # ---- step 2 ---------------------------------------------------------
    for suf, repl in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ):
        if word.endswith(suf):
            r = _replace(word, suf, repl, 0)
            if r is not None:
                word = r
            break

    # ---- step 3 ---------------------------------------------------------
    for suf, repl in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if word.endswith(suf):
            r = _replace(word, suf, repl, 0)
            if r is not None:
                word = r
            break

    # ---- step 4 ---------------------------------------------------------
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if suf == "ion" and (not stem or stem[-1] not in "st"):
                break
            if _measure(stem) > 1:
                word = stem
            break

    # ---- step 5a --------------------------------------------------------
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            word = stem

    # ---- step 5b --------------------------------------------------------
    if _measure(word) > 1 and _ends_double_cons(word) and word[-1] == "l":
        word = word[:-1]

    return word


# ---------------------------------------------------------------------------
# Language-routed stemming (reference: the stemmer is selected by the
# DETECTED language with English fallback,
# /root/reference/crates/core/src/schema/text_field.rs:294-326 +
# tokenizer/fields/stemmed.rs via rust-stemmers). English routes to the
# classic Porter above (documented deviation: Snowball "Porter2"
# differs on a small word set); de/fr/es route to the Snowball German /
# French / Spanish algorithms implemented from the published specs in
# :mod:`cuely_spark.snowball` — the same algorithms rust-stemmers
# generates for the reference. Inputs from this engine's Default chain
# arrive lowercase + NFKD-diacritic-stripped; the Snowball rules accept
# both accented and stripped forms (see the snowball module docstring).

def german_stem(word: str) -> str:
    """Snowball German (snowball.german_snowball); non-alpha passthrough
    mirrors the Porter wrapper."""
    if len(word) <= 2 or not word.isalpha():
        return word
    from .snowball import german_snowball

    return german_snowball(word)


def french_stem(word: str) -> str:
    """Snowball French (snowball.french_snowball)."""
    if len(word) <= 2 or not word.isalpha():
        return word
    from .snowball import french_snowball

    return french_snowball(word)


def spanish_stem(word: str) -> str:
    """Snowball Spanish (snowball.spanish_snowball)."""
    if len(word) <= 2 or not word.isalpha():
        return word
    from .snowball import spanish_snowball

    return spanish_snowball(word)


def english_stem(word: str) -> str:
    """Snowball English ("Porter2", snowball.english_snowball) — what
    rust-stemmers runs for Algorithm::English, i.e. exact parity with
    the reference's English stemmed fields. The classic-Porter
    `porter_stem` above remains exported (its 1980-paper vectors are
    pinned by tests) but is no longer the routed default."""
    if len(word) <= 2 or not word.isalpha():
        return word
    from .snowball import english_snowball

    return english_snowball(word)


STEMMERS = {
    "en": english_stem,
    "de": german_stem,
    "fr": french_stem,
    "es": spanish_stem,
}

# marker words per language for query-side detection (the whatlang
# analog, crates/core/src/query/mod.rs:77-154 detects the query's
# language before choosing per-field query tokenizers); tiny on purpose
# — queries are short, and the explicit `lang=` parameter wins
_LANG_MARKERS = {
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein"}),
    "en": frozenset({"the", "and", "of", "is", "a", "to", "in"}),
    "es": frozenset({"el", "los", "las", "de", "es", "una", "y"}),
    "fr": frozenset({"le", "les", "et", "est", "une", "des", "du"}),
}


def detect_lang(tokens, default: str = "en") -> str:
    """Best marker-word overlap, ties/no-signal -> `default` (the
    reference falls back to English when detection fails)."""
    best, best_n = default, 0
    for lang in sorted(_LANG_MARKERS):
        n = sum(1 for t in tokens if t in _LANG_MARKERS[lang])
        if n > best_n:
            best, best_n = lang, n
    return best


def stem_for_lang(word: str, lang: str | None) -> str:
    """Stem with the language's stemmer; unknown/None -> English
    (reference fallback: text_field.rs:294-326)."""
    return STEMMERS.get(lang or "en", english_stem)(word)
