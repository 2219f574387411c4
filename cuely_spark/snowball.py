"""Snowball stemmers for German, French, and Spanish — implemented
from the published algorithm descriptions at snowballstem.org (public
specifications; the same algorithms rust-stemmers generates from, which
is what the reference routes to:
/root/reference/crates/core/src/tokenizer/stemmer.rs ->
tantivy::tokenizer::Stemmer -> rust_stemmers::Algorithm::{German,
French, Spanish}; language routing in
crates/core/src/schema/text_field.rs:294-326).

Each stemmer operates on a lowercase word as the spec requires (the
reference chain is Normal -> LowerCaser -> Stemmer,
tokenizer/fields/stemmed.rs:45-53 — no accent folding before the
stemmer). Accent-stripped input (what this engine's Default tokenizer
chain produces) is also accepted: the rules simply see a/e/o/u where
the accented forms would be, which is the documented projection
``strip(snowball(strip(w)))`` — identical to Snowball for unaccented
words.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared region helpers


def _r_after_first_nonvowel_after_vowel(word: str, vowels: str,
                                        start: int = 0) -> int:
    """Standard R1/R2 start: position after the first non-vowel that
    follows a vowel, searching from `start`; len(word) if none."""
    n = len(word)
    i = start
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    # word[i] is the first non-vowel after a vowel (or end)
    return min(i + 1, n)


def _standard_r1_r2(word: str, vowels: str) -> tuple[int, int]:
    r1 = _r_after_first_nonvowel_after_vowel(word, vowels)
    r2 = _r_after_first_nonvowel_after_vowel(word, vowels, r1)
    return r1, r2


# ---------------------------------------------------------------------------
# German (snowballstem.org/algorithms/german/stemmer.html)

_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = "bdfghklmnrt"
_DE_ST_ENDING = "bdfghklmnt"


def german_snowball(word: str) -> str:
    if not word:
        return word
    # prelude: ß -> ss; u/y between vowels marked as consonants (upper)
    word = word.replace("ß", "ss")
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "uy" and chars[i - 1] in _DE_VOWELS
                and chars[i + 1] in _DE_VOWELS):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1, r2 = _standard_r1_r2(word, _DE_VOWELS)
    r1 = max(r1, 3) if len(word) >= 3 else len(word)  # min-3 adjustment

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1: longest among em/ern/er | e/en/es | s(s-ending)
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if suf in ("ern", "em", "er"):
                if in_r1(pos):
                    word = word[:pos]
            elif suf in ("en", "es", "e"):
                if in_r1(pos):
                    word = word[:pos]
                    if word.endswith("niss"):
                        word = word[:-1]
            else:  # 's'
                if in_r1(pos) and pos > 0 and word[pos - 1] in _DE_S_ENDING:
                    word = word[:pos]
            break

    # step 2: longest among est/en/er | st(st-ending, >=3 before)
    for suf in ("est", "en", "er", "st"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if suf == "st":
                if (in_r1(pos) and pos > 0
                        and word[pos - 1] in _DE_ST_ENDING
                        and pos - 1 >= 3):
                    word = word[:pos]
            else:
                if in_r1(pos):
                    word = word[:pos]
            break

    # step 3: d-suffixes
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig",
                "ik"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if suf in ("end", "ung"):
                if in_r2(pos):
                    word = word[:pos]
                    if word.endswith("ig"):
                        p2 = len(word) - 2
                        if in_r2(p2) and not word[:p2].endswith("e"):
                            word = word[:p2]
            elif suf in ("ig", "ik", "isch"):
                if in_r2(pos) and not word[:pos].endswith("e"):
                    word = word[:pos]
            elif suf in ("lich", "heit"):
                if in_r2(pos):
                    word = word[:pos]
                    for p in ("er", "en"):
                        if word.endswith(p) and in_r1(len(word) - 2):
                            word = word[:-2]
                            break
            else:  # keit
                if in_r2(pos):
                    word = word[:pos]
                    for p in ("lich", "ig"):
                        if (word.endswith(p)
                                and in_r2(len(word) - len(p))):
                            word = word[: len(word) - len(p)]
                            break
            break

    # postlude: unmark + remove umlauts
    return (word.lower()
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# Spanish (snowballstem.org/algorithms/spanish/stemmer.html)

_ES_VOWELS = "aeiouáéíóúü"

_ES_STEP1 = [
    # (suffixes sorted longest-first handled by caller, action key)
    (("amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
      "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
      "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa"),
     "del_r2"),
    (("aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
      "ancia", "ador", "ante"), "del_r2_ic"),
    (("logías", "logía"), "log"),
    (("uciones", "ución"), "u"),
    (("encias", "encia"), "ente"),
    (("amente",), "amente"),
    (("mente",), "mente"),
    (("idades", "idad"), "idad"),
    (("ivas", "ivos", "iva", "ivo"), "iva"),
]

_ES_PRONOUNS = ("selas", "selos", "sela", "selo", "las", "les", "los",
                "nos", "me", "se", "la", "le", "lo")
_ES_PRON_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRON_PRE_B = ("iendo", "ando", "ar", "er", "ir")

# the official step-2b suffix list verbatim (en/es/éis/emos — the
# gu-undoubling group — handled separately)
_ES_STEP2B_LONG = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré",
    "erían", "erías", "erán", "erás", "eríais", "ería", "eréis",
    "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré",
    "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id", "ase",
    "iese", "aste", "iste", "an", "aban", "ían", "aran", "ieran",
    "asen", "iesen", "aron", "ieron", "ado", "ido", "ando", "iendo",
    "ió", "ar", "er", "ir", "as", "abas", "adas", "idas", "ías",
    "aras", "ieras", "ases", "ieses", "ís", "áis", "abais", "íais",
    "arais", "ierais", "aseis", "ieseis", "asteis", "isteis", "ados",
    "idos", "amos", "ábamos", "íamos", "imos", "áramos", "iéramos",
    "iésemos", "ásemos",
)


def _es_rv(word: str) -> int:
    """Spanish/French RV: second letter consonant -> after next vowel;
    first two letters vowels -> after next consonant; else (cons-vowel)
    -> after third letter; end of word if not found."""
    n = len(word)
    if n < 3:
        return n
    v = _ES_VOWELS
    if word[1] not in v:
        i = 2
        while i < n and word[i] not in v:
            i += 1
        return min(i + 1, n)
    if word[0] in v and word[1] in v:
        i = 2
        while i < n and word[i] in v:
            i += 1
        return min(i + 1, n)
    return 3


def _es_unaccent(word: str) -> str:
    for a, b in (("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"),
                 ("ú", "u")):
        word = word.replace(a, b)
    return word


def spanish_snowball(word: str) -> str:
    if not word:
        return word
    r1, r2 = _standard_r1_r2(word, _ES_VOWELS)
    rv = _es_rv(word)

    # step 0: attached pronoun
    for pron in _ES_PRONOUNS:
        if not word.endswith(pron):
            continue
        base = word[: len(word) - len(pron)]
        done = False
        for pre in _ES_PRON_PRE_A:
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                word = (base[: len(base) - len(pre)]
                        + _es_unaccent(pre))
                done = True
                break
        if not done:
            for pre in _ES_PRON_PRE_B:
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    word = base
                    done = True
                    break
        if (not done and base.endswith("yendo")
                and len(base) - 5 >= rv
                and base[: len(base) - 5].endswith("u")):
            word = base
        break

    changed1 = False
    # step 1: standard suffixes — longest match across ALL groups
    best = None
    for sufs, action in _ES_STEP1:
        for suf in sufs:
            if word.endswith(suf) and (best is None
                                       or len(suf) > len(best[0])):
                best = (suf, action)
    if best is not None:
        suf, action = best
        pos = len(word) - len(suf)
        before = word

        def try_del(w: str, pres: tuple[str, ...], region: int) -> str:
            for p in pres:
                if w.endswith(p) and len(w) - len(p) >= region:
                    return w[: len(w) - len(p)]
            return w

        if action == "del_r2" and pos >= r2:
            word = word[:pos]
        elif action == "del_r2_ic" and pos >= r2:
            word = try_del(word[:pos], ("ic",), r2)
        elif action == "log" and pos >= r2:
            word = word[:pos] + "log"
        elif action == "u" and pos >= r2:
            word = word[:pos] + "u"
        elif action == "ente" and pos >= r2:
            word = word[:pos] + "ente"
        elif action == "amente" and pos >= r1:
            word = word[:pos]
            if word.endswith("iv") and len(word) - 2 >= r2:
                word = word[:-2]
                word = try_del(word, ("at",), r2)
            else:
                word = try_del(word, ("os", "ic", "ad"), r2)
        elif action == "mente" and pos >= r2:
            word = try_del(word[:pos], ("ante", "able", "ible"), r2)
        elif action == "idad" and pos >= r2:
            word = try_del(word[:pos], ("abil", "ic", "iv"), r2)
        elif action == "iva" and pos >= r2:
            word = try_del(word[:pos], ("at",), r2)
        changed1 = word != before

    if not changed1:
        # step 2a: verb suffixes beginning y, preceded by u (u may be
        # outside RV)
        removed_2a = False
        for suf in ("yeron", "yendo", "yamos", "yais", "yan", "yen",
                    "yas", "yes", "ya", "ye", "yo", "yó"):
            if word.endswith(suf):
                pos = len(word) - len(suf)
                if pos >= rv and pos > 0 and word[pos - 1] == "u":
                    word = word[:pos]
                    removed_2a = True
                break
        if not removed_2a:
            # step 2b: other verb suffixes, in RV
            best2 = None
            for suf in _ES_STEP2B_LONG + ("en", "es", "éis", "emos"):
                if word.endswith(suf) and (best2 is None
                                           or len(suf) > len(best2)):
                    best2 = suf
            if best2 is not None:
                pos = len(word) - len(best2)
                if pos >= rv:
                    word = word[:pos]
                    if best2 in ("en", "es", "éis", "emos") \
                            and word.endswith("gu"):
                        word = word[:-1]  # u outside RV is fine

    # step 3: residual suffix, in RV
    for suf in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if pos >= rv:
                word = word[:pos]
                if suf in ("e", "é") and word.endswith("gu") \
                        and len(word) - 1 >= rv:
                    word = word[:-1]  # the u must be in RV here
            break

    return _es_unaccent(word)


# ---------------------------------------------------------------------------
# French (snowballstem.org/algorithms/french/stemmer.html)

_FR_VOWELS = "aeiouyâàëéêèïîôûù"

_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "î", "i",
)

_FR_STEP2B_ER = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_FR_STEP2B_A = (
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
)


def _fr_rv(word: str) -> int:
    n = len(word)
    if n < 2:
        return n
    v = _FR_VOWELS
    if word[:3] in ("par", "col", "tap"):
        return 3
    if word[0] in v and word[1] in v:
        return min(3, n)
    # region after the first vowel not at word start
    i = 1
    while i < n and word[i] not in v:
        i += 1
    return min(i + 1, n)


def french_snowball(word: str) -> str:
    if not word:
        return word
    # prelude: mark u/i between vowels, y adjacent to a vowel, u after q
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1].lower() in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1].lower() in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    word = "".join(chars)

    r1, r2 = _standard_r1_r2(word, _FR_VOWELS)
    rv = _fr_rv(word)

    def ends(w: str, suf: str) -> bool:
        return w.endswith(suf)

    changed1 = False
    found_ment = False

    # ---- step 1: longest matching suffix across the whole table ------
    step1_sufs = [
        "issements", "issement", "atrices", "amment", "emment", "ments",
        "atrice", "ateurs", "ations", "logies", "usions", "utions",
        "ences", "ances", "iqUes", "ismes", "ables", "istes", "ement",
        "ements", "ités", "ives", "euses", "ateur", "ation", "logie",
        "usion", "ution", "ence", "ment", "ance", "iqUe", "isme",
        "able", "iste", "ité", "ive", "ifs", "aux", "eaux", "euse",
        "eux", "if",
    ]
    best = ""
    for s in step1_sufs:
        if ends(word, s) and len(s) > len(best):
            best = s
    if best:
        suf = best
        pos = len(word) - len(suf)
        before = word
        if suf in ("ance", "iqUe", "isme", "able", "iste", "eux",
                   "ances", "iqUes", "ismes", "ables", "istes"):
            if pos >= r2:
                word = word[:pos]
        elif suf in ("atrice", "ateur", "ation", "atrices", "ateurs",
                     "ations"):
            if pos >= r2:
                word = word[:pos]
                if word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if pos >= r2:
                word = word[:pos] + "log"
        elif suf in ("usion", "ution", "usions", "utions"):
            if pos >= r2:
                word = word[:pos] + "u"
        elif suf in ("ence", "ences"):
            if pos >= r2:
                word = word[:pos] + "ent"
        elif suf in ("ement", "ements"):
            if pos >= rv:
                word = word[:pos]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                elif word.endswith("eus"):
                    p = len(word) - 3
                    if p >= r2:
                        word = word[:p]
                    elif p >= r1:
                        word = word[:p] + "eux"
                elif (word.endswith("abl") or word.endswith("iqU")) \
                        and len(word) - 3 >= r2:
                    word = word[:-3]
                elif (word.endswith("ièr") or word.endswith("Ièr")) \
                        and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
        elif suf in ("ité", "ités"):
            if pos >= r2:
                word = word[:pos]
                if word.endswith("abil"):
                    p = len(word) - 4
                    word = word[:p] if p >= r2 else word[:p] + "abl"
                elif word.endswith("ic"):
                    p = len(word) - 2
                    word = word[:p] if p >= r2 else word[:p] + "iqU"
                elif word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if pos >= r2:
                word = word[:pos]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic"):
                        p = len(word) - 2
                        word = word[:p] if p >= r2 else word[:p] + "iqU"
        elif suf == "eaux":
            word = word[:pos] + "eau"
        elif suf == "aux":
            if pos >= r1:
                word = word[:pos] + "al"
        elif suf in ("euse", "euses"):
            if pos >= r2:
                word = word[:pos]
            elif pos >= r1:
                word = word[:pos] + "eux"
        elif suf in ("issement", "issements"):
            if pos >= r1 and pos > 0 and word[pos - 1] not in _FR_VOWELS:
                word = word[:pos]
        elif suf == "amment":
            found_ment = True
            if pos >= rv:
                word = word[:pos] + "ant"
        elif suf == "emment":
            found_ment = True
            if pos >= rv:
                word = word[:pos] + "ent"
        elif suf in ("ment", "ments"):
            found_ment = True
            if pos > 0 and word[pos - 1] in _FR_VOWELS and pos - 1 >= rv:
                word = word[:pos]
        changed1 = word != before

    # step-3-vs-4 control mirrors french.sbl: the ment/amment/emment
    # actions end with `fail`, so a step-1 ment-change alone does NOT
    # select step 3 — only a non-ment step-1 change or a step-2a/2b
    # change does (the or-chain `standard_suffix or i_verb_suffix or
    # verb_suffix` succeeding).
    did_23 = changed1 and not found_ment
    if not changed1 or found_ment:
        # ---- step 2a: i-verb suffixes, preceded by a non-vowel in RV
        removed_2a = False
        best = ""
        for s in _FR_STEP2A:
            if ends(word, s) and len(s) > len(best):
                best = s
        if best:
            pos = len(word) - len(best)
            if (pos > 0 and word[pos - 1] not in _FR_VOWELS
                    and pos - 1 >= rv):
                word = word[:pos]
                removed_2a = True
        if removed_2a:
            did_23 = True
        else:
            # ---- step 2b
            best = ""
            for s in ("ions",) + _FR_STEP2B_ER + _FR_STEP2B_A:
                if ends(word, s) and len(s) > len(best):
                    best = s
            if best:
                pos = len(word) - len(best)
                before = word
                if best == "ions":
                    if pos >= rv and pos >= r2:
                        word = word[:pos]
                elif best in _FR_STEP2B_ER:
                    if pos >= rv:
                        word = word[:pos]
                else:  # a-group
                    if pos >= rv:
                        word = word[:pos]
                        if word.endswith("e") and len(word) - 1 >= rv:
                            word = word[:-1]
                if word != before:
                    did_23 = True

    if did_23:
        # ---- step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # ---- step 4
        if (word.endswith("s") and len(word) >= 2
                and word[-2] not in "aiouès"
                and word[-2] != "I"):
            word = word[:-1]
        best = ""
        for s in ("Ière", "ière", "Ier", "ier", "ion", "ë", "e"):
            if ends(word, s) and len(s) > len(best):
                best = s
        if best:
            pos = len(word) - len(best)
            if best == "ion":
                if (pos >= rv and pos >= r2 and pos > 0
                        and word[pos - 1] in "st" and pos - 1 >= rv):
                    word = word[:pos]
            elif best in ("ier", "ière", "Ier", "Ière"):
                if pos >= rv:
                    word = word[:pos] + "i"
            elif best == "e":
                if pos >= rv:
                    word = word[:pos]
            elif best == "ë":
                if pos >= rv and word[:pos].endswith("gu"):
                    word = word[:pos]

    # ---- step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(end):
            word = word[:-1]
            break

    # ---- step 6: un-accent é/è before final non-vowel run
    i = len(word) - 1
    seen_nonvowel = False
    while i >= 0 and word[i] not in _FR_VOWELS:
        # uppercase markers count as non-vowels here
        seen_nonvowel = True
        i -= 1
    if seen_nonvowel and i >= 0 and word[i] in "éè":
        word = word[:i] + "e" + word[i + 1:]

    return word.lower()


# ---------------------------------------------------------------------------
# English "Porter2" (snowballstem.org/algorithms/english/stemmer.html)
# — the algorithm rust-stemmers runs for Algorithm::English, i.e. what
# the reference's English stemmed fields actually use.

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = "cdeghkmnrt"

_EN_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXC_1A = frozenset(("inning", "outing", "canning", "herring",
                        "earring", "proceed", "exceed", "succeed"))

_EN_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
    ("iveness", "ive"), ("fulness", "ful"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]
_EN_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]
_EN_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant",
             "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
             "al", "er", "ic")


def _en_is_vowel(chars: str, i: int) -> bool:
    return chars[i] in _EN_VOWELS  # Y (marked) is a consonant


def _en_short_syllable_at(w: str, i: int) -> bool:
    """Short syllable ending at index i (the vowel is at i):
    (a) vowel + non-vowel (not w/x/Y) preceded by a non-vowel, or
    (b) vowel at position 0 followed by a non-vowel."""
    if i < 0 or i + 1 >= len(w):
        return False
    if not _en_is_vowel(w, i) or _en_is_vowel(w, i + 1):
        return False
    if i == 0:
        return True
    return (w[i + 1] not in "wxY") and not _en_is_vowel(w, i - 1)


def _en_is_short(w: str, r1: int) -> bool:
    """Word is short: ends in a short syllable AND R1 is null."""
    return r1 >= len(w) and _en_short_syllable_at(w, len(w) - 2)


def english_snowball(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.lstrip("'")
    if word in _EN_EXCEPTIONS:
        return _EN_EXCEPTIONS[word]
    if len(word) <= 2:
        return word
    # mark consonant y as Y: initial y, or y after a vowel
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    # R1 with the gener/commun/arsen prefix exception
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        r1 = _r_after_first_nonvowel_after_vowel(word, _EN_VOWELS)
    r2 = _r_after_first_nonvowel_after_vowel(word, _EN_VOWELS, r1)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if a vowel exists before the position just ahead of s
        if any(word[i] in _EN_VOWELS for i in range(len(word) - 2)):
            word = word[:-1]

    if word in _EN_EXC_1A:
        return word.replace("Y", "y")

    # step 1b
    did_1b = False
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if any(c in _EN_VOWELS for c in stem):
                    word = stem
                    did_1b = True
                break
    if did_1b:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif word.endswith(_EN_DOUBLES):
            word = word[:-1]
        elif _en_is_short(word, r1):
            word += "e"

    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in _EN_VOWELS):
        word = word[:-1] + "i"

    # step 2 (in R1), longest match
    for suf, repl in _EN_STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word[: -3].endswith("l"):
                        word = word[:-1]
                elif suf == "li":
                    if word[:-2] and word[-3] in _EN_LI_END:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # step 3 (in R1), longest match
    for suf, repl in _EN_STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - 5 >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + repl
            break

    # step 4 (in R2), longest match
    for suf in sorted(_EN_STEP4, key=len, reverse=True):
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if word[:-3] and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        stem = word[:-1]
        if (len(word) - 1 >= r2
                or (len(word) - 1 >= r1
                    and not _en_short_syllable_at(stem, len(stem) - 2))):
            word = stem
    elif word.endswith("l") and len(word) - 1 >= r2 \
            and word[:-1].endswith("l"):
        word = word[:-1]

    return word.replace("Y", "y")
