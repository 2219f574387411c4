"""Snowball German/French/Spanish stemmer vectors.

Each expected output was hand-traced through the published algorithm
descriptions (snowballstem.org; the same specs rust-stemmers — the
reference's stemmer backend — is generated from). No Snowball library
ships in this environment, so the vectors here are the verification
artifact: canonical examples quoted in the algorithm write-ups plus
traces exercising every step/region rule (R1/R2/RV boundaries,
longest-match, secondary deletions, undoubling, un-accenting).
"""

from cuely_spark.snowball import (french_snowball, german_snowball,
                                  spanish_snowball)

GERMAN = {
    # umlaut removal + step-1 er/en/es/e (R1 with min-3 adjustment)
    "häuser": "haus", "haus": "haus", "hauses": "haus",
    "katzen": "katz", "katze": "katz",
    "lesen": "les", "lese": "les",
    "kategorie": "kategori", "kategorien": "kategori",
    "aufeinander": "aufeinand",
    # ß -> ss prelude
    "straße": "strass",
    # niss restoration after group-(b) deletion
    "verzeichnisse": "verzeichnis",
    "bedürfnissen": "bedurfnis",
    # step-2 st after valid st-ending with >= 3 letters before
    "schönsten": "schon",
    "arbeiten": "arbeit",
    # step-3 heit in R2 with secondary en-deletion in R1
    "zufriedenheit": "zufried",
    # heit NOT in R2 -> kept
    "schönheit": "schonheit",
    # lich not in R2 -> kept
    "freundlich": "freundlich",
    # s only after a valid s-ending: 'aus' keeps its s (u not s-ending)
    "aus": "aus",
    # short words untouched (R1 floor at position 3)
    "des": "des",
}

FRENCH = {
    # step-1 ité in R2
    "continuité": "continu", "continu": "continu",
    # ement in RV + secondary eus-handling
    "majestueusement": "majestu",
    # step-2b er-group in RV
    "chanter": "chant", "chante": "chant",
    # step-4 s-removal then residual e
    "chantes": "chant",
    "chansons": "chanson", "chanson": "chanson",
    # step-2b iez
    "voudriez": "voudr",
    # step-4 residual e after 2a/2b fail
    "nationale": "national", "nation": "nation",
    # step-2a issant/issent preceded by non-vowel in RV
    "finissent": "fin", "finissant": "fin",
    # prelude: ou + er -> joU marking keeps 'jou' intact
    "jouer": "jou", "jouets": "jouet",
    # prelude Y (yeux: y before vowel -> Y, 'eux' needs R2 -> kept)
    "yeux": "yeux",
    # no rule fires on short accented words
    "été": "été",
}

SPANISH = {
    # step-1 adores/idad(+iv) in R2
    "torturadores": "tortur",
    "relatividad": "relat",
    # step-3 residual vowels in RV
    "gatos": "gat", "gato": "gat", "gata": "gat", "agua": "agu",
    # step-2b verb suffixes in RV
    "corriendo": "corr", "correr": "corr", "cantando": "cant",
    "llegaron": "lleg", "cantaron": "cant", "cantarás": "cant",
    "comeremos": "com", "viviremos": "viv", "luchas": "luch",
    # step-3 e after gu with the u in RV -> u dropped
    "pagué": "pag",
    # undoubling does NOT apply to guerra (step-3 'a' only)
    "guerra": "guerr",
    # amente with R1 + os/ic/ad secondary in R2
    "fácilmente": "facil",
    # pronoun not in RV -> step 0 must NOT fire; residual o drops
    "dándoselo": "dandosel",
    # encia NOT in R2 here (R2 starts after 'influen') -> step-3 'a'
    "influencia": "influenci",
    # encia -> ente when genuinely in R2
    "dependencia": "dependent",
}


def _check(table, fn):
    bad = {w: (fn(w), want) for w, want in table.items()
           if fn(w) != want}
    assert not bad, bad


def test_german_vectors():
    _check(GERMAN, german_snowball)


def test_french_vectors():
    _check(FRENCH, french_snowball)


def test_spanish_vectors():
    _check(SPANISH, spanish_snowball)


def test_accent_stripped_projection_stable():
    """The engine feeds accent-stripped tokens; stripped input must be
    handled and re-stemming a stem must be cheap-stable for the shadow
    term join (s:stem terms are produced on both index and query side
    from the same normalized token, so only same-input determinism is
    required — but idempotence on common nouns is a good canary)."""
    for w in ("hauser", "kategorie", "continuite", "relatividad",
              "facilmente", "torturadores"):
        for fn in (german_snowball, french_snowball, spanish_snowball):
            assert fn(w) == fn(w)


def test_routed_wrappers_use_snowball():
    from cuely_spark.stemmer import (french_stem, german_stem,
                                     spanish_stem, stem_for_lang)

    assert german_stem("häuser") == "haus"
    assert french_stem("majestueusement") == "majestu"
    assert spanish_stem("torturadores") == "tortur"
    assert stem_for_lang("häuser", "de") == "haus"
    # English fallback for unknown language
    assert stem_for_lang("running", "xx") == "run"


ENGLISH = {
    # exceptional forms
    "skis": "ski", "skies": "sky", "dying": "die", "news": "news",
    # step 1a ied/ies length rule
    "ties": "tie", "cries": "cri",
    # s-deletion vowel condition
    "gas": "gas", "gaps": "gap", "kiwis": "kiwi",
    # 1b with undoubling / e-restoration / short-word e
    "hopping": "hop", "hoping": "hope", "running": "run",
    "agreed": "agre",
    # 1c + step 2
    "happy": "happi", "consolingly": "consol",
    "luxuriously": "luxuri", "generously": "generous",
    # gener/commun/arsen R1 exception
    "generate": "generat", "generically": "generic",
    "communism": "communism",
    # step 3/4 chains (Porter2 differs from classic Porter here)
    "relational": "relat", "conditional": "condit",
    "rational": "ration",
    # 1a exceptions stop immediately
    "inning": "inning", "proceed": "proceed",
}


def test_english_porter2_vectors():
    from cuely_spark.snowball import english_snowball

    _check(ENGLISH, english_snowball)


def test_english_routing_is_porter2():
    from cuely_spark.stemmer import english_stem, stem_for_lang

    # Porter2 diverges from classic Porter on these; the routed
    # default must be Porter2 (what rust-stemmers runs)
    assert english_stem("dying") == "die"       # Porter: dy
    assert english_stem("skies") == "sky"       # Porter: ski
    assert stem_for_lang("dying", None) == "die"
    assert stem_for_lang("dying", "en") == "die"
