"""Porter stemmer vectors (full-algorithm outputs; the 1980 paper's
per-step examples adjusted where a later step reduces further, e.g.
step 4 takes different->differ, electric->electr)."""

from cuely_spark.stemmer import porter_stem as s


def test_porter_vectors():
    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit",
        "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ",
        "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
        "running": "run", "flies": "fli", "merge": "merg",
        "tables": "tabl", "windowing": "window",
    }
    bad = {w: (s(w), e) for w, e in vectors.items() if s(w) != e}
    assert not bad, bad


def test_porter_non_alpha_passthrough():
    assert s("c++") == "c++"
    assert s("a1b2") == "a1b2"
    assert s("of") == "of"


# ---------------------------------------------------------------------------
# language-routed stemming (reference: stemmer selected by detected
# language with English fallback, text_field.rs:294-326)

def test_light_stemmers_cross_inflection():
    from cuely_spark.stemmer import (
        detect_lang,
        french_stem,
        german_stem,
        spanish_stem,
        stem_for_lang,
    )

    assert german_stem("katzen") == german_stem("katze")
    assert german_stem("hauses") == german_stem("haus")
    assert french_stem("chanter") == french_stem("chantes") \
        == french_stem("chante")
    assert french_stem("chansons") == french_stem("chanson")
    assert spanish_stem("gatos") == spanish_stem("gato") \
        == spanish_stem("gata")
    assert spanish_stem("corriendo") == spanish_stem("correr")
    # unknown language falls back to English Porter
    assert stem_for_lang("running", "xx") == "run"
    assert stem_for_lang("running", None) == "run"
    assert detect_lang(["die", "katzen", "sind"]) == "de"
    assert detect_lang(["les", "chansons", "et"]) == "fr"
    assert detect_lang(["zzz", "qqq"]) == "en"  # no signal -> fallback


def test_lang_routed_index_recall(spark, tmp_path):
    """Cross-inflection recall per language on a routed index: the
    query's stem (explicit lang or detected) meets the doc's stem."""
    import numpy as np

    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    rows = [
        (0, "die katzen sind hier", "de"),
        (1, "the cats are here", "en"),
        (2, "les chansons chantes", "fr"),
        (3, "los gatos correr", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "routed")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                rows_per_segment=10, num_jobs=1, stem=True,
                stem_lang_col="lang")
    r = IndexReader(spark, out)
    assert r.stats["stem_lang_col"] == "lang"

    def ids(q, **kw):
        return set(r.search(q, k=10, dtype=np.float64, **kw)
                   .select("doc_id").toPandas()["doc_id"])

    # inflected query term never appears literally — only the routed
    # stem shadow can match it
    assert ids("katze", lang="de") == {0}
    assert ids("cat", lang="en") == {1}
    assert ids("chante", lang="fr") == {2}
    assert ids("gato", lang="es") == {3}
    # detection: German markers route the stemmer without explicit lang
    assert 0 in ids("die katze")
    # wrong-language routing must NOT find the German doc ("katze" under
    # Porter stems to "katz" too? no: porter keeps "katze" -> "katz"? it
    # strips final e only when measure allows; assert behaviour is
    # language-dependent for a pair where stems differ
    assert ids("corriendo", lang="es") == {3}   # corr == stem(correr)


def test_lang_routed_batch_spec(spark, tmp_path):
    """search_many specs carry per-query lang for routed stemming."""
    import numpy as np

    from cuely_spark.indexer import build_index
    from cuely_spark.queryengine import IndexReader

    rows = [(0, "die katzen sind hier", "de"),
            (1, "the cats are here", "en")]
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, lang string")
    out = str(tmp_path / "routed_batch")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                rows_per_segment=10, num_jobs=1, stem=True,
                stem_lang_col="lang")
    r = IndexReader(spark, out)
    res = r.search_many({"de_q": {"q": "katze", "lang": "de"},
                         "en_q": {"q": "cat", "lang": "en"}},
                        k=10, dtype=np.float64).collect()
    by_q = {}
    for row in res:
        by_q.setdefault(row["query"], set()).add(row["doc_id"])
    assert by_q == {"de_q": {0}, "en_q": {1}}
