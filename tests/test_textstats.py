"""Language-ID marker scoring: obvious snippets per language classify
correctly, empty/markerless text returns 'und', ties break first-wins
in LANG_MARKERS order (the oracle SQL mirrors all three properties —
it is generated from the same dict, __spark_entry__._langid_sql)."""

from __future__ import annotations

from sagan_spark.ops.textstats import LANG_MARKERS, lang_id

SNIPPETS = {
    "en": "the cat sat on the mat and most of it was in the sun",
    "de": "der hund und die katze sind nicht mit dem vogel auf der wiese",
    "fr": "le chien et les chats sont dans la maison pour la nuit",
    "es": "el perro y los gatos que viven en una casa por la noche",
    "it": "il cane che corre per la strada non sono una cosa rara",
    "pt": "os gatos que vivem com uma familia para sempre mais felizes",
    "nl": "de hond en het paard zijn niet voor een dag met ons mee",
}


def test_langid_classifies_obvious_snippets(spark):
    rows = [(lang, text) for lang, text in SNIPPETS.items()]
    rows.append(("und", "zzz qqq xxx"))
    rows.append(("und", ""))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.pred_lang for r in lang_id(docs).collect()}
    assert got == {lang: lang for lang in SNIPPETS} | {"und": "und"}


def test_langid_tie_breaks_first_wins(spark):
    # 'le' (fr) and 'el' (es) each appear once -> equal scores
    # (same marker length); fr precedes es in LANG_MARKERS
    langs = list(LANG_MARKERS)
    assert langs.index("fr") < langs.index("es")
    docs = spark.createDataFrame([("t", "qq le qq el qq")], ["doc_id", "text"])
    got = lang_id(docs).collect()[0]
    assert got.pred_lang == "fr"
