"""The vendored lang-id model (ops/langid_data.py) classifies real
running prose in every covered language — including the hard
near-neighbor pairs (cs/sk, da/no, es/pt/ca, ru/uk) — and stays
'und' on uncovered input.  Sentences are ordinary encyclopedic prose
written in each language (lowercased: the table's documented casing
contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sagan_spark.ops.langid_data import (
    LANGID_TOKENS,
    langid_weight_rows,
    load_langid_weights,
)
from sagan_spark.ops.textstats import lang_id

SENTENCES = {
    "en": "the history of the city is told in the books that were "
          "written by those who lived there at the time",
    "de": "die geschichte der stadt wird in den büchern erzählt die "
          "von den menschen geschrieben wurden die damals dort lebten",
    "fr": "l'histoire de la ville est racontée dans les livres qui "
          "ont été écrits par ceux qui vivaient là à cette époque",
    "es": "la historia de la ciudad se cuenta en los libros que "
          "fueron escritos por los que vivían allí en esa época",
    "pt": "a história da cidade é contada nos livros que foram "
          "escritos por aqueles que viviam lá naquela época e não só",
    "it": "la storia della città è raccontata nei libri che sono "
          "stati scritti da coloro che vivevano lì in quel periodo",
    "nl": "de geschiedenis van de stad wordt verteld in de boeken "
          "die zijn geschreven door de mensen die er toen woonden",
    "sv": "stadens historia berättas i de böcker som har skrivits av "
          "dem som bodde där på den tiden och inte av andra",
    "da": "byens historie bliver fortalt i de bøger som er skrevet "
          "af dem der boede der på det tidspunkt og ikke af andre",
    "no": "byens historie blir fortalt i de bøkene som er skrevet av "
          "dem som bodde der på den tiden og ikke av andre",
    "fi": "kaupungin historia kerrotaan kirjoissa jotka on "
          "kirjoittanut ne jotka asuivat siellä siihen aikaan mutta "
          "ei kukaan muu ja se on niin hyvä että kaikki lukevat sen",
    "pl": "historia miasta jest opowiedziana w książkach które "
          "zostały napisane przez tych którzy tam wtedy mieszkali i "
          "nie przez innych ale to jest dla nas bardzo ważne",
    "cs": "historie města je vyprávěna v knihách které byly napsány "
          "těmi kteří tam v té době žili a podle nich to také bylo",
    "sk": "história mesta je rozprávaná v knihách ktoré boli "
          "napísané tými ktorí tam v tom čase žili a podľa nich to "
          "tiež bolo a sú pre nás dôležité",
    "ro": "istoria orașului este povestită în cărțile care au fost "
          "scrise de cei care au trăit acolo în acea perioadă și nu "
          "de alții dar este pentru noi mai importantă",
    "hu": "a város története azokban a könyvekben van elmesélve "
          "amelyeket azok írtak akik akkor ott éltek és nem mások "
          "de ez még csak az egyik része a történetnek",
    "tr": "şehrin tarihi o dönemde orada yaşayanlar tarafından "
          "yazılan kitaplarda anlatılır ve bu çok önemli bir konu "
          "olarak her zaman daha fazla ilgi görür ama ne kadar",
    "id": "sejarah kota ini diceritakan dalam buku yang ditulis oleh "
          "mereka yang tinggal di sana pada waktu itu dan tidak oleh "
          "orang lain karena ini adalah hal yang penting untuk kita",
    "ca": "la història de la ciutat és explicada en els llibres que "
          "van ser escrits per aquells que hi vivien en aquella "
          "època i no per altres però és més important per a la seva gent",
    "vi": "lịch sử của thành phố được kể trong những cuốn sách do "
          "những người đã sống ở đó vào thời điểm này viết ra và "
          "không phải của người khác",
    "ru": "история города рассказана в книгах которые были написаны "
          "теми кто жил там в то время а не другими и это для нас так важно",
    "uk": "історія міста розказана в книгах які були написані тими "
          "хто жив там у той час але не іншими і це для нас також важливо",
    "el": "η ιστορία της πόλης λέγεται στα βιβλία που γράφτηκαν από "
          "αυτούς που ζούσαν εκεί εκείνη την εποχή και είναι για μας σημαντική",
    "ar": "تاريخ المدينة يُروى في الكتب التي كتبها الذين كانوا "
          "يعيشون هناك في ذلك الوقت وهو من أهم ما كتب عن هذا",
    "he": "ההיסטוריה של העיר מסופרת בספרים אשר נכתבו על ידי אלה "
          "אשר חיו שם באותה תקופה והיא לא רק זה אלא גם כל מה שהיה",
    "hi": "शहर का इतिहास उन किताबों में बताया गया है जो उस समय वहाँ "
          "रहने वाले लोगों ने लिखी थीं और यह हमारे लिए बहुत ही खास है",
}


def test_vendored_rows_shape():
    rows = langid_weight_rows()
    assert len(rows) == sum(len(v) for v in LANGID_TOKENS.values())
    assert len(LANGID_TOKENS) == 26
    # weights are rank-banded positive milli-units, (token, lang) unique
    assert all(w > 0 for _, _, w in rows)
    assert len({(t, l) for t, l, _ in rows}) == len(rows)


def test_vendored_langid_real_sentences(spark):
    docs = spark.createDataFrame(
        [(i, lang, s) for i, (lang, s) in enumerate(sorted(SENTENCES.items()))],
        "doc_id long, want string, text string",
    )
    got = lang_id(docs, marker_weights=load_langid_weights(spark))
    joined = docs.join(got, "doc_id").select("want", "pred_lang").collect()
    wrong = [(r["want"], r["pred_lang"]) for r in joined
             if r["want"] != r["pred_lang"]]
    assert not wrong, f"misclassified: {wrong}"


def test_vendored_langid_und_on_uncovered(spark):
    docs = spark.createDataFrame(
        [(0, "zzz qqq xxyy 12345"), (1, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(
        docs, marker_weights=load_langid_weights(spark)).collect()}
    assert got == {0: "und", 1: "und"}
