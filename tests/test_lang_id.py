"""Language-ID breadth (functions/text.lang_id r6): Unicode-block script
detection for non-Latin scripts, kana-over-han precedence, the script
threshold keeping mostly-Latin text with the stopword vote, and the
widened 7-language tables."""

from __future__ import annotations

from ganda_spark.functions.text import lang_id


def _guess(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [r.lang_guess for r in lang_id(df).orderBy("doc_id").collect()]


def test_scripts_resolve(spark):
    got = _guess(
        spark,
        [
            "Это русский текст для проверки",      # Cyrillic
            "这是中文测试文档",                      # Han only
            "هذا نص عربي للاختبار",                 # Arabic
            "これは日本語のテストです",               # kana (+ no han)
            "日本語のテスト 漢字も含む",              # kana + han → ja, not zh
            "한국어 테스트 문장입니다",               # Hangul
            "Ελληνικό κείμενο δοκιμής",             # Greek
            "עברית טקסט לבדיקה",                    # Hebrew
            "हिन्दी परीक्षण पाठ",                     # Devanagari
            "ทดสอบข้อความภาษาไทย",                  # Thai
        ],
    )
    assert got == ["ru", "zh", "ar", "ja", "ja", "ko", "el", "he", "hi", "th"]


def test_script_threshold_keeps_latin_with_vote(spark):
    """A couple of CJK chars inside an English sentence must NOT flip the
    guess: script chars are under a quarter of the Latin count."""
    got = _guess(
        spark,
        [
            "the cat and the dog went to the market 汉字",
            "der Hund ist nicht mit der Katze 字",
        ],
    )
    assert got == ["en", "de"]


def test_widened_stopword_tables(spark):
    got = _guess(
        spark,
        [
            "il gatto non è per che sono della casa",     # it
            "o gato não é um problema com mais dos",      # pt
            "het huis is van niet op voor met aan dat",   # nl
            "xyzzy plugh qwertzuiop",                     # no hits → und
        ],
    )
    assert got == ["it", "pt", "nl", "und"]


def test_tie_breaks_alphabetical(spark):
    """'est' votes for fr only; 'es' votes for es only; a word in neither
    table scores zero — equal single-hit votes resolve alphabetically."""
    # 'de' appears in no table (removed from es/pt to avoid confusion with
    # the German code); craft a genuine tie: 'la' (fr) vs 'las' (es)
    got = _guess(spark, ["la las"])
    assert got == ["es"]  # h_es == h_fr == 1 → alphabetical ascending
