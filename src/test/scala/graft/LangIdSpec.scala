package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.TextAnalysis

/** Accuracy fixture for the 31-language profile classifier: one sample
  * sentence per language (composed here, ordinary function words), each
  * must classify to its own language; plus 'und' and cross-script edges. */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples: Seq[(String, String)] = Seq(
    "en" -> "the cat is on the mat and the dog is here to stay",
    "de" -> "der hund und die katze ist nicht im haus, straße",
    "es" -> "el perro y los gatos, es una canción que me gusta, españa",
    "fr" -> "le chien est une belle créature, les oiseaux et des fleurs, ça va",
    "it" -> "il cane è per gli amici che di solito",
    "pt" -> "não é uma canção, os meninos, coração, são paulo",
    "nl" -> "het is een mooie dag, van de niet zo vrij, ijsberg",
    "sv" -> "och det är att vara på, många år",
    "da" -> "og det er ikke af den største",
    "no" -> "og det er av den på fjellet",
    "fi" -> "ja se on ei ole hyvää päivää, kukka kakku",
    "pl" -> "to nie jest łatwe, żółty, węże często",
    "cs" -> "to je se řeka, před, ještě, něco",
    "sk" -> "to je sa veľmi, môže, ľudia, vôbec",
    "hu" -> "az ember és a nem tudja, erős, gyűrű",
    "ro" -> "și el este în casă, viață, țară",
    "tr" -> "bu bir ve güzel gün, ılık, dağ, aşk",
    "id" -> "yang dan di rumah itu besar sekali",
    "vi" -> "của chúng tôi và các bạn, người, ế",
    "ca" -> "els nens amb la pilota, és col·legi",
    "ru" -> "привет мир это хорошо сегодня",
    "uk" -> "це дуже добре, їжак, є, українська, ґанок",
    "bg" -> "това е българският език, ъгъл, къща",
    "el" -> "αυτό είναι ένα καλό παράδειγμα",
    "ar" -> "هذا مثال جيد للغة العربية",
    "he" -> "זו דוגמה טובה לשפה העברית",
    "hi" -> "यह एक अच्छा उदाहरण है",
    "th" -> "นี่คือตัวอย่างที่ดี",
    "ja" -> "これは良い例です、日本語のテキスト",
    "ko" -> "이것은 좋은 예입니다 한국어",
    "zh" -> "这是一个很好的例子中文文本")

  test("every language sample classifies to its own language") {
    val df = samples.zipWithIndex.map { case ((lang, text), i) =>
      (i.toLong, lang, text)
    }.toDF("doc_id", "expected", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val wrong = samples.zipWithIndex.flatMap { case ((lang, text), i) =>
      val (pred, score) = got(i.toLong)
      if (pred != lang) Some(s"$lang -> $pred (score $score): $text") else None
    }
    assert(wrong.isEmpty, s"misclassified:\n${wrong.mkString("\n")}")
    assert(got.values.forall(_._2 > 0))
  }

  test("no profile hits yields 'und' with score 0") {
    val df = Seq((0L, "12345 @@@ ???"), (1L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("und", 0L), ("und", 0L)))
  }

  test("covers 31 languages and the profile is what the oracle mirrors") {
    assert(TextAnalysis.Langs.size == 31)
    assert(samples.map(_._1).toSet == TextAnalysis.Langs.toSet)
    // the duck and spark score expressions differ ONLY in the regexp form
    val sSpark = TextAnalysis.langScoreSql("ja", "t", duck = false)
    val sDuck = TextAnalysis.langScoreSql("ja", "t", duck = true)
    assert(sDuck.replace(", '', 'g')", ", '')") == sSpark)
  }
}
