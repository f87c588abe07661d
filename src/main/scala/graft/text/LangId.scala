package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification — function-word scoring plus a CJK
  * character-range signal, the classic lightweight n-gram/stopword approach
  * (public technique; cf. Cavnar & Trenkle "N-Gram-Based Text
  * Categorization", 1994).
  *
  * Built entirely from codegen'd built-ins (split / higher-order filter /
  * struct array_max): the whole detector is one narrow projection, no
  * shuffle, no UDF — it streams at parquet-scan speed over any corpus size.
  *
  * Scoring: for each candidate language, evidence = number of tokens that
  * are function words of that language (+ CJK character count for zh);
  * detected_lang = argmax, ties broken deterministically by language code
  * (max struct comparison: score first, then code).
  */
object LangId {

  val functionWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "it", "you", "that",
      "was", "for", "on", "are", "with", "as", "this"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "se",
      "no", "por", "con", "para", "los", "las"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est",
      "en", "que", "qui", "dans", "pour", "ce", "il"),
    "de" -> Seq("der", "die", "das", "und", "ist", "in", "den", "von", "zu",
      "mit", "sich", "des", "auf", "ein", "eine", "nicht"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这",
      "中", "大", "来", "上", "国")
  )

  /** Append `detected_lang` (string) and `lang_score` (double in [0,1]:
    * winning evidence / token count) to `df`.
    */
  def detect(df: DataFrame, text: Column): DataFrame = {
    val toks = split(lower(text), "\\s+")
    val nToks = greatest(size(toks), lit(1))

    def tokenScore(lang: String): Column = {
      val words = array(functionWords(lang).map(lit): _*)
      size(filter(toks, t => array_contains(words, t)))
    }
    // CJK text rarely whitespace-tokenizes; count Han characters directly.
    val cjkChars = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))

    val scored = functionWords.keys.toSeq.sorted.map { lang =>
      val s = if (lang == "zh") tokenScore(lang) + cjkChars else tokenScore(lang)
      struct(s.cast("long").as("score"), lit(lang).as("code"))
    }
    val best = array_max(array(scored: _*))
    df.withColumn("detected_lang", best.getField("code"))
      .withColumn("lang_score",
        best.getField("score").cast("double") / nToks.cast("double"))
  }
}
