package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class LangIdSpec extends SparkSuite {

  test("detects the obvious language of real-language snippets") {
    import spark.implicits._
    val fixtures = Seq(
      ("en", "the cat sat on the mat and it was happy with this arrangement"),
      ("es", "el perro corre por la calle y no quiere volver a la casa"),
      ("fr", "le chien est dans la maison et il ne veut pas sortir pour le moment"),
      ("de", "der hund ist in dem haus und er will nicht mit der katze spielen"),
      ("zh", "这是一个中文句子我们在这里测试语言识别")
    ).toDF("expected", "text")
    val got = LangId.detect(fixtures, col("text"))
      .select("expected", "detected_lang").as[(String, String)].collect()
    got.foreach { case (want, detected) => assert(detected == want) }
  }

  test("score is in [0, 1] and positive for matched text") {
    import spark.implicits._
    val df = Seq(("x", "the of and to in is it")).toDF("id", "text")
    val s = LangId.detect(df, col("text")).select("lang_score").as[Double].head()
    assert(s > 0.9 && s <= 1.0)
  }
}
