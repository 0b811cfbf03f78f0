package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-search bucket expressions: equivalence with the linear
  * definition at 2k+ boundaries (codegen + interpreted), and the UTF-8
  * ordering contract that keeps driver-side boundary sorting consistent
  * with executor-side comparisons.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("BucketOfLong == #(boundaries <= key) across 2500 boundaries") {
    val bounds = (1 to 2500).map(_ * 7L).toArray // sorted
    val keys = (-10L to 18000L by 13L).toDF("k")
    val got = keys.select($"k", SearchOps.bucketOf($"k", bounds).as("b"))
      .as[(Long, Int)].collect()
    got.foreach { case (k, b) =>
      assert(b == bounds.count(_ <= k), s"key $k")
    }
  }

  test("BucketOfString matches UTF-8 boundary order, incl. supplementary chars") {
    // "😀" (U+1F600, 4-byte UTF-8 f0 9f 98 80) sorts BELOW
    // "�" in Java's UTF-16 order but ABOVE it in UTF-8 bytes —
    // Spark compares UTF-8, so utf8Ordering must too.
    val emoji = "😀"
    val repl = "￿"
    assert(Ordering.String.lt(emoji, repl), "UTF-16 order (sanity)")
    assert(Search.utf8Ordering.gt(emoji, repl), "UTF-8 order differs")

    val bounds = Array("apple", "mango", repl, emoji) // UTF-8 sorted
    assert(bounds.sorted(Search.utf8Ordering).toSeq == bounds.toSeq)
    val keys = Seq("aardvark", "apple", "kiwi", "zebra", repl, emoji).toDF("k")
    val got = keys.select($"k", SearchOps.bucketOfStr($"k", bounds).as("b"))
      .as[(String, Int)].collect().toMap
    assert(got("aardvark") == 0)
    assert(got("apple") == 1) // inclusive: boundary itself counts
    assert(got("kiwi") == 1)
    assert(got("zebra") == 2) // "zebra" < "￿" < emoji in UTF-8
    assert(got(repl) == 3)
    assert(got(emoji) == 4)
  }

  test("expression evaluates identically in codegen and interpreted modes") {
    val bounds = Array(10L, 20L, 30L)
    val df = Seq(5L, 10L, 15L, 30L, 99L).toDF("k")
      .select(SearchOps.bucketOf($"k", bounds).as("b"))
    val expected = Seq(0, 1, 1, 3, 3)
    withSQLConf("spark.sql.codegen.wholeStage" -> "true") {
      assert(df.as[Int].collect().toSeq == expected)
    }
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.as[Int].collect().toSeq == expected)
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
