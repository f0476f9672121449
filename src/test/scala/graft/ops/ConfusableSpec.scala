package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

/** Homoglyph confusable-fold pins: the skeleton mapping, ASCII
  * pass-through, surrogate safety, and the dedup composition the
  * kernel exists for (folded groups catch lookalike twins that plain
  * exact dedup is blind to). */
class ConfusableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fold(s: String): String =
    Kernels.confusableFold(UTF8String.fromString(s)).toString

  test("Cyrillic/Greek/fullwidth lookalikes fold to their ASCII skeletons") {
    assert(fold("рауреal сom") === "paypeal com") // Cyrillic р а у с о
    assert(fold("Αpple Βank") === "Apple Bank")   // Greek Α Β
    assert(fold("ｆｒｅｅ ｍｏｎｅｙ！") === "free money!") // fullwidth
    assert(fold("Ехample") === "Example")          // Cyrillic Е х
  }

  test("ASCII and unmapped codepoints pass through; surrogate pairs survive") {
    val ascii = "The quick brown fox 123 !@#"
    assert(fold(ascii) === ascii)
    assert(fold("žluťoučký kůň") === "žluťoučký kůň") // unmapped Latin-ext
    val emoji = "ok 😀 а" // non-BMP + one Cyrillic а
    assert(fold(emoji) === "ok 😀 a")
  }

  test("fold is idempotent and inverts the confuse direction over the whole table") {
    // every source folds to an ASCII target whose re-fold is itself
    for ((src, tgt) <- Kernels.confusablePairs) {
      val s = new String(Character.toChars(src))
      val t = new String(Character.toChars(tgt))
      assert(fold(s) === t, s"fold(U+${src.toHexString})")
      assert(fold(t) === t, "targets are fixed points")
    }
  }

  test("dedup composition: folded grouping pairs lookalike twins; plain exact dedup is blind") {
    import spark.implicits._
    val docs = Seq(
      (1L, "free money here"),
      (2L, "ｆｒｅｅ ｍｏｎｅｙ ｈｅｒｅ"), // fullwidth twin
      (3L, "frее monеy hеrе"),             // Cyrillic е twin
      (4L, "different text entirely")).toDF("doc_id", "text")
    val foldedGroups = docs
      .groupBy(md5(lower(graft.functions.GraftFunctions.confusableFold(col("text")))).as("k"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .collect().map(_.getSeq[Long](1)).toSet
    assert(foldedGroups === Set(Seq(1L, 2L, 3L)))
    val plainGroups = Dedup.exact(docs, col("text"), col("doc_id"))
      .filter(col("cluster_size") >= 2).count()
    assert(plainGroups === 0L, "plain exact dedup must be homoglyph-blind")
  }
}
