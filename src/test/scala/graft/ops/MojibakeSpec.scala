package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

/** Pins for the mojibake repair kernel: each damage class one case,
  * each refusal rule one case, plus idempotence and the SQL
  * registration. */
class MojibakeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def moji(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))

  test("pure ASCII passes through with zero rounds") {
    assert(Kernels.mojibakeFixStr("plain ascii text.") ===
      ("plain ascii text.", 0))
    assert(Kernels.mojibakeFixStr("") === ("", 0))
  }

  test("legitimate accents are not altered (strict decode fails)") {
    for (s <- Seq("café", "naïve — résumé", "l’élan ’quote’ 20€",
        "señor Müller às"))
      assert(Kernels.mojibakeFixStr(s) === (s, 0), s"s=$s")
  }

  test("single mojibake repairs in one round") {
    val orig = "café résumé — l’élan 20€"
    assert(Kernels.mojibakeFixStr(moji(orig)) === (orig, 1))
  }

  test("double mojibake repairs in two rounds") {
    val orig = "déjà vu"
    assert(Kernels.mojibakeFixStr(moji(moji(orig))) === (orig, 2))
  }

  test("cp1252 punctuation region round-trips (0x80-0x9F)") {
    // every char in the euro/quote block whose UTF-8 bytes avoid the
    // five UNDEFINED cp1252 positions survives the trip; '”' (U+201D,
    // UTF-8 ..9D) hits undefined 0x9D — a cp1252 decoder renders it
    // U+FFFD, the information is destroyed, and the repair correctly
    // refuses rather than guessing (separate assertion below)
    val orig = "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“•–—˜™š›œžŸ"
    assert(Kernels.mojibakeFixStr(moji(orig)) === (orig, 1))
    val lossy = moji("”")
    assert(lossy === "â€�")
    assert(Kernels.mojibakeFixStr(lossy) === (lossy, 0))
  }

  test("chars outside cp1252's image refuse the repair") {
    val s = "日本語 Ã© mixed"
    assert(Kernels.mojibakeFixStr(s) === (s, 0))
  }

  test("truncated lead byte refuses the repair") {
    // Ã alone maps to byte C3 with no continuation — invalid UTF-8
    assert(Kernels.mojibakeFixStr("Ã") === ("Ã", 0))
    assert(Kernels.mojibakeFixStr("ends with Ã") === ("ends with Ã", 0))
  }

  test("repair is idempotent") {
    val fixed = Kernels.mojibakeFixStr(moji(moji("déjà vu — 20€")))._1
    assert(Kernels.mojibakeFixStr(fixed) === (fixed, 0))
  }

  test("latin-1 misdecodes (C1 controls) repair too") {
    // Í = C3 8D; 8D is undefined in cp1252 and decodes to the C1
    // control U+008D — the reverse table must map it back
    val orig = "ÍSLAND Ísafjörður"
    val garbled = new String(
      orig.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Kernels.mojibakeFixStr(garbled) === (orig, 1))
  }

  test("Column API and SQL registration agree with the kernel") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val garbled = moji("café — l’élan")
    val viaCol = Seq(garbled).toDF("t")
      .select(TextOps.mojibakeFix(col("t")).as("f"))
      .select(col("f.text"), col("f.rounds"))
      .collect().head
    assert((viaCol.getString(0), viaCol.getInt(1)) ===
      Kernels.mojibakeFixStr(garbled))
    val viaSql = Seq(garbled).toDF("t").createOrReplaceTempView("moji_in")
    val r = spark.sql(
      "SELECT graft_mojibake_fix(t).text AS x, graft_mojibake_fix(t).rounds AS n FROM moji_in")
      .collect().head
    assert((r.getString(0), r.getInt(1)) === Kernels.mojibakeFixStr(garbled))
  }
}
