package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge pins for the charset sniff/decode kernel — each case isolates
  * one rule of the contract (BOM dispatch, strict RFC 3629 rejection
  * classes, the windows-1252 fallback). */
class CharsetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def decode(bytes: Array[Byte]): (String, String, Long) = {
    import spark.implicits._
    val r = Seq(Tuple1(bytes)).toDF("payload")
      .select(graft.functions.GraftFunctions.charsetDecode(col("payload")).as("d"))
      .select("d.charset", "d.text", "d.n_bytes")
      .head()
    (r.getString(0), r.getString(1), r.getLong(2))
  }

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("pure 7-bit is ascii; any valid multibyte upgrades to utf-8") {
    assert(decode("hello".getBytes("US-ASCII")) === (("ascii", "hello", 5L)))
    assert(decode("café".getBytes("UTF-8")) === (("utf-8", "café", 5L)))
  }

  test("4-byte sequences decode (emoji); above U+10FFFF rejects") {
    assert(decode(b(0xF0, 0x9F, 0x98, 0x80)) === (("utf-8", "😀", 4L)))
    val (cs, _, _) = decode(b(0xF4, 0x90, 0x80, 0x80)) // U+110000
    assert(cs === "windows-1252")
  }

  test("strict rejection classes all fall back to windows-1252") {
    assert(decode(b(0xC0, 0x80))._1 === "windows-1252") // overlong NUL
    assert(decode(b(0xED, 0xA0, 0x80))._1 === "windows-1252") // surrogate
    assert(decode(b(0x41, 0x80))._1 === "windows-1252") // stray continuation
    assert(decode(b(0x41, 0xE9))._1 === "windows-1252") // truncated lead
  }

  test("windows-1252 specials decode via the real table, not latin-1") {
    // 0x93/0x94 are curly quotes, 0x80 is the euro sign in cp1252
    assert(decode(b(0x93, 0x41, 0x94, 0x80)) ===
      (("windows-1252", "“A”€", 4L)))
  }

  test("UTF-8 BOM strips; n_bytes keeps the BOM; bad body falls back") {
    val body = "hi café".getBytes("UTF-8")
    assert(decode(b(0xEF, 0xBB, 0xBF) ++ body) ===
      (("utf-8-bom", "hi café", (3 + body.length).toLong)))
    assert(decode(b(0xEF, 0xBB, 0xBF, 0xE9))._1 === "windows-1252")
  }

  test("UTF-16 both endiannesses; odd body length refuses the BOM") {
    assert(decode(b(0xFF, 0xFE) ++ "Ωk".getBytes("UTF-16LE")) ===
      (("utf-16le", "Ωk", 6L)))
    assert(decode(b(0xFE, 0xFF) ++ "Ωk".getBytes("UTF-16BE")) ===
      (("utf-16be", "Ωk", 6L)))
    assert(decode(b(0xFF, 0xFE, 0x41))._1 === "windows-1252")
  }

  test("fixture round-trips every variant") {
    for (id <- 0L to 9L) {
      val (cs, text, n) = decode(Ingest.charsetFixture(id, "plain words"))
      val expected = (id % 5) match {
        case 0 => ("ascii", "plain words")
        case 1 => ("utf-8", "plain words café Ωμέγα")
        case 2 => ("utf-8-bom", "plain words café Ωμέγα")
        case 3 => ("utf-16le", "plain words café Ωμέγα")
        case _ => ("windows-1252", "plain words café")
      }
      assert((cs, text) === expected, s"id=$id")
      assert(n === Ingest.charsetFixture(id, "plain words").length.toLong)
    }
  }
}
