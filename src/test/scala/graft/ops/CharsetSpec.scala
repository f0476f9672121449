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

  private def decodeHint(bytes: Array[Byte], hint: String): (String, String) = {
    import spark.implicits._
    val r = Seq((bytes, hint)).toDF("payload", "hint")
      .select(graft.functions.GraftFunctions
        .charsetDecodeHint(col("payload"), col("hint")).as("d"))
      .select("d.charset", "d.text")
      .head()
    (r.getString(0), r.getString(1))
  }

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

  test("UTF-32 BOMs check before their UTF-16 prefixes; misaligned falls through") {
    assert(decode(b(0xFF, 0xFE, 0x00, 0x00) ++ "Ωk".getBytes("UTF-32LE")) ===
      (("utf-32le", "Ωk", 12L)))
    assert(decode(b(0x00, 0x00, 0xFE, 0xFF) ++ "Ωk".getBytes("UTF-32BE")) ===
      (("utf-32be", "Ωk", 12L)))
    // FF FE 00 00 with a non-multiple-of-4 body is UTF-16LE whose
    // first char is NUL — the r10 shadowing bug read the aligned case
    // as UTF-16LE with interleaved NULs
    assert(decode(b(0xFF, 0xFE, 0x00, 0x00) ++ "k ".getBytes("UTF-16LE"))._1
      === "utf-16le")
  }

  test("Shift_JIS and EUC-JP are found by byte structure with no hint") {
    val jp = "これは日本語の文章です。東京都渋谷区。"
    assert(decode(jp.getBytes("Shift_JIS")) ===
      (("shift_jis", jp, jp.getBytes("Shift_JIS").length.toLong)))
    assert(decode(jp.getBytes("EUC-JP")) ===
      (("euc-jp", jp, jp.getBytes("EUC-JP").length.toLong)))
    // half-width katakana via SS2 mixed with zenkaku text still reads
    // euc-jp (pure SS2 runs are byte-identical to valid Shift_JIS
    // pairs — there the tie goes to precedence, one more family
    // ambiguity the hint contract covers)
    val mixed = "これはﾃｽﾄです。日本語"
    assert(decode(mixed.getBytes("EUC-JP"))._1 === "euc-jp")
  }

  test("below-threshold CJK evidence stays windows-1252") {
    // two accidental Shift_JIS pairs (curly quotes + letters) — cp1252
    // is the safer verdict at this evidence level
    assert(decode(b(0x93, 0x41, 0x94, 0x80))._1 === "windows-1252")
  }

  test("declared hints resolve the structurally-ambiguous EUC/GB/Big5 family") {
    val kr = "한국어 텍스트 문서입니다 감사합니다"
    val zhS = "这是一份中文文档内容测试"
    val zhT = "這是一份中文文檔內容測試"
    assert(decodeHint(kr.getBytes("EUC-KR"), "euc-kr") === (("euc-kr", kr)))
    assert(decodeHint(zhS.getBytes("GBK"), "GB2312") === (("gbk", zhS)))
    assert(decodeHint(zhT.getBytes("Big5"), "big5") === (("big5", zhT)))
    // without a hint the EUC-family precedence calls these euc-jp /
    // gbk-family — the documented ambiguity the hint contract exists for
    assert(decodeHint(kr.getBytes("EUC-KR"), "")._1 === "euc-jp")
  }

  test("latin-1 declarations map to windows-1252 per the web platform") {
    val bytes = "café €5".getBytes("windows-1252")
    assert(decodeHint(bytes, "latin-1") === (("windows-1252", "café €5")))
    assert(decodeHint(bytes, "ISO-8859-1")._1 === "windows-1252")
  }

  test("lying declarations lose: strict UTF-8 beats the header; failed strict decode falls back") {
    val utf8 = "café Ωμέγα".getBytes("UTF-8")
    assert(decodeHint(utf8, "shift_jis")._1 === "utf-8")
    val cp = "word café".getBytes("windows-1252") // trailing 0xE9: GBK pair truncates
    assert(decodeHint(cp, "gbk") === (("windows-1252", "word café")))
    assert(decodeHint(cp, "no-such-charset")._1 === "windows-1252")
  }

  test("ISO-2022-JP: ESC-shift structure beats the pure-ASCII verdict") {
    val jp = "headline これは日本語 tail"
    assert(decode(jp.getBytes("ISO-2022-JP")) === (("iso-2022-jp", jp,
      jp.getBytes("ISO-2022-JP").length.toLong)))
    // a lone ESC without a shift intro stays ascii; garbage after a
    // shift intro refuses the JIS reading rather than desyncing
    assert(decode(b(0x41, 0x1B, 0x42))._1 === "ascii")
    assert(decode(b(0x41, 0x1B, '$', 0x01))._1 === "ascii")
  }

  test("cjk fixture round-trips every variant") {
    val txt = "plain words"
    for (id <- 0L to 17L) {
      val (payload, hint) = Ingest.charsetCjkFixture(id, txt)
      val (cs, text) = decodeHint(payload, hint)
      val expected = (id % 9) match {
        case 0 => ("utf-8", txt + " café")
        case 1 => ("shift_jis", txt + " 日本語テキスト")
        case 2 => ("euc-jp", txt + " 日本語テキスト")
        case 3 => ("euc-kr", txt + " 한국어 텍스트")
        case 4 => ("gbk", txt + " 中文文本")
        case 5 => ("big5", txt + " 中文測試")
        case 6 => ("windows-1252", txt + " café")
        case 7 => ("windows-1252", txt + " café")
        case _ => ("iso-2022-jp", txt + " 日本語テキスト")
      }
      assert((cs, text) === expected, s"id=$id")
    }
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
