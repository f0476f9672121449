package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Pins for the HTTP/1.x response parse kernel — one case per header
  * rule, one per malformed-input contract. */
class HttpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def parse(b: Array[Byte]): (Int, String, String, String, Int, Array[Byte]) = {
    val r = Kernels.httpResponse(b).asInstanceOf[GenericInternalRow]
    (r.getInt(0), r.get(1, null).asInstanceOf[UTF8String].toString,
      r.get(2, null).asInstanceOf[UTF8String].toString,
      r.get(3, null).asInstanceOf[UTF8String].toString,
      r.getInt(4), r.get(5, null).asInstanceOf[Array[Byte]])
  }

  test("status line, media type, charset param, body cut") {
    val p = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      "X-Other: 1\r\n\r\nbody bytes").getBytes(utf8)
    val (st, ct, hint, enc, nh, body) = parse(p)
    assert((st, ct, hint, enc, nh) === (200, "text/html", "utf-8", "", 2))
    assert(new String(body, utf8) === "body bytes")
  }

  test("malformed payloads are data: status 0, whole payload as body") {
    for (bad <- Seq("not http at all", "HTTP/1.1 abc OK\r\n\r\nx", "",
        // all-digit but Int-overflowing status: must be malformed
        // DATA, never a NumberFormatException out of the scan task
        "HTTP/1.1 99999999999 OK\r\n\r\nx",
        "HTTP/1.1 2147483648 OK\r\n\r\nx")) {
      val (st, ct, hint, enc, nh, body) = parse(bad.getBytes(utf8))
      assert((st, ct, hint, enc, nh) === (0, "", "", "", 0), s"in=$bad")
      assert(new String(body, utf8) === bad)
    }
    // 9 digits is the guard boundary: still parses as a number
    val (st9, _, _, _, _, _) = parse("HTTP/1.1 999999999 OK\r\n\r\nx".getBytes(utf8))
    assert(st9 === 999999999)
  }

  test("bare-LF line breaks tolerated; header names case-insensitive") {
    val p = "HTTP/1.0 404 NF\ncontent-TYPE: TEXT/Plain\n\nnope".getBytes(utf8)
    val (st, ct, hint, _, nh, body) = parse(p)
    assert((st, ct, hint, nh) === (404, "text/plain", "", 1))
    assert(new String(body, utf8) === "nope")
  }

  test("first Content-Type wins; quoted charset parameter unquotes") {
    val p = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"ISO-8859-1\"\r\n" +
      "Content-Type: image/png\r\n\r\nx").getBytes(utf8)
    val (_, ct, hint, _, nh, _) = parse(p)
    assert((ct, hint, nh) === ("text/html", "iso-8859-1", 2))
  }

  test("gzip Content-Encoding inflates; corrupt gzip keeps raw bytes") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("inflated!".getBytes(utf8)); gz.close()
    val good = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n").getBytes(utf8) ++
      bos.toByteArray
    val (_, _, _, enc1, _, b1) = parse(good)
    assert(enc1 === "gzip" && new String(b1, utf8) === "inflated!")
    val corrupt = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n").getBytes(utf8) ++
      Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)
    val (_, _, _, enc2, _, b2) = parse(corrupt)
    assert(enc2 === "gzip" && b2.length === 5)
  }

  test("meta-charset prescan fires only without a header charset, within 1 KiB") {
    val withMeta = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=EUC-JP\"></head>")
      .getBytes(utf8)
    assert(parse(withMeta)._3 === "euc-jp")
    val headerWins = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
      "<meta charset=\"euc-jp\">").getBytes(utf8)
    assert(parse(headerWins)._3 === "utf-8")
    val farMeta = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "x" * 1200 + "<meta charset=\"euc-jp\">").getBytes(utf8)
    assert(parse(farMeta)._3 === "")
  }

  test("headers-only payload (no blank line) parses with an empty body") {
    val (st, ct, _, _, nh, body) =
      parse("HTTP/1.1 204 No Content\r\nContent-Type: text/html".getBytes(utf8))
    assert((st, ct, nh) === (204, "text/html", 1))
    assert(body.length === 0)
  }

  test("SQL registration matches the kernel") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    Seq("HTTP/1.1 200 OK\r\nContent-Type: a/b; charset=x\r\n\r\nZ")
      .toDF("t").select(col("t").cast("binary").as("p"))
      .createOrReplaceTempView("http_in")
    val r = spark.sql("SELECT graft_http_response(p).status AS s, " +
      "graft_http_response(p).charset_hint AS h FROM http_in").collect().head
    assert((r.getInt(0), r.getString(1)) === (200, "x"))
  }
}
