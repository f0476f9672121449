package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property checks for the round-7 kernels against
  * independent brute-force twins — the pattern the blocked/approx
  * operators use for recall self-checks, applied to exact kernels:
  * any divergence is a bug, not a tuning issue. */
class KernelPropertiesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic property loop (TimeSpec's offline-cache bridge). */
  def forAll[A](ga: Gen[A], n: Int = 150)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      f(ga.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val smallText: Gen[String] =
    Gen.listOfN(40, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
  private val patSet: Gen[List[String]] =
    Gen.listOfN(4, Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))

  test("property: AC hit/match counts equal the brute end-position scan") {
    forAll(Gen.zip(smallText, patSet)) { case (text, pats0) =>
      val pats = pats0.distinct.toArray
      val bs = new java.util.BitSet(pats.length)
      val ac = new Kernels.AcAutomaton(pats)
      val hits = ac.run(text, bs)
      var brute = 0L
      val matched = Array.fill(pats.length)(false)
      for (pi <- pats.indices; end <- pats(pi).length to text.length)
        if (text.regionMatches(end - pats(pi).length, pats(pi), 0,
            pats(pi).length)) {
          brute += 1; matched(pi) = true
        }
      assert(hits === brute, s"text='$text' pats=${pats.mkString(",")}")
      assert(bs.cardinality() === matched.count(identity))
    }
  }

  test("property: WARC roundtrip over arbitrary binary payloads") {
    val payloads = Gen.listOfN(3,
      Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
          .map(_.toArray)))
    forAll(payloads, n = 80) { ps =>
      val recs = ps.zipWithIndex.map { case (p, i) =>
        (Map("WARC-Type" -> s"t$i",
          "WARC-Target-URI" -> s"http://x/$i"), p)
      }
      val parsed = graft.ops.Codecs.parseWarc(
        graft.ops.Codecs.encodeWarc(recs)).get
      assert(parsed.size === ps.size)
      parsed.zip(ps).zipWithIndex.foreach { case ((r, p), i) =>
        assert(r.warcType === s"t$i")
        assert(java.util.Arrays.equals(r.payload, p),
          s"payload $i mismatch")
      }
    }
  }

  test("property: unicodeNormalize matches Normalizer and is idempotent") {
    val uniText: Gen[String] = Gen.listOfN(20, Gen.frequency(
      6 -> Gen.alphaChar,
      2 -> Gen.oneOf('\u0301', '\u0308', '\u030A'),
      1 -> Gen.oneOf('\u00e9', '\u00e5', '\ufb01', '\uff21'),
      1 -> Gen.const(' '))).map(_.mkString)
    forAll(uniText) { t =>
      Seq("NFC", "NFKC").foreach { form =>
        val f = java.text.Normalizer.Form.valueOf(form)
        val got = Kernels.unicodeNormalize(
          UTF8String.fromString(t), form).toString
        assert(got === java.text.Normalizer.normalize(t, f), s"form=$form")
        assert(Kernels.unicodeNormalize(
          UTF8String.fromString(got), form).toString === got)
      }
    }
  }

  test("property: span interval merge equals the position-set brute force") {
    import spark.implicits._
    // random docs over a 3-word vocab with n=2 grams: heavy overlap,
    // the worst case for the gap-and-islands merge
    val docGen = Gen.listOfN(4,
      Gen.choose(4, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))))
    forAll(docGen, n = 25) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = graft.ops.Spans
        .duplicatedSpans(df, col("text"), col("doc_id"), n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // brute force: covered position set per doc, then island scan
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val gramOwners = scala.collection.mutable.Map
        .empty[(String, String), scala.collection.mutable.Set[Long]]
      toks.foreach { case (id, ts) =>
        ts.sliding(2).foreach { g =>
          if (g.length == 2)
            gramOwners.getOrElseUpdate((g(0), g(1)),
              scala.collection.mutable.Set.empty) += id
        }
      }
      val expect = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      toks.foreach { case (id, ts) =>
        val covered = scala.collection.mutable.Set.empty[Int]
        ts.sliding(2).zipWithIndex.foreach { case (g, i) =>
          if (g.length == 2) {
            val owners = gramOwners((g(0), g(1)))
            if (owners.size > 1 && owners.min != id) {
              covered += (i + 1); covered += (i + 2)
            }
          }
        }
        val sorted = covered.toSeq.sorted
        var start = -1; var prev = -10
        (sorted :+ Int.MaxValue).foreach { p =>
          if (p != prev + 1) {
            if (start > 0) expect += ((id, start.toLong, (prev - start + 1).toLong))
            start = p
          }
          prev = p
        }
      }
      assert(got === expect.toSet, s"docs=$docs")
    }
  }

  test("property: deflateLen equals a fresh Deflater's output length") {
    forAll(smallText, n = 60) { t =>
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      assert(Kernels.deflateLen(UTF8String.fromString(t)) === total)
    }
  }

  test("property: rangeBucket equals the brute cut count and preserves order") {
    // pieces deliberately straddle the UTF-16/UTF-8 order divergence:
    // U+FFFD and U+E000 sort AFTER supplementary-plane codepoints in
    // codepoint (UTF8String) order but BEFORE them in UTF-16 code-unit
    // order — the divergence that broke the r12 cut-sketch sort
    val key = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "z", "é", " ",
        "�", "", "😀", "𐀀")).map(_.mkString))
    val row = Gen.zip(key, Gen.choose(0L, 50L))
    val gen = Gen.zip(Gen.listOfN(12, row), Gen.listOfN(40, row))
    forAll(gen, n = 100) { case (cutList, rows) =>
      // cuts must be ascending in the (binary key, id) total order —
      // UTF8String.compareTo IS Spark's binary string order
      val cuts = cutList.distinct
        .sortWith((a, b) =>
          UTF8String.fromString(a._1).compareTo(UTF8String.fromString(b._1)) < 0 ||
            (a._1 == b._1 && a._2 < b._2))
      val ck = cuts.map(c => UTF8String.fromString(c._1)).toArray
      val ci = cuts.map(_._2).toArray
      def brute(k: String, id: Long): Int = cuts.count { case (cKing, cId) =>
        val c = UTF8String.fromString(cKing).compareTo(UTF8String.fromString(k))
        c < 0 || (c == 0 && cId <= id)
      }
      val got = rows.map { case (k, id) =>
        Kernels.rangeBucket(UTF8String.fromString(k), id, ck, ci) }
      assert(got === rows.map { case (k, id) => brute(k, id) })
      // order preservation: sorting rows by (key, id) never decreases bucket
      val sorted = rows.distinct.sortWith((a, b) =>
        UTF8String.fromString(a._1).compareTo(UTF8String.fromString(b._1)) < 0 ||
          (a._1 == b._1 && a._2 < b._2))
      val bs = sorted.map { case (k, id) =>
        Kernels.rangeBucket(UTF8String.fromString(k), id, ck, ci) }
      assert(bs === bs.sorted, s"bucket assignment not order-preserving: $bs")
    }
  }

  test("property: CountByValue serialize/deserialize/merge round-trips any key mix") {
    val anyKey: Gen[Any] = Gen.oneOf(
      Gen.choose(-5.0, 5.0).map(d => d: Any),
      Gen.oneOf("", "a", "zz", "é café", " nul").map(s =>
        UTF8String.fromString(s): Any))
    val gen = Gen.listOfN(60, anyKey)
    // one agg per key TYPE (dataType drives the serializer)
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{DoubleType, StringType}
    forAll(gen, n = 60) { keys =>
      for ((tpe, isStr) <- Seq((DoubleType, false), (StringType, true))) {
        val agg = CountByValue(Literal.default(tpe))
        val subset = keys.filter {
          case _: UTF8String => isStr
          case _ => !isStr
        }
        val (h1, h2) = subset.splitAt(subset.length / 2)
        def fill(xs: Seq[Any]) = {
          val b = agg.createAggregationBuffer()
          xs.foreach(k => b.put(k, b.getOrDefault(k, 0L) + 1L))
          b
        }
        val merged = agg.merge(
          agg.deserialize(agg.serialize(fill(h1))),
          agg.deserialize(agg.serialize(fill(h2))))
        val expect = subset.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
        import scala.jdk.CollectionConverters._
        assert(merged.asScala.toMap === expect)
      }
    }
  }

  test("property: BoundedCollect == sorted-prefix of the full collection, any split/merge order") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val entry = Gen.zip(Gen.choose(0L, 20L), Gen.choose(-4.0, 4.0))
    val gen = Gen.zip(Gen.listOfN(50, entry), Gen.choose(1, 12),
      Gen.choose(1, 49), Gen.oneOf(false, true))
    forAll(gen, n = 80) { case (rows, cap, splitAt, distinct) =>
      val agg = graft.functions.BoundedCollect(
        Literal.default(LongType), Literal.default(DoubleType), cap, distinct)
      def fill(xs: Seq[(Long, Double)]) = {
        val b = agg.createAggregationBuffer()
        xs.foreach { case (k, v) => b.add(k, v, 1L) }
        b
      }
      // split arbitrarily, serialize both halves, merge — the capped
      // result must be the cap-prefix of the FULL sorted collection
      val (h1, h2) = rows.splitAt(splitAt)
      val merged = agg.merge(
        agg.deserialize(agg.serialize(fill(h1))),
        agg.deserialize(agg.serialize(fill(h2))))
      val got = merged.toArrayData.array.toSeq
      // distinct mode dedupes (sortKey, payload) ENTRIES (SetT passes
      // the value for both, making it distinct-values)
      val full =
        if (distinct) rows.distinct.sorted.map(_._2)
        else rows.sorted.map(_._2)
      assert(got === full.take(cap),
        s"cap=$cap distinct=$distinct split=$splitAt")
    }
  }

  test("CountByValue admits only atomic keys (hash-stable representations)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    // arrays/structs/binary hash by representation or identity, so
    // logically-equal keys could split across map entries — rejected
    for (bad <- Seq(ArrayType(DoubleType), BinaryType,
        StructType(Seq(StructField("a", LongType)))))
      assert(!CountByValue(Literal.default(bad)).checkInputDataTypes().isSuccess,
        s"$bad must be rejected")
    for (ok <- Seq(DoubleType: DataType, StringType, LongType, BooleanType,
        DateType, TimestampType))
      assert(CountByValue(Literal.default(ok)).checkInputDataTypes().isSuccess,
        s"$ok must be accepted")
  }
}
