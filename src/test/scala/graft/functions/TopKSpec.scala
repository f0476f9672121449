package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bounded top-k heap buffer: ordering contract
  * (score desc, id asc, NaN ranks worst — the double total order of the
  * sort-by-struct(-score, id) formulation it replaced), O(k) bound,
  * merge, and the shuffle serialization roundtrip. */
class TopKSpec extends AnyFunSuite {

  def drain(b: TopKBuffer): Seq[(Double, Long)] = {
    val arr = b.toSortedArrayData
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getDouble(0), r.getLong(1))
    }
  }

  /** reference: sort all offered rows by the contract, take k. */
  def naive(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortWith { case ((sa, ia), (sb, ib)) =>
      val c = java.lang.Double.compare(-sa, -sb)
      if (c != 0) c < 0 else ia < ib
    }.take(k)

  // deterministic pseudo-random stream (no RNG state)
  def mix(i: Long): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("heap matches naive sort-take on a deterministic stream with ties") {
    val rows = (0 until 5000).map { i =>
      // coarse scores force plenty of ties → id tie-break exercised
      ((mix(i).toDouble % 100) / 10.0, mix(i * 7) % 1000)
    }
    val b = new TopKBuffer(25)
    rows.foreach { case (s, id) => b.offer(s, id) }
    assert(drain(b) === naive(rows, 25))
  }

  test("NaN scores rank worst; -0.0 sorts below 0.0") {
    val rows = Seq((Double.NaN, 1L), (0.0, 2L), (-0.0, 3L), (1.0, 4L), (Double.NaN, 0L))
    val b = new TopKBuffer(3)
    rows.foreach { case (s, id) => b.offer(s, id) }
    assert(drain(b) === Seq((1.0, 4L), (0.0, 2L), (-0.0, 3L)))
  }

  test("merge of partial heaps == single heap over the union") {
    val rows = (0 until 2000).map(i => ((mix(i) % 1000).toDouble, i.toLong))
    val (l, r) = rows.splitAt(700)
    val a = new TopKBuffer(10); l.foreach { case (s, id) => a.offer(s, id) }
    val c = new TopKBuffer(10); r.foreach { case (s, id) => c.offer(s, id) }
    a.absorb(c)
    assert(drain(a) === naive(rows, 10))
  }

  test("serialize/deserialize roundtrip preserves contents") {
    val b = new TopKBuffer(8)
    (0 until 100).foreach(i => b.offer((mix(i) % 50).toDouble, i.toLong))
    val back = TopKBuffer.fromBytes(8, b.toBytes)
    assert(drain(back) === drain(b))
  }

  test("fewer rows than k returns them all, sorted") {
    val b = new TopKBuffer(10)
    b.offer(1.0, 5L); b.offer(3.0, 1L); b.offer(2.0, 9L)
    assert(drain(b) === Seq((3.0, 1L), (2.0, 9L), (1.0, 5L)))
  }
}
