package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact edit-distance pair matching — the fuzzy half of entity
  * resolution (near-identical names, titles, product codes, URLs),
  * complementing the set-similarity funnels in [[Dedup]] which are
  * blind to character-level edits that shred token sets.
  *
  * Candidate generation is segment blocking (public: Li, Deng, Feng,
  * "PassJoin: a partition-based method for similarity joins",
  * PVLDB 2011): partition every string into `maxDist + 1` contiguous
  * segments; by pigeonhole over the optimal alignment, any string
  * within edit distance d of it contains at least one segment as an
  * EXACT substring, starting within ±d of the segment's position (and
  * the two lengths differ by at most d). So candidates are found by a
  * key-EQUALITY join — `(target_len, segment_idx, segment_text)`
  * against substrings the probe side enumerates for lengths within ±d
  * and starts within ±d — never a cartesian product, never a
  * similarity predicate in the join condition. Levenshtein with an
  * early-exit threshold then verifies exactly; the funnel has NO
  * false negatives for strings of at least `maxDist + 1` characters
  * (shorter strings carry no information at that radius — screen them
  * upstream; the funnel documents, not hides, that contract).
  *
  * 100 TB shape: the probe explosion is O((2d+1)²·(d+1)) rows per
  * string — constant for fixed d — and every downstream step is a
  * key-equality shuffle. `bucketCap` is the standard skew insurance
  * (same trade as the LSH funnels): a segment shared by more than
  * `cap` strings (a constant prefix in machine-generated keys) is
  * dropped from BLOCKING — pairs whose every other segment also
  * exceeds the cap are lost, which the caller fixes by stripping the
  * constant prefix, not by an uncapped quadratic join. */
object EditDistance {

  private def segStart(len: Column, k: Int, d: Int): Column =
    (floor(len * lit(k) / lit(d + 1)) + 1).cast(IntegerType)
  private def segLen(len: Column, k: Int, d: Int): Column =
    (floor(len * lit(k + 1) / lit(d + 1)) -
      floor(len * lit(k) / lit(d + 1))).cast(IntegerType)

  /** All unordered pairs `(id_a, id_b, dist)` with
    * `levenshtein ≤ maxDist`, ids ordered `id_a < id_b`. Both sides
    * restricted to strings of ≥ `maxDist + 1` chars (see object doc). */
  def editPairs(df: DataFrame, str: Column, id: Column, maxDist: Int,
      bucketCap: Int = 100000): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val d = maxDist
    val base = df.filter(str.isNotNull)
      .select(id.as("id"), str.as("s"), length(str).as("len"))
      .filter(col("len") >= d + 1)
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("id"))

    // target role: the d+1 segments of every string, keyed by length
    val segs = base.select(col("id").as("tid"), col("len").as("tl"),
      explode(array((0 to d).map(k => struct(lit(k).as("k"),
        substring(col("s"), segStart(col("len"), k, d),
          segLen(col("len"), k, d)).as("seg"))): _*)).as("g"))
      .select(col("tid"), col("tl"), col("g.k"), col("g.seg"))
      .filter(length(col("seg")) >= 1)

    // probe role: for every target length within ±d and every segment,
    // the substrings at the segment's position shifted by ±d
    val probeStructs = for {
      dl <- -d to d
      k <- 0 to d
      shift <- -d to d
    } yield {
      val tl = col("len") + lit(dl)
      val pos = (segStart(tl, k, d) + lit(shift)).cast(IntegerType)
      val sl = segLen(tl, k, d)
      struct(tl.cast(IntegerType).as("tl"), lit(k).as("k"),
        pos.as("pos"), sl.as("sl"),
        substring(col("s"), pos, sl).as("sub"))
    }
    val probes = base.select(col("id").as("pid"), col("len").as("pl"),
      explode(array(probeStructs: _*)).as("g"))
      .select(col("pid"), col("pl"), col("g.tl"), col("g.k"),
        col("g.pos"), col("g.sl"), col("g.sub"))
      .filter(col("tl") >= d + 1 && col("pos") >= 1 && col("sl") >= 1 &&
        col("pos") + col("sl") - 1 <= col("pl") &&
        length(col("sub")) === col("sl"))
      .select(col("pid"), col("tl"), col("k"), col("sub")).distinct()

    val cand = Dedup.dropOversizedBuckets(segs, Seq("tl", "k", "seg"), bucketCap)
      .join(Dedup.dropOversizedBuckets(probes, Seq("tl", "k", "sub"), bucketCap)
          .withColumnRenamed("sub", "seg"), Seq("tl", "k", "seg"))
      .filter(col("tid") =!= col("pid"))
      .select(least(col("tid"), col("pid")).as("id_a"),
        greatest(col("tid"), col("pid")).as("id_b"))
      .distinct()

    val a = base.select(col("id").as("id_a"), col("s").as("__sa"),
      col("len").as("__la"))
    val b = base.select(col("id").as("id_b"), col("s").as("__sb"),
      col("len").as("__lb"))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .filter(abs(col("__la") - col("__lb")) <= d)
      // threshold variant early-exits the DP once the distance is
      // provably > d (returns -1 there)
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), d))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist").cast(LongType).as("dist"))
  }
}
