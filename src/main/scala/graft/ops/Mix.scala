package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Token-budget data mixing: compose a training corpus from weighted
  * sources by keeping, per source, the prefix of a DETERMINISTIC
  * shuffle whose cumulative token count fits that source's budget —
  * the "N billion tokens of web, M of code" recipe step every LLM
  * data pipeline ends with.
  *
  * Determinism contract (same posture as [[Sampling]]): the shuffle
  * order is md5(id · seed) — reproducible across runs, cluster sizes,
  * and retries, and portable across engines (hex strings compare
  * identically everywhere), so a mix is an auditable function of
  * (corpus, budgets, seed), not of task scheduling. Changing the seed
  * re-rolls the mix; growing the corpus only displaces docs at the
  * budget boundary.
  *
  * One window over one shuffle on `source`; token counts ride along
  * from a map-side projection. A source's docs sort by the hash, the
  * running token sum cuts at the budget.
  */
object Mix {

  /** Kept rows: id, source, n_tokens, cum_tokens (≤ the source's
    * budget). `budgets` overrides `defaultBudget` per source name. */
  /** THE engine-portable order/selection hash: lowercase
    * md5hex(UTF-8 bytes of "<id>#<seed>"). Every operator that needs
    * a cross-engine-reproducible order or fractional selection
    * ([[build]], [[upsample]], [[Sampling.bernoulliPortable]],
    * [[Pack]]) MUST use this one definition — the concat format,
    * binary cast, and hex case are load-bearing for the DuckDB
    * oracles (`md5(CAST(id AS VARCHAR) || '#<seed>')`) and for every
    * persisted layout/index keyed by it. */
  def ordHash(id: Column, seed: Long): Column =
    md5(concat(id.cast(StringType), lit("#" + seed)).cast(BinaryType))

  def build(docs: DataFrame, text: Column, id: Column, source: Column,
      defaultBudget: Long, budgets: Map[String, Long] = Map.empty,
      seed: Long = 0L): DataFrame = {
    // resolve against the projected names so caller column names
    // (whatever they are) can't leak into the window/filter
    val ord = ordHash(col("doc_id"), seed)
    val w = Window.partitionBy(col("source"))
      .orderBy(ord.asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (src, b)) => when(col("source") === src, b).otherwise(acc)
    }
    // null text would ride along with NULL n_tokens (sum ignores it,
    // so it ties its predecessor's cum and passes the filter) — a
    // token-budget mix has no place for unmeasurable docs; screen
    // them here, surface them upstream via Curate's "invalid" stage
    docs
      .filter(text.isNotNull)
      .select(id.as("doc_id"), source.as("source"),
        size(Dedup.tokens(text)).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** 32 hex digits of `frac` (⌊frac·16³²⌋, zero-padded) — the string
    * threshold for deterministic fractional selection: u(doc) < frac
    * ⟺ md5hex(doc·seed) < hexThreshold(frac), comparing lowercase
    * hex LEXICOGRAPHICALLY. No numeric hash conversion anywhere, so
    * the predicate is portable verbatim to any engine with md5.
    * Public: [[Sampling.bernoulliPortable]] and oracle SQL builders
    * embed the same literal. */
  def hexThreshold(frac: Double): String = {
    require(frac >= 0 && frac <= 1, s"fraction out of [0,1]: $frac")
    if (frac >= 1.0) "g" // every 32-hex-digit string sorts below this
    else {
      // exact java.math arithmetic: scala.BigDecimal multiplies under
      // DECIMAL128 (34 sig digits) and would round the threshold ~1e-14
      // off the value the oracle SQL writes as a literal
      val bi = new java.math.BigDecimal(frac)
        .multiply(new java.math.BigDecimal(
          java.math.BigInteger.ONE.shiftLeft(128)))
        .toBigInteger
      val s = bi.toString(16)
      "0" * (32 - s.length) + s
    }
  }

  /** Temperature-scaled source weights (public recipe: Conneau &
    * Lample 2019's multilingual sampling; the Gopher/PaLM mixture
    * table): weight_i = n_i^α / Σ_j n_j^α over per-source token counts.
    * α = 1 keeps natural proportions, α = 0 is uniform, the usual
    * 0.2–0.7 range lifts small sources without letting them dominate.
    * Output one row per source: (source, src_tokens, weight rounded 6,
    * budget = ⌊totalBudget · weight⌋) — budgets derive from the ROUNDED
    * weight so the allocation is engine-portable verbatim.
    *
    * One map-side-combined aggregate over the corpus; the normalizing
    * sum is an unpartitioned window over the per-SOURCE rows (a
    * handful), not the corpus. */
  def temperatureBudgets(docs: DataFrame, text: Column, source: Column,
      totalBudget: Long, alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"temperature alpha out of [0,1]: $alpha")
    require(totalBudget > 0, "totalBudget must be positive")
    docs.filter(text.isNotNull)
      .select(source.as("source"),
        size(Dedup.tokens(text)).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("src_tokens"))
      .withColumn("__p", pow(col("src_tokens").cast("double"), alpha))
      .withColumn("weight",
        round(col("__p") / sum("__p").over(Window.partitionBy()), 6))
      .withColumn("budget", floor(lit(totalBudget) * col("weight")).cast("long"))
      .drop("__p")
  }

  /** [[build]] with per-source budgets ALLOCATED by temperature
    * ([[temperatureBudgets]]) instead of passed in: "spend B total
    * tokens across sources at temperature α" as one declarative plan.
    * Two corpus passes by construction — the allocation needs global
    * counts before any row can be kept — but the first is a
    * map-side-combined count and its result joins back as a broadcast
    * (rows = #sources). Same determinism contract as [[build]]. */
  def buildTemperature(docs: DataFrame, text: Column, id: Column,
      source: Column, totalBudget: Long, alpha: Double,
      seed: Long = 0L): DataFrame = {
    val alloc = broadcast(
      temperatureBudgets(docs, text, source, totalBudget, alpha)
        .select(col("source"), col("budget")))
    val ord = ordHash(col("doc_id"), seed)
    val w = Window.partitionBy(col("source"))
      .orderBy(ord.asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .filter(text.isNotNull)
      .select(id.as("doc_id"), source.as("source"),
        size(Dedup.tokens(text)).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(alloc, Seq("source"))
      .filter(col("cum_tokens") <= col("budget"))
      .select("doc_id", "source", "n_tokens", "cum_tokens")
  }

  /** Deterministic upsampling (the "epochs per source" half of a data
    * mix — e.g. 3.5 epochs of wikipedia, 1.0 of web): each doc emits
    * `epoch` rows 1..⌈f⌉, the fractional last epoch kept only for the
    * hash-selected frac(f) of docs. Selection is md5(id · seed) —
    * reproducible across runs/retries/engines, and independent of the
    * epoch number, so raising f from 2.5 to 2.7 only ADDS docs to the
    * last epoch (nested, mix-stable). Explode-only, no shuffle. */
  def upsample(docs: DataFrame, id: Column, source: Column,
      defaultFactor: Double, factors: Map[String, Double] = Map.empty,
      seed: Long = 0L): DataFrame = {
    require(defaultFactor >= 0 && factors.values.forall(_ >= 0),
      "epoch factors must be non-negative")
    val factor = factors.foldLeft(lit(defaultFactor)) {
      case (acc, (src, f)) => when(col("source") === src, f).otherwise(acc)
    }
    val fracHex = factors.foldLeft(lit(hexThreshold(defaultFactor % 1))) {
      case (acc, (src, f)) =>
        when(col("source") === src, hexThreshold(f % 1)).otherwise(acc)
    }
    val h = ordHash(col("doc_id"), seed)
    docs
      .select(id.as("doc_id"), source.as("source"))
      .withColumn("epoch",
        // greatest(…, 1): sequence(1, 0) would DESCEND for factor 0;
        // the filter then drops the lone epoch-1 row (0 epochs = no rows)
        explode(sequence(lit(1), greatest(ceil(factor).cast("int"), lit(1)))))
      .filter(col("epoch") <= floor(factor) || h < fracHex)
  }
}
