package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  def build(docs: DataFrame, text: Column, id: Column, source: Column,
      defaultBudget: Long, budgets: Map[String, Long] = Map.empty,
      seed: Long = 0L): DataFrame = {
    // resolve against the projected names so caller column names
    // (whatever they are) can't leak into the window/filter
    val ord = md5(concat(col("doc_id").cast("string"), lit("#" + seed))
      .cast("binary"))
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
}
