package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL surface for the engine's custom Catalyst expressions — the
  * `SparkSessionExtensions` hook, so a pure-SQL user (or a JDBC/
  * Thrift client with no Scala in sight) gets the same codegen'd
  * kernels the Column API uses:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   SELECT graft_simhash64(text), graft_jaccard(a, b) FROM docs
  * }}}
  *
  * For an already-built session, [[GraftExtensions.register]] adds
  * the same functions to its registry in place. Integer parameters
  * (gram size, hash count, …) must be literals — they parameterize
  * codegen, not per-row values.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an INTEGER literal, got $other")
  }

  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getName, name)

  /** (sql name, info, builder) for every exposed kernel. */
  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("graft_simhash64", info("graft_simhash64", classOf[SimHash64]),
        es => SimHash64(es.head)),
      ("graft_word_gram_hashes",
        info("graft_word_gram_hashes", classOf[WordGramHashes]),
        es => WordGramHashes(es.head, intLit(es(1), "graft_word_gram_hashes", 1))),
      ("graft_char_ngram_hashes",
        info("graft_char_ngram_hashes", classOf[CharNgramHashes]),
        es => CharNgramHashes(es.head, intLit(es(1), "graft_char_ngram_hashes", 1))),
      ("graft_minhash_sig", info("graft_minhash_sig", classOf[MinHashSig]),
        es => MinHashSig(es.head, intLit(es(1), "graft_minhash_sig", 1))),
      ("graft_jaccard", info("graft_jaccard", classOf[JaccardSim]),
        es => JaccardSim(es.head, es(1))),
      ("graft_containment", info("graft_containment", classOf[ContainmentSim]),
        es => ContainmentSim(es.head, es(1))),
      ("graft_cosine", info("graft_cosine", classOf[CosineSim]),
        es => CosineSim(es.head, es(1))),
      ("graft_quantize_q8", info("graft_quantize_q8", classOf[QuantizeQ8]),
        es => QuantizeQ8(es.head)),
      ("graft_cosine_q8", info("graft_cosine_q8", classOf[CosineSimQ8]),
        es => CosineSimQ8(es.head, es(1))),
      ("graft_winnow", info("graft_winnow", classOf[WinnowFingerprints]),
        es => WinnowFingerprints(es.head, intLit(es(1), "graft_winnow", 1),
          intLit(es(2), "graft_winnow", 2))),
      ("graft_rolling_hash", info("graft_rolling_hash", classOf[RollingHash]),
        es => RollingHash(es.head)),
      ("graft_text_stats", info("graft_text_stats", classOf[TextStatsCounts]),
        es => TextStatsCounts(es.head)),
      ("graft_repetition_stats",
        info("graft_repetition_stats", classOf[RepetitionStats]),
        es => RepetitionStats(es.head)))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
