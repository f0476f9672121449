package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Large-scale deduplication operators over a documents table.
  *
  * All variants are single-pass + shuffles on derived keys (content
  * hash, LSH band, fingerprint chunk) — the only shape that survives
  * 100 TB. Nothing collects to the driver; candidate generation is
  * always a key-equality join (never cartesian); candidate pairs are
  * deduplicated BEFORE the exact-verification join so each pair pays
  * the set-similarity check once; and every LSH family takes an
  * explicit per-bucket cap as skew insurance (a pathological bucket of
  * B docs would otherwise mint B² candidates on one shuffle key).
  */
object Dedup {

  /** Exact duplicates: one shuffle on the content hash. Returns one row
    * per distinct content with its cluster size and the kept (minimum)
    * id — the standard "keep first, drop rest" contract. */
  def exact(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(md5(text.cast(BinaryType)).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("cluster_size"))

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Paragraph-level boilerplate pruning (the C4/RefinedWeb cleaning
    * step): drop every paragraph (split on blank lines) whose EXACT
    * text recurs in at least `minRepeats` documents corpus-wide —
    * navigation chrome, subscribe footers, cookie banners — and
    * reconstruct each document from its surviving paragraphs in
    * original order. Returns (doc_id, cleaned, n_paras, n_pruned);
    * docs whose every paragraph is boilerplate survive with empty
    * text (pruning must not silently delete documents).
    *
    * Shape: explode → one aggregate on paragraph text (count per
    * distinct paragraph is tiny output) → broadcast-or-shuffle join
    * back → one aggregate on doc_id with an in-order array_sort
    * reconstruction. Paragraph recurrence counts DOCUMENTS, not
    * occurrences (array_distinct before the count-side explode), so a
    * doc repeating its own paragraph doesn't self-boilerplate. */
  def paragraphPrune(docs: DataFrame, text: Column, id: Column,
      minRepeats: Int): DataFrame = {
    val paras = docs.select(id.as("doc_id"),
      F.posexplode(split(text, "\n\\s*\n")).as(Seq("idx", "para")))
    val boiler = docs
      .select(explode(array_distinct(split(text, "\n\\s*\n"))).as("para"))
      .groupBy("para").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minRepeats)
      .withColumn("__boiler", lit(1))
    paras
      .join(boiler.select("para", "__boiler"), Seq("para"), "left")
      .groupBy("doc_id")
      .agg(
        array_join(
          F.transform(
            array_sort(collect_list(
              when(col("__boiler").isNull, struct(col("idx"), col("para"))))),
            s => s.getField("para")),
          "\n\n").as("cleaned"),
        count(lit(1)).as("n_paras"),
        sum(coalesce(col("__boiler"), lit(0))).as("n_pruned"))
  }

  /** Word k-shingles of a text column (array of strings). */
  /** Word k-shingles, duplicates kept — the fused codegen kernel
    * ([[graft.functions.Kernels.wordShingles]]): the previous
    * transform(sequence, i => concat_ws(slice(tokens(text), …)))
    * Column tree re-evaluated the SPLIT per output gram when
    * interpreted (higher-order functions are CodegenFallback), i.e.
    * O(tokens²) per document on every shingle projection of the dedup
    * family. Null text still yields [""] (the concat_ws(null) rule the
    * oracle restates), handled in the wrapper because the kernel is
    * null-intolerant. */
  def shingles(text: Column, k: Int): Column =
    when(text.isNull, array(lit("")))
      .otherwise(graft.functions.GraftFunctions.wordShingles(text, k))

  /** Distinct character n-grams of a whitespace-normalized, lowercased
    * text column — fused kernel
    * ([[graft.functions.Kernels.charNgramsDistinct]]; the Column tree
    * re-ran the regexp_replace + lower per gram position, O(len²)
    * interpreted). Null text still yields [null] (substr-of-null per
    * position, distinct'd), handled in the wrapper. */
  def charNgrams(text: Column, n: Int): Column =
    when(text.isNull, array(lit(null).cast(StringType)))
      .otherwise(graft.functions.GraftFunctions.charNgramsDistinct(text, n))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum XXH64 over the element set — a custom codegen
    * expression ([[graft.functions.MinHashSig]]): one fused loop per
    * row instead of numHashes × |elems| interpreted lambda calls. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    graft.functions.GraftFunctions.minhashSig(sh, numHashes)

  /** Exact Jaccard similarity of two array columns (set semantics),
    * as a custom codegen expression ([[graft.functions.JaccardSim]]). */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.jaccardSim(a, b)

  /** (doc_id, elems, sig, n) signature table — shared by the inline
    * funnel and the persisted index. `n` is SET cardinality (the
    * size-ratio guard's invariant j >= t ⟹ |A|/|B| ∈ [t, 1/t] only
    * holds for distinct counts; shingles() keeps duplicates, so a
    * repetitive doc would otherwise be silently dropped against its
    * compact twin). */
  private def signatureTable(docsKeyed: DataFrame, numHashes: Int,
      elemsDistinct: Boolean): DataFrame = {
    val card = if (elemsDistinct) size(col("elems"))
               else size(array_distinct(col("elems")))
    docsKeyed
      .withColumn("sig", minhashSignature(col("elems"), numHashes))
      .withColumn("n", card)
  }

  /** Band explosion of a signature table: one (doc_id, n, band, bh) row
    * per band, bh = xxhash64 of the band's signature slice. Reading
    * from a STORED signature table, upstream column pruning keeps the
    * (wide) elems column out of this scan. */
  private def bandTable(sigTable: DataFrame, bands: Int, rows: Int): DataFrame =
    sigTable.select(col("doc_id"), col("n"),
      posexplode(F.transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bh")))

  /** The shared verification funnel: signature-estimate prefilter
    * (skipped when the margin covers the whole range) then exact
    * Jaccard over element sets, both via key-equality joins against
    * `lookup` (doc_id, sig, elems). */
  /** Every array-carrying verify join is SHUFFLE_HASH with the O(n)
    * per-doc side as the build: bare candidate pairs stream through
    * the probes and collapse to scores inside the stage, so rows
    * carrying signature/element arrays are never sorted or buffered
    * (the sort-merge plan this replaces spilled 6.6 GB at the m=64
    * scale point purely sorting candidates+array payload). */
  private def verifyCandidates(cands: DataFrame, lookup: DataFrame,
      numHashes: Int, threshold: Double): DataFrame = {
    val margin = 4.0 * math.sqrt(threshold * (1 - threshold) / numHashes)
    val likely =
      if (threshold - margin <= 0) cands
      else {
        val est = graft.functions.GraftFunctions.sigMatch(col("sig_a"), col("sig_b"))
        cands
          .join(lookup.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
            .hint("SHUFFLE_HASH"), Seq("id_a"))
          .join(lookup.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
            .hint("SHUFFLE_HASH"), Seq("id_b"))
          .filter(est >= threshold - margin)
          .select("id_a", "id_b")
      }
    likely
      .join(lookup.select(col("doc_id").as("id_a"), col("elems").as("e_a"))
        .hint("SHUFFLE_HASH"), Seq("id_a"))
      .join(lookup.select(col("doc_id").as("id_b"), col("elems").as("e_b"))
        .hint("SHUFFLE_HASH"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("e_a"), col("e_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Banded-LSH near-duplicate pairs over an element-set column
    * (`doc_id`, `elems`), exact-verified. The full scale funnel:
    *
    *  1. signature table (doc_id, elems, sig, |elems|), persisted —
    *     it feeds candidate generation AND both verification joins;
    *  2. band explosion → per-bucket count → drop buckets over
    *     `bucketCap` (skew insurance: a pathological bucket of B docs
    *     would mint B² pairs on one shuffle key);
    *  3. self-join on (band, hash) with a SIZE-RATIO guard — j ≥ t
    *     forces |A|/|B| ∈ [t, 1/t], so wildly different-sized docs
    *     never materialize as pairs;
    *  4. distinct (id_a, id_b) — each pair verified once, not once per
    *     colliding band;
    *  5. signature-estimate prefilter: est = (matching minhash
    *     components)/H ≈ j with σ = √(j(1−j)/H); pairs below
    *     t − 4σ are discarded after a 2·H-long join instead of paying
    *     the full element-set join. Crucial when the corpus background
    *     similarity sits near the band knee (candidate volume is
    *     driven by the background, not the threshold);
    *  6. exact Jaccard over the element sets for the survivors.
    */
  /** Scrub corpus-scale elements before signatures: an element in
    * more than `frac` of the corpus (floor 16 docs) is boilerplate —
    * a cookie banner, a license footer, a shared template — and
    * carries no identity signal, but it places ALL its docs in each
    * other's near-dup range: n docs sharing a 38-word tail at
    * pairwise Jaccard just above the threshold mint a Θ(n²) truth
    * set. Dropping those elements makes the truth set (and thus any
    * correct engine's cost) near-linear again; the hot list is
    * bounded by Σ|elems| / (frac·n) entries — independent of corpus
    * size — so it travels as an InSet literal. Docs whose elems are
    * ALL boilerplate drop out entirely (no identity left to match).
    * Every engagement is recorded in [[Ledger]]. */
  /** Returns the scrubbed (doc_id, elems) plan plus the persisted
    * input handle the CALLER must unpersist once its own downstream
    * cache has materialized — an eager checkpoint here would pin a
    * corpus-sized RDD in the block manager for the session's life
    * (storage `clearCache()` does not reap checkpoints), which
    * measurably poisons every later job's memory. */
  private def scrubHotElems(docsKeyed: DataFrame,
      frac: Double): (DataFrame, DataFrame) = {
    val keyed = docsKeyed.persist()
    val n = keyed.count()
    val cap = math.max(16L, math.ceil(frac * n).toLong)
    val hot = keyed
      .select(explode(array_distinct(col("elems"))).as("e"))
      .groupBy("e").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap)
      .collect().map(_.get(0))
    Ledger.note("minhash_hot_elems",
      s"scrubbed ${hot.length} corpus-scale elems (df > $cap of $n docs)")
    val out =
      if (hot.isEmpty) keyed
      else {
        val hotSet = hot.toSeq
        keyed.select(col("doc_id"),
            F.filter(col("elems"), e => !e.isInCollection(hotSet)).as("elems"))
          .filter(size(col("elems")) > 0)
      }
    (out, keyed)
  }

  /** Optional per-doc candidate budget, shared by every pair funnel: a
    * doc in more than `cap` candidate pairs is in a near-dup CLIQUE
    * (boilerplate, template flood) where the pair list is quadratic by
    * construction. Each doc KEEPS a deterministic id-ordered slice of
    * `cap` candidates in each endpoint role, and a pair survives if
    * EITHER endpoint keeps it — total candidate volume is then
    * ≤ 2·n·cap (globally linear) and every doc with any candidate
    * keeps at least one, so cluster connectivity survives; the pairs
    * LIST is what's truncated, and the truncation is ledgered.
    * `cap <= 0` (the default everywhere) disables the budget. */
  private[ops] def capCandidatesPerDoc(cands: DataFrame, cap: Int,
      tag: String): DataFrame =
    if (cap <= 0) cands
    else {
      val kept = cands
        .withColumn("__ra", row_number().over(
          Window.partitionBy("id_a").orderBy("id_b")))
        .withColumn("__rb", row_number().over(
          Window.partitionBy("id_b").orderBy("id_a")))
        .filter(col("__ra") <= cap || col("__rb") <= cap)
        .select("id_a", "id_b")
        .persist()
      val nKept = kept.count()
      Ledger.note(s"${tag}_per_doc_cap",
        s"candidate budget $cap/doc kept $nKept pairs")
      kept
    }

  /** CONTRACT NOTE — `materialize = false` keeps the returned PLAN
    * lazy, but the opt-in `hotElemFrac` / `perDocCap` knobs run eager
    * driver actions regardless (a count + collect / a count + persist):
    * the scrub must SEE corpus-wide dfs and the budget must ledger what
    * it kept before either can shape the plan. Under materialize=false
    * their persisted intermediates are released only by the caller's
    * `spark.catalog.clearCache()` — callers wanting a fully lazy,
    * leak-free plan leave both knobs at their defaults (off). */
  private def lshPairs(docsKeyed0: DataFrame, numHashes: Int, bands: Int,
      bucketCap: Int, threshold: Double, elemsDistinct: Boolean,
      materialize: Boolean = true, hotElemFrac: Double = 0.0,
      perDocCap: Int = 0): DataFrame = {
    val (docsKeyed, scrubInput) =
      if (hotElemFrac <= 0) (docsKeyed0, None)
      else {
        val (out, keyed) = scrubHotElems(docsKeyed0, hotElemFrac)
        (out, Some(keyed))
      }
    val rows = numHashes / bands
    val base = signatureTable(docsKeyed, numHashes, elemsDistinct).persist()
    val banded = bandTable(base, bands, rows)
    val capped = dropOversizedBuckets(banded, Seq("band", "bh"), bucketCap)
    val a = capped.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("n").as("n_a"))
    val b = capped.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("n").as("n_b"))
    val cands0 = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")).cast(DoubleType) /
          greatest(col("n_a"), col("n_b")) >= threshold)
      .select("id_a", "id_b")
      .distinct()
    val cands = capCandidatesPerDoc(cands0, perDocCap, "minhash")
    val verified = verifyCandidates(cands, base, numHashes, threshold)
    // default: materialize the (tiny) verified pair set eagerly so the
    // signature cache can be released NOW — without this, repeated
    // pipeline calls accumulate cached tables for the session's life.
    // materialize=false keeps the plan lazy/auditable; the caller owns
    // releasing the cache (spark.catalog.clearCache()).
    if (!materialize) verified
    else {
      val out = verified.localCheckpoint(true)
      base.unpersist()
      scrubInput.foreach(_.unpersist())
      if (!(cands eq cands0)) cands.unpersist()
      out
    }
  }

  /** Skew insurance without a sort: per-bucket counts are a tiny
    * aggregate (one row per bucket, and only buckets over the cap
    * survive the filter — few by construction), broadcast back as a
    * left-anti join. The window-count formulation this replaces forced
    * a full shuffle+SORT of the entire exploded table just to find the
    * handful of oversized buckets. */
  private[ops] def dropOversizedBuckets(exploded: DataFrame, keys: Seq[String],
      cap: Int): DataFrame = {
    val over = exploded.groupBy(keys.map(col): _*).count()
      .filter(col("count") > cap).select(keys.map(col): _*)
    exploded.join(broadcast(over), keys, "left_anti")
  }

  /** MinHash + LSH near-duplicate pairs over word shingles, verified
    * with exact Jaccard. Recall at the threshold is governed by the
    * (bands, rows) S-curve: P(candidate) = 1 − (1 − s^rows)^bands. */
  /** Spread docs across the cluster by id BEFORE the (interpreted,
    * CPU-heavy) shingle/minhash projections — a coarse upstream scan
    * otherwise serializes the whole signature computation into a
    * handful of tasks; partitioning by doc id also pre-co-locates the
    * verification joins. The shuffled payload is the raw text — far
    * cheaper than the hash work it parallelizes. */
  private def spreadById(docs: DataFrame, id: Column, payload: Column): DataFrame =
    docs.select(id.as("doc_id"), payload.as("__raw")).repartition(col("doc_id"))

  /** (doc_id, elems) with elems = xxhash64'd word k-shingles — shingles
    * travel as longs like the char-n-gram funnel: identical Jaccard up
    * to 2^-64 collisions, ~1/3 the verify-join bytes of shingle
    * strings, and the primitive (unboxed) set kernel on the verify
    * path. */
  private def shingleElems(docs: DataFrame, text: Column, id: Column,
      shingleK: Int): DataFrame =
    spreadById(docs, id, text)
      .select(col("doc_id"),
        F.transform(shingles(col("__raw"), shingleK), s => xxhash64(s)).as("elems"))

  def minhashLSH(docs: DataFrame, text: Column, id: Column,
      shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
      jaccardThreshold: Double = 0.5, bucketCap: Int = 100000,
      materialize: Boolean = true, hotElemFrac: Double = 0.0,
      perDocCap: Int = 0): DataFrame =
    lshPairs(shingleElems(docs, text, id, shingleK), numHashes, bands,
      bucketCap, jaccardThreshold,
      elemsDistinct = false, // shingles() keeps duplicates
      materialize = materialize, hotElemFrac = hotElemFrac,
      perDocCap = perDocCap)

  // ---- persisted minhash index (incremental near-dup) -----------------

  /** Mode of a stored index; metas written before the mode column
    * existed are shingle-mode by construction. */
  private def indexMode(meta: org.apache.spark.sql.Row): String =
    if (meta.schema.fieldNames.contains("mode")) meta.getAs[String]("mode")
    else "shingle"

  /** Element derivation per index mode: "shingle" = word k-shingles
    * (duplicates kept — [[minhashLSH]]'s funnel), "chargram" =
    * distinct char n-grams ([[ngramJaccardPairs]]'s funnel). */
  private def indexElems(docs: DataFrame, text: Column, id: Column,
      mode: String, k: Int): DataFrame = mode match {
    case "shingle" => shingleElems(docs, text, id, k)
    case "chargram" => spreadById(docs, id, text)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.charNgramHashes(col("__raw"), k).as("elems"))
    case m => throw new IllegalArgumentException(
      s"unknown minhash index mode: $m (shingle|chargram)")
  }

  /** Build the write-once half of incremental near-dup dedup: persist
    * each document's minhash signature, set cardinality, and hashed
    * shingle set. A new crawl increment is then deduplicated against
    * the whole corpus ([[nearDupAgainstIndex]]) WITHOUT re-reading or
    * re-hashing any stored text — the per-increment cost is hashing the
    * increment plus key-equality joins against this store.
    *
    * Layout: `path/meta` (one row: shingle_k, num_hashes, bands — the
    * query path reads its parameters from here, so a build/query
    * mismatch is structurally impossible) and `path/docs`
    * (doc_id, n, sig, elems). Storing `elems` is what buys
    * verification-without-rescan; it costs ~8 bytes per token — the
    * same order as the corpus text it replaces on the read path.
    * Old-old pairs are the BUILD-time dedup's job (run [[minhashLSH]]
    * over the corpus once); the index query reports only pairs that
    * touch the increment. */
  def buildMinhashIndex(docs: DataFrame, text: Column, id: Column,
      path: String, shingleK: Int = 3, numHashes: Int = 16,
      bands: Int = 4, mode: String = "shingle"): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(mode == "shingle" || mode == "chargram",
      s"unknown minhash index mode: $mode (shingle|chargram)")
    val spark = docs.sparkSession
    import spark.implicits._
    // docs first, meta LAST: meta is the commit marker (readers resolve
    // it before touching docs), so a crash mid-build leaves no
    // readable half-store — just an orphan docs dir an overwrite heals
    signatureTable(indexElems(docs, text, id, mode, shingleK), numHashes,
        elemsDistinct = mode == "chargram")
      .select("doc_id", "n", "sig", "elems")
      .write.mode("overwrite").parquet(s"$path/docs")
    Seq((mode, shingleK, numHashes, bands))
      .toDF("mode", "shingle_k", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Append an increment to a stored minhash index. Ids already present
    * are anti-joined away (idempotent under replay, and the store keeps
    * one row per doc_id — the join contract of the query path). Call
    * AFTER deduplicating the increment against the store, or the
    * appended near-dups become stored near-dups. */
  def appendToMinhashIndex(spark: SparkSession, indexPath: String,
      docs: DataFrame, text: Column, id: Column): Unit = {
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (mode, k, numHashes) = (indexMode(meta),
      meta.getAs[Int]("shingle_k"), meta.getAs[Int]("num_hashes"))
    signatureTable(indexElems(docs, text, id, mode, k), numHashes,
        elemsDistinct = mode == "chargram")
      .select("doc_id", "n", "sig", "elems")
      .join(spark.read.parquet(s"$indexPath/docs").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(s"$indexPath/docs")
  }

  /** Near-duplicate pairs between an increment and a stored minhash
    * index (plus pairs WITHIN the increment): the incremental twin of
    * [[minhashLSH]], same funnel — band explosion, union bucket cap (a
    * bucket hot across store+increment squares in the join no matter
    * which side fed it), size-ratio guard, per-pair distinct,
    * signature-estimate prefilter, exact Jaccard — with the corpus side
    * read from the store. Stored-stored pairs are NOT re-derived.
    *
    * Output (id_a, id_b, jaccard), id_a < id_b, at least one side from
    * the increment. Ids must be unique ACROSS store and increment (the
    * [[appendToMinhashIndex]] anti-join maintains this for the store).
    * Store scans prune columns: banding reads (doc_id, n, sig),
    * verification reads (doc_id, sig, elems) — the wide elems column
    * never rides the band explosion. */
  def nearDupAgainstIndex(spark: SparkSession, indexPath: String,
      newDocs: DataFrame, text: Column, id: Column,
      jaccardThreshold: Double = 0.5, bucketCap: Int = -1,
      materialize: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (mode, k, numHashes, bands) = (indexMode(meta),
      meta.getAs[Int]("shingle_k"), meta.getAs[Int]("num_hashes"),
      meta.getAs[Int]("bands"))
    // bucketCap < 0 (the default) = resolve the inline funnel's mode
    // default: the chargram funnel is deliberately capped 100× tighter
    // (same-vocabulary corpora concentrate band buckets), and a looser
    // indexed default would both diverge from inline results and
    // re-open the hot-bucket square the tight cap exists to stop.
    // 0 keeps the inline funnels' literal semantics (drop every
    // bucket) so the twins take the SAME explicit values.
    val cap = if (bucketCap >= 0) bucketCap
              else if (mode == "chargram") 1000 else 100000
    val rows = numHashes / bands
    val stored = spark.read.parquet(s"$indexPath/docs")
    val newBase = signatureTable(indexElems(newDocs, text, id, mode, k),
      numHashes, elemsDistinct = mode == "chargram").persist()

    val banded = bandTable(newBase, bands, rows).withColumn("is_new", lit(true))
      .unionByName(bandTable(stored, bands, rows).withColumn("is_new", lit(false)))
    val capped = dropOversizedBuckets(banded, Seq("band", "bh"), cap)
    // left side = increment only (stored-stored pairs never form);
    // right side = both. New-new pairs orient id_a < id_b; new-old
    // pairs form exactly once (old ids never appear on the left), then
    // canonicalize to id_a < id_b.
    val a = capped.filter(col("is_new"))
      .select(col("band"), col("bh"), col("doc_id").as("id_a"), col("n").as("n_a"))
    val b = capped
      .select(col("band"), col("bh"), col("doc_id").as("id_b"), col("n").as("n_b"),
        col("is_new").as("new_b"))
    val cands = a.join(b, Seq("band", "bh"))
      .filter((!col("new_b") || col("id_a") < col("id_b")) &&
        col("id_a") =!= col("id_b") &&
        least(col("n_a"), col("n_b")).cast(DoubleType) /
          greatest(col("n_a"), col("n_b")) >= jaccardThreshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    val lookup = newBase.select("doc_id", "sig", "elems")
      .unionByName(stored.select("doc_id", "sig", "elems"))
    val verified = verifyCandidates(cands, lookup, numHashes, jaccardThreshold)
    if (!materialize) verified
    else {
      val out = verified.localCheckpoint(true)
      newBase.unpersist()
      out
    }
  }

  /** Character n-gram Jaccard near-duplicate pairs, banded-MinHash
    * blocked (NOT single-band min-hash blocking, which funnels most of
    * a same-vocabulary corpus into one quadratic bucket), verified
    * exactly over int-hashed grams (identical Jaccard up to 2^-64
    * collisions, ~1/3 the verify-join bytes of string grams).
    *
    * The S-curve must be STEEP for char n-grams: unrelated documents in
    * one language/domain commonly sit at j ≈ 0.4-0.6, so shallow bands
    * would accept nearly every pair. Defaults (128 hashes × 16 bands of
    * 8) give P(candidate) ≈ 0.95 at j=0.8 but ≈ 0.4% at j=0.55 — the
    * knee sits between the background mode and the near-dup threshold.
    * Run [[exact]] dedup first: clusters of >bucketCap IDENTICAL docs
    * saturate every band bucket and are dropped by the skew cap. */
  def ngramJaccardPairs(docs: DataFrame, text: Column, id: Column,
      n: Int = 3, threshold: Double = 0.8, numHashes: Int = 128,
      bands: Int = 16, bucketCap: Int = 1000,
      materialize: Boolean = true, hotElemFrac: Double = 0.0,
      perDocCap: Int = 0): DataFrame = {
    val base = spreadById(docs, id, text)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.charNgramHashes(col("__raw"), n).as("elems"))
    lshPairs(base, numHashes, bands, bucketCap, threshold,
      elemsDistinct = true, // charNgramHashes is already distinct
      materialize = materialize, hotElemFrac = hotElemFrac,
      perDocCap = perDocCap)
  }

  /** Exact all-pairs n-gram Jaccard over a BOUNDED sample — the oracle
    * twin of [[ngramJaccardPairs]] (quadratic by construction; callers
    * must pass a bounded `docs`, e.g. a few hundred rows). */
  def ngramJaccardExact(docs: DataFrame, text: Column, id: Column,
      n: Int, threshold: Double): DataFrame = {
    // the repartition puts an exchange ABOVE the gram projection so the
    // nested-loop join streams materialized arrays (not a per-pair
    // recompute of the whole gram pipeline) and parallelizes the pairs.
    // 8 partitions, not the session default: a cartesian schedules
    // left×right partition PAIRS, so 32×32 would mint 1024 near-empty
    // tasks for a bounded sample — scheduling would dwarf the work
    val base = docs.select(id.as("doc_id"), charNgrams(text, n).as("elems"))
      .repartition(8, col("doc_id"))
    val a = base.select(col("doc_id").as("id_a"), col("elems").as("e_a"))
    val b = base.select(col("doc_id").as("id_b"), col("elems").as("e_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("e_a"), col("e_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs word-shingle Jaccard over a bounded sample — the
    * oracle twin of [[minhashLSH]]'s verification arithmetic. */
  def shingleJaccardExact(docs: DataFrame, text: Column, id: Column,
      shingleK: Int, threshold: Double): DataFrame = {
    val base = docs.select(id.as("doc_id"), shingles(text, shingleK).as("elems"))
      .repartition(8, col("doc_id")) // bounded sample: avoid 32² cartesian tasks
    val a = base.select(col("doc_id").as("id_a"), col("elems").as("e_a"))
    val b = base.select(col("doc_id").as("id_b"), col("elems").as("e_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("e_a"), col("e_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash fingerprint: per-token hash votes on each bit,
    * sign of the vote sum becomes the bit — a custom codegen
    * expression ([[graft.functions.SimHash64]]): the 64×tokens vote
    * loop runs fused instead of as nested interpreted lambdas. */
  def simhash(text: Column): Column =
    graft.functions.GraftFunctions.simhash64(text)

  /** SimHash near-dup pairs via multi-index hashing: block on `chunks`
    * bit-slices of the fingerprint with a per-chunk Hamming radius
    * r = ⌊maxHamming / chunks⌋, verify with popcount.
    *
    * Exactness (Norouzi et al., "Fast Search in Hamming Space with
    * Multi-Index Hashing", public): if d(x, y) ≤ h then some chunk of
    * the pair differs by ≤ ⌊h/c⌋ bits, so candidate generation has
    * recall 1.0 for any chunk count. r = 0 is the classic pigeonhole
    * exact-chunk join; r = 1 joins an EXACT side against a radius-1
    * BALL side (each chunk value plus its `width` single-bit flips) —
    * asymmetric, so a key collision implies chunk distance ≤ 1, never
    * 2. The win over shrinking chunks to keep r = 0: keys stay wide.
    * maxHamming=7 blocks on four 16-bit keys (radius 1) instead of
    * eight 8-bit keys — a 2^16 key space instead of 2^8, which on a
    * biased real-text corpus cuts candidate volume ~4× and top-bucket
    * occupancy ~8× (measured at sf0.1), the number that gets SQUARED
    * by a hot bucket at 100 TB. r ≥ 2 ball enumeration (1+w+C(w,2)
    * keys per chunk) is never worth it — use more chunks instead
    * (enforced).
    *
    * `chunks` defaults to the widest slicing with r ≤ 1, preferring
    * r = 0 while keys stay ≥ 16 bits: c=2 (h ≤ 1), c=4 exact
    * (h ≤ 3), c=4 radius-1 (h ≤ 7), c=8 radius-1 (h ≤ 15), … */
  def simhashPairs(docs: DataFrame, text: Column, id: Column,
      maxHamming: Int = 3, chunks: Int = 0, bucketCap: Int = 100000,
      materialize: Boolean = true): DataFrame =
    hammingPairs(
      spreadById(docs, id, text)
        .select(col("doc_id"), simhash(col("__raw")).as("fp")),
      maxHamming, chunks, bucketCap, materialize)

  /** Chunk count + chunk width for multi-index hamming blocking, with
    * the radius-≤1 guard (Norouzi et al.). */
  private def mihConfig(maxHamming: Int, chunks: Int): (Int, Int) = {
    val c = if (chunks > 0) chunks
            else if (maxHamming < 4) Seq(2, 4).find(_ > maxHamming).getOrElse(4)
            else Seq(4, 8, 16, 32, 64).find(_ * 2 > maxHamming).getOrElse(64)
    require(64 % c == 0, s"chunks must divide 64, got $c")
    require(maxHamming / c <= 1,
      s"maxHamming=$maxHamming over $c chunks needs per-chunk radius ${maxHamming / c} > 1; " +
        s"use at least ${maxHamming / 2 + 1} chunks")
    (c, 64 / c)
  }

  /** One (…, chunk, ck) row per fingerprint chunk; all input columns
    * (e.g. an is_new tag) ride along. */
  private def chunkExplode(fp: DataFrame, c: Int, width: Int): DataFrame = {
    val mask = if (width == 64) lit(-1L) else lit((1L << width) - 1)
    fp.select(fp.columns.map(col) :+
      posexplode(F.transform(sequence(lit(0), lit(c - 1)),
        k => call_function("shiftright", col("fp"), k * width).bitwiseAND(mask)))
        .as(Seq("chunk", "ck")): _*)
  }

  /** Radius-1 ball: each chunk row plus one row per flipped bit —
    * (width + 1) rows per input row. Built from the CAPPED table, not
    * the raw one: ball rows of a dropped hot bucket would otherwise
    * land on its `width` neighbor keys and multiply against those
    * keys' exact rows (cap × hot-bucket output — exactly the blowup
    * the cap exists to stop). From the capped side, |ball@k| ≤
    * (width+1) × cap, so per-key join output is bounded by
    * (width+1) × cap². A doc whose bucket was dropped loses that one
    * chunk's ball rows and falls back on its other c−1 chunks — the
    * same lossiness contract as every capped funnel here. */
  private def ballExplode(chunked: DataFrame, width: Int): DataFrame =
    chunked.select(chunked.columns.filter(_ != "ck").map(col) :+
      explode(F.transform(sequence(lit(0), lit(width)),
        i => when(i === 0, col("ck")).otherwise(
          col("ck").bitwiseXOR(call_function("shiftleft", lit(1L), i - 1))))).as("ck"): _*)

  /** Multi-index-hashing hamming near-dup pairs over ANY precomputed
    * 64-bit fingerprint table (`doc_id`, `fp`) — the blocking layer
    * behind [[simhashPairs]] (text fingerprints) and
    * [[Multimodal.phashPairs]] (media perceptual hashes). Candidate
    * generation is EXACT for per-chunk radius ≤ 1 (Norouzi et al.:
    * h ≤ c·(r+1)−1 errors cannot exceed radius r in every chunk). */
  def hammingPairs(fps: DataFrame, maxHamming: Int = 3, chunks: Int = 0,
      bucketCap: Int = 100000, materialize: Boolean = true): DataFrame = {
    val (c, width) = mihConfig(maxHamming, chunks)
    val r = maxHamming / c
    // persist the (doc_id, fp) table: one row per doc, and it feeds the
    // bucket-count aggregates AND both join sides — without the cache
    // the upstream fingerprint pipeline recomputes three times
    val fp = fps.select(col("doc_id"), col("fp")).persist()
    val chunked = chunkExplode(fp, c, width)
    // persisted when it feeds two consumers (join side a AND the ball
    // explosion): without the cache the bucket-count aggregate and
    // anti-join replay once per consumer
    val exactSide0 = dropOversizedBuckets(chunked, Seq("chunk", "ck"), bucketCap)
    val exactSide = if (r == 0) exactSide0 else exactSide0.persist()
    val probeSide = if (r == 0) exactSide else ballExplode(exactSide, width)
    val a = exactSide.select(col("chunk"), col("ck"), col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = probeSide.select(col("chunk"), col("ck"), col("doc_id").as("id_b"), col("fp").as("fp_b"))
    val pairs = a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    // see lshPairs: eager-materialize the tiny pair set, release cache
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint(true)
      fp.unpersist()
      if (r > 0) exactSide.unpersist()
      out
    }
  }

  /** Persist a fingerprint corpus — the 16-bytes-per-doc store behind
    * incremental hamming dedup ([[hammingAgainstIndex]]). The heavy
    * thing at scale is not this table but producing it (a full pass
    * over text or media payloads): the index makes that pass
    * write-once. `maxHamming`/`chunks` stay QUERY-time parameters —
    * the store is raw fingerprints, so one build serves any radius. */
  def buildFingerprintIndex(fps: DataFrame, path: String): Unit =
    fps.select("doc_id", "fp").write.mode("overwrite").parquet(path)

  /** Append an increment's fingerprints; ids already stored are
    * anti-joined away (idempotent under replay, one row per doc). */
  def appendToFingerprintIndex(spark: SparkSession, indexPath: String,
      fps: DataFrame): Unit =
    fps.select("doc_id", "fp")
      .join(spark.read.parquet(indexPath).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(indexPath)

  /** Hamming near-dup pairs between an increment and a stored
    * fingerprint index (plus pairs within the increment) — the
    * incremental twin of [[hammingPairs]]: same multi-index blocking
    * with the corpus side read from the store (16 bytes/doc — no
    * payload or text rescan), union-side bucket cap, stored-stored
    * pairs never re-derived. Output (id_a, id_b, hamming) with
    * id_a < id_b; ids must be unique across store and increment. */
  def hammingAgainstIndex(spark: SparkSession, indexPath: String,
      newFps: DataFrame, maxHamming: Int = 3, chunks: Int = 0,
      bucketCap: Int = 100000, materialize: Boolean = true): DataFrame = {
    val (c, width) = mihConfig(maxHamming, chunks)
    val r = maxHamming / c
    val newFp = newFps.select(col("doc_id"), col("fp"))
      .withColumn("is_new", lit(true)).persist()
    val stored = spark.read.parquet(indexPath)
      .select(col("doc_id"), col("fp")).withColumn("is_new", lit(false))
    val chunked = chunkExplode(newFp.unionByName(stored), c, width)
    val capped0 = dropOversizedBuckets(chunked, Seq("chunk", "ck"), bucketCap)
    val capped = if (r == 0) capped0 else capped0.persist()
    val probe = if (r == 0) capped else ballExplode(capped, width)
    val a = capped.filter(col("is_new"))
      .select(col("chunk"), col("ck"), col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = probe.select(col("chunk"), col("ck"), col("doc_id").as("id_b"),
      col("fp").as("fp_b"), col("is_new").as("new_b"))
    val pairs = a.join(b, Seq("chunk", "ck"))
      .filter((!col("new_b") || col("id_a") < col("id_b")) &&
        col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint(true)
      newFp.unpersist()
      if (r > 0) capped.unpersist()
      out
    }
  }

  /** Winnowing fingerprints of a text column — the MOSS scheme
    * ([[graft.functions.Kernels.winnowFingerprints]]): any shared
    * substring of ≥ w + k − 1 codepoints yields a shared fingerprint. */
  def winnow(text: Column, k: Int = 8, w: Int = 8): Column =
    graft.functions.GraftFunctions.winnowFp(text, k, w)

  /** CONTAINMENT near-duplicate pairs — the family member
    * Jaccard-style set similarity structurally misses: a short
    * document embedded verbatim in a much longer one has tiny Jaccard
    * (|A∩B|/|A∪B| ≤ |A|/|B|), and the LSH funnels' size-ratio guard
    * drops such pairs BY DESIGN. Containment |A∩B|/min(|A|,|B|) is
    * the right score for subset/superset duplication (boilerplate,
    * quotation, doc-in-corpus inclusion — a dominant duplication mode
    * in web training data).
    *
    * Candidate generation is winnowing fingerprints (MOSS): two docs
    * sharing any substring of ≥ w + k − 1 codepoints share a
    * fingerprint, so real containment always produces candidates
    * (recall is deterministic, not an S-curve). The fingerprints are
    * NOT the score — window-minimum selection is biased toward
    * globally small hashes, which inflates overlap between
    * same-vocabulary documents — candidates are verified EXACTLY over
    * the full k-gram hash sets, like every funnel here.
    *
    * Funnel: per doc, winnowed fps + distinct k-gram hashes
    * (persisted) → fp explode → per-fp bucket cap (a boilerplate
    * fingerprint shared by B docs would mint B² candidate rows) →
    * fp-equality self-join → per-pair shared-fp count ≥ minShared
    * (noise floor) → gram sets joined back by doc id → exact
    * containment ([[graft.functions.Kernels.containmentLong]]) →
    * threshold. Shuffles only on derived keys; never cartesian. */
  /** Default `w = 24` (guarantee: any shared run of ≥ 31 codepoints
    * produces a candidate): fingerprint density is ~2/(w+1) of all
    * grams and candidate volume scales with its square, so the window
    * should be as wide as the shortest shared passage worth detecting
    * — not the near-dup-grade w=8. */
  /** `bucketFrac` (opt-in, ledgered): PROPORTIONAL per-fingerprint
    * bucket cap — fps shared by more than `bucketFrac` of the corpus
    * (floor 16 docs) drop before pair minting, the containment twin of
    * minhash's hotElemFrac and sparse-cosine's dfFrac. The judgment:
    * a fingerprint in >0.1% of a corpus is template text, not
    * containment identity — and WITHOUT it the candidate-count
    * aggregation's input is Σ df² pair mentions over every mid-df
    * vocab-background bucket the absolute cap leaves standing
    * (measured r10: 4 GB spilled at 26k docs, 38.6 GB at 416k, ALL in
    * that one aggregation stage — the absolute cap stops being the
    * binding judgment as n grows past cap/frac). Forces one count()
    * on the already-persisted base. */
  def containmentPairs(docs: DataFrame, text: Column, id: Column,
      k: Int = 8, w: Int = 24, threshold: Double = 0.5, minShared: Int = 3,
      bucketCap: Int = 100000, materialize: Boolean = true,
      perDocCap: Int = 0, bucketFrac: Double = 0.0): DataFrame = {
    val base = spreadById(docs, id, text)
      .select(col("doc_id"),
        winnow(col("__raw"), k, w).as("fps"),
        graft.functions.GraftFunctions.charNgramHashes(col("__raw"), k).as("grams"))
      .persist()
    val exploded = base.select(col("doc_id"), explode(col("fps")).as("fp"))
    val effCap =
      if (bucketFrac <= 0) bucketCap
      else {
        val n = base.count()
        val pc = math.max(16L, math.ceil(bucketFrac * n).toLong)
          .min(bucketCap.toLong).toInt
        Ledger.note("contain_bucket_frac",
          s"proportional fp cap $pc (frac $bucketFrac of $n docs, abs cap $bucketCap)")
        pc
      }
    val capped = dropOversizedBuckets(exploded, Seq("fp"), effCap)
    val a = capped.select(col("fp"), col("doc_id").as("id_a"))
    val b = capped.select(col("fp"), col("doc_id").as("id_b"))
    val cands0 = a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared")) // fps are distinct per doc, so count = shared fps
      .filter(col("shared") >= minShared)
      .select("id_a", "id_b")
    // NOTE: a non-zero perDocCap runs eager actions (count + persist)
    // even under materialize=false — the budget must SEE the candidate
    // volume to ledger it; callers wanting a fully lazy plan leave the
    // cap off
    val cands = capCandidatesPerDoc(cands0, perDocCap, "contain")
    // Verify-join shape, chosen for its SPILL profile at scale: both
    // gram-array joins are SHUFFLE_HASH with the O(n) per-doc side as
    // the build side, so the wide rows (candidates carrying one gram
    // array) are never sorted or buffered — they stream through the
    // probe and collapse to (id_a, id_b, score) inside the same stage.
    // The sort-merge plan this replaces sorted candidate rows WITH
    // array payload attached (measured r9: 3.9–38.7 GB spilled across
    // the scale sweep under an 8g heap); here the only memory resident
    // is the build map, Σ|grams| / shuffle-partitions per task.
    // Candidates enter bare (two longs), pick up g_b at id_b's
    // partition, and meet g_a at id_a's partition where the score is
    // computed and filtered before anything else sees the arrays.
    val gB = base.select(col("doc_id").as("id_b"), col("grams").as("g_b"))
      .hint("SHUFFLE_HASH")
    val gA = base.select(col("doc_id").as("id_a"), col("grams").as("g_a"))
      .hint("SHUFFLE_HASH")
    val pairs = cands
      .join(gB, Seq("id_b"))
      .join(gA, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        graft.functions.GraftFunctions.containmentSim(col("g_a"), col("g_b")).as("containment"))
      .filter(col("containment") >= threshold)
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint(true)
      base.unpersist()
      if (!(cands eq cands0)) cands.unpersist()
      out
    }
  }

  /** Persist winnowing fingerprints + gram sets for incremental
    * containment dedup ([[containmentAgainstIndex]]): `path/docs` =
    * (doc_id, fps, grams), `path/meta` = (k, w) written LAST as the
    * commit marker (a fingerprint computed under different (k, w)
    * never matches — the meta pin makes mismatch impossible). Storing
    * grams is what buys exact verification without re-reading stored
    * text, same trade as the minhash index's elems. */
  def buildContainmentIndex(docs: DataFrame, text: Column, id: Column,
      path: String, k: Int = 8, w: Int = 24): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    spreadById(docs, id, text)
      .select(col("doc_id"),
        winnow(col("__raw"), k, w).as("fps"),
        graft.functions.GraftFunctions.charNgramHashes(col("__raw"), k).as("grams"))
      .write.mode("overwrite").parquet(s"$path/docs")
    Seq((k, w)).toDF("k", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Append an increment's fingerprints + grams (idempotent on
    * doc_id). */
  def appendToContainmentIndex(spark: SparkSession, indexPath: String,
      docs: DataFrame, text: Column, id: Column): Unit = {
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (k, w) = (meta.getAs[Int]("k"), meta.getAs[Int]("w"))
    spreadById(docs, id, text)
      .select(col("doc_id"),
        winnow(col("__raw"), k, w).as("fps"),
        graft.functions.GraftFunctions.charNgramHashes(col("__raw"), k).as("grams"))
      .join(spark.read.parquet(s"$indexPath/docs").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(s"$indexPath/docs")
  }

  /** Containment pairs between an increment and a stored containment
    * index (plus pairs within the increment) — [[containmentPairs]]'
    * incremental twin: same fp-equality candidates with the per-fp
    * cap on the store∪increment union (a boilerplate fingerprint is
    * boilerplate no matter which side fed it), shared-fp floor on the
    * canonical pair, exact containment over stored gram sets —
    * stored text never re-read, stored-stored pairs never formed.
    * Output (id_a, id_b, containment), id_a < id_b; ids unique
    * across store and increment. */
  def containmentAgainstIndex(spark: SparkSession, indexPath: String,
      newDocs: DataFrame, text: Column, id: Column,
      threshold: Double = 0.5, minShared: Int = 3,
      bucketCap: Int = 100000, materialize: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (k, w) = (meta.getAs[Int]("k"), meta.getAs[Int]("w"))
    val stored = spark.read.parquet(s"$indexPath/docs")
    val newBase = spreadById(newDocs, id, text)
      .select(col("doc_id"),
        winnow(col("__raw"), k, w).as("fps"),
        graft.functions.GraftFunctions.charNgramHashes(col("__raw"), k).as("grams"))
      .persist()
    val exploded = newBase
      .select(col("doc_id"), lit(true).as("is_new"), explode(col("fps")).as("fp"))
      .unionByName(stored
        .select(col("doc_id"), lit(false).as("is_new"), explode(col("fps")).as("fp")))
    val capped = dropOversizedBuckets(exploded, Seq("fp"), bucketCap)
    val a = capped.filter(col("is_new")).select(col("fp"), col("doc_id").as("id_a"))
    val b = capped.select(col("fp"), col("doc_id").as("id_b"), col("is_new").as("new_b"))
    val cands = a.join(b, Seq("fp"))
      .filter((!col("new_b") || col("id_a") < col("id_b")) &&
        col("id_a") =!= col("id_b"))
      .groupBy(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("id_a", "id_b")
    val lookup = newBase.select("doc_id", "grams")
      .unionByName(stored.select("doc_id", "grams"))
    // same spill-shaped verify as containmentPairs: SHUFFLE_HASH with
    // the O(n) gram side as build, bare candidates streamed, score
    // computed and filtered before the arrays leave the stage
    val pairs = cands
      .join(lookup.select(col("doc_id").as("id_b"), col("grams").as("g_b"))
        .hint("SHUFFLE_HASH"), Seq("id_b"))
      .join(lookup.select(col("doc_id").as("id_a"), col("grams").as("g_a"))
        .hint("SHUFFLE_HASH"), Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        graft.functions.GraftFunctions.containmentSim(col("g_a"), col("g_b")).as("containment"))
      .filter(col("containment") >= threshold)
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint(true)
      newBase.unpersist()
      out
    }
  }

  /** Exact all-pairs char-n-gram CONTAINMENT over a BOUNDED sample —
    * oracle twin of [[containmentPairs]] (quadratic by construction):
    * |grams(A) ∩ grams(B)| / min(|grams(A)|, |grams(B)|), pure
    * built-ins so the DuckDB oracle states the same arithmetic. */
  def containmentExact(docs: DataFrame, text: Column, id: Column,
      n: Int, threshold: Double): DataFrame = {
    val base = docs.select(id.as("doc_id"), charNgrams(text, n).as("elems"))
      .repartition(8, col("doc_id")) // bounded sample: avoid 32² cartesian tasks
    val a = base.select(col("doc_id").as("id_a"), col("elems").as("e_a"))
    val b = base.select(col("doc_id").as("id_b"), col("elems").as("e_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("e_a"), col("e_b"))).cast(DoubleType) /
          least(size(col("e_a")), size(col("e_b")))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Near-duplicate clustering: connected components over a candidate
    * pair set by iterative min-label propagation. Each node adopts the
    * minimum label among itself and its neighbors; iterate to fixpoint.
    * One shuffle join + one aggregation per iteration, converging in
    * O(component diameter) rounds — near-dup components are
    * star/clique-shaped, so a handful of rounds in practice; labels are
    * localCheckpoint'ed each round so lineage stays flat. Output:
    * (id, cluster) with cluster = min member id — the canonical
    * "keep the smallest id, drop the rest" contract.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    connectedComponentsResult(pairs, maxIter).labels

  /** Labels plus an explicit convergence signal — a component whose
    * diameter exceeds maxIter would otherwise return WRONG (unconverged)
    * labels silently. */
  case class CCResult(labels: DataFrame, converged: Boolean, iterations: Int)

  /** Algorithm-selectable variant: `"label"` = min-label propagation
    * (O(component diameter) rounds — right for the star/clique
    * components near-dup candidate sets produce), `"star"` =
    * alternating large-star/small-star contraction
    * ([[connectedComponentsStar]], O(log n) rounds on ANY shape —
    * right when components can be long chains, e.g. transitive
    * near-dup runs in crawl data). Identical output contract. */
  def connectedComponentsResult(pairs: DataFrame, maxIter: Int,
      algorithm: String): CCResult = algorithm match {
    case "label" => connectedComponentsResult(pairs, maxIter)
    case "star"  => connectedComponentsStar(pairs, maxIter)
    case other => throw new IllegalArgumentException(
      s"unknown connected-components algorithm '$other' (label|star)")
  }

  /** Two-phase star contraction (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC'14 — public): alternate
    *
    *  - **large-star**: every node points its strictly-LARGER
    *    neighbors at the minimum of its closed neighborhood;
    *  - **small-star**: every node links its smaller-or-equal
    *    neighbors (and itself) to its minimum neighbor;
    *
    * until the edge set reaches a fixpoint, at which point edges form
    * stars rooted at each component's minimum id. Converges in
    * O(log n) rounds on ANY component shape — min-label propagation
    * ([[connectedComponentsResult]]) needs O(diameter) rounds, which
    * degenerates to O(n) on chain components (transitively-linked
    * near-dups, common in crawl shingles). Each round is two
    * aggregate+join+distinct passes over the edge set — shuffles on
    * edge keys only, edges localCheckpoint'ed per round so lineage
    * stays flat.
    *
    * Convergence is detected by consecutive-round (count, hash-sum)
    * equality — an O(1)-row aggregate per round instead of a full
    * anti-join; a 64-bit checksum collision declaring a false
    * fixpoint is ~2^-64 and would still be caught by the paper's
    * invariant that the edge set only shrinks lexicographically.
    *
    * ADAPTIVE: when the (already-funneled) edge set is tiny —
    * `smallGraphEdges` or fewer edges, the same size class Spark
    * broadcasts a join side at — the multi-round loop is pure
    * scheduling overhead: each round is ~4 shuffle jobs over a few
    * hundred rows, ~0.5 s of fixed cost per round at local[32]. Such
    * graphs take one collect + a driver union-find (identical labels:
    * min id per component) and zero loop rounds. Near-dup graphs AT
    * scale stay distributed — the gate is an edge/node count, checked
    * on the checkpointed edge set before any round runs. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50,
      smallGraphEdges: Long = 100000L): CCResult = {
    // materialize the pair set ONCE before deriving nodes and edges —
    // each derivation is its own checkpoint action, and `pairs` is
    // typically the unmaterialized tail of a full dedup funnel that
    // would otherwise run twice (measured: the whole split query paid
    // the minhash funnel 2x before this)
    val p0 = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    // nodes from the RAW pair set (a self-pair-only node is a
    // singleton component and must still get a label), edges as
    // canonical down-edges (src > dst) with self-loops dropped
    val nodes = p0.select(col("id_a").as("id"))
      .unionAll(p0.select(col("id_b").as("id")))
      .distinct()
      .localCheckpoint(true)
    var edges = p0
      .select(greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)

    def checksum(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent over the (distinct) edge
      // set and can't overflow under ANSI arithmetic
      val r = e.agg(count(lit(1)),
        coalesce(call_function("bit_xor", xxhash64(col("src"), col("dst"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def largeStar(e: DataFrame): DataFrame = {
      val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = und.groupBy("src").agg(min("dst").as("nmin"))
        .select(col("src"), least(col("nmin"), col("src")).as("m"))
      und.filter(col("dst") > col("src"))
        .join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("src").agg(min("dst").as("m"))
      val relinked = e.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
      val self = mins.select(col("src"), col("m").as("dst"))
      relinked.unionAll(self)
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    val idType = pairs.schema(pairs.schema.fieldIndex("id_a")).dataType
    val fastTypeOk = idType match {
      case _: org.apache.spark.sql.types.NumericType |
           org.apache.spark.sql.types.StringType => true
      case _ => false
    }
    if (fastTypeOk && edges.count() <= smallGraphEdges &&
        nodes.count() <= 2 * smallGraphEdges) {
      import scala.jdk.CollectionConverters._
      val es = edges.collect().map(r => (r.get(0), r.get(1)))
      val ns = nodes.collect().map(_.get(0))
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent(c); parent(c) = r; c = nxt
        }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      def lt(a: Any, b: Any) =
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
      ns.foreach { n =>
        val r = find(n)
        if (!minOf.get(r).exists(m => lt(m, n))) minOf(r) = n
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("cluster", idType)))
      val rows = ns.toSeq
        .map(n => org.apache.spark.sql.Row(n, minOf(find(n)))).asJava
      return CCResult(
        pairs.sparkSession.createDataFrame(rows, schema), true, 0)
    }

    var sig = checksum(edges)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nsig = checksum(next)
      converged = nsig == sig
      edges = next
      sig = nsig
      it += 1
    }
    // fixpoint edges are stars (u → component min); roots label themselves
    val labels = nodes
      .join(edges.select(col("src").as("id"), col("dst").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster"))
    CCResult(labels, converged, it)
  }

  def connectedComponentsResult(pairs: DataFrame, maxIter: Int = 20): CCResult = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster").as("nlbl")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("nlbl").as("nbr_min"))
      // keep BOTH labels through the checkpoint so change detection is a
      // scan of the checkpointed partitions, not a second join+count job
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("old"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      converged = updated.filter(col("cluster") =!= col("old")).limit(1).count() == 0
      labels = updated.select(col("id"), col("cluster"))
      it += 1
    }
    edges.unpersist() // labels are checkpointed; the edge cache is dead weight
    CCResult(labels, converged, it)
  }

  /** Brute-force SimHash pairs over a bounded sample — recall oracle
    * for [[simhashPairs]]. */
  def simhashExact(docs: DataFrame, text: Column, id: Column,
      maxHamming: Int): DataFrame = {
    val fp = docs.select(id.as("doc_id"), simhash(text).as("fp"))
      .repartition(8, col("doc_id")) // bounded sample: avoid 32² cartesian tasks
    val a = fp.select(col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = fp.select(col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
  /** Sorted-neighborhood (SNM) candidate pairs — the SORT-based
    * blocking family, complementing the hash funnels above (minhash
    * bands, simhash chunks) and [[EditDistance]]'s segment blocking:
    * order the corpus by a cheap sort key (here the lowercased first
    * `sortKeyLen` chars), then verify only pairs whose global ranks
    * lie within `window` of each other (Hernández & Stolfo's
    * merge/purge, public). Catches the near-dup mode where documents
    * share a long common PREFIX (templated titles, boilerplate
    * headers) at O(n·w) verify cost.
    *
    * The global rank is computed WITHOUT a single-task sort — see
    * [[globalRankByKey]]: sampled (key, id) range cuts, per-bucket
    * row_number in parallel, broadcast prefix-sum offsets. Because
    * the cuts carry the id tiebreak, the rank exchange stays balanced
    * (~n/rankBuckets per task) under ANY key distribution — a corpus
    * where 90% of sort keys share a leading prefix funneled the
    * previous first-codepoint bucketing into one task (DedupSpec pins
    * the pathology). The neighbor join is rank-equality (each row
    * probes its next `window−1` ranks), so it shuffles on an integer
    * key with fan-in bounded by `window` — no skew, no cartesian
    * corner. Verification is the exact set-Jaccard codegen kernel
    * over word shingles. */
  def sortedNeighborhoodPairs(docs: DataFrame, text: Column, id: Column,
      sortKeyLen: Int = 24, window: Int = 10, shingleK: Int = 2,
      threshold: Double = 0.3, rankBuckets: Int = 256): DataFrame = {
    require(window >= 2, "SNM needs a window of at least 2")
    // shingle arrays ride the rank exchange and the (window-1)-fold
    // neighbor probe directly: a "narrower" variant that ranked and
    // paired on bare ids and re-joined shingles at verify measured
    // 5.8s vs this shape's 3.6s at sf0.1 - the two extra join stages
    // cost more than replicating the (small) element arrays through
    // shuffles whose fan-in the window already bounds
    val key = lower(substring(trim(text), 1, sortKeyLen))
    val base = docs.select(id.cast("long").as("doc_id"), key.as("__k"),
      shingles(text, shingleK).as("__e"))
    val r = globalRankByKey(base, rankBuckets)
      .select(col("doc_id"), col("__e"), col("__rank"))
    val probe = r.select(col("doc_id").as("__pid"), col("__e").as("__pe"),
      explode(sequence(col("__rank") + 1,
        col("__rank") + lit(window.toLong - 1))).as("__rank"))
    // SHUFFLE_HASH on the O(n) ranked side: the probe side carries
    // (window-1) array replicas per doc, and sort-merge sorted BOTH
    // array-bearing sides on __rank (measured 6.1 GB spill at the
    // m=64 scale point); hash-building the n-row side lets the 9n-row
    // probe stream through unsorted
    probe.join(r.hint("SHUFFLE_HASH"), Seq("__rank"))
      .select(least(col("__pid"), col("doc_id")).as("id_a"),
        greatest(col("__pid"), col("doc_id")).as("id_b"),
        jaccard(col("__pe"), col("__e")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Dense global rank 1..n by (`__k`, doc_id) without a single-task
    * sort — an explicit, inspectable range partitioner: sample (key,
    * id) pairs from the pruned key projection, take every
    * (sample/nBuckets)-th as a cut point, bucket rows by codegen'd
    * binary search ([[graft.functions.Kernels.rangeBucket]]), rank
    * within buckets in parallel, and lift local ranks to global with
    * broadcast per-bucket offsets from a prefix sum. Because the cut
    * points carry the id TIEBREAK, the underlying order is total and
    * cuts can split even a run of identical keys — balanced under ANY
    * key distribution (a 90%-shared-prefix corpus funneled the
    * previous first-codepoint buckets into one task; DedupSpec pins
    * the pathology). The rank itself is cut-invariant: any
    * order-preserving bucketing yields the same global (key, id)
    * rank, so output is deterministic regardless of sampling. Returns
    * the input plus `__b` (bucket) and `__rank`. */
  private[graft] def globalRankByKey(base: DataFrame,
      nBuckets: Int): DataFrame = {
    // ONE-pass cut derivation (the RangePartitioner sketch, done
    // explicitly): per-partition reservoir + row count, then a
    // weighted walk picks nBuckets-1 cuts. The sketch job projects
    // (key, id) only — column pruning keeps shingle/payload columns
    // out of this extra pass — and seeds per partition index, so the
    // cuts (and with them the physical plan, though never the ranks)
    // are deterministic.
    val resK = 128
    // null keys never reach the cuts: they rank first by Spark's
    // nulls-first ORDER BY and get their own bucket below, so the
    // sketch only needs the non-null order statistics
    val sketch = base.select(col("__k"), col("doc_id"))
      .filter(col("__k").isNotNull).rdd
      .map(r => (r.getString(0), r.getLong(1)))
      .mapPartitionsWithIndex { (pi, it) =>
        val rng = new java.util.Random(42L + pi)
        val res = new Array[(String, Long)](resK)
        var n = 0L
        while (it.hasNext) {
          val x = it.next()
          if (n < resK) res(n.toInt) = x
          else {
            val j = (rng.nextDouble() * (n + 1)).toLong
            if (j < resK) res(j.toInt) = x
          }
          n += 1
        }
        if (n == 0L) Iterator.empty
        else Iterator.single((n, res.take(math.min(n, resK.toLong).toInt)))
      }.collect()
    val totalRows = sketch.map(_._1).sum
    // each sampled element stands for (partition rows / sample size)
    // input rows; cuts fall where cumulative weight crosses each
    // 1/nBuckets fraction of the total
    // the sketch and the cut array MUST sort in the order rangeBucket
    // binary-searches with — UTF8String.compareTo (UTF-8 byte /
    // codepoint order), which is also what ORDER BY __k sorts by.
    // Scala's default String ordering (UTF-16 code-unit order)
    // disagrees for keys mixing U+E000..U+FFFF (e.g. U+FFFD) with
    // supplementary-plane codepoints, which would leave the cuts
    // unsorted w.r.t. the search and silently break bucketing
    val kiOrd: Ordering[(String, Long)] = new Ordering[(String, Long)] {
      def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = org.apache.spark.unsafe.types.UTF8String.fromString(a._1)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b._1))
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val weighted = sketch.flatMap { case (n, xs) =>
      val w = n.toDouble / xs.length
      xs.map(x => (x, w))
    }.sortBy(_._1)(kiOrd)
    val cuts: Array[(String, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      var cum = 0.0
      var b = 1
      for ((x, w) <- weighted if b < nBuckets) {
        cum += w
        if (cum >= b.toDouble * totalRows / nBuckets) {
          out += x
          b += 1
        }
      }
      out.distinct.sorted(kiOrd).toArray
    }
    // null keys: rangeBucket is null-intolerant (null __k → null
    // bucket), and a null __b would silently DROP rows at the USING
    // join below. Bucket them as -1 — nulls sort before every
    // non-null key in the window ORDER BY, and -1 sorts before every
    // real bucket in the offset prefix sum, so the global rank stays
    // order-preserving with nulls ranked first (dirty corpora are
    // data, not dropped rows)
    val withB = base.withColumn("__b", when(col("__k").isNull, lit(-1))
      .otherwise(graft.functions.GraftFunctions.rangeBucket(col("__k"),
        col("doc_id"), cuts.map(_._1), cuts.map(_._2))))
    val wB = Window.partitionBy("__b").orderBy(col("__k"), col("doc_id"))
    val ranked = withB.withColumn("__r0", row_number().over(wB).cast("long"))
    val counts = ranked.groupBy("__b").agg(count(lit(1)).as("__c"))
    val wOff = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .drop("__c")
    ranked.join(broadcast(offsets), Seq("__b"))
      .withColumn("__rank", col("__r0") + col("__off"))
      .drop("__r0")
  }
}
