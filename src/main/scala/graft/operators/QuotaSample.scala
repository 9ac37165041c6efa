package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified quota sampling — the domain-mixing primitive.
  *
  * Training-data pipelines cap each domain/source at a quota ("at most N
  * docs of src17") so one crawl host cannot dominate the mix. The sample
  * must be (a) deterministic — re-running the pipeline on the same corpus
  * snapshot must pick the same docs, or downstream incremental stages
  * churn; (b) unbiased within the group — "first N in file order" keeps
  * whatever the crawler's ordering correlates with. Ranking by a
  * cryptographic hash of the id gives both: a uniform, input-order-free
  * shuffle that any engine reproduces (md5 is engine-portable, which also
  * makes the operator exactly oracle-checkable).
  *
  * Scale shape: the naive form — one `row_number` window partitioned by
  * group — sends EVERY row of a group through one task; a 10-billion-doc
  * hot domain is a straggler at 100 TB. Two stages fix it:
  *   1. rank within (group, salt) where salt spreads each group over
  *      `salts` tasks, keep `quota` per cell — the group's global
  *      smallest-by-hash `quota` docs survive regardless of which cells
  *      they land in (each cell keeps its local top-quota, a superset of
  *      the global winners' cells' contributions);
  *   2. rank the ≤ salts·quota survivors per group in one tiny window.
  * Stage 1 shuffles (group, salt)-partitioned full rows once; stage 2's
  * per-group input is bounded by salts·quota rows — constant, not
  * corpus-sized, so the final window cannot straggle.
  */
object QuotaSample {

  /** Keep the `quota` rows with the smallest md5(id) per `groupCol` value
    * (all rows of groups smaller than the quota). Output schema = input
    * schema. Deterministic: ties are impossible for distinct ids and the
    * hash order is stable across runs/engines. */
  def stratifiedQuota(df: DataFrame, groupCol: String, idCol: String,
                      quota: Int, salts: Int = 16): DataFrame = {
    require(quota > 0 && salts > 0, s"quota=$quota salts=$salts must be positive")
    val key = "__qs_key"
    val salt = "__qs_salt"
    val rn = "__qs_rn"
    val keyed = df
      .withColumn(key, md5(col(idCol).cast("string")))
      .withColumn(salt, pmod(xxhash64(col(idCol)), lit(salts)))
    val w1 = Window.partitionBy(col(groupCol), col(salt))
      .orderBy(col(key), col(idCol))
    val pruned = keyed.withColumn(rn, row_number().over(w1))
      .filter(col(rn) <= quota).drop(rn, salt)
    val w2 = Window.partitionBy(col(groupCol)).orderBy(col(key), col(idCol))
    pruned.withColumn(rn, row_number().over(w2))
      .filter(col(rn) <= quota)
      .drop(rn, key)
  }

  /** TOKEN-budget quota per group — the data-mixing primitive in its
    * production currency. [[stratifiedQuota]] caps groups by ROW count;
    * mixture recipes are written in tokens ("≤ B tokens of src17"), so
    * the cap must be a running token sum down the same deterministic
    * md5-rank order: a doc is kept while the group's cumulative token
    * count (inclusive) stays ≤ `budget`; the group's first doc is always
    * kept so a budget below one document still emits something.
    *
    * Scale shape — the naive form is one window over EVERY row of a
    * group (a 10B-doc source = one straggler task). Instead the md5 rank
    * order is split into 4096 order-aligned buckets (the first 3 hex
    * digits of the key — hex-string order IS numeric order):
    *   1. histogram pass: token sum per (group, bucket) — partial
    *      aggregation bounds the shuffle at groups × 4096 rows;
    *   2. a ≤4096-row window per group classifies each bucket as fully
    *      kept (prefix + bucket ≤ B), fully dropped (prefix ≥ B), or THE
    *      boundary bucket (at most one per group, prefix monotone);
    *   3. only boundary-bucket rows (~1/4096 of a group) pay a row-level
    *      window; everything else gets its verdict from an equi-join on
    *      (group, bucket).
    * No driver pull anywhere; the exact naive semantics are reproduced
    * (parity-pinned in the spec, oracle-checked in q104).
    *
    * Zero-token rows (possible only from null/typed-down inputs — the
    * whitespace tokenizer yields ≥1 for any string) are excluded: a
    * 0-token doc at a bucket edge would make the bucket classification
    * disagree with the strict naive ordering. Output: (idCol, groupCol,
    * n_tokens, kept). */
  def tokenQuota(df: DataFrame, groupCol: String, idCol: String,
                 textCol: String, budget: Long,
                 tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    // tokenCounter is the accounting lane: whitespace tokens by default,
    // Bpe.tokenCount(_, model) for token-TRUE budgets — selection
    // machinery is denomination-agnostic
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    // `base` feeds TWO plan branches — the (group, bucket) histogram and
    // the row-level join probe — and Spark executes each branch's subtree
    // independently, so without materialization the tokenize pass AND the
    // caller's upstream joins (curateFull stage 5 hands in a chain of
    // anti-joins) run twice per call (r22; guide §3.3 "materialising an
    // intermediate result truncates the plan"). The checkpointed rows are
    // (doc, group, count, key, bucket) — no text — so the leaf is narrow
    // and both branches read it once.
    val base = df.select(col(idCol).as("__tq_doc"), col(groupCol).as("__tq_grp"),
        tokenCounter(col(textCol)).cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("__tq_key"))
      .filter(col("n_tokens") >= 1)
      .withColumn("__tq_bkt", conv(substring(col("__tq_key"), 1, 3), 16, 10).cast("int"))
      .localCheckpoint(eager = true)
    val wb = Window.partitionBy("__tq_grp").orderBy("__tq_bkt")
    val cls = base.groupBy("__tq_grp", "__tq_bkt")
      .agg(sum("n_tokens").as("__tq_btok"))
      .withColumn("__tq_before", coalesce(
        sum("__tq_btok").over(wb) - col("__tq_btok"), lit(0L)))
      .withColumn("__tq_cls",
        when(col("__tq_before") + col("__tq_btok") <= budget, lit(1))
          .when(col("__tq_before") >= budget, lit(0))
          .otherwise(lit(2)))
      .select("__tq_grp", "__tq_bkt", "__tq_before", "__tq_cls")
    val tagged = base.join(cls, Seq("__tq_grp", "__tq_bkt"))
    // ONE branch, one window (r21): the former settled/boundary split
    // union'd two filters of `tagged`, and Spark plans each union arm as
    // its own subtree — the text scan (tokenCounter over every doc), the
    // histogram join, and any upstream lineage all ran TWICE per call
    // (measured: 16 jobs / 2.5 s of the q132 timed sample were this one
    // stage). The within-BUCKET running sum gives every row its verdict
    // in one pass: settled buckets read their class directly, the (at
    // most one per group) boundary bucket reads prefix + in-bucket cum.
    // The window partitions by (group, bucket) — the join's own keys, so
    // no extra exchange, and partition size is bucket-bounded (~1/4096
    // of a group), never group- or corpus-sized. Bucket order IS key
    // order (the bucket is the key's first 3 hex digits), so
    // before + in-bucket cum ≡ the global per-group running sum.
    val wRow = Window.partitionBy("__tq_grp", "__tq_bkt")
      .orderBy(col("__tq_key"), col("__tq_doc"))
    tagged
      .withColumn("__tq_cum", col("__tq_before") + sum("n_tokens").over(wRow))
      .withColumn("kept",
        when(col("__tq_cls") === 1, lit(true))
          .when(col("__tq_cls") === 0, lit(false))
          .otherwise(col("__tq_cum") <= budget ||
            // the group's global first doc: only reachable in a bucket
            // whose full-bucket prefix is 0 (every earlier bucket empty)
            (col("__tq_before") === 0 && row_number().over(wRow) === 1)))
      .select(col("__tq_doc"), col("__tq_grp"), col("n_tokens"), col("kept"))
      .withColumnRenamed("__tq_doc", idCol).withColumnRenamed("__tq_grp", groupCol)
  }

  /** [[tokenQuota]] with PER-GROUP budgets: `budgets` is a (groupCol,
    * budget BIGINT) relation — #groups rows, AQE-broadcast into the
    * bucket-histogram join. Same deterministic md5-rank selection, same
    * first-doc guarantee, same 4096-bucket scale shape; the only change
    * is that every budget comparison reads the group's own row. */
  def tokenQuotaBudgets(df: DataFrame, groupCol: String, idCol: String,
                        textCol: String, budgets: DataFrame,
                        tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    val bud = budgets.select(col(groupCol).as("__tq_grp"),
      col("budget").cast("long").as("__tq_bud"))
    // materialized once for the histogram and probe branches — see
    // [[tokenQuota]] (r22)
    val base = df.select(col(idCol).as("__tq_doc"), col(groupCol).as("__tq_grp"),
        tokenCounter(col(textCol)).cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("__tq_key"))
      .filter(col("n_tokens") >= 1)
      .withColumn("__tq_bkt", conv(substring(col("__tq_key"), 1, 3), 16, 10).cast("int"))
      .localCheckpoint(eager = true)
    val wb = Window.partitionBy("__tq_grp").orderBy("__tq_bkt")
    val cls = base.groupBy("__tq_grp", "__tq_bkt")
      .agg(sum("n_tokens").as("__tq_btok"))
      .join(bud, Seq("__tq_grp"))
      .withColumn("__tq_before", coalesce(
        sum("__tq_btok").over(wb) - col("__tq_btok"), lit(0L)))
      .withColumn("__tq_cls",
        when(col("__tq_before") + col("__tq_btok") <= col("__tq_bud"), lit(1))
          .when(col("__tq_before") >= col("__tq_bud"), lit(0))
          .otherwise(lit(2)))
      .select("__tq_grp", "__tq_bkt", "__tq_before", "__tq_bud", "__tq_cls")
    val tagged = base.join(cls, Seq("__tq_grp", "__tq_bkt"))
    // one branch, one bucket-bounded window — see [[tokenQuota]] (r21)
    val wRow = Window.partitionBy("__tq_grp", "__tq_bkt")
      .orderBy(col("__tq_key"), col("__tq_doc"))
    tagged
      .withColumn("__tq_cum", col("__tq_before") + sum("n_tokens").over(wRow))
      .withColumn("kept",
        when(col("__tq_cls") === 1, lit(true))
          .when(col("__tq_cls") === 0, lit(false))
          .otherwise(col("__tq_cum") <= col("__tq_bud") ||
            (col("__tq_before") === 0 && row_number().over(wRow) === 1)))
      .select(col("__tq_doc"), col("__tq_grp"), col("n_tokens"), col("kept"))
      .withColumnRenamed("__tq_doc", idCol).withColumnRenamed("__tq_grp", groupCol)
  }

  /** Temperature-weighted mixture sampling — the training-data RECIPE
    * operator: given sampling temperature `alpha`, each source's token
    * budget is `totalBudget · mass_s^alpha / Σ_t mass_t^alpha` (floored,
    * min 1), then the deterministic per-source token quota selects the
    * docs. alpha = 1 reproduces natural proportions; alpha = 0 splits the
    * budget evenly; the 0 < alpha < 1 range up-samples small sources the
    * way LLM mixture recipes do.
    *
    * Determinism contract (oracle-portable): per-source masses come from
    * one bounded aggregation (#sources rows — the documented driver
    * pull); weights accumulate LEFT-TO-RIGHT over sources sorted by
    * name, and alpha = 0.5 uses `sqrt` (correctly rounded in every IEEE
    * engine, unlike `pow`'s platform-dependent last ulp) — so an
    * external engine replays the identical budgets. Output:
    * (idCol, sourceCol, n_tokens, budget, kept). */
  def temperatureMixture(df: DataFrame, sourceCol: String, idCol: String,
                         textCol: String, alpha: Double,
                         totalBudget: Long,
                         tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(totalBudget >= 1, s"totalBudget must be >= 1, got $totalBudget")
    def weight(mass: Double): Double =
      if (alpha == 0.5) math.sqrt(mass) else math.pow(mass, alpha)
    val masses = df.groupBy(col(sourceCol))
      .agg(sum(tokenCounter(col(textCol)).cast("long")).as("mass"))
      .collect()
      .map(r => (r.get(0), r.getLong(1)))
      .sortBy(_._1.toString)
    val wsum = masses.foldLeft(0.0)((acc, m) => acc + weight(m._2.toDouble))
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val budRows = masses.map { case (s, mass) =>
      org.apache.spark.sql.Row(s,
        math.max(1L, math.floor(totalBudget * weight(mass.toDouble) / wsum).toLong))
    }
    val budgets = spark.createDataFrame(budRows.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        df.schema(sourceCol).copy(name = sourceCol),
        org.apache.spark.sql.types.StructField("budget",
          org.apache.spark.sql.types.LongType, nullable = false))))
    tokenQuotaBudgets(df, sourceCol, idCol, textCol, budgets)
      .join(budgets, Seq(sourceCol))
  }

  /** Epoch-repetition data mixing — the up/down-sampling recipe an LLM
    * training run actually consumes: given explicit per-source weights
    * (a mixture recipe, not derived from the data) and a total token
    * budget, each source's token target is `totalBudget · w_s / Σw`,
    * delivered as WHOLE passes over the source (`full_epochs =
    * ⌊target / mass⌋` — repetition, the way small high-quality sources
    * are up-sampled) plus a deterministic fractional HEAD (the
    * [[tokenQuotaBudgets]] md5-rank selection over the remaining
    * `target − full_epochs·mass` tokens). Output one row per doc:
    * (idCol, sourceCol, n_tokens, epochs) with epochs = full passes
    * (+1 if the doc is in the fractional head); a training-shard writer
    * materializes `epochs` copies.
    *
    * Determinism contract (oracle-portable, the [[temperatureMixture]]
    * conventions): Σw folds LEFT-TO-RIGHT over name-sorted weights
    * (DuckDB: `list_sum(list(w ORDER BY source))`); per-source masses
    * come from one bounded aggregation (#sources rows — the documented
    * driver pull); target/epoch arithmetic is plain IEEE
    * multiply-divide-floor in the same operand order on both engines.
    * Sources absent from the recipe weigh 0 (full_epochs = 0, no head);
    * conversely a positive-weight recipe entry naming a source ABSENT
    * from the corpus is a hard error (r17+): it would inflate Σw and
    * silently deflate every real source's share — a typo'd source name
    * must fail loudly, not run smaller.
    * A fractional head under `1` token is dropped UNLESS the source has
    * a positive remainder ≥ 1, where the quota's first-doc guarantee
    * keeps one doc even when it overshoots — budget floors, not
    * truncation. Scale shape: the only non-equi-join work is the quota's
    * 4096-bucket histogram; the recipe/epoch relations are #sources
    * rows, AQE-broadcast. */
  def epochRepetition(df: DataFrame, sourceCol: String, idCol: String,
                      textCol: String, weights: Seq[(String, Double)],
                      totalBudget: Long,
                      tokenCounter: Column => Column = TextOps.tokenCount): DataFrame = {
    // tokenCounter: the accounting lane (whitespace default, BPE for
    // token-TRUE recipes) — threaded into the masses, the emitted
    // n_tokens, AND the fractional head's quota so the three can never
    // denominate differently
    require(totalBudget >= 1, s"totalBudget must be >= 1, got $totalBudget")
    require(weights.nonEmpty, "weights recipe must not be empty")
    require(weights.forall(_._2 >= 0.0), s"weights must be >= 0: $weights")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = weights.sortBy(_._1)
    val wsum = sorted.foldLeft(0.0)((acc, w) => acc + w._2)
    require(wsum > 0.0, "at least one weight must be positive")
    val wmap = sorted.toMap
    // one bounded aggregation: #sources rows (the documented pull)
    val masses = df
      .select(col(sourceCol).cast("string").as("__er_src"),
        tokenCounter(col(textCol)).cast("long").as("__er_n"))
      .filter(col("__er_n") >= 1)
      .groupBy("__er_src").agg(sum("__er_n").as("__er_m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    // a positive-weight recipe entry naming a source absent from the
    // corpus would still inflate Σw, silently deflating every real
    // source's share below totalBudget — a typo'd source name must read
    // as an error, not a quietly smaller run
    val present = masses.map(_._1).toSet
    val phantom = sorted.filter(w => w._2 > 0.0 && !present.contains(w._1))
    require(phantom.isEmpty,
      f"weights name sources absent from the corpus (their " +
        f"${phantom.map(_._2).sum / wsum * 100}%.1f%% budget share would be " +
        s"silently forfeited): ${phantom.map(_._1).mkString(", ")}")
    val plan = masses.map { case (src, m) =>
      val target = totalBudget.toDouble * wmap.getOrElse(src, 0.0) / wsum
      val full = math.floor(target / m).toLong
      val rem = math.floor(target - full * m).toLong
      (src, full, rem)
    }
    val fullDf = plan.map(p => (p._1, p._2)).toSeq.toDF(sourceCol, "full_epochs")
    val budDf = plan.filter(_._3 >= 1L).map(p => (p._1, p._3)).toSeq
      .toDF(sourceCol, "budget")
    val extra =
      if (budDf.isEmpty) df.limit(0).select(col(idCol).as("__er_extra"))
      else tokenQuotaBudgets(df, sourceCol, idCol, textCol, budDf, tokenCounter)
        .filter(col("kept")).select(col(idCol).as("__er_extra"))
    df.select(col(idCol), col(sourceCol),
        tokenCounter(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .join(fullDf, Seq(sourceCol)) // #sources rows: AQE broadcast
      .join(extra, col(idCol) === col("__er_extra"), "left")
      .withColumn("epochs",
        col("full_epochs") + when(col("__er_extra").isNotNull, 1L).otherwise(0L))
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("epochs"))
  }

  /** Reference formulation of [[tokenQuota]] (parity pin): the naive
    * single window per group over every row. */
  private[graft] def tokenQuotaNaive(df: DataFrame, groupCol: String,
                                     idCol: String, textCol: String,
                                     budget: Long): DataFrame = {
    val base = df.select(col(idCol).as("__tq_doc"), col(groupCol).as("__tq_grp"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("__tq_key"))
      .filter(col("n_tokens") >= 1)
    val w = Window.partitionBy("__tq_grp").orderBy(col("__tq_key"), col("__tq_doc"))
    base.withColumn("kept",
        sum("n_tokens").over(w) <= budget || row_number().over(w) === 1)
      .select(col("__tq_doc"), col("__tq_grp"), col("n_tokens"), col("kept"))
      .withColumnRenamed("__tq_doc", idCol).withColumnRenamed("__tq_grp", groupCol)
  }
}
