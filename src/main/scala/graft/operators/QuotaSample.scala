package graft.operators

import org.apache.spark.sql.DataFrame
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
}
