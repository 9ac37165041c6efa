package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

import graft.sketch.Kit

/** Column-function DSL over the registered SQL names, so both
  * `spark.sql("SELECT datasketch_kll(...)")` and
  * `df.agg(functions.datasketch_kll(200, $"x"))` work (SURVEY §7.0).
  * Requires [[Registration.register]] (or the `GraftExtensions` injector)
  * on the session first.
  */
object functions {

  private def call(name: String, cols: Column*): Column = call_function(name, cols: _*)

  // ---- aggregates ---------------------------------------------------------

  def datasketch_quantiles(k: Int, v: Column): Column = call("datasketch_quantiles", lit(k), v)
  def datasketch_kll(k: Int, v: Column): Column = call("datasketch_kll", lit(k), v)
  def datasketch_kll(k: Int, v: Column, elem: String): Column =
    call("datasketch_kll", lit(k), v, lit(elem))
  def datasketch_req(k: Int, v: Column): Column = call("datasketch_req", lit(k), v)
  def datasketch_tdigest(k: Int, v: Column): Column = call("datasketch_tdigest", lit(k), v)
  def datasketch_hll(lgK: Int, v: Column): Column = call("datasketch_hll", lit(lgK), v)
  def datasketch_hll_union(lgK: Int, sk: Column): Column = call("datasketch_hll_union", lit(lgK), sk)
  def datasketch_cpc(lgK: Int, v: Column): Column = call("datasketch_cpc", lit(lgK), v)
  def datasketch_cpc_union(lgK: Int, sk: Column): Column = call("datasketch_cpc_union", lit(lgK), sk)
  def datasketch_theta(v: Column): Column = call("datasketch_theta", v)
  def datasketch_theta(lgK: Int, v: Column): Column = call("datasketch_theta", lit(lgK), v)
  def datasketch_frequent_items(v: Column): Column = call("datasketch_frequent_items", v)
  def datasketch_frequent_items(lgK: Int, v: Column): Column =
    call("datasketch_frequent_items", lit(lgK), v)

  def datasketch_bloom(maxDistinct: Long, fpp: Double, v: Column): Column =
    call("datasketch_bloom", lit(maxDistinct), lit(fpp), v)
  def datasketch_bloom_union(sk: Column): Column = call("datasketch_bloom_union", sk)
  def datasketch_reservoir(k: Int, v: Column): Column =
    call("datasketch_reservoir", lit(k), v)
  def datasketch_reservoir(k: Int, v: Column, elem: String): Column =
    call("datasketch_reservoir", lit(k), v, lit(elem))
  def datasketch_varopt(k: Int, v: Column, weight: Column): Column =
    call("datasketch_varopt", lit(k), v, weight)

  // ---- scalar probes (generic helpers) ------------------------------------

  /** `datasketch_<family>_<fn>(args...)` for any of the 78 scalar names. */
  def sketch_fn(family: String, fn: String, args: Column*): Column =
    call(s"datasketch_${family}_$fn", args: _*)

  def datasketch_kll_quantile(sk: Column, rank: Double, inclusive: Boolean = true): Column =
    call("datasketch_kll_quantile", sk, lit(rank), lit(inclusive))
  def datasketch_kll_rank(sk: Column, item: Column, inclusive: Boolean = true): Column =
    call("datasketch_kll_rank", sk, item, lit(inclusive))
  def datasketch_hll_estimate(sk: Column): Column = call("datasketch_hll_estimate", sk)
  def datasketch_cpc_estimate(sk: Column): Column = call("datasketch_cpc_estimate", sk)
  def datasketch_theta_estimate(sk: Column): Column = call("datasketch_theta_estimate", sk)
  def datasketch_theta_union(a: Column, b: Column): Column = call("datasketch_theta_union", a, b)
  def datasketch_theta_intersect(a: Column, b: Column): Column =
    call("datasketch_theta_intersect", a, b)
  def datasketch_theta_a_not_b(a: Column, b: Column): Column =
    call("datasketch_theta_a_not_b", a, b)
  def datasketch_frequent_items_estimate(sk: Column, item: Column): Column =
    call("datasketch_frequent_items_estimate", sk, item)
  def datasketch_frequent_items_get_frequent(sk: Column): Column =
    call("datasketch_frequent_items_get_frequent", sk)
  def datasketch_bloom_might_contain(sk: Column, v: Column): Column =
    call("datasketch_bloom_might_contain", sk, v)
  def datasketch_reservoir_samples(sk: Column, elem: String = "double"): Column =
    call("datasketch_reservoir_samples", sk, lit(elem))
  def datasketch_varopt_samples(sk: Column, elem: String = "double"): Column =
    call("datasketch_varopt_samples", sk, lit(elem))

  // ---- sketch-typed column helper ----------------------------------------

  /** Alias a sketch column, attaching the family/element-type metadata the
    * bind layer uses for alias-type dispatch (the reference's named BLOB
    * alias types, SURVEY §1.2). Use when persisting sketches:
    * `df.select(as_sketch(datasketch_kll(200, $"x"), "sk", "kll", "long"))`. */
  def as_sketch(c: Column, name: String, family: String, elem: String = "double"): Column = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(Registration.FamilyTag, family)
      .putString(Registration.ElemTag, elem)
      .build()
    c.as(name, md)
  }
}
