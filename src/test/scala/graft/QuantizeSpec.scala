package graft

import org.apache.spark.sql.functions._

import operators.Quantize

/** Int8 embedding quantization: reconstruction stays inside the
  * analytical scale/2 band, quantized cosine tracks true cosine, and the
  * zero vector round-trips without dividing by zero. */
class QuantizeSpec extends SparkTestBase {

  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("reconstruction error bounded by scale/2 per element") {
    val q = Quantize.quantizeInt8(embeddings)
    val bad = q.select(
        zip_with(col("embedding"),
          Quantize.dequantizeInt8(col("q_codes"), col("q_scale")),
          (orig, rec) => abs(orig.cast("double") - rec.cast("double")))
          .as("errs"),
        col("q_scale"))
      // float32 reconstruction adds one rounding step on top of the
      // analytical scale/2 bound — allow one ulp-ish epsilon
      .filter(exists(col("errs"), e => e > col("q_scale") / 2 + lit(1e-6)))
      .count()
    assert(bad == 0L, s"$bad vectors exceed the scale/2 reconstruction band")
  }

  test("codes live in [-127, 127] and the max-|v| element hits ±127") {
    val stats = Quantize.quantizeInt8(embeddings)
      .select(array_max(col("q_codes")).as("mx"), array_min(col("q_codes")).as("mn"),
        array_max(transform(col("q_codes"), c => abs(c))).as("amax"))
    assert(stats.filter(col("mx") > 127 || col("mn") < -127).count() == 0L)
    // symmetric scheme: every non-zero vector has at least one ±127 code
    assert(stats.filter(col("amax") =!= 127).count() == 0L)
  }

  test("quantized cosine within 0.02 of exact cosine on real pairs") {
    val q = Quantize.quantizeInt8(embeddings).limit(50)
      .select(col("vec_id"), col("embedding"), col("q_scale"), col("q_codes"))
    val a = q.select(col("vec_id").as("ia"), col("embedding").as("ea"),
      col("q_scale").as("sa"), col("q_codes").as("ca"))
    val b = q.select(col("vec_id").as("ib"), col("embedding").as("eb"),
      col("q_scale").as("sb"), col("q_codes").as("cb"))
    val pairs = a.join(b, col("ia") < col("ib"))
      .select(
        call_function("graft_cosine", col("ea"), col("eb")).as("exact"),
        Quantize.quantizedCosine(col("ca"), col("sa"), col("cb"), col("sb"))
          .as("approx"))
    val worst = pairs.select(max(abs(col("exact") - col("approx")))).head().getDouble(0)
    assert(worst < 0.02, s"quantized cosine drifts $worst from exact")
  }

  test("packed lane: bytes equal the oracle-pinned INT codes; packedCosine " +
    "equals quantizedCosine") {
    val both = Quantize.quantizeInt8Packed(
      Quantize.quantizeInt8(embeddings).drop("q_scale"))
    // byte-for-byte: packed code i == INT code i for every vector
    val rows = both.select(col("q_codes"), col("q_bytes")).collect()
    val mismatched = rows.count { r =>
      val codes = r.getSeq[Int](0)
      val bytes = r.getAs[Array[Byte]](1)
      codes.size != bytes.length ||
        codes.indices.exists(i => codes(i).toByte != bytes(i))
    }
    assert(mismatched == 0, s"$mismatched vectors pack differently than they quantize")

    // scales cancel: packedCosine ≡ quantizedCosine on real pairs
    val p = both.limit(30).select(col("vec_id"), col("q_codes"), col("q_scale"), col("q_bytes"))
    val a = p.select(col("vec_id").as("ia"), col("q_codes").as("ca"),
      col("q_scale").as("sa"), col("q_bytes").as("ba"))
    val b = p.select(col("vec_id").as("ib"), col("q_codes").as("cb"),
      col("q_scale").as("sb"), col("q_bytes").as("bb"))
    val worst = a.join(b, col("ia") < col("ib"))
      .select(max(abs(
        Quantize.quantizedCosine(col("ca"), col("sa"), col("cb"), col("sb")) -
          Quantize.packedCosine(col("ba"), col("bb")))))
      .head().getDouble(0)
    assert(worst < 1e-12, s"packed and unpacked cosine diverge by $worst")
  }

  test("zero vector quantizes to zero codes and reconstructs to zeros") {
    import spark.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(df).orderBy("vec_id").collect()
    assert(q(0).getSeq[Int](q(0).fieldIndex("q_codes")) == Seq(0, 0, 0))
    assert(q(0).getAs[Double]("q_scale") == 0.0)
    assert(q(1).getSeq[Int](q(1).fieldIndex("q_codes")).map(_.abs).max == 127)
  }
}
