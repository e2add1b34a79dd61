package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join result on skewed data") {
    // one celebrity key (0) owning 90% of rows
    val skewed = spark.range(0, 10000).toDF("i")
      .withColumn("k", when(col("i") % 10 =!= 0, lit(0L)).otherwise(col("i") % 100))
      .withColumn("payload", col("i") * 2)
      .select("k", "payload")
    val dim = spark.range(0, 100).toDF("k").withColumn("name", concat(lit("n"), col("k")))

    val salted = SkewJoin.saltedEquiJoin(skewed, dim, Seq("k"), salt = 8)
    val plain = skewed.join(dim, Seq("k"))

    assert(salted.count() === plain.count())
    assert(salted.agg(sum("payload")).as[Long].head() ===
      plain.agg(sum("payload")).as[Long].head())
    assert(salted.columns.toSet === Set("k", "payload", "name"))
  }
}
