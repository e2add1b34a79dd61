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

  test("left outer keeps unmatched skewed-side rows exactly once") {
    // keys 0..49 match the dim; keys 50..99 are unmatched
    val skewed = spark.range(0, 1000).toDF("i")
      .withColumn("k", col("i") % 100)
      .select("k", "i")
    val dim = spark.range(0, 50).toDF("k").withColumn("name", concat(lit("n"), col("k")))
    val salted = SkewJoin.saltedEquiJoin(skewed, dim, Seq("k"), salt = 4, joinType = "left")
    val plain = skewed.join(dim, Seq("k"), "left")
    assert(salted.count() === plain.count()) // unmatched rows NOT multiplied by salt
    assert(salted.filter(col("name").isNull).count() ===
      plain.filter(col("name").isNull).count())
  }

  test("right/full outer are rejected: replicated rows would emit salt times") {
    val l = Seq((1L, "a")).toDF("k", "v")
    val r = Seq((2L, "b")).toDF("k", "w")
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(l, r, Seq("k"), joinType = "right"))
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(l, r, Seq("k"), joinType = "full_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(l, r, Seq("k"), joinType = "outer"))
  }
}
