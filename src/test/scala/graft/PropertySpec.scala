package graft

import graft.operators.DistinctAndFrequency
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style checks on randomized inputs — the reference's test
  * style (synthetic tables with known ground truth + partition
  * invariance, platform/.../utils/TestTables.java, HistSketchTest
  * partition-split assertions). Generators are driven by fixed seeds so
  * runs are reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("MG + exact verify equals exact heavy hitters on random data") {
    samples(Gen.listOfN(300, Gen.chooseNum(0, 20)), 5).foreach { keys =>
      val df = keys.map(_.toString).toDF("k")
      val exact = DistinctAndFrequency.heavyHittersExact(df, Seq("k"), 0.1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val mg = DistinctAndFrequency.heavyHittersMG(df, Seq("k"), 0.1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(mg == exact, s"keys=${keys.take(20)}…")
    }
  }

  test("histogram counts are repartition-invariant on random data") {
    samples(Gen.listOfN(200, Gen.chooseNum(0.0, 100.0)), 5).foreach { vs =>
      val df = vs.toDF("v")
      def hist(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Histograms.histogram1D(d,
          graft.operators.Histograms.numericBucket(col("v"), 0.0, 100.0, 10))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(hist(df) == hist(df.repartition(7)))
    }
  }

  test("TopKByKey equals sort-take per key on random data") {
    val gen = Gen.listOfN(200, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0.0, 1.0)))
    samples(gen, 5).foreach { rows =>
      val data = rows.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) }
      val df = data.toDF("key", "score", "id")
      val got = graft.functions.TopKByKey.topKPerKey(df, "key", "score", "id", 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val expect = data.groupBy(_._1).flatMap { case (k, grp) =>
        grp.sortBy(t => (-t._2, t._3)).take(3).zipWithIndex
          .map { case (t, idx) => (k, idx + 1, t._3) }
      }.toSet
      assert(got == expect)
    }
  }

  test("GroupTopK equals sort-take per key on random data") {
    samples(Gen.listOfN(150, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0.0, 1.0))), 3)
      .foreach { rows =>
        val data = rows.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) }
        val df = data.toDF("key", "score", "id")
        val got = graft.plans.GroupTopK.groupTopK(df, Seq("key"),
            Seq(("score", false), ("id", true)), 3)
          .select("key", "rank", "id")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        val expect = data.groupBy(_._1).flatMap { case (k, grp) =>
          grp.sortBy(t => (-t._2, t._3)).take(3).zipWithIndex
            .map { case (t, idx) => (k, idx + 1, t._3) }
        }.toSet
        assert(got == expect)
      }
  }

  test("laplace noise: zero scale is exact; nonzero is deterministic") {
    val df = (1 to 10).toDF("k")
    val zero = df.select(graft.functions.Quantization.laplaceNoise(col("k"), 0.0).as("n"))
      .collect().map(_.getDouble(0))
    assert(zero.forall(_ == 0.0))
    val a = df.select(graft.functions.Quantization.laplaceNoise(col("k"), 1.0).as("n"))
      .collect().map(_.getDouble(0))
    val b = df.select(graft.functions.Quantization.laplaceNoise(col("k"), 1.0).as("n"))
      .collect().map(_.getDouble(0))
    assert(a.sameElements(b) && a.exists(_ != 0.0))
  }

  test("schema file round-trip") {
    val li = graft.engine.Tables.lineitem(spark, sf)
    val tmp = java.nio.file.Files.createTempFile("graft_schema", ".schema")
    graft.sources.Sources.writeSchemaFile(li.schema, tmp.toString)
    val back = graft.sources.Sources.readSchemaFile(tmp.toString)
    assert(back.fields.map(_.name).sameElements(li.schema.fields.map(_.name)))
  }
}
