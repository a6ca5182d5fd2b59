package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** Hashed-feature linear quality scoring: weight table determinism,
  * hand-computed scores, degenerate docs, partition invariance. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private lazy val docs = Seq(
    (0L, "alpha beta alpha"),
    (1L, "gamma"),
    (2L, "   "),          // token-less after trim
    (3L, null.asInstanceOf[String])) // dropped entirely
    .toDF("doc_id", "text")

  test("seededWeights: in [-1, 1], deterministic, JVM-rebuildable") {
    val w = QualityModel.seededWeights(spark, dim).orderBy("feature_id")
      .as[(Long, Double)].collect()
    assert(w.length == dim)
    assert(w.forall { case (_, v) => v >= -1.0 && v <= 1.0 })
    val expected = (0 until dim).map { f =>
      (graft.functions.PortableHash.hash48(s"w:$f", 42L) % 2001L - 1000L) /
        1000.0
    }
    assert(w.map(_._2).toSeq == expected)
  }

  test("score is the mean feature weight; token-less -> 0; null dropped") {
    val w = QualityModel.seededWeights(spark, dim)
    val out = QualityModel.scoreHashedLinear(docs, "text", "doc_id", w, dim)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L)) // null dropped
    def wOf(tok: String): Double = {
      val f = graft.functions.PortableHash.hash48(tok, 42L) % dim
      (graft.functions.PortableHash.hash48(s"w:$f", 42L) % 2001L - 1000L) /
        1000.0
    }
    val expected0 = (wOf("alpha") + wOf("beta") + wOf("alpha")) / 3.0
    assert(math.abs(out(0).getDouble(1) - expected0) < 1e-12)
    assert(out(0).getLong(2) == 3L)
    assert(math.abs(out(1).getDouble(1) - wOf("gamma")) < 1e-12)
    assert(out(2).getDouble(1) == 0.0 && out(2).getLong(2) == 0L)
  }

  test("partition-invariant (the hashed join and mean don't depend on " +
      "layout)") {
    val w = QualityModel.seededWeights(spark, dim)
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityModel.scoreHashedLinear(df, "text", "doc_id", w, dim)
        .select(col("doc_id"),
          floor(col("score") * 1e6 + 0.5).cast("long").as("s"))
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("keepProbability: logistic in (0,1), monotone in score") {
    val w = QualityModel.seededWeights(spark, 1024)
    val p = QualityModel.keepProbability(
      QualityModel.scoreHashedLinear(docs, "text", "doc_id", w, 1024))
      .select("score", "p_keep").as[(Double, Double)].collect()
    assert(p.forall { case (_, pk) => pk > 0.0 && pk < 1.0 })
    val sorted = p.sortBy(_._1)
    assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq)
  }

  test("sparse trained model: missing features contribute 0, not null") {
    // weights covering only feature ids {0}: every other token's feature
    // is absent and must act as weight 0 — the sparse-model contract
    val sparse = Seq((0L, 0.5)).toDF("feature_id", "weight")
    val out = QualityModel.scoreHashedLinear(docs, "text", "doc_id",
        sparse, dim)
      .orderBy("doc_id").collect()
    assert(out.forall(r => !r.isNullAt(1)))
  }
}
