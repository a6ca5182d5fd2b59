package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** X3 similarity search: exact brute-force top-k + IVF recall. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector kernels: dot, norm, cosine") {
    val r = Seq(1).toDF("x").select(
      VectorFunctions.dot(array(lit(1f), lit(2f)), array(lit(3f), lit(4f)))
        .as("dot"),
      VectorFunctions.l2_norm(array(lit(3f), lit(4f))).as("norm"),
      VectorFunctions.cosine(array(lit(1f), lit(0f)), array(lit(1f), lit(0f)))
        .as("same"),
      VectorFunctions.cosine(array(lit(1f), lit(0f)), array(lit(0f), lit(1f)))
        .as("orth"),
      VectorFunctions.cosine(array(lit(0f), lit(0f)), array(lit(1f), lit(0f)))
        .as("zero")).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3)) < 1e-12)
    assert(r.isNullAt(4)) // zero vector -> null, not NaN
  }

  test("bruteForceTopK: self excluded, ranks ordered, k respected") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val out = Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 3), e, "embedding", "vec_id", k = 4)
    val rows = out.orderBy("query_id", "rank").collect()
    assert(rows.length == 12) // 3 queries x 4
    assert(!rows.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("vec_id")))
    val cosines = rows.filter(_.getAs[Long]("query_id") == 0L)
      .map(_.getAs[Double]("cosine")).toSeq
    assert(cosines == cosines.sorted.reverse)
  }

  test("IVF top-k achieves decent recall vs brute force") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(queries, e, "embedding", "vec_id", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val (cent, assigned) = Similarity.ivfIndex(e, "embedding", "vec_id", 10)
    val approx = Similarity.ivfTopK(queries, cent, assigned,
      "embedding", "vec_id", k = 5, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random-ish embeddings + 10 cells probed 4 -> expect ~40%+ overlap;
    // this guards the plumbing, not the statistics
    assert(recall > 0.2, s"recall $recall too low")
    assert(approx.size == exact.size)
  }

  test("ivfIndex: centroid count is fixed at k regardless of corpus size") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val (cent, assigned) = Similarity.ivfIndex(e, "embedding", "vec_id", 16)
    assert(cent.count() == 16)
    // every vector assigned to exactly one of the k cells
    assert(assigned.count() == e.count())
    val cells = assigned.select("centroid_id").distinct().count()
    assert(cells <= 16 && cells > 1)
  }

  test("IVF recall vs exact at sf0.01 scale") {
    val e = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, e, "embedding", "vec_id", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val (cent, assigned) = Similarity.ivfIndex(e, "embedding", "vec_id", 32)
    val approx = Similarity.ivfTopK(queries, cent, assigned,
      "embedding", "vec_id", k = 5, nProbe = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.2, s"recall $recall too low at sf0.01")
  }
}
