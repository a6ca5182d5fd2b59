package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` makes the engine's custom
  * expressions first-class SQL functions in a vanilla session — no Scala
  * imports, no register() call. Needs its own SparkSession (extensions bind
  * at session build), so this suite does not share [[SparkSpec]]'s. */
class GraftExtensionsSpec extends AnyFunSuite {

  // Extensions bind at session CREATION: getOrCreate would silently hand
  // back the suite-shared session (without extensions) when this runs in
  // the full test sweep, so step around the default/active session, build
  // a genuinely new one (same SparkContext), and restore. withExtensions
  // (programmatic) rather than the `spark.sql.extensions` config string:
  // the string is a STATIC conf that only applies when the SparkContext is
  // first created, which a shared-suite JVM can't guarantee — both routes
  // run the same GraftExtensions.apply.
  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    prevDefault match {
      case Some(d) => SparkSession.setDefaultSession(d)
      case None => SparkSession.clearDefaultSession()
    }
    prevActive match {
      case Some(a) => SparkSession.setActiveSession(a)
      case None => SparkSession.clearActiveSession()
    }
    s
  }

  test("pure SQL reaches every injected expression") {
    val r = spark.sql(
      """SELECT
        |  ascii_fold('Café déjà') AS folded,
        |  fingerprint64('hello world') AS fp,
        |  token_shingles('a b c d', 2) AS sh,
        |  array_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |  array_norm2(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nrm,
        |  morton2(3, 3) AS z,
        |  array_dequantize8(array_quantize8(
        |    array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT)))) AS deq,
        |  array_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS un
        |""".stripMargin).head()
    assert(r.getAs[String]("folded") == "Cafe deja")
    assert(r.getAs[Long]("fp") ==
      graft.functions.TextKernels.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(r.getAs[scala.collection.Seq[String]]("sh").toSeq ==
      Seq("a b", "b c", "c d"))
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Double]("nrm") == 5.0)
    assert(r.getAs[Long]("z") == 15L)
    val deq = r.getAs[scala.collection.Seq[Float]]("deq")
    assert(math.abs(deq(0) - 1.0f) < 0.01f && math.abs(deq(1) + 0.5f) < 0.01f)
    val un = r.getAs[scala.collection.Seq[Float]]("un")
    assert(math.abs(un(0) - 0.6f) < 1e-6)
  }

  test("injected functions agree with the Column-API surface") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("Smörgåsbord — Åland").toDF("s")
    val viaSql = spark.sql("SELECT ascii_fold('Smörgåsbord — Åland') AS f")
      .head().getString(0)
    val viaCol = df.select(
      graft.functions.GraftFunctions.ascii_fold(col("s"))).head().getString(0)
    assert(viaSql == viaCol)
  }

  test("sample_k works as a SQL aggregate (analyzer wraps the bare function)") {
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 9L))
      .toDF("g", "id").createOrReplaceTempView("skt")
    val rows = spark.sql(
      "SELECT g, sample_k(id, 2) AS s FROM skt GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).getAs[scala.collection.Seq[Long]]("s").size == 2)
    assert(rows(1).getAs[scala.collection.Seq[Long]]("s").toSeq == Seq(9L))
  }

  test("optimizer rule collapses redundant ascii_fold applications") {
    import spark.implicits._
    // non-foldable input (id) so ConstantFolding can't erase the whole
    // expression — the rule must do the collapse
    val doubled = spark.sql(
      "SELECT ascii_fold(ascii_fold(concat('Café', id))) AS f FROM range(2)")
    // semantics preserved
    assert(doubled.as[String].collect().sorted.toSeq == Seq("Cafe0", "Cafe1"))
    // and the optimized plan runs the NFKD pass once, not twice
    val optimized = doubled.queryExecution.optimizedPlan.toString
    assert("asciifold|ascii_fold".r.findAllIn(optimized.toLowerCase).size == 1,
      optimized)
  }

  test("random_project works from SQL") {
    val row = spark.sql(
      "SELECT size(random_project(array(1.0f, 2.0f, 3.0f), 4)) AS d").head()
    assert(row.getInt(0) == 4)
  }

  test("topk_freq works as a SQL aggregate") {
    import spark.implicits._
    (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z"))
      .toDF("tk").createOrReplaceTempView("hht")
    val row = spark.sql(
      "SELECT topk_freq(tk, 2, 16) AS hh FROM hht").head()
    val hh = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hh")
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 5L), ("y", 3L)))
  }

  test("cms_sketch works as a SQL aggregate") {
    import spark.implicits._
    (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z"))
      .toDF("tk").createOrReplaceTempView("cmst")
    val sk = spark.sql("SELECT cms_sketch(tk, 2, 64) AS sk FROM cmst")
      .head().getSeq[scala.collection.Seq[Long]](0)
    assert(sk.length == 2 && sk.forall(_.length == 64))
    assert(sk.forall(_.sum == 9L))
    intercept[Exception] {
      spark.sql("SELECT cms_sketch(tk, 2) FROM cmst").collect()
    }
  }

  test("bloom agg + probe work from pure SQL (build once, probe rows)") {
    import spark.implicits._
    Seq("the quick brown fox", "the quick brown dog")
      .toDF("q").createOrReplaceTempView("bench_sql")
    Seq((1L, "a sentence with the quick brown fox inside"),
        (2L, "nothing shared at all here"))
      .toDF("id", "t").createOrReplaceTempView("corpus_sql")
    val out = spark.sql(
      """SELECT c.id,
        |  bloom_count_shingles(c.t, b.bl, 3, 5) AS n
        |FROM corpus_sql c CROSS JOIN
        |  (SELECT bloom_shingle_agg(q, 3, 1024, 5) AS bl
        |   FROM bench_sql) b
        |ORDER BY c.id""".stripMargin)
      .as[(Long, Int)].collect().toSeq
    assert(out.head._2 > 0)     // overlapping doc probes positive
    assert(out(1)._2 == 0)      // disjoint doc provably clean
  }

  test("non-literal shingle size fails with a clear message") {
    val e = intercept[Exception](
      spark.sql("SELECT token_shingles('a b', 1 + 1)").head())
    assert(e.getMessage.contains("literal"))
  }
}
