package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions._

/** Spark-native installation point: register the engine's custom Catalyst
  * expressions with ANY session via
  *
  * {{{
  *   spark.sql.extensions = graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)` programmatically). After
  * that, pure-SQL users call `ascii_fold`, `fingerprint64`,
  * `token_shingles`, `array_dot`, `array_norm2` with no Scala imports —
  * the injected builders produce the same codegen'd expressions the
  * Column API uses, so there is exactly one implementation per function.
  *
  * This is the `SparkSessionExtensions` tier of the build brief's custom-
  * operator ladder. It also injects
  * [[graft.plans.SimplifyGraftExpressions]], an optimizer
  * `Rule[LogicalPlan]` that collapses redundant applications of the custom
  * expressions. The engine needs no custom LogicalPlan/Strategy because
  * every whole-operator semantic (as-of join, range join, LSH dedup, IVF)
  * composes from built-in operators whose plans Catalyst already optimizes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.SimplifyGraftExpressions)
    ext.injectFunction((FunctionIdentifier("ascii_fold"),
      info("ascii_fold", "ascii_fold(str) - NFKD-normalize and fold to ASCII."),
      exprs => AsciiFold(exprs.head)))
    ext.injectFunction((FunctionIdentifier("fingerprint64"),
      info("fingerprint64", "fingerprint64(str) - 64-bit rolling-hash fingerprint."),
      exprs => Fingerprint64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(str) - one-pass 64-bit SimHash over whitespace tokens."),
      exprs => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("token_shingles"),
      info("token_shingles",
        "token_shingles(str, n) - whitespace-token n-gram shingle array."),
      exprs => TokenShingles(exprs.head, exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"token_shingles size must be a literal, got: $other")
      })))
    ext.injectFunction((FunctionIdentifier("array_dot"),
      info("array_dot", "array_dot(a, b) - float-array dot product as double."),
      exprs => ArrayDot(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("array_norm2"),
      info("array_norm2", "array_norm2(a) - float-array L2 norm as double."),
      exprs => ArrayNorm2(exprs.head)))
    ext.injectFunction((FunctionIdentifier("morton2"),
      info("morton2", "morton2(a, b) - Z-order interleave of two longs."),
      exprs => Morton2(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("array_quantize8"),
      info("array_quantize8",
        "array_quantize8(a) - int8-quantize a vector to struct(scale, q)."),
      exprs => ArrayQuantize8(exprs.head)))
    ext.injectFunction((FunctionIdentifier("array_dequantize8"),
      info("array_dequantize8",
        "array_dequantize8(s) - expand struct(scale, q) back to array<float>."),
      exprs => ArrayDequantize8(exprs.head)))
    ext.injectFunction((FunctionIdentifier("array_normalize"),
      info("array_normalize", "array_normalize(a) - unit-L2 float vector."),
      exprs => ArrayNormalize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("random_project"),
      info("random_project",
        "random_project(a, d[, seed]) - seeded JL projection to d dims."),
      exprs => {
        if (exprs.length < 2 || exprs.length > 3)
          throw new IllegalArgumentException(
            s"random_project takes (a, d[, seed]), got ${exprs.length} " +
              "argument(s)")
        def lit(i: Int): Long = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null =>
            try v.toString.toLong
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"random_project argument ${i + 1} must be an integer " +
                  s"literal, got: $v")
            }
          case other => throw new IllegalArgumentException(
            s"random_project argument ${i + 1} must be a non-null integer " +
              s"literal, got: $other")
        }
        val d = lit(1)
        if (d < 1 || d > Int.MaxValue)
          throw new IllegalArgumentException(
            s"random_project dimension must be in [1, ${Int.MaxValue}], " +
              s"got: $d")
        RandomProject(exprs.head, d.toInt,
          if (exprs.length > 2) lit(2) else 42L)
      }))
    ext.injectFunction((FunctionIdentifier("bloom_count_shingles"),
      info("bloom_count_shingles",
        "bloom_count_shingles(text, bloom, n, k) - shingles of text whose " +
          "k probe bits are all set in the bloom binary."),
      exprs => {
        if (exprs.length != 4)
          throw new IllegalArgumentException(
            s"bloom_count_shingles takes (text, bloom, n, k), got " +
              s"${exprs.length} argument(s)")
        def lit(i: Int): Int = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"bloom_count_shingles argument ${i + 1} must be an integer " +
              s"literal, got: $other")
        }
        BloomCountShingles(exprs.head, exprs(1), lit(2), lit(3))
      }))
    // aggregate functions register bare — the analyzer wraps them in an
    // AggregateExpression during resolution (same as built-in percentile)
    ext.injectFunction((FunctionIdentifier("bloom_shingle_agg"),
      info("bloom_shingle_agg",
        "bloom_shingle_agg(text, n[, numBits[, k]]) - aggregate a shingle " +
          "Bloom filter bitset over a corpus as binary."),
      exprs => {
        if (exprs.length < 2 || exprs.length > 4)
          throw new IllegalArgumentException(
            s"bloom_shingle_agg takes (text, n[, numBits[, k]]), got " +
              s"${exprs.length} argument(s)")
        def lit(i: Int): Int = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"bloom_shingle_agg argument ${i + 1} must be an integer " +
              s"literal, got: $other")
        }
        BloomShingleAgg(exprs.head, lit(1),
          if (exprs.length > 2) lit(2) else 1 << 22,
          if (exprs.length > 3) lit(3) else 5)
      }))
    ext.injectFunction((FunctionIdentifier("sample_k"),
      info("sample_k",
        "sample_k(id, k) - deterministic k-sample of ids per group " +
          "(bottom-k by seeded hash)."),
      exprs => SampleK(exprs.head, exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"sample_k size must be a literal, got: $other")
      })))
    ext.injectFunction((FunctionIdentifier("topk_freq"),
      info("topk_freq",
        "topk_freq(item, k[, capacity]) - Misra-Gries heavy hitters: top k " +
          "items with lower-bound counts in O(capacity) state."),
      exprs => {
        if (exprs.length < 2 || exprs.length > 3)
          throw new IllegalArgumentException(
            s"topk_freq takes (item, k[, capacity]), got ${exprs.length} " +
              "argument(s)")
        def lit(i: Int): Int = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            try v.toString.toInt
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"topk_freq argument ${i + 1} must be an integer literal, " +
                  s"got: $v")
            }
          case other => throw new IllegalArgumentException(
            s"topk_freq argument ${i + 1} must be a literal, got: $other")
        }
        val cap = if (exprs.length > 2) lit(2) else 4096
        TopKFreq(exprs.head, cap, lit(1))
      }))
    ext.injectFunction((FunctionIdentifier("cms_sketch"),
      info("cms_sketch",
        "cms_sketch(item, depth, width) - Count-Min sketch: depth x width " +
          "counter matrix with one-sided point-frequency error."),
      exprs => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"cms_sketch takes (item, depth, width), got ${exprs.length} " +
              "argument(s)")
        def lit(i: Int): Int = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            try v.toString.toInt
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"cms_sketch argument ${i + 1} must be an integer literal, " +
                  s"got: $v")
            }
          case other => throw new IllegalArgumentException(
            s"cms_sketch argument ${i + 1} must be a literal, got: $other")
        }
        CmsSketch(exprs.head, lit(1), lit(2))
      }))
  }
}
