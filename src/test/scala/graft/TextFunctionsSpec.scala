package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => GF, TextKernels}

/** F1 ascii_fold (reference graph_db_builder.py:521-527 NFKD fallback) and
  * the text-analysis function surface. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("asciiFold kernel: NFKD cases") {
    assert(TextKernels.asciiFoldString("Café") == "Cafe")
    assert(TextKernels.asciiFoldString("naïve façade") == "naive facade")
    assert(TextKernels.asciiFoldString("héllo wörld") == "hello world")
    // no ASCII decomposition -> dropped (reference encode('ascii','ignore'))
    assert(TextKernels.asciiFoldString("中文abc") == "abc")
    // NFKD(½) = "1⁄2" with U+2044 fraction slash, which is non-ASCII
    assert(TextKernels.asciiFoldString("½") == "12")
    assert(TextKernels.asciiFoldString("plain ascii") == "plain ascii")
  }

  test("gopher_rules: per-rule booleans and conjunction") {
    val docs = Seq(
      // passes all four rules (>= 5 words, sane word length, stopwords,
      // little punctuation)
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      // too short
      (2L, "tiny text here"),
      // no stopwords at all
      (3L, "alpha bravo charlie delta echo foxtrot golf hotel india"),
      // symbol storm: punct-per-word ratio over 0.5
      (4L, "a! the!! b@# c$% d^& e*( f)! g#@ h%$ the"),
      // empty: every rule fails, no division blows up
      (5L, ""))
      .toDF("id", "text")
    val out = docs.select(col("id"),
      GF.gopher_rules(col("text"), minWords = 5).as("g"))
      .orderBy("id")
      .select("id", "g.words_ok", "g.mean_word_ok", "g.stopwords_ok",
        "g.symbol_ok", "g.pass")
      .collect()
    assert(out(0).getBoolean(1) && out(0).getBoolean(3) &&
      out(0).getBoolean(5)) // doc 1 passes
    assert(!out(1).getBoolean(1) && !out(1).getBoolean(5)) // too short
    assert(!out(2).getBoolean(3) && !out(2).getBoolean(5)) // no stopwords
    assert(!out(3).getBoolean(4) && !out(3).getBoolean(5)) // symbol-heavy
    assert(!out(4).getBoolean(1) && !out(4).getBoolean(4) &&
      !out(4).getBoolean(5)) // empty
  }

  test("ascii_fold expression folds inside a dataframe plan") {
    GF.register(spark)
    val out = Seq("Café", "中文x", "ok").toDF("s")
      .select(GF.ascii_fold(col("s")).as("f")).as[String].collect()
    assert(out.toSeq == Seq("Cafe", "x", "ok"))
  }

  test("ascii_fold is null-safe") {
    GF.register(spark)
    val out = Seq(Option("Café"), None).toDF("s")
      .select(GF.ascii_fold(col("s")).as("f")).collect()
    assert(out(1).isNullAt(0))
  }

  test("fingerprint64: deterministic, order-sensitive") {
    GF.register(spark)
    val out = Seq("ab", "ba", "ab").toDF("s")
      .select(GF.fingerprint64(col("s")).as("fp")).as[Long].collect()
    assert(out(0) == out(2))
    assert(out(0) != out(1))
  }

  test("token counts and ratios") {
    val df = Seq("the quick brown fox", "  ", "one", "hi, world!").toDF("s")
      .select(
        GF.token_count_ws(col("s")).as("ws"),
        GF.punct_ratio(col("s")).as("pr"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 4)
    assert(rows(1).getInt(0) == 0)
    assert(rows(2).getInt(0) == 1)
    assert(rows(3).getInt(0) == 2)
    assert(rows(3).getDouble(1) > 0.0) // ", !" are punct
  }

  test("token_count_bpe counts word pieces + punctuation marks") {
    val out = Seq("hi, world!", "a--b", "one", "", "  ").toDF("s")
      .select(GF.token_count_bpe(col("s")).as("n")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(4, 4, 1, 0, 0))
  }

  test("stopword ratio: exact token matches incl. adjacent stopwords") {
    val out = Seq("a a a", "the cat", "atheist theory", "cat dog").toDF("s")
      .select(GF.stopword_ratio(col("s")).as("r")).collect().map(_.getDouble(0))
    assert(out(0) == 1.0)          // adjacent stopwords all counted
    assert(out(1) == 0.5)
    assert(out(2) == 0.0)          // substrings are not token matches
    assert(out(3) == 0.0)
  }

  test("stopword ratio and quality score band") {
    val good = "the quick brown fox jumps over the lazy dog and runs to " +
      "the forest where it is safe and the sun shines on the hills"
    val junk = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( ))))"
    val df = Seq(good, junk).toDF("s").select(
      GF.stopword_ratio(col("s")).as("sr"),
      GF.quality_score(col("s")).as("q"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) > 0.2)            // prose has stopwords
    assert(rows(0).getDouble(1) > rows(1).getDouble(1)) // prose beats junk
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("redact_pii: emails and IPv4 replaced, prose untouched") {
    val out = Seq(
      "reach me at jo.doe+spam@sub.example.co.uk or 192.168.1.254 today",
      "no pii here, just 3.14 and 12.345 floats",
      "a@b.io x",
      // known \b caveat (identical in Java regex and RE2, so redaction is
      // engine-consistent): dotted version strings over-redact
      "see v1.2.3.4.5")
      .toDF("s").select(GF.redact_pii(col("s"))).as[String].collect()
    assert(out(0) == "reach me at [EMAIL] or [IP] today")
    assert(out(1) == "no pii here, just 3.14 and 12.345 floats")
    assert(out(2) == "[EMAIL] x")
    assert(out(3) == "see v1.[IP]")
  }

  test("reading_ease: hand-computed Flesch/FK closed form, sentence " +
    "clamp, wordless text null") {
    val rows = Seq(
      "The cat sat. It ran!",  // 5 words, 2 sentence runs, 5 vowel groups
      "no punctuation here",   // sentence count clamps to 1
      "123 !!!")               // wordless → null scores
      .toDF("s").select(GF.reading_ease(col("s")).as("r"))
      .select("r.n_words", "r.n_sentences", "r.n_syllables", "r.flesch",
        "r.fk_grade").collect()
    assert(rows(0).getLong(0) == 5L && rows(0).getLong(1) == 2L &&
      rows(0).getLong(2) == 5L)
    val ws = 5.0 / 2.0
    val yw = 5.0 / 5.0
    assert(rows(0).getDouble(3) == 206.835 - 1.015 * ws - 84.6 * yw)
    assert(rows(0).getDouble(4) == 0.39 * ws + 11.8 * yw - 15.59)
    assert(rows(1).getLong(1) == 1L)
    assert(rows(2).getLong(0) == 0L && rows(2).isNullAt(3) &&
      rows(2).isNullAt(4))
  }

  test("repetition_ratio: repeats score high, unique prose zero, empty zero") {
    val out = Seq("buy now buy now buy now", "all tokens here differ", "", "x")
      .toDF("s").select(GF.repetition_ratio(col("s"))).as[Double].collect()
    assert(math.abs(out(0) - (1.0 - 2.0 / 6)) < 1e-12)
    assert(out(1) == 0.0)
    assert(out(2) == 0.0)
    assert(out(3) == 0.0)
  }

  test("blocklist: word-boundary hits (no substring bleed), phrases, " +
      "case folding, keep flag, hostile terms rejected") {
    val terms = Seq("spam", "click here")
    val rows = Seq(
      (1L, "pure SPAM and more spam"),        // 2 hits (case-folded)
      (2L, "antispam spammer specials"),      // substrings only -> 0
      (3L, "please Click Here now"),          // phrase hit
      (4L, "clean prose about engines")
    ).toDF("id", "text")
    val out = rows.select(col("id"),
        GF.blocklist_hits(col("text"), terms).as("h"),
        GF.blocklist_ok(col("text"), terms).as("ok"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((2, false)))
    assert(out(2L) == ((0, true)))
    assert(out(3L) == ((1, false)))
    assert(out(4L) == ((0, true)))
    intercept[IllegalArgumentException] {
      GF.blocklist_hits(col("text"), Seq("a.b|.*"))
    }
  }

  test("lang_id markers") {
    val df = Seq(
      "the cat and the dog of the house",
      "der Hund und die Katze ist schnell",
      "le chat et la maison des amis",
      "我是中国人的",
      "zzz qqq xxx").toDF("s")
      .select(GF.lang_id(col("s")).as("l")).as[String].collect()
    assert(df.toSeq == Seq("en", "de", "fr", "zh", "und"))
  }
}
