package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** End-to-end corpus curation: every drop attributable to its stage. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val longClean =
    "the quick brown fox jumps over the lazy dog and then the dog " +
      "wanders off to find a quiet spot in the garden for a nap"

  test("curateCorpus: each stage drops exactly its targets, report totals") {
    val bench = Seq((100L, "what is the capital of france paris obviously"))
      .toDF("qid", "question")
    val docs = Seq(
      (1L, "en", longClean), // kept
      (2L, "en", longClean), // exact dup of 1 → dedup drop
      (3L, "en", "too short"), // quality drop
      (4L, "en", "trivia time what is the capital of france paris " +
        "obviously said the guide while we all listened and took notes " +
        "on the long walking tour of the old city"), // decontamination drop
      (5L, "fr", longClean + " encore une fois pour la version francaise"))
      .toDF("doc_id", "lang", "text")
    val (kept, report) = Curation.curateCorpus(
      docs, "text", "doc_id", bench, "question", "qid",
      minWords = 5, contaminationShingle = 4)
    val decisions = report.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(decisions(3L) == ("quality", "dropped"))
    assert(decisions(2L) == ("dedup", "dropped"))
    assert(decisions(4L) == ("decontamination", "dropped"))
    assert(decisions(1L) == ("kept", "kept"))
    assert(decisions(5L) == ("kept", "kept"))
    assert(decisions.size == 5) // one verdict per input doc, no gaps
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 5L))
    assert(kept.columns.toSeq == docs.columns.toSeq) // schema untouched
  }

  test("curateCorpus: quota stage caps per group and is attributable") {
    val bench = Seq((9L, "zzz qqq yyy xxx www")).toDF("qid", "question")
    // 6 distinct long-enough docs in one lang, quota 2
    val docs = (1L to 6L).map(i =>
      (i, "en", longClean +
        s" alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"))
      .toDF("doc_id", "lang", "text")
    val (kept, report) = Curation.curateCorpus(
      docs, "text", "doc_id", bench, "question", "qid",
      minWords = 5, quotaGroupCol = Some("lang"), quotaPerGroup = 2)
    assert(kept.count() == 2)
    val byStage = report.groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("quota") == 4L && byStage("kept") == 2L)
    // deterministic: same quota winners on re-run
    val (kept2, _) = Curation.curateCorpus(
      docs, "text", "doc_id", bench, "question", "qid",
      minWords = 5, quotaGroupCol = Some("lang"), quotaPerGroup = 2)
    assert(kept2.select("doc_id").as[Long].collect().sorted.toSeq ==
      kept.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("curateCorpus: temperature mode rebalances groups, attributes " +
      "drops to the temperature stage, matches temperatureSample") {
    val bench = Seq((9L, "zzz qqq yyy xxx www")).toDF("qid", "question")
    // 40 en docs vs 10 fr docs, all clean/distinct — temperature α=0.5
    // toward 25 total keeps ∝ √n: en rate 25·√40/(√40+√10)/40 ≈ 0.42,
    // fr rate 25·√10/(√40+√10)/10 ≈ 0.83 — fr keeps a HIGHER fraction.
    val docs = ((1L to 40L).map(i => (i, "en",
        longClean + s" alpha$i beta$i gamma$i delta$i epsilon$i")) ++
      (101L to 110L).map(i => (i, "fr",
        longClean + s" omega$i psi$i chi$i phi$i upsilon$i")))
      .toDF("doc_id", "lang", "text")
    val (kept, report) = Curation.curateCorpus(
      docs, "text", "doc_id", bench, "question", "qid",
      minWords = 5, quotaGroupCol = Some("lang"),
      temperatureAlpha = Some(0.5), temperatureTarget = 25L)
    val byStage = report.groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage.contains("temperature") && !byStage.contains("quota"))
    assert(byStage("temperature") + byStage("kept") == 50L)
    // the composed stage IS temperatureSample over the decon survivors
    // (all 50 docs survive the earlier stages here)
    val direct = graft.operators.Sampling.temperatureSample(
        docs, "lang", "doc_id", 0.5, 25L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == direct)
    // fr's realized keep fraction must exceed en's (the rebalance point)
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptByLang.getOrElse("fr", 0L) * 40L >
      keptByLang.getOrElse("en", 0L) * 10L)
  }

  test("curateCorpus: temperatureAlpha without quotaGroupCol fails fast") {
    val df = Seq((1L, "en", longClean)).toDF("doc_id", "lang", "text")
    intercept[IllegalArgumentException] {
      Curation.curateCorpus(df, "text", "doc_id", df, "text", "doc_id",
        temperatureAlpha = Some(0.5), temperatureTarget = 10L)
    }
  }

  test("domainCap: host parsing handles scheme/userinfo/port/path; cap " +
      "keeps the k best per host deterministically") {
    import org.apache.spark.sql.functions._
    val urls = Seq(
      (1L, "https://a.com/x", 10),
      (2L, "http://user@b.org:8080/p?q#f", 10),
      (3L, "c.net/path", 10),
      (4L, "https://d.io", 10),
      (5L, "https://a.com/y", 30),
      (6L, "https://a.com/z", 20)
    ).toDF("doc_id", "url", "score")
    val hosts = urls.select(col("doc_id"),
        Curation.urlHost(col("url")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(hosts == Map(1L -> "a.com", 2L -> "b.org", 3L -> "c.net",
      4L -> "d.io", 5L -> "a.com", 6L -> "a.com"))
    val kept = Curation.domainCap(urls, "url", 2,
      Seq(col("score").desc, col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    // a.com keeps its two best (5: score 30, 6: score 20); 1 is dropped
    assert(kept == Set(2L, 3L, 4L, 5L, 6L))
    val re = Curation.domainCap(urls.repartition(5), "url", 2,
      Seq(col("score").desc, col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    assert(re == kept)
  }

  test("curateCorpus under Checkpointer.Reliable matches Local") {
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cur-ckpt").toString)
    val bench = Seq((100L, "held out eval question nothing shared"))
      .toDF("qid", "question")
    val docs = Seq(
      (1L, "en", longClean), (2L, "en", longClean), (3L, "en", "too short"))
      .toDF("doc_id", "lang", "text")
    def verdicts(ckpt: Checkpointer) =
      Curation.curateCorpus(docs, "text", "doc_id", bench, "question",
        "qid", minWords = 5, ckpt = ckpt)._2
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
        .toMap
    assert(verdicts(Checkpointer.Reliable) == verdicts(Checkpointer.Local))
  }

  test("canonicalizeUrl: fragment, case, default-port, and tracking-param " +
      "identities collapse; path case, param order, userinfo, and " +
      "non-default ports survive") {
    val cases = Seq(
      // the flagship identity: every normalization at once
      "HTTP://Example.COM:80/Path/A?utm_source=x&q=1&gclid=z#frag" ->
        "http://example.com/Path/A?q=1",
      // https default port + empty path + fragment
      "https://A.com:443#Sec" -> "https://a.com/",
      // only tracking params → the '?' disappears entirely
      "https://a.com/p?utm_campaign=z&fbclid=y" -> "https://a.com/p",
      // remaining params keep their original order (never sorted)
      "https://a.com/p?b=2&a=1" -> "https://a.com/p?b=2&a=1",
      // non-default port is semantic: kept
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // path case is semantic: kept (only scheme://host lowercases)
      "https://A.com/CaseSensitive" -> "https://a.com/CaseSensitive",
      // userinfo is case-SENSITIVE (RFC 3986 §3.2.1): its case survives
      // even though the host around it lowercases
      "https://Alice@A.com/x" -> "https://Alice@a.com/x",
      "https://user@a.com/x" -> "https://user@a.com/x",
      // a param NAMED like tracking mid-value is kept (anchored match)
      "https://a.com/p?page=utm_source" -> "https://a.com/p?page=utm_source",
      // scheme-less input: only fragment/query rules apply, no guessed '/'
      "a.com/x?utm_medium=m#f" -> "a.com/x")
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), Curation.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want, s"canonicalizeUrl($in) = ${out(in)}, want $want")
    }
    // idempotence: canonical form is a fixpoint
    val once = cases.map(_._2).toDF("url")
      .select(col("url"), Curation.canonicalizeUrl(col("url")).as("c"))
      .collect()
    once.foreach(r => assert(r.getString(1) == r.getString(0),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
  }

  private def extract1(html: String): (String, Int, Int, Int) = {
    val r = Curation.extractMainText(Seq(html).toDF("html"), "html")
      .select("main_text", "n_scripts", "n_links", "n_tags").head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("extractMainText: scripts/styles/comments drop their PAYLOAD, " +
      "block closers keep paragraph structure, entities decode") {
    val (t, s, l, g) = extract1(
      "<html><head><script>var secret = 1;</script>" +
        "<STYLE>.x{}</STYLE></head><body><!-- hidden -->" +
        "<h1>Title</h1><p>Para one.</p><p>Para &amp; two.</p>" +
        "<a href=\"http://x.org\">link text</a></body></html>")
    assert(t == "Title\nPara one.\nPara & two.\nlink text")
    assert(!t.contains("secret") && !t.contains("hidden"))
    assert(s == 1 && l == 1)
    assert(g > 0) // remaining non-block tags were stripped and counted
    // &amp; decodes LAST: double-encoded &amp;lt; yields the literal
    // entity text, never a real '<'
    assert(extract1("<p>a &amp;lt; b</p>")._1 == "a &lt; b")
    // whitespace: runs collapse, space-padded newlines tighten, 3+
    // blank lines become one paragraph break, ends trim
    assert(extract1("<div>  a\t b </div><br><br><br><p>  c  </p>")._1
      == "a b\n\nc")
    // uppercase/attribute-heavy script still drops
    assert(extract1(
      "<SCRIPT type=\"x\" async>while(1){}</SCRIPT><p>ok</p>") ==
      (("ok", 1, 0, 1)))
  }

  private def code1(md: String): (String, String, Long, Long, String) = {
    val r = Curation.extractCodeBlocks(Seq(md).toDF("md"), "md")
      .select("code_text", "prose_text", "n_fences", "code_chars",
        "fence_langs").head()
    (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getString(4))
  }

  test("extractCodeBlocks: fences split out with langs and exact char " +
      "counts; unclosed/malformed fences degrade deterministically") {
    val (code, prose, n, chars, langs) = code1(
      "# T\n\nintro text\n```python\nprint(1)\n```\nmid\n```\nx = 2\n" +
        "```\ntail")
    // bodies keep their exact bytes INCLUDING the trailing newline the
    // closer sits after
    assert(code == "print(1)\n\n\nx = 2\n")
    assert(n == 2L && chars == 15L) // "print(1)\n" (9) + "x = 2\n" (6)
    assert(langs == "python,")
    assert(prose == "# T\n\nintro text\n \nmid\n \ntail")
    // no fences: everything is prose, empty code
    assert(code1("just prose") == (("", "just prose", 0L, 0L, "")))
    // unclosed fence never matches (non-greedy needs the closer) —
    // total, not an error
    val (c2, p2, n2, _, _) = code1("a\n```py\nnever closed")
    assert(c2 == "" && n2 == 0L && p2.contains("never closed"))
    // info strings trim; blank-line bodies keep exact bytes
    val (c3, _, n3, ch3, l3) = code1("```  sql  \nSELECT 1;\n\n```x")
    assert(c3 == "SELECT 1;\n\n" && n3 == 1L && ch3 == 11L &&
      l3 == "sql")
  }

  private def scrub1(text: String): (String, Int, Int, Int, Int) = {
    val r = Curation.scrubPii(Seq(text).toDF("text"), "text")
      .select("text_scrubbed", "n_emails", "n_ips", "n_ssns", "n_phones")
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("scrubPii: each category redacts and counts") {
    assert(scrub1("mail a.b+tag@sub.example.org now") ==
      ("mail <EMAIL> now", 1, 0, 0, 0))
    assert(scrub1("host 192.168.0.1 up") == ("host <IP> up", 0, 1, 0, 0))
    assert(scrub1("ssn 123-45-6789.") == ("ssn <SSN>.", 0, 0, 1, 0))
    assert(scrub1("call +49 (0) 30-123456 or (555) 123-4567 or " +
      "555-123-4567") ==
      ("call <PHONE> or <PHONE> or <PHONE>", 0, 0, 0, 3))
  }

  test("scrubPii: staged order never double-counts a span") {
    // digits inside the email are the email's, not an SSN/phone
    assert(scrub1("bob.555-12-3456@x.com") == ("<EMAIL>", 1, 0, 0, 0))
    // an SSN is not re-counted by the dashed-phone branch
    assert(scrub1("id 078-05-1120 x") == ("id <SSN> x", 0, 0, 1, 0))
    // an IP-host email is NOT an email (alpha TLD required): the IP
    // stage gets the quad, the local part survives
    assert(scrub1("u@10.0.0.1") == ("u@<IP>", 0, 1, 0, 0))
  }

  test("scrubPii: near-misses stay untouched") {
    val misses = Seq(
      "not an email: a@b, a@@c.com trailing@",
      "octet 999.1.1.1 is no address",
      "date 2024-01-15 and 12-34-5678",
      "sum 123-4567 and plain 5551234567")
    misses.foreach { s =>
      val (t, e, i, n, p) = scrub1(s)
      // 999.1.1.1: no valid first-octet parse starts at a word boundary
      assert((e, i, n, p) == ((0, 0, 0, 0)), s"false positive on: $s")
      assert(t == s)
    }
    // pinned RE2-subset limitation (no lookahead): a 5-component
    // version string loses its leading quad — the dot after "4" is a
    // non-word char, so \b holds there
    assert(scrub1("version 1.2.3.4.5") == ("version <IP>.5", 0, 1, 0, 0))
  }

  test("scrubPii: counts survive on multi-hit documents, cols pass through") {
    val df = Seq((7L, "a@b.co c@d.io 10.0.0.1 10.0.0.2 ok"))
      .toDF("doc_id", "text")
    val out = Curation.scrubPii(df, "text").head()
    assert(out.getAs[Long]("doc_id") == 7L)
    assert(out.getAs[Int]("n_emails") == 2 && out.getAs[Int]("n_ips") == 2)
    assert(out.getAs[String]("text_scrubbed") ==
      "<EMAIL> <EMAIL> <IP> <IP> ok")
  }
}
