package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Checkpointer
import graft.functions.GraftFunctions

/** One-call corpus curation — the end-to-end composition a training-data
  * pipeline actually runs, in the canonical order:
  *
  *  1. QUALITY: Gopher-style hard rules ([[GraftFunctions.gopher_rules]])
  *     drop junk first, so later (more expensive) stages never touch it.
  *  2. DEDUP: exact + MinHash near-dup collapse ([[Dedup.dedupCorpus]])
  *     on the quality survivors.
  *  3. DECONTAMINATE: benchmark-overlap removal
  *     ([[Decontaminate.decontaminate]]) on the deduped set — after dedup
  *     so each retained representative is checked once, not per copy.
  *  4. QUOTA (optional): deterministic weighted sample of at most
  *     `quotaPerGroup` docs per `quotaGroupCol`
  *     ([[Sampling.weightedSamplePerGroup]], weight = token count — longer
  *     docs preferred under the cap). Setting `temperatureAlpha` swaps
  *     the hard cap for α-temperature mixing
  *     ([[Sampling.temperatureSample]]): each group keeps a seeded
  *     Bernoulli fraction proportional to `n^α / Σ n^α`, flattening the
  *     group distribution toward `temperatureTarget` total docs — the
  *     standard multi-source rebalance knob of training-data recipes.
  *     Its drops are reported under stage `temperature`.
  *
  * Returns (curated corpus, decision report). The report has one row per
  * INPUT doc: (doc_id, stage, decision) where stage ∈ quality | dedup |
  * decontamination | quota | kept — so every drop is attributable, the
  * property that makes a 100 TB curation run debuggable.
  *
  * Scale notes: each stage is the already-audited operator — no new
  * shuffle shapes. Every stage's surviving ID SET is materialized once
  * via the supplied [[graft.Checkpointer]] (tiny: one id per doc), so
  * each expensive stage executes exactly once even though its result
  * feeds both the next stage and the report's anti-join diffs — the
  * naive lazy composition re-executed the dedup DAG per consumer,
  * measured ~2.5× slower. This makes the operator EAGER at composition
  * time (like the other materializing pipelines here); the returned
  * frames are cheap semi-joins of `docs` against the checkpointed ids.
  * Pass `Checkpointer.Reliable` for fault-tolerant multi-hour runs.
  */
object Curation {

  def curateCorpus(
      docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, benchIdCol: String,
      minWords: Int = 50, dedupThreshold: Double = 0.8,
      contaminationShingle: Int = 8,
      quotaGroupCol: Option[String] = None,
      quotaPerGroup: Int = Int.MaxValue,
      ckpt: Checkpointer = Checkpointer.Local,
      portableDedup: Boolean = false,
      temperatureAlpha: Option[Double] = None,
      temperatureTarget: Long = 0L,
      sampleSeed: Long = 42L,
      portableSample: Boolean = false): (DataFrame, DataFrame) = {
    require(temperatureAlpha.isEmpty || quotaGroupCol.isDefined,
      "temperatureAlpha needs quotaGroupCol — temperature mixing is " +
        "defined over a group column")

    def restrict(idSet: DataFrame): DataFrame =
      docs.join(idSet, Seq(idCol), "left_semi")

    // 1. quality
    val qIds = ckpt(docs.filter(
        GraftFunctions.gopher_rules(col(textCol), minWords).getField("pass"))
      .select(col(idCol)))
    // 2. dedup (exact + near) among quality survivors
    val dIds = ckpt(Dedup.dedupedRows(restrict(qIds), textCol, idCol,
        dedupThreshold, ckpt = ckpt, portable = portableDedup)
      .select(col(idCol)))
    // 3. decontamination
    val cIds = ckpt(Decontaminate.decontaminate(restrict(dIds), textCol,
        idCol, bench, benchTextCol, benchIdCol, contaminationShingle)
      .select(col(idCol)))
    // 4. quota — hard per-group cap by default, temperature mixing opt-in
    val quotaStage =
      if (temperatureAlpha.isDefined) "temperature" else "quota"
    val keptIds = ckpt(((quotaGroupCol, temperatureAlpha) match {
      case (Some(g), Some(a)) =>
        Sampling.temperatureSample(restrict(cIds), g, idCol, a,
          temperatureTarget, sampleSeed, portableSample)
      case (Some(g), None) =>
        Sampling.weightedSamplePerGroup(
          restrict(cIds).withColumn("_w",
            GraftFunctions.token_count_ws(col(textCol)).cast("double")),
          g, idCol, "_w", quotaPerGroup)
      case (None, _) => restrict(cIds)
    }).select(col(idCol)))

    def dropped(before: DataFrame, after: DataFrame, stage: String) =
      before.join(after, Seq(idCol), "left_anti")
        .select(col(idCol).as("doc_id"), lit(stage).as("stage"),
          lit("dropped").as("decision"))

    val report = dropped(docs.select(col(idCol)), qIds, "quality")
      .unionByName(dropped(qIds, dIds, "dedup"))
      .unionByName(dropped(dIds, cIds, "decontamination"))
      .unionByName(dropped(cIds, keptIds, quotaStage))
      .unionByName(keptIds
        .select(col(idCol).as("doc_id"), lit("kept").as("stage"),
          lit("kept").as("decision")))

    (restrict(keptIds), report)
  }

  /** The host part of a URL — scheme and userinfo stripped, everything
    * before the first `/`, `:` (port), `?` or `#`. A plain character-class
    * regex (no lookarounds, no backreferences) so the SAME pattern parses
    * identically under Java regex, RE2, and DuckDB — web-crawl curation
    * must agree with offline audits about what "the domain" was. */
  def urlHost(url: Column): Column =
    regexp_extract(url,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)", 1)

  /** Query parameters that identify a CLICK, not a RESOURCE — the
    * standard tracking params stripped before URL-keyed dedup. Plain
    * alternation of character classes (no lookarounds) so the same
    * pattern means the same thing under Java regex and RE2/DuckDB. */
  val trackingParamPattern: String =
    "^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid)="

  /** Canonical form of an absolute http(s) URL — the pre-dedup key
    * normalizer: the same page fetched as
    * `HTTP://Example.COM:80/p?utm_source=feed&q=1#top` and
    * `http://example.com/p?q=1` must collapse to ONE dedup key, or
    * URL-level dedup silently keeps both copies. Applied before
    * [[urlHost]]/[[domainCap]] and before any URL-keyed exact dedup.
    *
    * Normalizations (each a deliberate, RFC-safe identity): fragment
    * stripped (never sent to the server); scheme and host lowercased
    * (case-insensitive per RFC 3986); default ports `:80`/`:443`
    * dropped for http/https (non-default ports kept); tracking query
    * params ([[trackingParamPattern]]) removed with the REMAINING
    * params kept in their original order (reordering could merge
    * semantically distinct URLs on servers that care); empty path
    * becomes `/`. Path case and userinfo are preserved — both can be
    * semantically significant (userinfo is case-sensitive per RFC 3986
    * §3.2.1, so only the scheme and host[:port] halves of the
    * authority lowercase). Scheme-less inputs pass through with
    * only the fragment/query rules applied (garbage stays visibly
    * garbage rather than being guessed at).
    *
    * Scale notes (100 TB): a fixed chain of codegen'd regex ops plus
    * one bounded higher-order filter over the split query — narrow,
    * per-row, no shuffle; every regex is a portable character-class
    * pattern so DuckDB/warehouse audits reproduce the key bit-for-bit. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lowercase ONLY the scheme and host[:port]; userinfo (anything
    // before the first '@' of the authority — '@' cannot appear
    // unencoded inside userinfo per RFC 3986) and the rest (path,
    // query) keep their case
    val hasScheme = noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val userinfo = regexp_extract(auth, "^([^@]*@)", 1)
    val hostPort = lower(regexp_replace(auth, "^[^@]*@", ""))
    val rest = regexp_replace(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val hostNoPort =
      when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
        .otherwise(hostPort)
    val noPort = when(hasScheme,
      concat(scheme, lit("://"), userinfo, hostNoPort)).otherwise(lit(""))
    val path = regexp_replace(rest, "[?].*", "")
    val query = when(rest.contains("?"),
      regexp_replace(rest, "^[^?]*[?]", "")).otherwise(lit(""))
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern))
    val qs = array_join(kept, "&")
    concat(noPort,
      when(path === "" && noPort =!= "", lit("/")).otherwise(path),
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Per-domain document cap — the crawl-curation rule that stops a
    * single site (content farm, mirror network) from dominating a
    * training mix no matter how many URLs it serves. Keeps the `k` best
    * docs per host under the caller's explicit total `ordering` (make it
    * total — e.g. quality DESC, id — so the kept set is deterministic).
    *
    * Scale notes (100 TB): host extraction is a narrow codegen'd regex;
    * the cap is [[Sampling.stratifiedTopK]] — ONE shuffle on the host
    * key, per-partition row_number, no global sort. Hot hosts are single
    * groups by design (that is what is being capped); AQE's skew
    * handling splits oversized host partitions.
    *
    * @return the input rows that survive the cap, plus a `host` column. */
  def domainCap(docs: DataFrame, urlCol: String, k: Int,
      ordering: Seq[Column]): DataFrame =
    Sampling.stratifiedTopK(
      docs.withColumn("host", urlHost(col(urlCol))), "host", k, ordering)

  /** PII patterns shared by [[scrubPii]] and any caller that only wants
    * detection counts. Deliberately restricted to the regex subset with
    * IDENTICAL semantics in java.util.regex and RE2 (DuckDB, Go, C++
    * scrubbers): no lookaround, no backreferences, ASCII classes and
    * `\b` only — so the scrub a Spark job applies is bit-reproducible
    * by the other engines a privacy review runs, and the DuckDB oracle
    * replays it verbatim.
    *
    *  - email: local@domain.tld (alpha TLD ≥ 2 — an IP-host address
    *    like user@10.0.0.1 is left for the IP stage)
    *  - ipV4: dotted quad, octet-validated (0–255), word-bounded
    *    (999.1.1.1 never matches; known subset limitation: without
    *    lookahead a 5-component version string like 1.2.3.4.5 loses
    *    its leading quad, since `.` is a non-word char and `\b` holds
    *    after the fourth octet — the spec pins this)
    *  - ssn: US 3-2-4 dashed form, word-bounded
    *  - phone: international +CC… (7–18 digits/separators) or NANP
    *    (555) 123-4567 / 555-123-4567 forms; requires the leading `+`,
    *    parenthesis, or full dashed shape, so bare integers, dates and
    *    quantities never trip it */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpV4Re = "\\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
    "\\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhoneRe = "(?:\\+[0-9][0-9 ().-]{6,18}[0-9]" +
    "|\\([0-9]{3}\\) ?[0-9]{3}-[0-9]{4}" +
    "|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b)"

  /** Scrub PII from a text column: emails, IPv4 addresses, US SSNs and
    * phone numbers replaced by typed placeholder tokens, with a
    * per-document count per category — the redaction stage every
    * training-data pipeline runs before text leaves the trust boundary,
    * and the counts are the audit trail (a spike in `n_ssns` on a new
    * source is a quarantine signal before any sample is inspected).
    *
    * Stages apply in a FIXED order — email, then IP, then SSN, then
    * phone — and each stage counts on the text as the previous stage
    * left it, so a span never double-counts: the digits inside
    * `bob.555-12-3456@x.com` are part of the scrubbed email, not a
    * phantom SSN, and an SSN is never re-counted as a dashed phone
    * because the SSN stage already replaced it. (The placeholder
    * tokens themselves contain no digits or `@`, so later stages can
    * never match inside an earlier replacement.)
    *
    * Scale notes (100 TB corpus): one narrow projection per document —
    * four codegen'd regexp_replace/extract_all pairs fused into the
    * same whole-stage-codegen scan, no shuffle, no UDF; RE2-subset
    * patterns keep worst-case matching linear (no catastrophic
    * backtracking on adversarial documents — the patterns have no
    * nested unbounded quantifiers, so java.util.regex is linear here
    * too). Appends `outCol`, `n_emails`, `n_ips`, `n_ssns`,
    * `n_phones`; original columns pass through untouched. */
  /** HTML-extraction patterns shared by [[extractMainText]] and its
    * oracle — the [[EmailRe]] discipline: Java∩RE2 subset only
    * (non-greedy `.*?`, inline `(?is)` flags, `\b`, explicit ASCII
    * classes — NO `\s`, whose class differs between the engines on
    * `\x0B`), so DuckDB/Go/C++ replay the strip byte-identically. */
  val HtmlScriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  val HtmlStyleRe = "(?is)<style\\b[^>]*>.*?</style>"
  val HtmlCommentRe = "(?s)<!--.*?-->"
  val HtmlLinkRe = "(?i)<a\\b"
  val HtmlBlockSepRe = "(?i)<(?:br|hr)[^>]*>|</(?:p|div|h[1-6]|li|ul|" +
    "ol|table|tr|td|th|blockquote|section|article|header|footer|" +
    "title)[ \\t]*>"
  val HtmlTagRe = "(?s)<[^>]*>"

  /** Fenced code-block pattern shared by [[extractCodeBlocks]] and its
    * oracle — same Java∩RE2 contract as the HTML set: inline `(?s)`,
    * non-greedy body, explicit classes. Group 1 = the info string
    * (language tag), group 2 = the block body; non-greedy matching is
    * total and deterministic on malformed/unclosed fences. */
  val CodeFenceRe = "(?s)```([^`\\n]*)\\n(.*?)```"

  /** Extract readable main text from raw HTML — the first stage of
    * every web-crawl training pipeline (the WET-file reduction):
    * script/style/comment payloads are DROPPED (their text is code,
    * not prose), block-level closers become newlines so paragraph
    * structure survives, remaining tags are stripped, the five
    * ubiquitous character entities decode (`&amp;` LAST, so
    * `&amp;lt;` correctly yields the literal `&lt;`), and whitespace
    * normalizes (runs of spaces/tabs/CRs collapse, space-padded
    * newlines tighten, 3+ blank lines become one paragraph break,
    * ends trim). Appends `outCol` plus the audit counts a crawl
    * triage reads before any sample: `n_scripts` (script blocks —
    * a spike flags JS-heavy app shells with no prose), `n_links`
    * (anchor density — boilerplate/nav detection), `n_tags`
    * (markup mass).
    *
    * Deliberately a FIXED-ORDER staged regex fold (scripts → styles →
    * comments → links counted → block separators → tags → entities →
    * whitespace), each stage reading the text as the previous stage
    * left it — the [[scrubPii]] determinism contract, and the whole
    * fold uses the shared Java∩RE2 pattern subset so the DuckDB
    * oracle replays it verbatim and md5 pins the output
    * byte-for-byte.
    *
    * Scale notes (100 TB crawl): one narrow projection per document —
    * every stage is a codegen'd regexp_replace/extract_all fused into
    * one whole-stage-codegen scan, no shuffle, no UDF; the patterns
    * have no nested unbounded quantifiers, so matching is linear even
    * on adversarial markup (and literally linear in RE2-engine
    * replays). NOT a DOM parser by design: malformed crawl HTML
    * breaks real parsers, while the regex reduction is total. */
  def extractMainText(docs: DataFrame, htmlCol: String,
      outCol: String = "main_text"): DataFrame = {
    val t0 = col(htmlCol)
    val nScripts = size(regexp_extract_all(t0, lit(HtmlScriptRe), lit(0)))
    val t1 = regexp_replace(
      regexp_replace(regexp_replace(t0, HtmlScriptRe, ""),
        HtmlStyleRe, ""), HtmlCommentRe, "")
    val nLinks = size(regexp_extract_all(t1, lit(HtmlLinkRe), lit(0)))
    val t2 = regexp_replace(t1, HtmlBlockSepRe, "\n")
    val nTags = size(regexp_extract_all(t2, lit(HtmlTagRe), lit(0)))
    val t3 = regexp_replace(t2, HtmlTagRe, "")
    val t4 = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(t3) { case (t, (e, c)) => regexp_replace(t, e, c) }
    val t5 = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(t4, "[ \\t\\r]+", " "),
          " ?\\n ?", "\n"),
        "\\n{3,}", "\n\n"),
      "^[ \\n]+|[ \\n]+$", "")
    docs.withColumns(Map(
      "n_scripts" -> nScripts, "n_links" -> nLinks, "n_tags" -> nTags,
      outCol -> t5))
  }

  /** Split fenced code blocks out of markdown/README-style documents —
    * the code-corpus triage step between HTML reduction
    * ([[extractMainText]]) and text quality scoring: code and prose
    * need DIFFERENT quality models (punctuation ratios, stopword
    * density, and repetition scores are meaningless on code), so a
    * mixed document must be split before either pipeline sees it.
    *
    * Appends: `code_text` (block bodies joined by blank lines),
    * `prose_text` (the document with fences removed, whitespace
    * normalized), `n_fences`, `code_chars` (exact body chars), and
    * `fence_langs` (the fence info strings in order, comma-joined —
    * the language census a code-mix report groups on).
    *
    * Same determinism contract as [[extractMainText]]: a fixed-order
    * staged regex fold over the shared Java∩RE2 [[CodeFenceRe]], so
    * the DuckDB oracle replays it verbatim and md5 pins both outputs
    * byte-for-byte; malformed markup (unclosed fences, nested
    * backticks) degrades deterministically, never throws.
    *
    * Scale notes (100 TB): one narrow codegen'd projection per
    * document — regexp_extract_all + regexp_replace fused into one
    * whole-stage-codegen scan, no shuffle, no UDF. */
  def extractCodeBlocks(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val infos = regexp_extract_all(t, lit(CodeFenceRe), lit(1))
    val bodies = regexp_extract_all(t, lit(CodeFenceRe), lit(2))
    val prose = regexp_replace(
      regexp_replace(
        regexp_replace(t, CodeFenceRe, " "),
        "[ \\t\\r]+", " "),
      "^[ \\n]+|[ \\n]+$", "")
    docs.withColumns(Map(
      "code_text" -> array_join(bodies, "\n\n"),
      "prose_text" -> prose,
      "n_fences" -> size(bodies).cast("long"),
      "code_chars" -> length(array_join(bodies, "")).cast("long"),
      "fence_langs" -> array_join(transform(infos, x => trim(x)), ",")))
  }

  def scrubPii(docs: DataFrame, textCol: String,
      outCol: String = "text_scrubbed"): DataFrame = {
    val stages = Seq(
      ("n_emails", EmailRe, "<EMAIL>"),
      ("n_ips", IpV4Re, "<IP>"),
      ("n_ssns", SsnRe, "<SSN>"),
      ("n_phones", PhoneRe, "<PHONE>"))
    val (scrubbed, counts) = stages.foldLeft(
        (col(textCol), Seq.empty[Column])) {
      case ((t, cs), (name, re, tok)) =>
        (regexp_replace(t, re, tok),
          cs :+ size(regexp_extract_all(t, lit(re), lit(0))).as(name))
    }
    docs.withColumns(
      ("n_emails" +: "n_ips" +: "n_ssns" +: "n_phones" +: Seq(outCol))
        .zip(counts :+ scrubbed.as(outCol)).toMap)
  }
}
