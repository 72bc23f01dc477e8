package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Unit semantics of the quality-filter rules (td6 is oracle-checked at the
  * corpus level; this pins WHICH rule fires for crafted inputs).
  */
class TextAnalysisSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("td25 sketch overlap: estimates track exact shingle Jaccard; mirror feeds read ~1") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, sf001)
    val est = TextAnalysis.sourceOverlapSketch(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(est.nonEmpty)
    // exact shingle-set Jaccard per source pair (affordable at sf0.001)
    val sets = docs
      .select(col("source"), explode(Dedup.shingles(col("text"), 3)).as("s"))
      .collect().groupBy(_.getString(0))
      .map { case (src, rows) => src -> rows.map(_.getString(1)).toSet }
    val k = 32
    est.foreach { case ((a, b), e) =>
      val (sa, sb) = (sets(a), sets(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      // binomial std at k=32 is ~0.09; 0.35 is a >3-sigma bound
      assert(math.abs(e - exact) <= 0.35,
        s"pair ($a,$b): est $e vs exact $exact")
    }
    // a mirrored feed must read ~1.0: duplicate one source verbatim
    import spark.implicits._
    val m = docs.select(col("source"), col("doc_id"), col("text"))
      .union(docs.filter(col("source") === "src0")
        .select(lit("mirror").as("source"), col("doc_id"), col("text")))
    val withMirror = TextAnalysis.sourceOverlapSketch(m).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(withMirror(("mirror", "src0")) === 1.0,
      "a verbatim mirror must match on every component")
  }

  test("td24 source drift: exact L1 vs hand-computed distributions, off-feed source maxes") {
    // corpus = {a:4, b:2, z:3}, N=9. s1=s2="a a b" (a 2/3, b 1/3):
    // L1 = |2/3-4/9| + |1/3-2/9| + |0-3/9| = 6/9. s3="z z z":
    // L1 = 4/9 + 2/9 + |1-3/9| = 12/9 — the broken-feed signature.
    val docs = Seq(
      ("src_a", 1L, "a a b"), ("src_a", 2L, "a a b"),
      ("src_z", 3L, "z z z")
    ).toDF("source", "doc_id", "text")
    val rows = TextAnalysis.sourceDrift(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("src_a")._1 === 6L && rows("src_z")._1 === 3L)
    assert(math.abs(rows("src_a")._2 - 6.0 / 9.0) < 1e-6)
    assert(math.abs(rows("src_z")._2 - 12.0 / 9.0) < 1e-6)
    // a source that IS the corpus drifts zero
    val uni = Seq(("only", 1L, "x y z")).toDF("source", "doc_id", "text")
    val u = TextAnalysis.sourceDrift(uni).collect()
    assert(u.length === 1 && u.head.getDouble(2) === 0.0)
  }

  test("td23 vocab growth: first appearance counts once, curve is cumulative and flat under duplication") {
    // 3 docs, one per bucket: doc0 mints {a,b}, doc1 mints {c} (re-serves
    // a), doc2 mints nothing (pure repeat — the duplication signature)
    val docs = Seq(
      (0L, "a b"), (1L, "a c"), (2L, "b c b")).toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(docs, nBuckets = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq === Seq(
      (0L, 1L, 2L, 2L, 2L),   // 1 doc, 2 tokens, 2 new types
      (1L, 2L, 4L, 1L, 3L),   // +c
      (2L, 3L, 7L, 0L, 3L)))  // flat: the tail re-serves the head
  }

  test("td22 BPE merges: hand-computed greedy steps on the Sennrich corpus shape") {
    // word counts: low×4 (3 + 1), lower×2, newest×4, widest×2
    val docs = Seq(
      (1L, "low low low lower lower newest newest"),
      (2L, "newest newest widest widest low")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpeMerges(spark, docs, dictSize = 512, nMerges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // step 1: e-s, s-t, l-o, o-w, w-e all tie at 6 → lexicographic (e,s)
    // step 2: es-t, l-o, o-w, w-es tie at 6 → (es,t) ('e' < 'l' < 'o' < 'w')
    // step 3: l-o, o-w, w-est tie at 6 → (l,o)
    assert(rows.toSeq === Seq(
      (1L, "e", "s", "es", 6L),
      (2L, "es", "t", "est", 6L),
      (3L, "l", "o", "lo", 6L)))
    // determinism: identical corpus ⇒ identical merge table
    val again = TextAnalysis.bpeMerges(spark, docs, dictSize = 512, nMerges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(again.toSeq === rows.toSeq)
  }

  test("td22 BPE merges: overlap is greedy leftmost and merged symbols compose") {
    // 'aaa'×5: step 1 pairs a-a count 10 (two positions × 5); after the
    // merge each word is [aa, a] (leftmost pair wins, no overlap), so
    // step 2's top pair is aa-a at 5
    val docs = Seq((1L, ("aaa " * 5).trim)).toDF("doc_id", "text")
    val rows = TextAnalysis.bpeMerges(spark, docs, dictSize = 8, nMerges = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      (1L, "a", "a", "aa", 10L),
      (2L, "aa", "a", "aaa", 5L)))
  }

  test("td26 BPE encode: hand-computed symbol counts under the trained merges; word-free docs emit (0, 0, NULL)") {
    // the td22 Sennrich corpus ⇒ merges (e,s), (es,t), (l,o); after
    // them: low → [lo,w]=2, lower → [lo,w,e,r]=4, newest → [n,e,w,est]=4,
    // widest → [w,i,d,est]=4. doc 3 has no dictionary-admissible words.
    val docs = Seq(
      (1L, "low low low lower lower newest newest"),
      (2L, "newest newest widest widest low"),
      (3L, "!!! 123 ???")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpeEncode(spark, docs, dictSize = 512, nMerges = 3)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 7L, 3 * 2 + 2 * 4 + 2 * 4L),   // 22
          (2L, 5L, 2 * 4 + 2 * 4 + 2L),        // 18
          (3L, 0L, 0L)))
    assert(math.abs(rows(0).getDouble(3) - 3.142857) < 1e-9)
    assert(math.abs(rows(1).getDouble(3) - 3.6) < 1e-9)
    assert(rows(2).isNullAt(3), "word-free doc has NULL ratio")
  }

  test("td26 BPE encode: zero merges count characters; more merges never increase the count; floor is n_words") {
    val docs = Seq((1L, "banana bandana"), (2L, "abracadabra")).toDF("doc_id", "text")
    val chars = TextAnalysis.bpeEncode(spark, docs, dictSize = 512, nMerges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chars === Map(1L -> ("banana".length + "bandana".length).toLong,
      2L -> "abracadabra".length.toLong))
    var prev = chars
    for (m <- 1 to 4) {
      val cur = TextAnalysis.bpeEncode(spark, docs, dictSize = 512, nMerges = m)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      cur.foreach { case (id, nb) =>
        assert(nb <= prev(id), s"merge $m must not grow doc $id")
      }
      prev = cur
    }
    // every word stays at least one symbol
    assert(prev.values.forall(_ >= 1L))
  }

  test("td6 quality filter: each rule binds on its crafted violation, keep is the conjunction") {
    val good = (("the quick brown fox jumps over a lazy dog near the riverbank " * 3).trim)
    val docs = Seq(
      (1L, good),                                    // passes all
      (2L, "too short to keep"),                     // r_n_tokens
      (3L, ("spam " * 30).trim),                     // r_distinct (and r_stopwords)
      (4L, (("$$$! %% @@ ## " * 8).trim)),           // r_symbols
      (5L, (("internationalization " * 25).trim))    // r_token_len (avg > 10)
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityFilter(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(rows(1L).getBoolean(rows(1L).fieldIndex("keep")))
    def failed(id: Long): Set[String] =
      Seq("r_n_tokens", "r_token_len", "r_stopwords", "r_symbols", "r_distinct")
        .filterNot(f => rows(id).getBoolean(rows(id).fieldIndex(f))).toSet
    assert(failed(1L) === Set.empty)
    assert(failed(2L).contains("r_n_tokens"))
    assert(failed(3L).contains("r_distinct"))
    assert(failed(4L).contains("r_symbols"))
    assert(failed(5L).contains("r_token_len"))
    // keep is exactly the conjunction of the five rule flags
    rows.values.foreach { r =>
      val conj = Seq("r_n_tokens", "r_token_len", "r_stopwords", "r_symbols", "r_distinct")
        .forall(f => r.getBoolean(r.fieldIndex(f)))
      assert(r.getBoolean(r.fieldIndex("keep")) === conj)
    }
  }

  test("tokenizer: runs of whitespace yield no empty tokens; ws-only docs have zero") {
    import org.apache.spark.sql.functions.col
    val got = Seq("a b", "a  b", "\ta b\n", "   ", "", "ab", "x  \t y")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), graft.functions.tokens(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L) === Seq("a", "b"))
    assert(got(1L) === Seq("a", "b"), "double space minted an empty token")
    assert(got(2L) === Seq("a", "b"), "leading tab / trailing newline leaked")
    assert(got(3L) === Seq.empty, "whitespace-only doc must have zero tokens")
    assert(got(4L) === Seq.empty)
    assert(got(5L) === Seq("ab"))
    assert(got(6L) === Seq("x", "y"))
  }

  test("td9 script language ID: unsegmented scripts classified by character inventory") {
    val docs = Seq(
      (1L, "这是一个没有空格的中文句子需要字符级别的语言识别"),
      (2L, "これは日本語の文章です漢字と仮名が混ざっています"),
      (3L, "이것은한국어문장입니다한글만사용합니다"),
      (4L, "นี่คือประโยคภาษาไทยที่ไม่มีช่องว่าง"),
      (5L, "the quick brown fox is on the table and it is quick"),
      (6L, "   ")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langIdScript(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(r.fieldIndex("script_pred")), r.getString(r.fieldIndex("lang_pred"))))).toMap
    assert(got(1L) === (("zh", "zh")), "Han-only must classify zh")
    assert(got(2L) === (("ja", "ja")), "kana presence must separate ja from zh")
    assert(got(3L) === (("ko", "ko")))
    assert(got(4L) === (("th", "th")))
    assert(got(5L)._1 === "latn")
    assert(got(5L)._2 === "en", "Latin script must fall back to the word path")
    assert(got(6L) === (("latn", "und")), "zero-char doc ends at the word path's und")
  }

  test("script_counts native expression matches its regexp twin; counts code points") {
    import org.apache.spark.sql.functions._
    import graft.functions.{ScriptProfiles, WsClass}
    // the emoji is a supplementary-plane char (4-byte UTF-8): ONE code point
    val docs = Seq(
      (1L, "abc 漢字 かな ハム 한글 ไทย éß 😀 x"),
      (2L, "mixed 語とカナ English 한 text"),
      (3L, "")).toDF("doc_id", "text")
    val scc = call_function("script_counts", col("text"))
    val twins = ScriptProfiles.scripts.zipWithIndex.map { case ((name, _), i) =>
      (element_at(scc, i + 1) ===
        regexp_count(col("text"), lit(ScriptProfiles.classLiteral(name))).cast("long"))
        .as(s"ok_$name")
    } :+ (element_at(scc, ScriptProfiles.nScripts + 1) ===
      length(regexp_replace(col("text"), WsClass, "")).cast("long")).as("ok_nonws")
    val rows = docs.select(twins: _*).collect()
    rows.foreach { r =>
      (0 until r.length).foreach { i =>
        assert(r.getBoolean(i), s"column ${r.schema.fieldNames(i)} diverged: $r")
      }
    }
    // explicit code-point check: emoji + accents count once each in nonws
    val counts = docs.filter(col("doc_id") === 1L)
      .select(scc).head().getSeq[Long](0)
    assert(counts(ScriptProfiles.index("han")) === 2L)
    assert(counts(ScriptProfiles.index("kana")) === 4L)
    assert(counts(ScriptProfiles.index("hangul")) === 2L)
    assert(counts(ScriptProfiles.index("thai")) === 3L)
    assert(counts(ScriptProfiles.index("latin")) === 4L)
    assert(counts(ScriptProfiles.nScripts) === 18L) // 2+4+2+3+4 + é ß 😀 = 18
  }

  test("script_counts survives invalid UTF-8 (binary->string casts are byte copies)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.ScriptProfiles
    // truncated 3-byte lead, then a bare continuation byte: each resyncs
    // as one replacement code point — counted as non-whitespace, no crash
    val bad = UTF8String.fromBytes(Array(0xE4.toByte, 0xB8.toByte))
    val counts = graft.functions.ScriptCounts.compute(bad)
    assert(counts.getLong(ScriptProfiles.nScripts) === 2L)
    ScriptProfiles.scripts.indices.foreach(i => assert(counts.getLong(i) === 0L))
    // a truncated 4-byte lead at end-of-buffer must not read past it
    val tail = UTF8String.fromBytes(Array('a'.toByte, 0xF0.toByte))
    assert(graft.functions.ScriptCounts.compute(tail).getLong(ScriptProfiles.nScripts) === 2L)
  }

  test("td10 repetition metrics: duplicate lines counted by occurrence and char mass") {
    val docs = Seq(
      (1L, "aa\nbb\naa\ncccc"),   // 4 lines, 'aa' x2 -> 2/4; chars 2+2+2+4=10, dup 4 -> 0.4
      (2L, "x\ny\nz"),            // all unique -> 0
      (3L, "\n\n"),               // 3 empty lines, all dups; zero chars -> null char frac
      (4L, "solo")                // single line
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def frac(id: Long, f: String): Option[Double] = {
      val r = rows(id); val i = r.fieldIndex(f)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    assert(rows(1L).getLong(1) === 4L)
    assert(frac(1L, "dup_line_frac") === Some(0.5))
    assert(frac(1L, "dup_char_frac") === Some(0.4))
    assert(frac(2L, "dup_line_frac") === Some(0.0))
    assert(rows(3L).getLong(1) === 3L)
    assert(frac(3L, "dup_line_frac") === Some(1.0))
    assert(frac(3L, "dup_char_frac") === None, "zero line chars must yield null, not NaN")
    assert(frac(4L, "dup_line_frac") === Some(0.0))
  }

  test("td17 dup n-grams: top-2-gram and dup-5-gram coverage, overlaps counted once") {
    val docs = Seq(
      // "a b" starts {0,2,4} cover positions 0..5 -> top2 = 6/6 = 1.0;
      // no 5-gram repeats -> dup5 = 0
      (1L, "a b a b a b"),
      // "x y z w v" at starts {0,5}: [0,5)+[5,10) cover all 10 -> dup5 1.0;
      // every 2-gram "x y".."v x" occurs twice; lexicographic tie-break
      // picks "v x" (starts {4}? no: "v x" at 4 only) — recompute: grams
      // "x y"{0,5} "y z"{1,6} "z w"{2,7} "w v"{3,8} "v x"{4} — top cnt=2,
      // smallest gram "w v" -> covers [3,5)+[8,10) = 4/10 = 0.4
      (2L, "x y z w v x y z w v"),
      // overlapping occurrences of the top 2-gram count positions once:
      // "a a" starts {0,1,2} cover [0,4) = 4/4 = 1.0
      (3L, "a a a a"),
      (4L, "only one token repeated never mind"), // all grams unique
      (5L, "")                                    // zero tokens -> nulls
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.dupNgrams(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def d(id: Long, f: String): Option[Double] = {
      val r = rows(id); val i = r.fieldIndex(f)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    assert(rows(1L).getString(2) === "a b")
    assert(d(1L, "top2_frac") === Some(1.0))
    assert(d(1L, "dup5_frac") === Some(0.0))
    assert(rows(1L).getBoolean(5) === true)
    assert(rows(2L).getString(2) === "w v")
    assert(d(2L, "top2_frac") === Some(0.4))
    assert(d(2L, "dup5_frac") === Some(1.0))
    assert(rows(2L).getBoolean(5) === true)
    assert(rows(3L).getString(2) === "a a")
    assert(d(3L, "top2_frac") === Some(1.0))
    // no 2-gram repeats: a single occurrence is not repetition
    assert(rows(4L).isNullAt(2))
    assert(d(4L, "top2_frac") === Some(0.0))
    assert(d(4L, "dup5_frac") === Some(0.0))
    assert(rows(4L).getBoolean(5) === false)
    assert(rows(5L).getLong(1) === 0L)
    assert(d(5L, "top2_frac") === None, "zero tokens must yield null, not NaN")
    assert(rows(5L).isNullAt(5))
  }

  test("td12 PII scan: crafted emails/IPs/phones are counted and redacted (corpus is PII-free)") {
    import org.apache.spark.sql.functions.{col, md5, lit}
    val docs = Seq(
      (1L, "contact alice.smith+dev@example.co.uk or bob@test.org today"),
      (2L, "server at 192.168.1.250 and 10.0.0.1 responded"),
      (3L, "call +1 (555) 123-4567 or 08001234567 now"),
      (4L, "clean document with no sensitive spans at all"),
      (5L, "mixed: eve@corp.io from 127.0.0.1 dialed 555-867-5309")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.piiScan(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def counts(id: Long) = (
      rows(id).getLong(rows(id).fieldIndex("n_emails")),
      rows(id).getLong(rows(id).fieldIndex("n_ipv4")),
      rows(id).getLong(rows(id).fieldIndex("n_phones")))
    assert(counts(1L) === ((2L, 0L, 0L)))
    assert(counts(2L) === ((0L, 2L, 0L)))
    assert(counts(3L)._3 >= 2L, s"phone spans not detected: ${counts(3L)}")
    assert(counts(4L) === ((0L, 0L, 0L)))
    assert(counts(5L)._1 === 1L)
    assert(counts(5L)._2 === 1L)
    assert(counts(5L)._3 >= 1L)
    assert(rows(4L).getBoolean(rows(4L).fieldIndex("pii_free")))
    assert(!rows(1L).getBoolean(rows(1L).fieldIndex("pii_free")))
    // a PII-free doc's fingerprint is the md5 of the ORIGINAL text;
    // a redacted doc's fingerprint differs from it
    val fp4 = docs.filter(col("doc_id") === 4L)
      .select(md5(col("text"))).head.getString(0)
    assert(rows(4L).getString(rows(4L).fieldIndex("redacted_fp")) === fp4)
    val fp1 = docs.filter(col("doc_id") === 1L)
      .select(md5(col("text"))).head.getString(0)
    assert(rows(1L).getString(rows(1L).fieldIndex("redacted_fp")) !== fp1)
    // the redaction literally replaces the spans (checked end-to-end)
    val red1 = docs.filter(col("doc_id") === 1L)
      .select(md5(lit("contact <EMAIL> or <EMAIL> today"))).head.getString(0)
    assert(rows(1L).getString(rows(1L).fieldIndex("redacted_fp")) === red1)
  }

  test("td13 BM25: tf raises relevance, rare terms outweigh common ones, scores reproduce") {
    // 'rare' appears in 1 of 6 docs, 'common' in 5 — with matching tf, the
    // rare-term doc must outrank the common-term doc (idf dominance)
    val docs = Seq(
      (1L, "rare word here with some filler text around it"),
      (2L, "common word here with some filler text around it"),
      (3L, "common filler text one"),
      (4L, "common filler text two"),
      (5L, "common filler text three"),
      (6L, "common common common heavy repetition of the common term")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, Seq("rare", "common"), k = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("score"))).toMap
    assert(got(1L) > got(2L), s"idf dominance violated: $got")
    // tf monotonicity among same-length docs of the same term
    assert(got(6L) > got(3L), s"tf monotonicity violated: $got")
    // deterministic: a second run reproduces bit-identical scores
    val again = TextAnalysis.bm25(docs, Seq("rare", "common"), k = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("score"))).toMap
    assert(got === again)
  }

  test("td14: Misra–Gries guarantees hold against exact counts on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf001)
    val k = 16
    val sketch = TextAnalysis.heavyHitters(docs, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.nonEmpty && sketch.size <= k)
    val exact = docs
      .select(explode(graft.functions.tokens(col("text"))).as("t"))
      .groupBy(col("t")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val threshold = n.toDouble / (k + 1)
    // no false negatives above the threshold (the MG guarantee)
    exact.foreach { case (t, c) =>
      if (c > threshold)
        assert(sketch.contains(t), s"heavy hitter '$t' (count $c > $threshold) missed")
    }
    // estimates never exceed truth, undershoot bounded by the threshold
    sketch.foreach { case (t, est) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth, s"'$t' overestimated: $est > $truth")
      assert(truth - est <= threshold.ceil.toLong,
        s"'$t' undershoots too far: $truth - $est > $threshold")
    }
  }

  test("td14: the reduce path decrements on overflow exactly as Misra–Gries") {
    val mg = new graft.functions.MisraGries(2)
    // a a b -> {a:2, b:1}; c overflows: all decrement, c not inserted
    val b = Seq("a", "a", "b", "c").foldLeft(mg.zero)(mg.reduce)
    assert(b === Map("a" -> 1L))
    // merge trims to k by subtracting the (k+1)-th largest count
    val merged = mg.merge(Map("a" -> 5L, "b" -> 3L), Map("c" -> 2L))
    assert(merged === Map("a" -> 3L, "b" -> 1L))
  }

  test("text stats survive a zero-token document: null ratios, not NaN or a crash") {
    val docs = Seq((1L, "the cat sat"), (2L, "   ")).toDF("doc_id", "text")
    val rows = TextAnalysis.textStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(2L).getLong(rows(2L).fieldIndex("n_tokens")) === 0L)
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("avg_token_len")))
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("stop_ratio")))
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("quality_score")))
    assert(rows(1L).getLong(rows(1L).fieldIndex("n_tokens")) === 3L)
    // and the language classifier: an unclassifiable zero-token doc is 'und'
    val lid = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    assert(lid(2L) === "und")
  }

  test("td16 chunking: overlap shared, final chunk truncates, zero-token docs emit nothing") {
    // 10 tokens, chunk 4, overlap 2 -> starts 0,2,4,6,8: full windows then
    // truncating tails; consecutive chunks share `overlap` tokens
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b c"), // shorter than one chunk -> exactly one chunk of 3
      (3L, "   ")) // zero tokens -> no chunks
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, chunkTokens = 4, overlap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet.map(_._1) === Set(1L, 2L))
    assert(got((1L, 0L)) === ((4L, "t0 t1 t2 t3")))
    assert(got((1L, 1L)) === ((4L, "t2 t3 t4 t5")))
    assert(got((1L, 2L)) === ((4L, "t4 t5 t6 t7")))
    assert(got((1L, 3L)) === ((4L, "t6 t7 t8 t9")))
    assert(got((1L, 4L)) === ((2L, "t8 t9")), "final chunk must truncate at doc end")
    assert(got((2L, 0L)) === ((3L, "a b c")))
    assert(got.count(_._1._1 == 1L) === 5)
  }

  test("td18 DSIR: target-looking docs outscore off-domain docs per token") {
    // target domain = lang 'en', vocabulary {alpha..}; off-domain 'de'
    // docs use a disjoint vocabulary; doc 4 is TAGGED 'de' but written
    // with the target vocabulary — DSIR's whole point is that it scores
    // by CONTENT profile, not by the label, so it must land near the
    // 'en' docs and far above the true off-domain ones.
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta alpha beta"),
      (2L, "en", "beta gamma delta epsilon alpha gamma"),
      (3L, "de", "zug bahn hof zug strasse platz"),
      (4L, "de", "alpha beta gamma alpha delta beta"),
      (5L, "de", "   ")) // zero tokens -> no row
      .toDF("doc_id", "lang", "text")
    val rows = TextAnalysis.dsirImportance(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L))
    val perTok = rows.map { case (id, (_, _, ipt)) => id -> ipt }
    assert(perTok(4L) > perTok(3L),
      "a de-tagged doc written in target vocabulary must outscore true off-domain text")
    assert(perTok(1L) > perTok(3L) && perTok(2L) > perTok(3L))
    // importance is the exact integer sum of per-bucket c*w — per-token
    // score is its floor division by the token count
    rows.foreach { case (_, (n, imp, ipt)) => assert(ipt === imp / n) }
    assert(rows(1L)._1 === 6L)
  }

  test("td19 OOV rate: bounded, exact counts, head-vocab doc scores 0 and junk scores 1") {
    // vocabSize=2 cuts the vocabulary to the two most frequent tokens
    // (the / den); doc 3 is all junk, doc 1 all head — the rate must
    // separate them deterministically
    val docs = Seq(
      (1L, "the den the den the"),
      (2L, "the den qzx wvu"),
      (3L, "qzx wvu jkl")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.oovRate(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows(1L) === ((5L, 0L, 0.0)))
    assert(rows(2L) === ((4L, 2L, 0.5)))
    assert(rows(3L) === ((3L, 3L, 1.0)))
    // corpus invariants at sf0.001
    val corpus = TextAnalysis.oovRate(
      graft.sources.Tables.documents(spark, sf001)).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val (n, oov, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0L && oov <= n)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("td21 LM surprisal: exact integer bits vs hand-computed LM, OOV maxes out, reference-like text scores low") {
    // refMod=2 -> docs 2 and 4 ARE the reference slice. LM: N=12 tokens,
    // D=7 vocab, denom=20. bits(tok) = floorlog2(20 div (c+1)):
    // the(c=4)->2, cat(1)->3, sat(2)->2, on(2)->2, mat(1)->3, OOV->4
    val docs = Seq(
      (1L, "the cat sat"),          // all in-vocab -> low bits
      (2L, "the cat sat on the mat"),
      (3L, "qzx wvu jkl"),          // all OOV -> the 4-bit ceiling
      (4L, "the dog sat on the log")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.lmSurprisal(docs, refMod = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows(1L) === ((3L, 7L, 2L)))
    assert(rows(3L) === ((3L, 12L, 4L)))
    assert(rows(2L) === ((6L, 14L, 2L)))
    // the CCNet cut separates reference-like from junk deterministically
    assert(rows(3L)._3 > rows(1L)._3)
    // corpus invariants at sf0.001 under the shared default holdout:
    // every score bounded by the OOV ceiling, floor-div consistent
    val corpus = TextAnalysis.lmSurprisal(
      graft.sources.Tables.documents(spark, sf001)).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val (n, bits, bpt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bits >= 0L && bpt === bits / n)
      assert(bpt <= 63L, "per-token bits is bounded by the 64-bit denom")
    }
  }

  test("td20 source overlap: exact Jaccard, duplicate feeds flagged at 1.0, disjoint at 0, repeats don't inflate") {
    val docs = Seq(
      (1L, "alpha beta gamma", "mirror_a"),
      (2L, "alpha beta gamma", "mirror_b"),    // identical vocab -> 1.0
      (3L, "alpha alpha beta", "subset_src"),  // repeats must not inflate
      (4L, "zeta eta theta", "disjoint_src")
    ).toDF("doc_id", "text", "source")
    val rows = TextAnalysis.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(("mirror_a", "mirror_b")) === ((3L, 3L, 1.0)))
    // subset vocab {alpha,beta} vs {alpha,beta,gamma}: 2/3
    assert(rows(("mirror_a", "subset_src")) === ((2L, 3L, 0.666667)))
    // disjoint pairs emit NO row (inner join on shared tokens)
    assert(!rows.contains(("disjoint_src", "mirror_a")) &&
      !rows.contains(("mirror_a", "disjoint_src")))
    // corpus run: every pair bounded and symmetric-free (a < b)
    val c = TextAnalysis.sourceOverlap(
      graft.sources.Tables.documents(spark, sf001)).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(2) <= r.getLong(3))
    }
  }

  test("td27: bit-regression equals a driver-side replica; a 1/rank corpus fits near -1; template spam pins the head mass") {
    // driver-side replica over the staged corpus
    val docs = graft.sources.Tables.documents(spark, sf001)
    val rows = TextAnalysis.zipfFit(docs).collect()
    assert(rows.nonEmpty)
    val freqs = docs
      .select(col("source"), explode(graft.functions.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def bits(n: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(n)
    rows.foreach { r =>
      val src = r.getString(0)
      val ranked = freqs.filter(_._1 == src).sortBy(t => (-t._3, t._2))
        .take(TextAnalysis.Td27FitV).zipWithIndex
        .map { case ((_, _, c), i) => (bits(i + 1L), bits(c)) }
      val n = ranked.length.toLong
      assert(r.getLong(1) === n, s"$src n_types")
      val (sx, sy) = (ranked.map(_._1).sum, ranked.map(_._2).sum)
      val sxy = ranked.map(t => t._1 * t._2).sum
      val sxx = ranked.map(t => t._1 * t._1).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(math.abs(r.getDouble(2) - slope) < 1e-6, s"$src slope")
      // at sf0.001 a source's vocab can quantize to one flat bit-curve
      // (slope exactly 0); head-heaviness may only assert non-positive —
      // the 1/rank synthetic below pins the strictly-negative behavior
      assert(r.getDouble(2) <= 0.0, s"$src: slope must be non-positive")
      val h = r.getDouble(3)
      assert(h > 0.0 && h < 1.0, s"$src head10_share")
    }
    // a synthetic 1/rank corpus: type i occurs floor(256/i) times -> the
    // bit-quantized fit lands near the Zipf ideal -1
    val zipfWords = (1 to 64).flatMap(i => Seq.fill(256 / i)(s"w$i"))
    val zipfDocs = Seq((0L, zipfWords.mkString(" "), "en", "z"))
      .toDF("doc_id", "text", "lang", "source")
    val zr = TextAnalysis.zipfFit(zipfDocs).collect().head
    assert(math.abs(zr.getDouble(2) - (-1.0)) < 0.15,
      s"1/rank corpus must fit near -1, got ${zr.getDouble(2)}")
    // template spam: three tokens carry EVERYTHING -> head mass saturates
    val spam = (0L until 20L).map(i => (i, "buy cheap now", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val sr = TextAnalysis.zipfFit(spam).collect().head
    assert(sr.getDouble(3) === 1.0, "spam head10_share must saturate")
  }
}
