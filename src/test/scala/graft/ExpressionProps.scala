package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based checks of the native Catalyst expressions against plain
  * Scala reference models, over arbitrary token material (including empty
  * strings — `split` produces them for doubled spaces — and duplicate
  * shingles).
  */
object ExpressionProps extends Properties("NativeExpressions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  private val token: Gen[String] =
    Gen.frequency(5 -> Gen.oneOf("a", "b", "c", "ab", "ba"), 1 -> Gen.const(""))
  private val toksGen: Gen[List[String]] = Gen.choose(0, 12).flatMap(Gen.listOfN(_, token))

  private def shingleModel(toks: List[String], n: Int): List[String] =
    if (toks.size < n) Nil
    else (0 to toks.size - n).map(i => toks.slice(i, i + n).mkString(" ")).toList.distinct

  property("word_shingles == sliding-window model (distinct, first-occurrence order)") =
    Prop.forAll(toksGen, Gen.choose(1, 4)) { (toks, n) =>
      val sp = spark
      import sp.implicits._
      val got = Seq(Tuple1(toks)).toDF("toks")
        .select(call_function("word_shingles", col("toks"), lit(n)))
        .collect().head.getSeq[String](0).toList
      got == shingleModel(toks, n)
    }

  // stopword-ish material: real lexicon words, MULTI-LEXICON words
  // ("de" ∈ {fr, es}, "a" ∈ {en, es} — StopLexicons.overlapping), and
  // non-stop tokens
  private val stopToken: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf("the", "a", "de", "la", "und", "es", "le", "y"),
    2 -> Gen.oneOf("xx", "spark", "", "thee"))
  private val stopToksGen: Gen[List[String]] =
    Gen.choose(0, 15).flatMap(Gen.listOfN(_, stopToken))

  property("stop_counts == size(filter(isin)) per language (the HOF formulation)") = {
    // the multi-bit accumulation path must be genuinely reachable: if the
    // lexicons ever stop overlapping, this property silently loses its
    // ability to cover that path — fail loudly instead
    require(graft.functions.StopLexicons.overlapping.nonEmpty,
      "lexicons no longer overlap; multi-bit path uncovered")
    Prop.forAll(stopToksGen) { toks =>
      val sp = spark
      import sp.implicits._
      val langs = graft.functions.StopLexicons.langs
      val df = Seq(Tuple1(toks)).toDF("toks")
      val native = df.select(call_function("stop_counts", col("toks")))
        .collect().head.getSeq[Long](0).toList
      val hof = df.select(langs.map { case (_, stops) =>
          size(filter(col("toks"), t => t.isin(stops: _*))).cast("long")
        }: _*).collect().head.toSeq.map(_.asInstanceOf[Long]).toList
      native == hof
    }
  }

  // arbitrary text with the character classes the shipped patterns
  // discriminate on (alnum runs, punctuation, spaces, digits-with-dots
  // for the IPv4-ish shapes, zero-length-match edge via empty strings)
  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '@', '-', ',', '!'),
      Gen.numChar)).map(_.mkString)

  property("match_count == regexp_count (the built-in it replaces) on every shipped pattern") =
    Prop.forAll(textGen, Gen.oneOf(
      graft.operators.TextAnalysis.WordPattern,
      graft.operators.TextAnalysis.BpeishPattern,
      graft.operators.TextAnalysis.EmailPattern,
      graft.operators.TextAnalysis.Ipv4Pattern,
      graft.operators.TextAnalysis.PhonePattern)) { (text, pat) =>
      val sp = spark
      import sp.implicits._
      val r = Seq(Tuple1(text)).toDF("t")
        .select(
          call_function("match_count", col("t"), lit(pat)),
          regexp_count(col("t"), lit(pat)).cast("long"))
        .collect().head
      r.getLong(0) == r.getLong(1)
    }

  private val P = 2147483647L

  property("minhash_sig == per-permutation running-minimum model") =
    Prop.forAll(toksGen, Gen.oneOf(4, 8, 16)) { (shingles, k) =>
      val sp = spark
      import sp.implicits._
      val got = Seq(Tuple1(shingles)).toDF("sh")
        .select(call_function("minhash_sig", col("sh"), lit(k)))
        .collect().head.getSeq[Long](0).toList
      val (as, bs) = graft.functions.MinHashSig.perms(k)
      val model =
        if (shingles.isEmpty) Nil
        else {
          val hs = shingles.map(s => graft.functions.md5Bits(s, 13) % P)
          (0 until k).map(j => hs.map(h => (as(j) * h + bs(j)) % P).min).toList
        }
      got == model
    }

  property("rhp_probes: first probe is the base cell, probes are distinct, count = min(nProbe, subsets<=2)") =
    Prop.forAll(Gen.listOfN(8, Gen.choose(-1.0, 1.0)), Gen.choose(1, 11)) { (vec, nProbe) =>
      val sp = spark
      import sp.implicits._
      val nPlanes = 4
      val df = Seq(Tuple1(vec)).toDF("v")
        .select(
          call_function("rhp_probes", col("v").cast("array<double>"),
            lit(nPlanes), lit(8), lit(42L), lit(nProbe)).as("probes"),
          element_at(
            call_function("rhp_buckets", col("v").cast("array<double>"),
              lit(1), lit(nPlanes), lit(8), lit(42L)), 1).as("base"))
      val r = df.collect().head
      val probes = r.getSeq[Long](0).toList
      val base = r.getLong(1)
      val maxSubsets = 1 + nPlanes + nPlanes * (nPlanes - 1) / 2
      probes.head == base &&
        probes.distinct == probes &&
        probes.size == math.min(nProbe, maxSubsets)
    }

  // ---- malformed-input fuzz: the two byte-level decoders must DEGRADE on
  // arbitrary bytes, never throw — a cleaning pipeline's inputs are dirty
  // by definition, and both parsers run inside whole-stage codegen where
  // one bad row fails the whole task (pure JVM calls: no Spark per case)

  private val bytesGen: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  property("image_header never throws on arbitrary bytes; format is always set") =
    Prop.forAll(bytesGen) { b =>
      val r = graft.functions.ImageHeader.compute(b)
      Set("png", "jpeg", "gif", "unknown")(r.getUTF8String(0).toString)
    }

  property("wav_header never throws on arbitrary bytes; format is always set") =
    Prop.forAll(bytesGen) { b =>
      val r = graft.functions.WavHeader.compute(b)
      Set("wav", "unknown")(r.getUTF8String(0).toString)
    }

  // RIFF-prefixed garbage is the interesting plane of the input space —
  // plain-random bytes almost never enter the chunk walk
  private val riffGen: Gen[Array[Byte]] =
    Gen.choose(0, 48).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail => "RIFF\u0000\u0000\u0000\u0000WAVE".getBytes("ISO-8859-1") ++ tail))

  property("wav_header chunk walk never throws or loops on corrupt RIFF bodies") =
    Prop.forAll(riffGen) { b =>
      val r = graft.functions.WavHeader.compute(b)
      r.getUTF8String(0).toString == "wav"
    }

  property("mp4_header never throws on arbitrary bytes; format is always set") =
    Prop.forAll(bytesGen) { b =>
      val r = graft.functions.Mp4Header.compute(b)
      Set("mp4", "unknown")(r.getUTF8String(0).toString)
    }

  // ftyp-prefixed garbage drives the box walk (plain-random bytes almost
  // never classify); the walk must terminate and never read past the end
  private val ftypGen: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail =>
          "\u0000\u0000\u0000\u0010ftypisom".getBytes("ISO-8859-1") ++ tail))

  property("mp4_header box walk never throws or loops on corrupt box bodies") =
    Prop.forAll(ftypGen) { b =>
      graft.functions.Mp4Header.compute(b).getUTF8String(0).toString == "mp4"
    }

  property("npy_header never throws on arbitrary bytes; format is always set") =
    Prop.forAll(bytesGen) { b =>
      val r = graft.functions.NpyHeader.compute(b)
      Set("npy", "unknown")(r.getUTF8String(0).toString)
    }

  private val npyGen: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail => "\u0093NUMPY".getBytes("ISO-8859-1") ++ tail))

  property("npy_header dict parse never throws on corrupt headers") =
    Prop.forAll(npyGen) { b =>
      graft.functions.NpyHeader.compute(b).getUTF8String(0).toString match {
        case "npy" | "unknown" => true // n < 10 stays unknown
        case _                 => false
      }
    }

  property("tar_members never throws on arbitrary bytes; format is always set") =
    Prop.forAll(bytesGen) { b =>
      val r = graft.functions.TarMembers.compute(b)
      Set("tar", "unknown")(r.getUTF8String(0).toString)
    }

  // a real first header block with garbage after it drives the member
  // walk across corrupt sizes and truncated payload extents
  private val tarGen: Gen[Array[Byte]] = {
    val hdr = new Array[Byte](512)
    "member".getBytes.copyToArray(hdr, 0)
    "00000001000 ".getBytes.copyToArray(hdr, 124)
    hdr(156) = '0'
    "ustar 00".getBytes("ISO-8859-1").copyToArray(hdr, 257)
    Gen.choose(0, 1024).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail => hdr ++ tail))
  }

  property("tar_members walk never throws or loops on corrupt archives") =
    Prop.forAll(tarGen) { b =>
      val r = graft.functions.TarMembers.compute(b)
      r.getUTF8String(0).toString == "tar" && r.getInt(1) >= 1
    }

  property("script_counts never reads out of bounds; counts bounded by byte length") =
    Prop.forAll(bytesGen) { b =>
      val counts = graft.functions.ScriptCounts.compute(UTF8String.fromBytes(b))
      val n = graft.functions.ScriptProfiles.nScripts
      // non-ws total can never exceed the byte count (every code point
      // consumes >= 1 byte), and per-script counts can never exceed it
      val total = counts.getLong(n)
      total <= b.length &&
        (0 until n).forall(i => counts.getLong(i) <= total)
    }

  // ------------------------------------------------------- Misra–Gries

  private val mgStream: Gen[List[String]] =
    Gen.choose(0, 120).flatMap(Gen.listOfN(_,
      Gen.frequency(6 -> Gen.const("hot"), 3 -> Gen.oneOf("w1", "w2", "w3"),
        2 -> Gen.oneOf((1 to 40).map("rare" + _)))))

  /** The sketch's guarantees must hold for ANY split of the stream into
    * partial buffers and ANY (left-fold) merge order — that is exactly
    * the freedom a distributed aggregation exercises.
    */
  property("MisraGries guarantees survive arbitrary splits and merge orders") =
    Prop.forAll(mgStream, Gen.choose(1, 5), Gen.choose(2, 6), Gen.long) {
      (stream, nSplits, k, seed) =>
        val mg = new graft.functions.MisraGries(k)
        // random contiguous split into partial buffers
        val rnd = new scala.util.Random(seed)
        val cuts = (Seq(0, stream.length) ++
          Seq.fill(nSplits - 1)(if (stream.isEmpty) 0 else rnd.nextInt(stream.length + 1)))
          .distinct.sorted
        val parts = cuts.zip(cuts.tail).map { case (a, b) =>
          stream.slice(a, b).foldLeft(mg.zero)(mg.reduce)
        }
        // random merge order
        val merged = rnd.shuffle(parts).foldLeft(mg.zero)(mg.merge)
        val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        val n = stream.size.toDouble
        val bound = n / (k + 1)
        val sizeOk = merged.size <= k
        val noFalseNegatives = exact.forall { case (t, c) =>
          c <= bound || merged.contains(t)
        }
        val estimatesBounded = merged.forall { case (t, est) =>
          val truth = exact.getOrElse(t, 0L)
          est <= truth && truth - est <= math.ceil(bound).toLong
        }
        sizeOk && noFalseNegatives && estimatesBounded
    }

  /** NULL terms are un-attributable AND un-encodable (Catalyst map
    * buffers reject null keys — the adversarial-events st14 catch): the
    * sketch must IGNORE them, yielding exactly the null-free result.
    */
  property("MisraGries ignores null terms: result equals the null-free stream's") =
    Prop.forAll(mgStream, Gen.choose(2, 6), Gen.long) { (stream, k, seed) =>
      val mg = new graft.functions.MisraGries(k)
      val rnd = new scala.util.Random(seed)
      val withNulls: List[String] =
        stream.flatMap(t => if (rnd.nextInt(4) == 0) List(null, t) else List(t))
      val a = withNulls.foldLeft(mg.zero)(mg.reduce)
      val b = stream.foldLeft(mg.zero)(mg.reduce)
      a == b && !a.contains(null)
    }
  // bpe_sym_count vs the rendered replace-chain model it replaced (the
  // td26/st25 formulation the DuckDB oracles still run): render chars as
  // |c||h|..., one literal replace per merge in order, count = surviving
  // delimiters / 2. Pairs include never-matching and repeated symbols.
  private val bpeWord: Gen[String] =
    Gen.choose(0, 12).flatMap(Gen.listOfN(_, Gen.oneOf('a', 'b', 'c', 'd'))).map(_.mkString)
  private val bpeSym: Gen[String] =
    Gen.oneOf("a", "b", "c", "d", "ab", "bc", "abc", "z")
  private val bpePairs: Gen[List[(String, String)]] =
    Gen.choose(0, 6).flatMap(Gen.listOfN(_, Gen.zip(bpeSym, bpeSym)))
  private def bpeModel(word: String, pairs: List[(String, String)]): Long = {
    val rendered = word.map(c => s"|$c|").mkString
    val merged = pairs.foldLeft(rendered) { case (s, (l, r)) =>
      s.replace(s"|$l||$r|", s"|$l$r|")
    }
    ((merged.length - merged.replace("|", "").length) / 2).toLong
  }
  property("bpe_sym_count == rendered replace-chain model (greedy leftmost non-overlapping)") =
    Prop.forAll(bpeWord, bpePairs) { (w, pairs) =>
      val sp = spark
      import sp.implicits._
      val spec = pairs.map { case (l, r) => s"$l:$r" }.mkString(",")
      val got = Seq(Tuple1(w)).toDF("w")
        .select(call_function("bpe_sym_count", col("w"), lit(spec)))
        .collect().head.getLong(0)
      got == bpeModel(w, pairs)
    }
}
