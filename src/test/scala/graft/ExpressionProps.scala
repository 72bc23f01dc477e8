package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
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
          val hs = shingles.map { s =>
            val raw = XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)
            val m = raw % P
            if (m < 0) m + P else m
          }
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
}
