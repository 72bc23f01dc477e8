package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.sources.UstarWriter
import graft.functions.{TarMembers, TarSamples}

/** Writer→reader round-trip fuzz for the USTAR shard path (r14 verdict
  * item 7): [[UstarWriter]] is the staging half of mm12's WebDataset
  * shards and [[TarSamples]]/[[TarMembers]] the serving half —
  * advassets fuzzes staged READERS, but nothing drove hostile member
  * names/sizes through write-then-walk. Properties pin:
  *
  *  - representation guards fail LOUDLY (names whose UTF-8 encoding
  *    exceeds the 100-byte POSIX.1-1988 field, sizes ≥ 8 GiB) — the
  *    r14 inline writer silently truncated/corrupted both;
  *  - everything representable round-trips EXACTLY: stems (including
  *    non-ASCII UTF-8 up to the byte limit), per-stem part counts and
  *    extension inventories, txt payload md5/bytes, declared-size sums
  *    — against a plain-Scala model of the WebDataset grouping rules;
  *  - the size-field boundaries (0, 511, 512, 513, 2^33 − 1) parse
  *    back to the declared value.
  */
object UstarWriterProps extends Properties("UstarWriter") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  // ---------------------------------------------------------- generators

  private val stemChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('-', '_', '.', '+', '~', '@'),
    1 -> Gen.oneOf('é', 'ß', 'Ω', 'б', '中', '文', '日', '한', 'क'),
    1 -> Gen.oneOf('é', '样', '本'))

  private val ext: Gen[String] = Gen.oneOf("txt", "jpg", "json", "wav", "npy")

  /** A representable member name: stem.ext, UTF-8 ≤ 100 bytes, no NUL,
    * no '/'. Stems avoid '.' as the FIRST char so stem/ext splitting is
    * the model's own job, not a generator artifact.
    */
  private val memberName: Gen[String] = for {
    stemLen <- Gen.choose(1, 24)
    stem0 <- Gen.listOfN(stemLen, stemChar).map(_.mkString)
    stem = stem0.replace('/', '_')
    e <- ext
    name = s"$stem.$e"
    if name.getBytes(StandardCharsets.UTF_8).length <= UstarWriter.NameFieldBytes
  } yield name

  private val payload: Gen[Array[Byte]] = for {
    n <- Gen.frequency(
      4 -> Gen.choose(0, 40),
      2 -> Gen.oneOf(0, 1, 511, 512, 513, 1023, 1024),
      1 -> Gen.choose(1000, 1500))
    bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bytes.toArray

  private val members: Gen[List[(String, Array[Byte])]] = for {
    n <- Gen.choose(0, 12)
    names <- Gen.listOfN(n, memberName)
    pays <- Gen.listOfN(n, payload)
  } yield names.distinct.zip(pays) // unique names: one file per member

  private def shard(ms: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ms.foreach { case (n, p) => UstarWriter.writeMember(out, n, p) }
    UstarWriter.terminate(out)
    out.toByteArray
  }

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  // plain-Scala model of TarSamples' WebDataset grouping contract
  private case class ModelSample(
      nParts: Long, exts: String, txtMd5: Option[String], txtBytes: Option[Long])
  private def model(ms: Seq[(String, Array[Byte])]): Map[String, ModelSample] =
    ms.groupBy { case (n, _) =>
      val dot = n.lastIndexOf('.'); if (dot < 0) n else n.substring(0, dot)
    }.map { case (stem, parts) =>
      val exts = parts.map { case (n, _) =>
        val dot = n.lastIndexOf('.'); if (dot < 0) "" else n.substring(dot + 1)
      }.distinct.sorted
      val txts = parts.filter(_._1.endsWith(".txt"))
      stem -> ModelSample(
        parts.length.toLong, exts.mkString(","),
        if (txts.isEmpty) None else Some(txts.map(t => md5(t._2)).max),
        if (txts.isEmpty) None else Some(txts.map(_._2.length.toLong).max))
    }

  // --------------------------------------------------------- properties

  property("write-then-assemble equals the WebDataset grouping model") =
    Prop.forAll(members) { ms =>
      val arr = TarSamples.compute(shard(ms))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 5)
        r.getUTF8String(0).toString -> ModelSample(
          r.getLong(1), r.getUTF8String(2).toString,
          if (r.isNullAt(3)) None else Some(r.getUTF8String(3).toString),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))
      }.toMap
      val want = model(ms)
      (got == want) :| s"got=$got want=$want"
    }

  property("write-then-walk member counts and declared-size sums are exact") =
    Prop.forAll(members) { ms =>
      val r = TarMembers.compute(shard(ms))
      val fmt = r.getUTF8String(0).toString
      if (ms.isEmpty) (fmt != "tar" || r.getInt(1) == 0) :| "empty shard"
      else (fmt == "tar") :| "format" &&
        (r.getInt(1) == ms.length) :| s"members ${r.getInt(1)} != ${ms.length}" &&
        (r.getInt(2) == ms.length) :| "regular files" &&
        (r.getLong(3) == ms.map(_._2.length.toLong).sum) :| "payload sum"
    }

  property("oversize names are a loud named error, never a truncated header") =
    Prop.forAll(Gen.choose(101, 300), Gen.oneOf("a", "中", "é")) { (n, c) =>
      // n CHARS of c — multibyte chars exceed the byte limit even when
      // the char count would fit
      val name = c * n + ".txt"
      val e = try { UstarWriter.header(name, 0L); None }
              catch { case t: IllegalArgumentException => Some(t) }
      e.exists(_.getMessage.contains("name field")) :| s"no guard for $n chars of '$c'"
    }

  property("a name of exactly 100 UTF-8 bytes round-trips un-truncated") = {
    val name = "a" * 96 + ".txt" // 100 bytes exactly
    val arr = TarSamples.compute(shard(Seq(name -> "x".getBytes)))
    (arr.numElements() == 1 &&
      arr.getStruct(0, 5).getUTF8String(0).toString == "a" * 96) :| "100-byte name"
  }

  property("size-field boundary: 2^33-1 is representable, 2^33 is a loud error") = {
    val max = UstarWriter.MaxMemberBytes
    val hdr = UstarWriter.header("big.bin", max)
    // TarMembers parses the declared size straight off this header even
    // though the payload is absent (the documented overrun stop)
    val parsed = TarMembers.compute(hdr ++ new Array[Byte](512))
    val over = try { UstarWriter.header("big.bin", max + 1); false }
               catch { case _: IllegalArgumentException => true }
    (parsed.getLong(3) == max) :| s"declared ${parsed.getLong(3)} != $max" &&
      over :| "2^33 accepted" &&
      (try { UstarWriter.header("neg.bin", -1L); false }
       catch { case _: IllegalArgumentException => true }) :| "negative accepted"
  }
}
