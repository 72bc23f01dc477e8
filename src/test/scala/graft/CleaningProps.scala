package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.operators.Cleaning
import graft.operators.Cleaning.Rule

/** Property-based cleaning invariants (SURVEY.md §5): for ARBITRARY data —
  * including nulls, negatives, boundary values — the cleaned frame
  * satisfies every rule, and the removal accounting always reconciles:
  * rows_in = rows_out + Σ removed_<rule>, under sequential attribution.
  */
object CleaningProps extends Properties("Cleaning") {

  // Spark jobs per check are not free — 20 generated frames is plenty to
  // cover null/boundary interactions while keeping the suite fast.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = TestSpark.spark

  private val cell: Gen[Option[Double]] = Gen.frequency(
    2 -> Gen.const(None),
    3 -> Gen.choose(-5.0, 0.0).map(Some(_)),
    1 -> Gen.const(Some(0.0)),
    1 -> Gen.const(Some(1000.0)), // price_cap boundary
    5 -> Gen.choose(0.0, 2000.0).map(Some(_)))

  private val rowGen: Gen[(Option[Long], Option[Double], Option[Double])] =
    for {
      id <- Gen.frequency(4 -> Gen.choose(0L, 99L).map(Some(_)), 1 -> Gen.const(None))
      q <- cell
      p <- cell
    } yield (id, q, p)

  private val frameGen = Gen.listOfN(40, rowGen)

  private val rules = Seq(
    Rule("nulls", Cleaning.notNull(Seq("id", "qty", "price"))),
    Rule("quantity", col("qty") > 0),
    Rule("price_pos", col("price") > 0),
    Rule("price_cap", col("price") <= 1000))

  property("cleaned frame satisfies every rule; accounting reconciles") =
    Prop.forAll(frameGen) { rows =>
      val sp = spark
      import sp.implicits._
      val df = rows.toDF("id", "qty", "price")
      val cleaned = Cleaning.clean(df, rules).collect()
      val allPass = cleaned.forall { r =>
        !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) &&
          r.getDouble(1) > 0 && r.getDouble(2) > 0 && r.getDouble(2) <= 1000
      }
      val acct = Cleaning.accountingAgg(df, rules).collect().head
      val removed = rules.map(r => acct.getAs[Long](s"removed_${r.name}")).sum
      val reconciles =
        acct.getAs[Long]("rows_in") == rows.size.toLong &&
          acct.getAs[Long]("rows_out") == cleaned.length.toLong &&
          removed + acct.getAs[Long]("rows_out") == acct.getAs[Long]("rows_in")
      allPass && reconciles
    }

  property("sequential attribution: reference's eager-passes semantics") =
    Prop.forAll(frameGen) { rows =>
      // reference semantics: apply rules one frame-pass at a time, counting
      // each rule's removals among the survivors of earlier rules
      // (assignment1.ipynb:147-164)
      def pass(r: (Option[Long], Option[Double], Option[Double]), i: Int): Boolean = i match {
        case 0 => r._1.isDefined && r._2.isDefined && r._3.isDefined
        case 1 => r._2.exists(_ > 0)
        case 2 => r._3.exists(_ > 0)
        case 3 => r._3.exists(_ <= 1000)
      }
      var survivors = rows
      val expected = (0 until 4).map { i =>
        val (keep, drop) = survivors.partition(pass(_, i))
        survivors = keep
        drop.size.toLong
      }
      val sp = spark
      import sp.implicits._
      val acct = Cleaning.accountingAgg(rows.toDF("id", "qty", "price"), rules)
        .collect().head
      rules.map(r => acct.getAs[Long](s"removed_${r.name}")) == expected
    }
}
