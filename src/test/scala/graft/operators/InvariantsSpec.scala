package graft.operators

import graft.SparkSpec
import graft.functions.Ids
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven invariant checks: scalacheck generates adversarial
  * inputs, one DataFrame pass evaluates the column functions over all of
  * them, and the invariants are asserted in Scala — property testing
  * without one Spark job per sample.
  */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val partialDate: Gen[String] = for {
    y <- Gen.chooseNum(1900, 2100)
    precision <- Gen.chooseNum(0, 2)
    m <- Gen.chooseNum(1, 12)
    d <- Gen.chooseNum(1, 28)
  } yield precision match {
    case 0 => f"$y%04d"
    case 1 => f"$y%04d-$m%02d"
    case _ => f"$y%04d-$m%02d-$d%02d"
  }

  test("prefix-date simplification: minimal covering subset") {
    val sets = samples(Gen.listOfN(6, partialDate).map(_.distinct), 300)
    val out = sets.toDF("vals")
      .select($"vals", Consolidate.simplifyPrefixDates(array_sort($"vals")).as("kept"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (input, kept) =>
      assert(kept.toSet.subsetOf(input.toSet))
      // no kept value is a strict prefix of another kept value
      kept.foreach(a => kept.foreach(b =>
        assert(a == b || !(b.startsWith(a) && b.length > a.length), s"$a prefixes $b")))
      // every dropped value is a strict prefix of something kept
      (input.toSet -- kept.toSet).foreach(d =>
        assert(kept.exists(k => k.startsWith(d) && k.length > d.length), s"$d dropped"))
    }
  }

  test("interval overlap is symmetric and wildcard-absorbing") {
    val maybeDate: Gen[String] = Gen.frequency(4 -> partialDate, 1 -> Gen.const(""))
    val quads = samples(Gen.zip(maybeDate, maybeDate, maybeDate, maybeDate), 300)
    val out = quads.toDF("s1", "e1", "s2", "e2")
      .select(
        Consolidate.intervalsOverlap($"s1", $"e1", $"s2", $"e2").as("ab"),
        Consolidate.intervalsOverlap($"s2", $"e2", $"s1", $"e1").as("ba"),
        Consolidate.intervalsOverlap($"s1", $"e1", lit(""), lit("")).as("wild"))
      .as[(Boolean, Boolean, Boolean)].collect()
    out.foreach { case (ab, ba, wild) =>
      assert(ab == ba)
      assert(wild) // the empty interval is a wildcard: overlaps everything
    }
  }

  test("slugify is idempotent and alphabet-closed") {
    val strings = samples(Gen.listOfN(12, Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('#'),
      1 -> Gen.const('ü'))).map(_.mkString), 300)
    val out = strings.toDF("s")
      .select(Ids.slugify($"s").as("once"), Ids.slugify(Ids.slugify($"s")).as("twice"))
      .as[(String, String)].collect()
    out.foreach { case (once, twice) =>
      assert(once == twice)
      assert(once.matches("[a-z0-9-]*"))
      assert(!once.startsWith("-") && !once.endsWith("-"))
    }
  }

  test("undirected edge keys are symmetric") {
    val pairs = samples(Gen.zip(Gen.identifier, Gen.identifier), 300)
    val out = pairs.toDF("a", "b")
      .select(Consolidate.undirectedKey($"a", $"b").as("k1"),
        Consolidate.undirectedKey($"b", $"a").as("k2"))
      .as[(String, String)].collect()
    out.foreach { case (k1, k2) => assert(k1 == k2) }
  }

  test("year extraction returns only in-range standalone numbers") {
    val texts = samples(for {
      nums <- Gen.listOfN(3, Gen.chooseNum(0, 99999))
      words <- Gen.listOfN(3, Gen.identifier)
    } yield (nums.map(_.toString) ++ words).mkString(" "), 300)
    val out = texts.toDF("t")
      .select($"t", graft.functions.Dates.extractYears($"t").as("years"))
      .as[(String, Seq[String])].collect()
    out.foreach { case (t, years) =>
      val tokens = t.split("\\s+").toSet
      years.foreach { y =>
        assert(tokens.contains(y), s"$y not a token of '$t'")
        assert(y.toInt >= 1800 && y.toInt <= 2100)
      }
    }
  }
}
