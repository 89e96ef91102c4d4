package graft

import graft.functions.{CrossHash, HashOps, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the exactness invariant: the native
  * single-pass expressions (HashExpressions) must produce EXACTLY the
  * same values as the higher-order-function formulations in
  * CrossHash/VectorFunctions — because the DuckDB oracles are
  * generated from the HOF shape, any drift between the two Spark
  * paths silently breaks the correctness gate.
  */
class CrossCheckSpec extends AnyFunSuite {

  /** Deterministic sampling in place of forAll (no scalatest-plus
    * bridge in the offline dep set): N seeded samples per property.
    */
  private def forSamples[T](gen: Gen[T], n: Int = 8)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private lazy val spark = TestSpark.spark

  // ascii word-ish text: words of a small alphabet, single/double spaces,
  // occasional empty string
  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(12))
  private val textGen: Gen[String] = Gen.frequency(
    1 -> Gen.const(""),
    2 -> word,
    10 -> Gen.listOfN(20, word).map(_.mkString(" ")),
    3 -> Gen.listOfN(8, word).map(_.mkString("  ")), // double spaces -> empty tokens
    2 -> Gen.listOfN(5, word).map(w => " " + w.mkString(" ") + " "))

  private def evalBoth(texts: Seq[String], fast: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column): Seq[(Any, Any)] = {
    import spark.implicits._
    texts.toDF("text").select(fast.as("fast"), hof.as("hof"))
      .collect().map(r => (r.get(0), r.get(1))).toSeq
  }

  test("native minhash signature == HOF minhash signature (random texts)") {
    forSamples(Gen.listOfN(24, textGen)) { texts =>
      val rows = evalBoth(texts,
        CrossHash.minhashSigFast(col("text"), 3),
        CrossHash.minhashSig(CrossHash.shingleHashes(col("text"), 3)))
      rows.foreach { case (f, h) => assert(f == h, s"fast=$f hof=$h") }
    }
  }

  test("native simhash == HOF simhash (random texts)") {
    forSamples(Gen.listOfN(24, textGen)) { texts =>
      // HOF simhash of an empty token set is 0 via empty filter counts
      val rows = evalBoth(texts,
        CrossHash.simhashFast(col("text")),
        CrossHash.simhash(CrossHash.tokenHashes(col("text"))))
      rows.foreach { case (f, h) => assert(f == h, s"fast=$f hof=$h") }
    }
  }

  test("native shingles == HOF shingles (random texts)") {
    forSamples(Gen.listOfN(24, textGen)) { texts =>
      val rows = evalBoth(texts,
        CrossHash.shinglesFast(col("text"), 2),
        CrossHash.shingles(col("text"), 2))
      rows.foreach { case (f, h) => assert(f == h, s"fast=$f hof=$h") }
    }
  }

  test("native fingerprint == HOF fingerprint (random texts)") {
    forSamples(Gen.listOfN(24, textGen)) { texts =>
      val rows = evalBoth(texts,
        CrossHash.fingerprintFast(col("text"), 5),
        coalesce(array_min(CrossHash.shingleHashes(col("text"), 5)), lit(-1L)))
      rows.foreach { case (f, h) => assert(f == h, s"fast=$f hof=$h") }
    }
  }

  test("charFold JVM implementation == Spark HOF charFold") {
    forSamples(Gen.listOfN(30, word)) { words =>
      import spark.implicits._
      val got = words.toDF("w").select(CrossHash.charFold(col("w"))).collect().map(_.getLong(0))
      val want = words.map(HashOps.charFold)
      assert(got.toSeq == want)
    }
  }

  test("native cosine == HOF cosine (random float vectors)") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f))
    forSamples(Gen.listOfN(12, Gen.zip(vecGen, vecGen))) { pairs =>
      import spark.implicits._
      val rows = pairs.toDF("a", "b")
        .select(
          VectorFunctions.cosineFast(col("a"), col("b")).as("fast"),
          VectorFunctions.cosine(col("a"), col("b")).as("hof"))
        .collect()
      rows.foreach { r =>
        val (f, h) = (r.getDouble(0), r.getDouble(1))
        assert(f == h || (f.isNaN && h.isNaN), s"fast=$f hof=$h") // bit-exact
      }
    }
  }
}
