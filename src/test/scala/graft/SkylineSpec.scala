package graft

import graft.operators.Skyline
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase distributed skyline must equal the quadratic
  * dominance definition exactly.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val part = spark.read.parquet(s"${TestSpark.sfDir}/part.parquet")

  private def brute(rows: Seq[(Long, Double, Int)]): Set[Long] = {
    def dominates(a: (Long, Double, Int), b: (Long, Double, Int)): Boolean =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    rows.filter(r => !rows.exists(u => dominates(u, r))).map(_._1).toSet
  }

  test("two-phase skyline equals the quadratic definition on part") {
    val rows = part.select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val want = brute(rows)
    val got = Skyline.skylineIds(part, "p_partkey",
      Seq("p_retailprice" -> false, "p_size" -> true))
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < rows.size) // nontrivial front
  }

  test("ties (identical criteria) all survive") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 10), (2L, 5.0, 10), (3L, 6.0, 9), (4L, 4.0, 11))
      .toDF("id", "price", "size")
    val got = Skyline.skylineIds(df, "id", Seq("price" -> false, "size" -> true))
      .collect().map(_.getLong(0)).toSet
    // 4 dominates 1,2,3; 1 and 2 tie with each other but are dominated by 4
    assert(got == Set(4L))
    val got2 = Skyline.skylineIds(df.filter($"id" =!= 4), "id",
      Seq("price" -> false, "size" -> true))
      .collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 2L)) // tied pair both stay once the dominator is gone
  }
}
