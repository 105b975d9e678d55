package graft

import java.nio.file.Files

import graft.engine.Ols
import graft.sources.PairSource

class SourcesSpec extends SparkSpec {

  test("PairSource reads x-y pairs and drops malformed lines") {
    val dir = Files.createTempDirectory("pairs")
    val f = dir.resolve("data.txt")
    Files.writeString(f,
      "1.0 3.0\n2.0 5.0\n3.0 7.0\nnot numbers\n4.0 9.0\n")
    val df = PairSource.readPairs(spark, f.toString)
    assert(df.count() == 4) // malformed line dropped, all valid rows kept
    val w = Ols.fitLinearExact(df, "x", "y") // y = 2x + 1
    assert(math.abs(w.w1 - 2.0) < 1e-9 && math.abs(w.w0 - 1.0) < 1e-9)
  }

  test("q45 approx_count_distinct stays within HLL error of exact") {
    val rows = SparkEntry.queries("q45_approx_distinct")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }
}
