package graft

/** Every registered query must build and execute at sf0.001 — catches
  * runtime regressions in queries whose oracle the driver checks only
  * at round boundaries, and in the rows-only queries it never
  * value-checks.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("all SparkEntry queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // noop write so every projected column actually evaluates
        // (count() would let Catalyst prune computed columns away)
        try {
          fn(spark, "/root/testdata/sf0.001")
            .write.format("noop").mode("overwrite").save()
          None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
