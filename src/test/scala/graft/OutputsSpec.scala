package graft

import graft.core.Tables
import graft.dbscan.{Dbscan, Outputs}
import graft.functions.Distances
import org.apache.spark.sql.functions._

class OutputsSpec extends GraftSuite {
  import spark.implicits._

  test("anonymized JSON matches the reference golden shape (combine.json)") {
    val raw = Tables.readPointsCsv(spark, "/root/reference/data.csv", 2)
    val pts = raw.select(Distances.pack(col("x0"), col("x1")).as("qi"), col("label"))
    val m = Dbscan.runCollapsed(pts, "qi", eps = 6.0, minPts = 10, k = 10)
    val dim = 2
    val out = Outputs.anonymizedPairs(m, dim, labelCol = Some("label"))
    // shape: pt struct _1.._3 (2 QI + label), an_pt struct _1.._3
    assert(out.schema("pt").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("_1", "_2", "_3"))
    assert(out.schema("an_pt").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("_1", "_2", "_3"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // label preserved: pt._3 == an_pt._3
    rows.foreach { r =>
      val pt = r.getStruct(0); val an = r.getStruct(1)
      assert(pt.get(2) == an.get(2), "label must ride through anonymization")
    }
    // round-trip through the JSON sink
    val dir = java.nio.file.Files.createTempDirectory("anon").toString
    Outputs.writeAnonymizedJson(m, dim, dir, Some("label"))
    val back = spark.read.json(dir)
    assert(back.count() == rows.length)
  }

  test("kmeans parquet sink: reference headers, one row per point") {
    val ptsDf = (0 until 40).map(i =>
      (i.toLong, Array((i % 4) * 10.0, (i % 4) * 10.0))).toDF("id", "qi")
    val m = graft.kmeans.ConstrainedKMeans.fit(ptsDf, "id", "qi", 4, 4, seed = 1)
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    Outputs.writeKmeansParquet(m, Seq("age", "height"), dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSeq == Seq("age", "height"))
    assert(back.count() == 40)
  }

  test("sweep CSV: reference header + one row per epsilon") {
    val recs = Seq(
      graft.dbscan.SweepRecord(1.0, 0, 10, 0, Double.PositiveInfinity,
        Double.PositiveInfinity, 0.1),
      graft.dbscan.SweepRecord(2.0, 3, 1, 12.5, 1.5, 14.0, 0.2))
    val f = java.nio.file.Files.createTempFile("eps", ".csv").toString
    Outputs.writeSweepCsv(recs, f)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f))
    assert(lines.get(0).startsWith("eps,number of cluster,number of noise"))
    assert(lines.size == 3)
    assert(lines.get(2).startsWith("2.0,3,1,12.5,1.5,14.0"))
  }
}
