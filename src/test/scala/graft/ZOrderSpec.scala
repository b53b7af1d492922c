package graft

import org.apache.spark.sql.functions._

/** Layout proof for the z-order clustering rewrite (`src_zorder_cluster`):
  * the point of interleaved-bit clustering is that each written file's
  * (partkey, suppkey) bounding box covers a small tile of the key plane,
  * so a predicate on BOTH dimensions can prune most files from footer
  * min/max stats alone. A single-key sort would leave the second
  * dimension's per-file range at full width; random layout leaves both.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("z-order files cover small bounding boxes in both key dimensions") {
    // run the query to materialize the clustered layout
    SparkEntry.queries("src_zorder_cluster")(spark, sf).collect()
    val path = s"${sys.props("java.io.tmpdir")}/graft_roundtrip/lineitem_zorder"
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(
        (max($"l_partkey") - min($"l_partkey") + 1).as("p_width"),
        (max($"l_suppkey") - min($"l_suppkey") + 1).as("s_width"))
    val bounds = spark.read.parquet(path)
      .agg((max($"l_partkey") - min($"l_partkey") + 1).as("p_total"),
        (max($"l_suppkey") - min($"l_suppkey") + 1).as("s_total"))
      .head()
    val (pTotal, sTotal) = (bounds.getLong(0).toDouble, bounds.getLong(1).toDouble)
    val boxes = perFile.select($"p_width", $"s_width").collect()
    assert(boxes.length >= 8, s"expected >=8 files, got ${boxes.length}")
    // mean bounding-box area as a fraction of the full key plane: a
    // contiguous 1/16 z-range tile covers ~1/16 of the plane; random
    // layout covers ~1.0 per file. 0.35 splits the two decisively.
    val meanFrac = boxes.map(r =>
      (r.getLong(0) / pTotal) * (r.getLong(1) / sTotal)).sum / boxes.length
    assert(meanFrac < 0.35,
      f"z-order files should tile the key plane: mean box fraction $meanFrac%.3f")
  }
}
