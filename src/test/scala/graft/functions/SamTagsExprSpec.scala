package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamTagsExprSpec extends SparkSpec {

  private def tags(attrs: String): (Int, Int, Option[String]) = {
    import spark.implicits._
    val r = Seq(Tuple1(attrs)).toDF("a")
      .select(SamTagsExpr.samTags(col("a")).as("t"))
      .select("t.nm", "t.nh", "t.md").head()
    (r.getInt(0), r.getInt(1), Option(r.getString(2)))
  }

  test("extracts NM/NH/MD with reference defaults") {
    assert(tags("NM:i:2 MD:Z:2A3T3 NH:i:1 XQ:i:10") === ((2, 1, Some("2A3T3"))))
    assert(tags("") === ((0, 1, None)))                 // defaults: NM=0, NH=1
    assert(tags("XQ:i:10 AS:i:5") === ((0, 1, None)))   // unrelated tags ignored
    assert(tags("MD:Z:10") === ((0, 1, Some("10"))))
    assert(tags("NM:i:-3") === ((-3, 1, None)))         // signed ints
  }

  test("tab- and space-separated blobs parse identically") {
    assert(tags("NM:i:5\tNH:i:2\tMD:Z:0A9") === ((5, 2, Some("0A9"))))
    assert(tags("  NM:i:5   NH:i:2 ") === ((5, 2, None)))
  }

  test("agrees with the generic attrMap composition on fixture records") {
    import graft.mito.Sam
    val df = Sam.read(spark, resource("mito/sample_MT_MD.sam"))
    val viaMap = df.select(col("readName"),
        Sam.attrMap(col("attributes")).as("m"))
      .select(col("readName"),
        Sam.tagOrDefault(col("m"), "NM", 0).as("nm"),
        Sam.tagOrDefault(col("m"), "NH", 1).as("nh"),
        element_at(col("m"), "MD").as("md"))
    val viaScan = df.select(col("readName"),
        SamTagsExpr.samTags(col("attributes")).as("t"))
      .select(col("readName"), col("t.nm").as("nm"), col("t.nh").as("nh"),
        col("t.md").as("md"))
    assert(viaMap.except(viaScan).isEmpty && viaScan.except(viaMap).isEmpty)
  }
}
