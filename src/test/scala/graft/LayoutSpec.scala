package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("shardPlan packs first-fit with exclusive prefixes, per group") {
    val docs = Seq(
      ("a", 1L, 600L), ("a", 2L, 600L), ("a", 3L, 600L), // 0,0 then 1200->1
      ("a", 4L, 5000L),                                  // oversized row
      ("a", 5L, 10L),                                    // pushed far ahead by it
      ("b", 1L, 10L)                                     // groups independent
    ).toDF("src", "id", "bytes")
    val got = Layout.shardPlan(docs, "src", "id", "bytes", target = 1000L)
      .select($"src", $"id", $"shard_id").as[(String, Long, Long)]
      .collect().toSet
    // exclusive prefixes in group a: 0, 600, 1200, 1800, 6800
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("a", 4L, 1L), ("a", 5L, 6L), ("b", 1L, 0L)), got.toString)
  }

  test("zorderValue interleaves bits dim-major (x=101b, y=011b -> 27)") {
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zorderValue(Seq($"x", $"y"), bits = 3).as("z"))
      .as[Long].head()
    assert(got == 27L, s"z=$got")
  }

  test("zorderSql is the same function as zorderValue") {
    val df = Seq((5L, 3L), (0L, 7L), (255L, 255L), (128L, 1L))
      .toDF("x", "y")
    val both = df.select(
        Layout.zorderValue(Seq($"x", $"y"), bits = 8).as("a"),
        expr(Layout.zorderSql(Seq("x", "y"), 8)).as("b"))
      .as[(Long, Long)].collect()
    assert(both.forall(p => p._1 == p._2), both.mkString(","))
  }

  test("z-ordered files bound both dimensions tighter than a time sort") {
    // the layout_zorder harness query: every file's span is bounded on
    // BOTH interleaved dims; a pure time sort leaves user_span ~ full
    val stats = SparkEntry.queries("layout_zorder")(spark, "/root/testdata/sf0.001")
      .agg(max($"user_span").as("mu"), max($"hour_span").as("mh"))
      .as[(Long, Long)].head()
    // 8-bit interleave of user in [0,150), hour in [0,720): a z-bucket
    // of 256 consecutive z-values fixes the top 4 bits of each dim ->
    // user span < 16, hour span < 2.82*16=45h... allow slack to stay
    // robust to corpus edges, but far below the full ranges (150/720)
    assert(stats._1 <= 16L && stats._2 <= 64L, stats.toString)
  }

  test("compactionPlan: small files pack into dense bounded bins, big files keep") {
    val files = Seq(
      ("a", 1L, 1000L), ("a", 2L, 5000L), ("a", 3L, 1500L),
      ("a", 4L, 2000L), ("a", 5L, 900L), ("b", 1L, 200L))
      .toDF("src", "fid", "bytes")
    val plan = Layout.compactionPlan(files, "src", "fid", "bytes",
        small = 3000L, target = 3000L)
      .select($"src", $"fid", $"action", $"bin")
      .as[(String, Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // a: smalls are 1000,1500,2000,900 with exclusive prefixes
    // 0,1000,2500,4500 -> bins 0,0,0,1; the 5000-byte file keeps
    assert(plan(("a", 1L)) == (("compact", 0L)))
    assert(plan(("a", 2L)) == (("keep", -1L)))
    assert(plan(("a", 3L)) == (("compact", 0L)))
    assert(plan(("a", 4L)) == (("compact", 0L)))
    assert(plan(("a", 5L)) == (("compact", 1L)))
    assert(plan(("b", 1L)) == (("compact", 0L))) // groups independent
  }
}
