package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: dim j's bit b lands at position b*n+j") {
    val rows = Seq((1L, 2L), (3L, 3L), (0L, 0L), (7L, 0L)).toDF("x", "y")
    val out = rows
      .select(col("x"), col("y"), ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[(Long, Long, Long)]
      .collect()
      .map { case (x, y, z) => (x, y) -> z }
      .toMap
    // x=1 (001), y=2 (010): bit0 of x -> pos0, bit1 of y -> pos3: 1 + 8
    out((1L, 2L)) shouldBe 9L
    // x=3, y=3: positions 0,1,2,3 set
    out((3L, 3L)) shouldBe 15L
    out((0L, 0L)) shouldBe 0L
    // x=7 (111): positions 0,2,4
    out((7L, 0L)) shouldBe (1L + 4L + 16L)
  }

  test("top z bits identify the quadrant: spatial locality is hierarchical") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = pts
      .toDF("x", "y")
      .select(
        col("x"),
        col("y"),
        shiftright(ZOrder.zValue(Seq(col("x"), col("y")), 4), 6).as("quad"))
      .as[(Long, Long, Long)]
      .collect()
    out.foreach { case (x, y, quad) =>
      quad shouldBe ((y / 8) * 2 + (x / 8)) // (y_top, x_top) quadrant id
    }
  }

  test("rangeBucket is exact integer range bucketing") {
    val out = Seq(0L, 999L, 1000L, 1999L)
      .toDF("v")
      .select(col("v"), ZOrder.rangeBucket(col("v"), 0L, 1999L, 3).as("b"))
      .as[(Long, Long)]
      .collect()
      .toMap
    out(0L) shouldBe 0L
    out(999L) shouldBe 3L // 999*8/2000 = 3.996 -> 3
    out(1000L) shouldBe 4L
    out(1999L) shouldBe 7L // never reaches 2^bits
  }

  test("a 2-D box touches fewer z-chunks than arrival-order chunks") {
    // 64x64 grid in arrival order (row-major): a 8x8 box crosses 8
    // arrival rows -> 8+ of 64 arrival chunks; z-order keeps it in ~1-2
    val pts = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
    val df = pts
      .toDF("arrival", "x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 6))
      .withColumn("chunk_arrival", ZOrder.rangeBucket(col("arrival"), 0L, 4095L, 6))
      .withColumn("chunk_z", shiftright(col("z"), 6)) // 12 bits -> 64 cells
    val box = col("x") >= 8 && col("x") < 16 && col("y") >= 8 && col("y") < 16
    val (na, nz) = df
      .filter(box)
      .agg(countDistinct(col("chunk_arrival")), countDistinct(col("chunk_z")))
      .as[(Long, Long)]
      .head()
    nz should be < na
    nz should be <= 4L // the box spans at most a few Morton cells
    na should be >= 8L // one arrival chunk per crossed row
  }
}
