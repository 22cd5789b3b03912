package graft.mdl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the raw-landing normalization laws ([[LandRaw]]): sanitize is total
  * over arbitrary header junk, collisions stay queryable, and the landed
  * table is typed.
  */
class LandRawSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sanitize: total, deterministic, always a bare-queryable identifier") {
    val rnd = new scala.util.Random(7)
    val pool = "aZ9 _-$%(),.:;/\\\"'éÑ中\t"
    for (_ <- 1 to 5000) {
      val raw = Seq.fill(1 + rnd.nextInt(14))(pool(rnd.nextInt(pool.length)))
        .mkString
      val s = LandRaw.sanitize(raw)
      assert(s.matches("[a-z_][a-z0-9_]*"),
        s"'$raw' -> '$s' is not a bare-queryable identifier")
      assert(s == LandRaw.sanitize(raw), s"non-deterministic on '$raw'")
    }
    // the dlt-style spellings users actually hit
    assert(LandRaw.sanitize("Total Price ($)") === "total_price_")
    assert(LandRaw.sanitize("9lives") === "c_9lives")
    assert(LandRaw.sanitize("___") === "___") // all-underscore survives as-is
    assert(LandRaw.sanitize("$%") === "_")    // all-symbol collapses to _
    assert(LandRaw.sanitize("") === "c_")     // empty gets the c_ floor
  }

  test("gzip-compressed raw files land by their inner format extension") {
    import java.nio.file.Files
    val raw = Files.createTempDirectory("graft_lrgz_")
    val out = Files.createTempDirectory("graft_lrgzland_").toString
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(raw.resolve("sales.csv.gz")))
    gz.write("id,amt\n1,2.5\n2,4.0\n".getBytes("UTF-8")); gz.close()
    // a codec nobody registered still skips, not errors
    Files.write(raw.resolve("notes.txt.gz"), Array[Byte](1, 2))
    val landed = LandRaw.land(spark, raw.toString, out)
    assert(landed.map(l => (l.table, l.format, l.rows, l.cols)) ===
      Seq(("sales", "csv", 2L, 2)))
    val df = spark.read.parquet(s"$out/sales.parquet")
    assert(df.columns.toSeq === Seq("id", "amt"))
    assert(df.schema("id").dataType === org.apache.spark.sql.types.IntegerType)
    Seq(raw.toString, out).foreach(graft.util.Fs.deleteTree)
  }

  test("post-sanitize header collisions get deterministic suffixes, stay typed") {
    import java.nio.file.Files
    val raw = Files.createTempDirectory("graft_lrcol_")
    val out = Files.createTempDirectory("graft_lrcolland_").toString
    // 'a b' and 'a-b' both sanitize to a_b; the second must land as a_b_2
    Files.write(raw.resolve("t.csv"),
      "a b,a-b,n\n1,x,2.5\n3,y,4.5".getBytes("UTF-8"))
    val landed = LandRaw.land(spark, raw.toString, out)
    assert(landed.map(l => (l.table, l.rows, l.cols)) === Seq(("t", 2L, 3)))
    val df = spark.read.parquet(s"$out/t.parquet")
    assert(df.columns.toSeq === Seq("a_b", "a_b_2", "n"))
    assert(df.schema("a_b").dataType === org.apache.spark.sql.types.IntegerType)
    assert(df.schema("n").dataType === org.apache.spark.sql.types.DoubleType)
    // every landed column is bare-queryable SQL
    assert(spark.sql(s"SELECT a_b, a_b_2, n FROM parquet.`$out/t.parquet` " +
      "WHERE a_b = 1").count() === 1)
    Seq(raw.toString, out).foreach(graft.util.Fs.deleteTree)
  }
}
