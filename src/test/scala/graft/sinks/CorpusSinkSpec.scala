package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) = (1 to n).map { i =>
    (i.toLong, (s"word$i " * (5 + i % 17)).trim)
  }.toDF("doc_id", "text")

  test("assignShards covers every doc once and packs within budget + one-doc spill") {
    val d = corpus(80)
    val out = CorpusSink.assignShards(d, "text", "doc_id", budget = 64, buckets = 4)
    assert(out.count() == 80)
    assert(out.select("doc_id").distinct().count() == 80)
    val manifest = CorpusSink.shardManifest(out, "doc_id").collect()
    val maxDoc = out.agg(max("n_tokens")).head.getLong(0)
    manifest.foreach { r =>
      val toks = r.getAs[Long]("n_tokens")
      assert(toks <= 64 + maxDoc,
        s"shard (${r.get(0)},${r.get(1)}) holds $toks tokens, budget 64 + $maxDoc spill")
    }
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == 80)
  }

  test("writeShards lays out one parquet file per shard and the manifest matches disk") {
    val dir = Files.createTempDirectory("shards").toString
    val d = corpus(60)
    val manifest = CorpusSink.writeShards(d, dir, "text", "doc_id",
      budget = 96, buckets = 2).collect()
    val back = spark.read.parquet(dir)
    assert(back.count() == 60)
    // one data file per (bucket, pack_ix) directory
    manifest.foreach { r =>
      val shardDir = new java.io.File(s"$dir/bucket=${r.get(0)}/pack_ix=${r.get(1)}")
      val files = shardDir.listFiles((_: java.io.File, n: String) => n.endsWith(".parquet"))
      assert(files != null && files.length == 1,
        s"$shardDir holds ${Option(files).map(_.length)} parquet files")
    }
    // manifest counts agree with what a reader sees per shard
    val diskCounts = back.groupBy("bucket", "pack_ix").count().collect()
      .map(r => ((r.getAs[Number]("bucket").longValue, r.getAs[Number]("pack_ix").longValue),
        r.getAs[Long]("count"))).toMap
    manifest.foreach { r =>
      val key = (r.getAs[Number]("bucket").longValue, r.getAs[Number]("pack_ix").longValue)
      assert(diskCounts(key) == r.getAs[Long]("n_docs"), s"shard $key count mismatch")
    }
  }

  test("writeJsonl round-trips content and bounds the file count") {
    val dir = Files.createTempDirectory("jsonl").toString
    val d = corpus(25)
    CorpusSink.writeJsonl(d, dir, "doc_id", files = 3)
    val back = spark.read.json(dir).select("doc_id", "text")
    assert(back.count() == 25)
    val orig = d.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val round = back.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(round == orig)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.length <= 3 && bucketDirs.nonEmpty)
  }
}
