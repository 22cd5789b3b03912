package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable
import scala.util.Try

import org.scalatest.funsuite.AnyFunSuite

import graft.mdl._
import graft.planner.TableResolver

/** Concurrent multi-tenant correctness: two deployments with a SAME-NAMED
  * model over DIFFERENT sources share one SparkSession's temp-view namespace.
  * The view-ownership swap and a query's ANALYSIS must be atomic
  * (`GraftSession.withViews`) — without it, a thread could analyze against the
  * other tenant's just-registered view and silently return the other tenant's
  * data. Each iteration uses distinct SQL text so the plan cache cannot mask
  * the catalog lookup.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private object ViewResolver extends TableResolver {
    override def resolve(spark: org.apache.spark.sql.SparkSession, ref: TableReference)
        : org.apache.spark.sql.DataFrame = spark.table(ref.table)
  }

  private def manifestOver(src: String): Manifest = Manifest(
    catalog = "graft", schema = "cc",
    models = List(Model("cc_shared",
      tableReference = Some(TableReference(table = src)),
      primaryKey = Some("id"),
      columns = List(Column("id", "int"), Column("v", "int")))))

  test("interleaved sessions never serve each other's data") {
    import spark.implicits._
    (1 to 64).map(i => (i, i)).toDF("id", "v").createOrReplaceTempView("cc_src_a")
    (1 to 64).map(i => (i, 1000 + i)).toDF("id", "v").createOrReplaceTempView("cc_src_b")
    val sessA = GraftEngine.deploy(spark, manifestOver("cc_src_a"), ViewResolver)
    val sessB = GraftEngine.deploy(spark, manifestOver("cc_src_b"), ViewResolver)
    val expectA = (1 to 64).sum.toLong
    val expectB = (1 to 64).map(_ + 1000).sum.toLong

    val threads = 8
    val iters = 12
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val failures = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val tasks = (0 until threads).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          for (i <- 0 until iters) {
            val useA = (t + i) % 2 == 0
            val (sess, expect) = if (useA) (sessA, expectA) else (sessB, expectB)
            // distinct SQL text per (thread, iter) → always a fresh analysis
            val sql = s"SELECT sum(v) + $t + $i - $t - $i AS s FROM cc_shared"
            val r = Try(sess.query(sql).collect().head.getLong(0))
            if (r.toOption != Some(expect))
              failures.add(s"t$t i$i ${if (useA) "A" else "B"}: got $r, want $expect")
          }
        }
      })
    }
    start.countDown()
    tasks.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    val bad = new mutable.ArrayBuffer[String]
    failures.forEach(f => { bad += f; () })
    assert(bad.isEmpty, bad.take(10).mkString("\n"))
  }
}
