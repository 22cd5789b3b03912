package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven injection point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes the native pipeline kernels (langID, MinHash/SimHash/shingle/window hashes,
  * BPE token count) plain SQL functions on every session of the application — the
  * path for spark-sql shells, JDBC/Thrift endpoints, and pyspark users who never
  * touch the Scala API. The same builders back the per-session registration
  * ([[graft.functions.GraftFunctions.register]]); this class only changes WHERE they
  * are installed (builder-time, application-wide) — semantics and codegen are
  * identical.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.kernelBuilders.foreach { case (name, builder) =>
      val spec = graft.functions.GraftFunctions.pipelineKernels.find(_.name == name)
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
          spec.map(s => s"$name${s.signature} - ${s.description}").orNull,
          "", "", "", "", "", "", "scala_udf"),
        builder))
    }
}
