package graft.memory

import graft.mdl.{Manifest, Model}

final case class SeedPair(nl: String, sql: String)

/** Canonical NL→SQL seed-pair generation from a manifest — the reference's
  * template set verbatim (`wren/src/wren/memory/seed_queries.py:25-109`):
  * per model a listing, a simple aggregation over the first non-pk numeric
  * column, a grouped aggregation over the first non-numeric groupable column;
  * per relationship a join template. Pure functions, no storage dependency.
  */
object SeedQueries {

  val SeedTag = "source:seed"

  private val NumericTypes = Set(
    "int", "integer", "bigint", "smallint", "tinyint",
    "float", "double", "decimal", "numeric", "real", "number")

  private def baseType(t: String): String =
    t.split('(').head.toLowerCase.trim

  def generateSeedQueries(m: Manifest): Seq[SeedPair] =
    m.models.flatMap(modelSeeds) ++
      m.relationships.flatMap { r =>
        val cond = r.condition.trim
        if (r.models.size < 2 || cond.isEmpty) None
        else Some(SeedPair(
          nl = s"${r.models.head} with ${r.models(1)} details",
          sql = s"SELECT * FROM ${r.models.head} JOIN ${r.models(1)} ON $cond LIMIT 100"))
      }

  private def modelSeeds(md: Model): Seq[SeedPair] = {
    val listing = SeedPair(s"List all ${md.name}", s"SELECT * FROM ${md.name} LIMIT 100")
    // first non-calculated non-pk numeric column, and first groupable column
    // (first-match-wins like the reference's single pass, seed_queries.py:53-74)
    var numericCol: Option[String] = None
    var groupCol: Option[String] = None
    md.columns.foreach { c =>
      val numeric = NumericTypes.contains(baseType(c.`type`))
      val isPk = md.primaryKey.contains(c.name)
      if (numeric && !c.isCalculated && !isPk && numericCol.isEmpty)
        numericCol = Some(c.name)
      else if (!numeric && !isPk && !c.isCalculated && groupCol.isEmpty)
        groupCol = Some(c.name)
    }
    val agg = numericCol.map(n => SeedPair(
      s"Total $n in ${md.name}", s"SELECT SUM($n) FROM ${md.name}"))
    val grouped = for (n <- numericCol; g <- groupCol) yield SeedPair(
      s"$n by $g in ${md.name}",
      s"SELECT $g, SUM($n) FROM ${md.name} GROUP BY 1")
    Seq(listing) ++ agg ++ grouped
  }
}
