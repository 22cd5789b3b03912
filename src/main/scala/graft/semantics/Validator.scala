package graft.semantics

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.mdl.{Cube, JoinType, Manifest, Relationship}

/** Manifest validation rules (A19): the reference exposes `column_is_valid`,
  * `relationship_is_valid`, and `rlac_condition_syntax_is_valid` as probe queries
  * generated against the deployed manifest (`ibis-server/app/model/validator.py:15-240`).
  * Each returns a ValidationResult rather than throwing, matching the API shape.
  */
object Validator {

  final case class ValidationResult(valid: Boolean, rule: String, message: String = "")

  /** The column exists on the deployed model and is selectable (probe:
    * `SELECT <col> FROM <model> LIMIT 1`, validator.py's column_is_valid).
    */
  def columnIsValid(spark: SparkSession, model: String, column: String): ValidationResult =
    Try(spark.sql(s"SELECT `$column` FROM `$model` LIMIT 1").collect()) match {
      case Success(_) => ValidationResult(valid = true, "column_is_valid")
      case Failure(e) => ValidationResult(valid = false, "column_is_valid", e.getMessage)
    }

  /** The relationship's models exist, its condition parses and references both sides,
    * and the declared cardinality holds on the data: the to-one side's join key must
    * be unique (validator.py's relationship_is_valid runs the analogous probe SQL).
    */
  def relationshipIsValid(
      spark: SparkSession, manifest: Manifest, rel: Relationship): ValidationResult = {
    val rule = "relationship_is_valid"
    if (rel.models.size != 2)
      return ValidationResult(valid = false, rule, s"${rel.name}: exactly 2 models required")
    val missing = rel.models.filterNot(m => manifest.model(m).nonEmpty)
    if (missing.nonEmpty)
      return ValidationResult(valid = false, rule, s"${rel.name}: unknown models ${missing.mkString(",")}")
    val sides = rel.condition.split("=").map(_.trim)
    if (sides.length != 2)
      return ValidationResult(valid = false, rule, s"${rel.name}: condition must be a single equality")

    def keyOf(modelName: String): Option[String] = {
      val q = "\"?" + java.util.regex.Pattern.quote(modelName) + "\"?\\.\"?([A-Za-z_0-9]+)\"?"
      sides.collectFirst { case s if s.matches(s"(?i)$q") =>
        s.replaceAll("(?i)" + q, "$1")
      }
    }
    val List(m1, m2) = rel.models
    (keyOf(m1), keyOf(m2)) match {
      case (Some(k1), Some(k2)) =>
        // uniqueness probes per declared cardinality
        def unique(m: String, k: String): Boolean = {
          val r = spark.sql(
            s"SELECT count(*) = count(DISTINCT `$k`) AND count(*) = count(`$k`) FROM `$m`").head
          r.getBoolean(0)
        }
        val need1 = rel.joinType == JoinType.OneToOne || rel.joinType == JoinType.ManyToOne
        val need0 = rel.joinType == JoinType.OneToOne || rel.joinType == JoinType.OneToMany
        Try {
          val ok1 = !need0 || unique(m1, k1) // ONE_* : left side unique
          val ok2 = !need1 || unique(m2, k2) // *_TO_ONE : right side unique
          (ok1, ok2)
        } match {
          case Success((true, true)) => ValidationResult(valid = true, rule)
          case Success(_) => ValidationResult(valid = false, rule,
            s"${rel.name}: declared ${rel.joinType} but join keys are not unique on the to-one side")
          case Failure(e) => ValidationResult(valid = false, rule, e.getMessage)
        }
      case _ => ValidationResult(valid = false, rule,
        s"${rel.name}: condition '${rel.condition}' does not reference both models")
    }
  }

  /** Every hierarchy drill path names declared cube dimensions (coarsest → finest;
    * manifest-macro lib.rs:356-369 carries these as ordered BTreeMap paths).
    */
  def cubeHierarchyIsValid(cube: Cube): ValidationResult = {
    val rule = "cube_hierarchy_is_valid"
    val declared =
      (cube.dimensions ++ cube.timeDimensions).map(_.toLowerCase).toSet
    val problems = cube.hierarchies.flatMap { case (name, path) =>
      if (path.isEmpty) Some(s"$name: empty drill path")
      else {
        val unknown = path.filterNot(d => declared.contains(d.toLowerCase))
        if (unknown.nonEmpty)
          Some(s"$name: unknown dimensions ${unknown.mkString(",")}")
        else if (path.map(_.toLowerCase).distinct.size != path.size)
          Some(s"$name: repeated dimension in drill path")
        else None
      }
    }
    if (problems.isEmpty) ValidationResult(valid = true, rule)
    else ValidationResult(valid = false, rule, s"cube ${cube.name}: ${problems.mkString("; ")}")
  }

  /** The RLAC condition parses as a boolean expression once `@property` placeholders
    * are substituted with dummy literals (validator.py's rlac_condition_syntax_is_valid).
    */
  def rlacConditionSyntaxIsValid(spark: SparkSession, condition: String): ValidationResult = {
    val substituted = "@([A-Za-z_][A-Za-z_0-9]*)".r.replaceAllIn(condition, _ => "'0'")
    val normalized = substituted.replace("\"", "`")
    Try(spark.sessionState.sqlParser.parseExpression(normalized)) match {
      case Success(_) => ValidationResult(valid = true, "rlac_condition_syntax_is_valid")
      case Failure(e) =>
        ValidationResult(valid = false, "rlac_condition_syntax_is_valid", e.getMessage)
    }
  }
}
