package graft.api

import graft.planner.ConnectionDocs

/** Browser profile-creation form — the reference's
  * `wren/src/wren/profile_web.py` (a Starlette app with Jinja templates)
  * reduced to three pure functions the HTTP server serves: the form page,
  * the per-datasource fields fragment (the HTMX swap target), and the save
  * handler. The field metadata comes from [[ConnectionDocs.registry]] —
  * the same single source of truth the reference's field_registry gives its
  * web form, CLI prompts, and docs.
  */
object ProfileWeb {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  def datasourceOptions: Seq[String] = ConnectionDocs.registry.map(_._1)

  /** Variant model names when a datasource is a discriminated union. */
  def variants(ds: String): Seq[String] = {
    val models = ConnectionDocs.registry.collectFirst {
      case (`ds`, ms) => ms }.getOrElse(Nil)
    if (models.size > 1) models.map(_.name) else Nil
  }

  /** The full form page (profile_form.html analogue). */
  def formPage(profileName: String): String = {
    val options = datasourceOptions.map(d =>
      s"""<option value="${esc(d)}">${esc(d)}</option>""").mkString
    s"""<!DOCTYPE html>
       |<html><head><title>graft profile</title></head><body>
       |<h1>Create profile '${esc(profileName)}'</h1>
       |<form method="post" action="/v1/profile/save">
       |  <input type="hidden" name="_profile_name" value="${esc(profileName)}"/>
       |  <label>Data source
       |    <select name="datasource"
       |      onchange="fetch('/v1/profile/fields?datasource='+this.value)
       |        .then(r=>r.text()).then(t=>{document.getElementById('fields').innerHTML=t})">
       |      <option value="">choose…</option>$options
       |    </select>
       |  </label>
       |  <div id="fields"></div>
       |  <button type="submit">Save</button>
       |</form>
       |</body></html>""".stripMargin
  }

  /** The per-datasource fields fragment (\_profile_fields.html analogue):
    * one labeled input per registry field, secrets as password inputs,
    * a variant selector when the source is a union. Empty for no selection.
    */
  def fieldsFragment(ds: String, variant: Option[String]): String = {
    if (ds.isEmpty) return ""
    val models = ConnectionDocs.registry.collectFirst {
      case (d, ms) if d == ds.toLowerCase => ms }.getOrElse(return "")
    val vs = variants(ds.toLowerCase)
    val model = variant.flatMap(v => models.find(_.name == v)).getOrElse(models.head)
    val variantSel =
      if (vs.isEmpty) ""
      else {
        val opts = vs.map(v =>
          s"""<option value="${esc(v)}"${if (v == model.name) " selected" else ""}>${esc(v)}</option>""")
          .mkString
        s"""<label>Variant<select name="_variant">$opts</select></label>\n"""
      }
    val inputs = model.fields.map { f =>
      val t = if (f.sensitive) "password" else "text"
      val req = if (f.required) " required" else ""
      val ph = f.example.map(e => s""" placeholder="${esc(e)}"""").getOrElse("")
      s"""<label>${esc(f.name)}<input type="$t" name="${esc(f.name)}"$ph$req/></label>"""
    }.mkString("\n")
    variantSel + inputs
  }

  /** application/x-www-form-urlencoded body → key/value map. */
  def parseForm(body: String): Map[String, String] =
    body.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap

  /** The save handler (profile_web.py:85-160): datasource required; unknown
    * sources and invalid variants answer 400 fragments; a non-empty `_json`
    * field replaces the individual inputs; internal keys never persist.
    */
  def save(store: Profiles, form: Map[String, String]): Either[(Int, String), String] = {
    val ds = form.getOrElse("datasource", "").trim.toLowerCase
    val name = form.get("_profile_name").map(_.trim).filter(_.nonEmpty).getOrElse("default")
    if (ds.isEmpty)
      return Left((400, "<small>✗ Please select a data source.</small>"))
    if (!datasourceOptions.contains(ds))
      return Left((400, "<small>✗ Unsupported data source.</small>"))
    val vs = variants(ds)
    val variantKey = form.get("_variant").map(_.trim).filter(_.nonEmpty)
    if (vs.nonEmpty && variantKey.exists(v => !vs.contains(v)))
      return Left((400, "<small>✗ Invalid variant.</small>"))

    val internal = Set("datasource", "_profile_name", "_variant", "_json")
    // the variant key persists ONLY for genuine unions (a client-supplied
    // _variant on a single-model source is unvalidated noise, never stored)
    val base: Map[String, Any] = Map("datasource" -> ds) ++
      (if (vs.nonEmpty) variantKey.map(v => s"${ds}_type" -> (v: Any)) else None)
    val profile: Map[String, Any] = form.get("_json").map(_.trim).filter(_.nonEmpty) match {
      case Some(raw) =>
        try {
          import org.json4s._
          org.json4s.jackson.JsonMethods.parse(raw) match {
            case JObject(fields) => base ++ fields.map {
              case (k, JString(s)) => k -> (s: Any)
              case (k, JInt(i)) => k -> (i.toLong: Any)
              case (k, JBool(b)) => k -> (b: Any)
              case (k, v) => k -> (org.json4s.jackson.JsonMethods.compact(v): Any)
            }
            case _ => return Left((400, "<small>✗ Invalid JSON.</small>"))
          }
        } catch {
          case _: Exception => return Left((400, "<small>✗ Invalid JSON.</small>"))
        }
      case None =>
        base ++ form.collect {
          case (k, v) if !internal(k) && v.trim.nonEmpty => k -> (v.trim: Any)
        }
    }
    try {
      store.add(name, profile)
      Right(s"<small>✓ Profile '${esc(name)}' saved.</small>")
    } catch {
      case e: Exception =>
        Left((500, s"<small>✗ Failed to save profile: ${esc(e.getMessage)}</small>"))
    }
  }
}
