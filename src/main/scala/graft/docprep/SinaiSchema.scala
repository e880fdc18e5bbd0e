package graft.docprep

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.jdk.CollectionConverters._

/** Structural schema of the Sinai data model (the public pydantic model in
  * feed_sinai/sinai_types.py) as the two tables everything else consumes:
  *
  *  - per-class FIELD DECLARATION ORDER — pydantic's `model_dump_json`
  *    serializes in declaration order (subclass-appended fields last), so
  *    reproducing `merged JSON files` and `manuscript_json_ts` byte-for-byte
  *    needs the order, not just the values;
  *  - per-(class, field) CHILD CLASS — lets a dump walk type the tree, and
  *    gives `deep_get(cls=X)` its nominal-typing semantics on plain JSON
  *    (sinai_types.py:118-135): in this schema every pydantic class is
  *    reachable only through a fixed set of field names, so "value of class
  *    X" == "object value of a field mapped to X".
  *
  * Merged-variant orders (sinai_types.py: subclasses append new fields):
  * AssocPlaceItemMerged appends place_record; ContentsMerged appends
  * pref_title; PartMerged / ManuscriptObjectMerged append ot_layer,
  * guest_layer, uto and exclude `layer`; UndertextManuscriptLayerMerged
  * appends uto_ms_ark, script, lang, orig_date and serializes id as
  * `uto_layer_ark` (sinai_types.py:726-750).
  */
object SinaiSchema {

  /** class -> fields in declaration order (merged variants). */
  val fieldOrder: Map[String, Seq[String]] = Map(
    "ms_obj" -> Seq("ark", "reconstruction", "type", "shelfmark", "summary",
      "extent", "weight", "dim", "state", "fol", "coll", "features", "part",
      "para", "location", "assoc_date", "assoc_name", "assoc_place", "note",
      "related_mss", "viscodex", "bib", "iiif", "internal", "cataloguer",
      "reconstructed_from", "dig_provenance", "desc_provenance",
      "image_provenance", "has_bind", "ot_layer", "guest_layer", "uto"),
    "part" -> Seq("label", "summary", "locus", "support", "extent", "dim",
      "para", "note", "related_mss", "ot_layer", "guest_layer", "uto"),
    "ms_layer" -> Seq("id", "label", "type", "layer_record", "locus"),
    "uto_layer" -> Seq("uto_layer_ark", "label", "type", "locus",
      "uto_ms_ark", "script", "lang", "orig_date"),
    "inscribed_layer" -> Seq("ark", "reconstruction", "state", "label",
      "locus", "summary", "extent", "writing", "ink", "layout", "text_unit",
      "para", "assoc_date", "assoc_name", "assoc_place", "features",
      "related_mss", "note", "bib", "cataloguer", "reconstructed_from",
      "parent", "internal", "desc_provenance"),
    "layer_text_unit" -> Seq("id", "label", "locus", "text_unit_record"),
    "text_unit" -> Seq("ark", "reconstruction", "label", "summary", "locus",
      "lang", "work_wit", "para", "features", "note", "bib", "cataloguer",
      "reconstructed_from", "parent", "internal", "desc_provenance"),
    "work_wit" -> Seq("work", "alt_title", "as_written", "locus", "excerpt",
      "contents", "note", "bib"),
    "conceptual_work" -> Seq("ark", "pref_title", "orig_lang",
      "orig_lang_title", "alt_title", "desc", "genre", "creator", "creation",
      "incipit", "explicit", "rel_con", "refno", "bib", "note", "rel_work",
      "rel_agent", "rel_place", "internal", "cataloguer"),
    "work_brief" -> Seq("desc_title", "creator", "genre"),
    "work_brief_creator" -> Seq("id", "agent_record"),
    "agent" -> Seq("ark", "type", "pref_name", "alt_name", "desc", "gender",
      "birth", "death", "floruit", "rel_con", "refno", "bib", "note",
      "rel_agent", "rel_place", "internal", "cataloguer"),
    "place" -> Seq("ark", "type", "pref_name", "alt_name", "desc", "rel_con",
      "note", "cataloguer"),
    "assoc_name" -> Seq("id", "agent_record", "value", "as_written", "role", "note"),
    "assoc_place" -> Seq("id", "value", "as_written", "event", "note", "place_record"),
    "para" -> Seq("type", "subtype", "locus", "lang", "script", "label",
      "as_written", "translation", "assoc_name", "assoc_place", "assoc_date", "note"),
    "assoc_date" -> Seq("value", "iso", "type", "as_written", "note"),
    "iso" -> Seq("not_before", "not_after"),
    "date" -> Seq("value", "iso"),
    "creation" -> Seq("value", "iso"),
    "contents" -> Seq("label", "work_id", "locus", "note", "pref_title"),
    "excerpt" -> Seq("type", "locus", "as_written", "translation", "note"),
    "incipit" -> Seq("value", "translation", "source"),
    "explicit" -> Seq("value", "translation", "source"),
    "controlled_term" -> Seq("id", "label"),
    "script_item" -> Seq("id", "label", "writing_system"),
    "writing" -> Seq("script", "locus", "note"),
    "ink" -> Seq("locus", "color", "note"),
    "layout" -> Seq("locus", "columns", "lines", "dim", "note"),
    "note_item" -> Seq("type", "value"),
    "location" -> Seq("id", "collection", "repository"),
    "related_mss" -> Seq("type", "label", "note", "mss"),
    "ms_stub" -> Seq("label", "id", "url"),
    "viscodex" -> Seq("type", "label", "url"),
    "bib" -> Seq("id", "type", "shortcode", "citation", "range", "alt_shelf",
      "url", "note"),
    "rel_con" -> Seq("label", "uri", "source"),
    "refno" -> Seq("label", "idno", "source"),
    "rel_item" -> Seq("id", "label"),
    "rel_agent" -> Seq("id", "source", "rel"),
    "rel_place" -> Seq("id", "source", "rel"),
    "rel_work" -> Seq("id", "source", "rel"),
    "cataloguer" -> Seq("message", "contributor", "added_by", "timestamp"),
    "reconstructed_from" -> Seq("id", "shelfmark"),
    "desc_provenance" -> Seq("program", "rights"),
    "desc_prov_program" -> Seq("label", "description"),
    "image_provenance" -> Seq("program", "rights"),
    "image_prov_program" -> Seq("label", "description", "camera_operator",
      "imaging_date", "delivery", "msi_processing", "condition_category",
      "note", "imaging_system"),
    "iiif" -> Seq("type", "manifest", "label", "text_direction", "behavior",
      "thumbnail"))

  /** (class, field) -> child class for object-valued fields. Fields absent
    * here are scalars / arrays of scalars.
    */
  val childClass: Map[(String, String), String] = {
    val ct = "controlled_term"
    val common: Seq[((String, String), String)] = Seq()
    (Seq(
      ("ms_obj", "type") -> ct, ("ms_obj", "state") -> ct,
      ("ms_obj", "features") -> ct, ("ms_obj", "part") -> "part",
      ("ms_obj", "para") -> "para", ("ms_obj", "location") -> "location",
      ("ms_obj", "assoc_date") -> "assoc_date",
      ("ms_obj", "assoc_name") -> "assoc_name",
      ("ms_obj", "assoc_place") -> "assoc_place",
      ("ms_obj", "note") -> "note_item",
      ("ms_obj", "related_mss") -> "related_mss",
      ("ms_obj", "viscodex") -> "viscodex", ("ms_obj", "bib") -> "bib",
      ("ms_obj", "iiif") -> "iiif", ("ms_obj", "cataloguer") -> "cataloguer",
      ("ms_obj", "reconstructed_from") -> "reconstructed_from",
      ("ms_obj", "desc_provenance") -> "desc_provenance",
      ("ms_obj", "image_provenance") -> "image_provenance",
      ("ms_obj", "ot_layer") -> "ms_layer",
      ("ms_obj", "guest_layer") -> "ms_layer",
      ("ms_obj", "uto") -> "uto_layer",
      ("part", "support") -> ct, ("part", "para") -> "para",
      ("part", "note") -> "note_item", ("part", "related_mss") -> "related_mss",
      ("part", "ot_layer") -> "ms_layer", ("part", "guest_layer") -> "ms_layer",
      ("part", "uto") -> "uto_layer",
      ("ms_layer", "type") -> ct, ("ms_layer", "layer_record") -> "inscribed_layer",
      ("uto_layer", "type") -> ct, ("uto_layer", "orig_date") -> "assoc_date",
      ("inscribed_layer", "state") -> ct, ("inscribed_layer", "writing") -> "writing",
      ("inscribed_layer", "ink") -> "ink", ("inscribed_layer", "layout") -> "layout",
      ("inscribed_layer", "text_unit") -> "layer_text_unit",
      ("inscribed_layer", "para") -> "para",
      ("inscribed_layer", "assoc_date") -> "assoc_date",
      ("inscribed_layer", "assoc_name") -> "assoc_name",
      ("inscribed_layer", "assoc_place") -> "assoc_place",
      ("inscribed_layer", "features") -> ct,
      ("inscribed_layer", "related_mss") -> "related_mss",
      ("inscribed_layer", "note") -> "note_item",
      ("inscribed_layer", "bib") -> "bib",
      ("inscribed_layer", "cataloguer") -> "cataloguer",
      ("inscribed_layer", "reconstructed_from") -> "reconstructed_from",
      ("inscribed_layer", "desc_provenance") -> "desc_provenance",
      ("layer_text_unit", "text_unit_record") -> "text_unit",
      ("text_unit", "lang") -> ct, ("text_unit", "work_wit") -> "work_wit",
      ("text_unit", "para") -> "para", ("text_unit", "features") -> ct,
      ("text_unit", "note") -> "note_item", ("text_unit", "bib") -> "bib",
      ("text_unit", "cataloguer") -> "cataloguer",
      ("text_unit", "reconstructed_from") -> "reconstructed_from",
      ("text_unit", "desc_provenance") -> "desc_provenance",
      // work_wit.work's class is value-dependent (conceptual_work when the
      // node has an "ark", else work_brief) — special-cased in classOf below
      ("work_wit", "excerpt") -> "excerpt",
      ("work_wit", "contents") -> "contents", ("work_wit", "note") -> "note_item",
      ("work_wit", "bib") -> "bib",
      ("conceptual_work", "orig_lang") -> ct, ("conceptual_work", "genre") -> ct,
      ("conceptual_work", "creator") -> "assoc_name",
      ("conceptual_work", "creation") -> "creation",
      ("conceptual_work", "incipit") -> "incipit",
      ("conceptual_work", "explicit") -> "explicit",
      ("conceptual_work", "rel_con") -> "rel_con",
      ("conceptual_work", "refno") -> "refno", ("conceptual_work", "bib") -> "bib",
      ("conceptual_work", "rel_work") -> "rel_work",
      ("conceptual_work", "rel_agent") -> "rel_agent",
      ("conceptual_work", "rel_place") -> "rel_place",
      ("conceptual_work", "cataloguer") -> "cataloguer",
      ("work_brief", "creator") -> "work_brief_creator",
      ("work_brief", "genre") -> ct,
      ("work_brief_creator", "agent_record") -> "agent",
      ("agent", "type") -> ct, ("agent", "gender") -> ct,
      ("agent", "birth") -> "date", ("agent", "death") -> "date",
      ("agent", "floruit") -> "date", ("agent", "rel_con") -> "rel_con",
      ("agent", "refno") -> "refno", ("agent", "bib") -> "bib",
      ("agent", "rel_agent") -> "rel_agent", ("agent", "rel_place") -> "rel_place",
      ("agent", "cataloguer") -> "cataloguer",
      ("place", "type") -> ct, ("place", "rel_con") -> "rel_con",
      ("place", "cataloguer") -> "cataloguer",
      ("assoc_name", "agent_record") -> "agent", ("assoc_name", "role") -> ct,
      ("assoc_place", "event") -> ct, ("assoc_place", "place_record") -> "place",
      ("para", "type") -> ct, ("para", "subtype") -> ct, ("para", "lang") -> ct,
      ("para", "script") -> "script_item",
      ("para", "assoc_name") -> "assoc_name",
      ("para", "assoc_place") -> "assoc_place",
      ("para", "assoc_date") -> "assoc_date",
      ("assoc_date", "iso") -> "iso", ("assoc_date", "type") -> ct,
      ("date", "iso") -> "iso", ("creation", "iso") -> "iso",
      ("excerpt", "type") -> ct,
      ("writing", "script") -> "script_item",
      ("note_item", "type") -> ct,
      ("related_mss", "type") -> ct, ("related_mss", "mss") -> "ms_stub",
      ("viscodex", "type") -> ct,
      ("bib", "type") -> ct,
      ("rel_agent", "rel") -> "rel_item", ("rel_place", "rel") -> "rel_item",
      ("rel_work", "rel") -> "rel_item",
      ("desc_provenance", "program") -> "desc_prov_program",
      ("image_provenance", "program") -> "image_prov_program",
      ("iiif", "type") -> ct) ++ common).toMap
  }

  /** Child class of (cls, field, node) with the one value-dependent case. */
  def classOf(cls: String, field: String, node: JsonNode): Option[String] =
    if (cls == "work_wit" && field == "work")
      Some(if (node.has("ark")) "conceptual_work" else "work_brief")
    else childClass.get((cls, field))

  /** Required-without-default array fields: pydantic's exclude_defaults
    * never drops them, even empty (everything else with min_length >= 1 is
    * non-empty in valid data, so "[] => drop" is exact for the rest).
    */
  private val keepEmpty: Set[(String, String)] = Set(("ms_obj", "location"))

  /** Pydantic scalar-type normalizations observed in model_dump_json output:
    * datetime fields re-serialize UTC offsets as `Z`; AnyUrl fields strip
    * surrounding whitespace (sinai_types.py CataloguerItem.timestamp,
    * RelConItem.uri, Ms.url, ViscodexItem.url, IiifItem.manifest/thumbnail).
    */
  private val datetimeFields: Set[(String, String)] = Set(("cataloguer", "timestamp"))
  private val urlFields: Set[(String, String)] = Set(
    ("rel_con", "uri"), ("ms_stub", "url"), ("viscodex", "url"),
    ("iiif", "manifest"), ("iiif", "thumbnail"))

  private def normScalar(cls: String, f: String, v: JsonNode): JsonNode =
    if (v.isTextual && datetimeFields((cls, f))) {
      // offset-carrying timestamps re-serialize as UTC `Z` (pydantic's
      // form); timezone-naive ones pass through verbatim (pydantic keeps
      // naive datetimes naive)
      val norm = scala.util.Try {
        java.time.OffsetDateTime.parse(v.asText())
          .toInstant.atOffset(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
          .replace("+00:00", "Z")
      }.getOrElse(v.asText())
      com.fasterxml.jackson.databind.node.TextNode.valueOf(norm)
    } else if (v.isTextual && urlFields((cls, f)))
      com.fasterxml.jackson.databind.node.TextNode.valueOf(v.asText().trim)
    else v.deepCopy[JsonNode]()

  /** Recursively order + strip `node` into pydantic model_dump_json shape:
    * declaration-ordered keys, null fields and default-valued (empty-array)
    * fields removed at every level (sinai_types.py:42-74 overrides
    * exclude_unset/defaults/none = True), scalar types normalized.
    */
  def dumpShape(node: JsonNode, cls: String): JsonNode = node match {
    case o: ObjectNode =>
      val out = o.objectNode()
      val order = fieldOrder.getOrElse(cls, o.fieldNames().asScala.toSeq)
      val extra = o.fieldNames().asScala.toSeq.filterNot(order.contains)
      (order ++ extra).foreach { f =>
        val v = o.get(f)
        if (v != null && !v.isNull && !(v.isArray && v.isEmpty && !keepEmpty((cls, f)))) {
          classOf(cls, f, v) match {
            case Some(childCls) =>
              if (v.isArray) {
                val arr = out.arrayNode()
                v.elements().asScala.foreach(e => arr.add(dumpShape(e, childCls)))
                out.set[com.fasterxml.jackson.databind.JsonNode](f, arr)
              } else out.set[com.fasterxml.jackson.databind.JsonNode](f, dumpShape(v, childCls))
            case None => out.set[com.fasterxml.jackson.databind.JsonNode](f, normScalar(cls, f, v))
          }
        }
      }
      out
    case other => other
  }

  /** deep_get (sinai_types.py:118-135) on the dump-shaped JSON tree: walk
    * every field of every object; a value (or array element) matches when
    * `pred(fieldName, value)` holds and, if `names` is non-empty, the field
    * name is in `names`; objects are recursed into. `exclude` prunes whole
    * fields. Iteration is document order — all consumers sort, so order
    * never observably differs from pydantic's set iteration.
    */
  def deepGet(node: JsonNode, names: Set[String],
              pred: (String, JsonNode) => Boolean,
              exclude: Set[String] = Set.empty): Iterator[JsonNode] = node match {
    case o: ObjectNode =>
      o.fields().asScala.toSeq.iterator.flatMap { e =>
        val (f, v) = (e.getKey, e.getValue)
        if (exclude(f)) Iterator.empty
        else {
          val elems = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
          elems.iterator.flatMap { el =>
            val hit = if (pred(f, el) && (names.isEmpty || names(f))) Iterator.single(el)
                      else Iterator.empty
            hit ++ (if (el.isObject) deepGet(el, names, pred, exclude) else Iterator.empty)
          }
        }
      }
    case _ => Iterator.empty
  }

  /** deep_get(*names, cls=str): string values under the given field names. */
  def deepGetStr(node: JsonNode, names: String*): Iterator[String] =
    deepGet(node, names.toSet, (_, v) => v.isTextual).map(_.asText())

  /** deep_get(cls=Model): object values reachable through `fields` — the
    * nominal-typing emulation (each model class has a fixed field-name set).
    */
  def deepGetObj(node: JsonNode, fields: Set[String],
                 exclude: Set[String] = Set.empty): Iterator[JsonNode] =
    deepGet(node, fields, (_, v) => v.isObject, exclude)
}
