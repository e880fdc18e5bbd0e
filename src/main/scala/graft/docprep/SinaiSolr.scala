package graft.docprep

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import scala.jdk.CollectionConverters._

/** One Sinai Solr record — every field of the reference's
  * ManuscriptSolrRecord (feed_sinai/solr_record.py:45-660), same names,
  * gated field-by-field against the reference's own golden outputs
  * (tests/sinai/export_test/solr/<ark>.json) in SinaiGoldenSpec.
  */
case class SinaiSolrRecord(
    ark_ssi: String,
    ms_type_ssi: String,
    state_ssi: String,
    features_ssim: Seq[String],
    support_ssim: Seq[String],
    repository_ssim: Seq[String],
    collection_ssim: Seq[String],
    names_ssim: Seq[String],
    places_ssim: Seq[String],
    date_types_ssim: Seq[String],
    program_ssim: Seq[String],
    reconstructed_from_ssim: Seq[String],
    reconstructed_from_shelfmark_ssim: Seq[String],
    ot_script_ssim: Seq[String],
    ot_writing_system_ssim: Seq[String],
    ot_genre_ssim: Seq[String],
    ot_year_isim: Seq[Int],
    ot_language_ssim: Seq[String],
    ot_works_ssim: Seq[String],
    para_script_ssim: Seq[String],
    para_writing_system_ssim: Seq[String],
    para_year_isim: Seq[Int],
    para_language_ssim: Seq[String],
    para_works_ssim: Seq[String],
    para_genre_ssim: Seq[String],
    para_names_ssim: Seq[String],
    para_type_ssim: Seq[String],
    uto_script_ssim: Seq[String],
    uto_language_ssim: Seq[String],
    uto_year_isim: Seq[Int],
    shelfmark_ssi: String,
    titles_tesim: Seq[String],
    names_tesim: Seq[String],
    exerpts_tesim: Seq[String],
    places_tesim: Seq[String],
    contents_tesim: Seq[String],
    paracontent_tesim: Seq[String],
    full_text_tesim: Seq[String],
    cataloguer_tesim: Seq[String],
    last_modified_dtsi: Option[String],
    manuscript_json_ts: String,
    id: String,
    has_model_ssim: Seq[String],
    visibility_ssi: String,
    discover_access_group_ssim: Seq[String],
    read_access_group_ssim: Seq[String],
    download_access_person_ssim: Seq[String],
    thumbnail_url_ss: Option[String],
    iiif_manifest_url_ssi: Option[String],
    header_index_tesim: Seq[String],
    ot_date_tesim: Seq[String],
    para_date_tesim: Seq[String],
    uto_date_tesim: Seq[String],
    extent_tesi: Option[String],
    text_unit_labels_tesim: Seq[String],
    origin_date_values_tesim: Seq[String])

/** The Sinai Solr-record generator over MERGED manuscript JSON
  * ([[SinaiEntityMerge.mergeAll]] output). Pure map-side projection — one
  * typed map per manuscript, no shuffle; scales linearly with the corpus.
  *
  * deep_get's nominal typing is emulated structurally via
  * [[SinaiSchema.deepGet]] (every model class is reachable only through a
  * fixed field-name set — see SinaiSchema scaladoc); `sorted(set(...))`
  * generator fields (solr_record.py:35-42) are `.toSeq.distinct.sorted`.
  */
object SinaiSolr {
  import SinaiSchema.{deepGet, deepGetStr}

  private val mapper = new ObjectMapper()

  private def txt(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filter(_.isTextual).map(_.asText())

  private def elems(n: JsonNode, f: String): Seq[JsonNode] =
    Option(n.get(f)).filter(_.isArray).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def strs(n: JsonNode, f: String): Seq[String] =
    elems(n, f).filter(_.isTextual).map(_.asText())

  private def typeId(n: JsonNode): Option[String] =
    Option(n.get("type")).flatMap(t => txt(t, "id"))

  private def ss(it: Iterator[String]): Seq[String] = it.toSeq.distinct.sorted
  private def ss(it: Iterable[String]): Seq[String] = it.toSeq.distinct.sorted

  /** EDTF year — the leading signed year component (edtf.parse_edtf(v).year;
    * all attested iso values are plain EDTF dates, sinai_types.py:157-176).
    */
  private val yearRe = "^(-?\\d{1,4})".r
  private def edtfYear(v: String): Int =
    yearRe.findFirstIn(v).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException(s"bad EDTF date: $v"))

  /** Iso.years(): not_before.year .. (not_after or not_before).year. */
  private def isoYears(iso: JsonNode): Range = {
    val start = edtfYear(txt(iso, "not_before").get)
    val end = edtfYear(txt(iso, "not_after").getOrElse(txt(iso, "not_before").get))
    start to end
  }

  // class predicates (field-name reachability, see SinaiSchema scaladoc)
  private def agents(n: JsonNode): Iterator[JsonNode] =
    deepGet(n, Set("agent_record"), (_, v) => v.isObject)
  private def placeRecords(n: JsonNode): Iterator[JsonNode] =
    deepGet(n, Set("place_record"), (_, v) => v.isObject)
  private def assocDates(n: JsonNode): Iterator[JsonNode] =
    deepGet(n, Set("assoc_date", "orig_date"), (_, v) => v.isObject)
  private def assocNames(n: JsonNode): Iterator[JsonNode] =
    deepGet(n, Set("assoc_name", "creator"), (f, v) =>
      v.isObject && (f == "assoc_name" || v.has("role")))
  private def assocPlaces(n: JsonNode): Iterator[JsonNode] =
    deepGet(n, Set("assoc_place"), (_, v) => v.isObject)
  private def controlled(n: JsonNode, name: String): Iterator[JsonNode] =
    deepGet(n, Set(name), (_, v) => v.isObject)

  def project(ms: ObjectNode): SinaiSolrRecord = {
    val ark = txt(ms, "ark").get
    val parts = elems(ms, "part")

    def layersOf(kind: String): Seq[JsonNode] = // ot_layers()/guest_layers()/uto_layers(): parts first
      parts.flatMap(p => elems(p, kind)) ++ elems(ms, kind)
    val otLayers = layersOf("ot_layer")
    val guestLayers = layersOf("guest_layer")
    val utoLayers = layersOf("uto")
    // get_layers(): ms-level first per type (solr_record.py:664-682)
    def getLayers(kind: String): Seq[JsonNode] = elems(ms, kind) ++ parts.flatMap(p => elems(p, kind))
    val allMergedLayers = getLayers("ot_layer") ++ getLayers("guest_layer") // ManuscriptLayerMerged only

    def layerRecord(l: JsonNode): Option[JsonNode] = Option(l.get("layer_record"))
    def textUnitRecords(l: JsonNode): Seq[JsonNode] =
      layerRecord(l).toSeq.flatMap(lr => elems(lr, "text_unit"))
        .flatMap(tu => Option(tu.get("text_unit_record")))

    // get_para(): ms.para + part.para + (every merged layer's) layer_record
    // .para + text_unit_record.para (solr_record.py:740-752)
    val paras: Seq[JsonNode] =
      elems(ms, "para") ++ parts.flatMap(p => elems(p, "para")) ++
        allMergedLayers.flatMap(l => layerRecord(l).toSeq.flatMap(lr => elems(lr, "para"))) ++
        allMergedLayers.flatMap(l => textUnitRecords(l).flatMap(tur => elems(tur, "para")))
    val parasNonFraming = paras.filterNot(p => typeId(p).contains("framing"))

    // get_work_wits(layer_type)
    def workWits(layers: Seq[JsonNode]): Seq[JsonNode] =
      layers.flatMap(l => textUnitRecords(l)).flatMap(tur => elems(tur, "work_wit"))

    // get_work_titles(layer_type, pref_only=True): conceptual-work pref
    // titles + contents pref titles (solr_record.py:697-720)
    def workTitles(layers: Seq[JsonNode]): Seq[String] =
      workWits(layers).flatMap { ww =>
        val fromWork = Option(ww.get("work")).toSeq
          .filter(_.has("ark")) // ConceptualWork; WorkBrief has no ark
          .flatMap(w => txt(w, "pref_title"))
        val fromContents = elems(ww, "contents").flatMap(c => txt(c, "pref_title"))
        fromWork ++ fromContents
      }

    def writingScripts(layers: Seq[JsonNode]): Seq[JsonNode] =
      layers.flatMap(l => layerRecord(l).toSeq.flatMap(lr => elems(lr, "writing")))
        .flatMap(w => elems(w, "script"))

    def layerLangLabels(layers: Seq[JsonNode]): Seq[String] =
      layers.flatMap(l => textUnitRecords(l)).flatMap(tur => elems(tur, "lang"))
        .flatMap(lg => txt(lg, "label"))

    def originDates(dates: Seq[JsonNode]): Seq[JsonNode] =
      dates.filter(d => typeId(d).contains("origin"))

    // get_origin_dates(): per OT layer, layer assoc_dates with iso, else its
    // paras' assoc_dates with iso (solr_record.py:782-796)
    val otOriginDates: Seq[JsonNode] = otLayers.flatMap { l =>
      layerRecord(l).toSeq.flatMap { lr =>
        val direct = originDates(elems(lr, "assoc_date")).filter(_.has("iso"))
        if (direct.nonEmpty) direct
        else originDates(elems(lr, "para").flatMap(p => elems(p, "assoc_date"))).filter(_.has("iso"))
      }
    }

    def layerOriginDateValues(layers: Seq[JsonNode]): Seq[String] =
      layers.flatMap(l => layerRecord(l).toSeq)
        .flatMap(lr => originDates(elems(lr, "assoc_date")))
        .flatMap(d => txt(d, "value"))

    def assocNameTexts(items: Iterator[JsonNode]): Iterator[String] = items.flatMap { an =>
      txt(an, "value").iterator ++ txt(an, "as_written").iterator ++ strs(an, "note").iterator
    }
    def assocPlaceTexts(items: Iterator[JsonNode]): Iterator[String] = items.flatMap { ap =>
      txt(ap, "value").iterator ++ txt(ap, "as_written").iterator ++ strs(ap, "note").iterator
    }

    // ---- paracontent_tesim (solr_record.py:462-508): guest layer records +
    // every ParaItemMerged, each contributing its own text surface ----
    val paracontentItems: Seq[(JsonNode, Boolean)] = // (item, isLayerRecord)
      getLayers("guest_layer").flatMap(l => layerRecord(l)).map(lr => (lr, true)) ++
        deepGet(ms, Set("para"), (_, v) => v.isObject).map(p => (p, false)).toSeq
    val paracontent: Seq[String] = paracontentItems.flatMap { case (item, isLayer) =>
      val own: Iterator[String] =
        if (isLayer) deepGetStr(item, "summary")
        else txt(item, "label").iterator ++ txt(item, "as_written").iterator ++
          strs(item, "translation").iterator ++ strs(item, "note").iterator ++
          elems(item, "script").iterator.flatMap(s =>
            txt(s, "label").iterator ++ txt(s, "writing_system").iterator)
      (own ++
        deepGetStr(item, "pref_name") ++
        assocNameTexts(assocNames(item)) ++
        assocPlaceTexts(assocPlaces(item)) ++
        assocDates(item).flatMap(d => strs(d, "note").iterator)).toSeq
    }

    // ---- full_text_tesim (solr_record.py:510-575) ----
    val fullText: Seq[String] = (
      Iterator.single(ark) ++
        controlled(ms, "support").flatMap(s => txt(s, "label")) ++
        deepGet(ms, Set("script"), (_, v) => v.isObject).flatMap(s =>
          txt(s, "label").iterator ++ txt(s, "writing_system").iterator) ++
        Iterator.single(txt(ms, "shelfmark").getOrElse("")) ++
        deepGet(ms, Set("note"), (_, v) => v.isObject).flatMap(n => txt(n, "value")) ++
        deepGetStr(ms, "note") ++
        deepGetStr(ms, "color") ++
        controlled(ms, "lang").flatMap(l => txt(l, "label")) ++
        deepGetStr(ms, "pref_title") ++
        deepGet(ms, Set("text_unit_record"), (_, v) => v.isObject).flatMap(t => txt(t, "label")) ++
        deepGetStr(ms, "desc_title", "alt_title", "as_written", "translation", "summary") ++
        deepGet(ms, Set("contents"), (_, v) => v.isObject).flatMap(c => txt(c, "label")) ++
        deepGet(ms, Set("para"), (_, v) => v.isObject).flatMap(p => txt(p, "label")) ++
        deepGetStr(ms, "pref_name", "alt_name") ++
        assocNames(ms).flatMap(a => txt(a, "value")) ++
        assocPlaces(ms).flatMap(p => txt(p, "value")) ++
        deepGet(ms, Set("related_mss"), (_, v) => v.isObject).flatMap { r =>
          Option(r.get("type")).flatMap(t => txt(t, "label")).iterator ++
            txt(r, "label").iterator ++
            elems(r, "mss").iterator.flatMap(m => txt(m, "label"))
        } ++
        Option(ms.get("image_provenance")).iterator.flatMap(ip =>
          elems(ip, "program").iterator.flatMap(p => txt(p, "delivery")))
      ).toSeq

    // ---- contents_tesim (solr_record.py:399-424) ----
    val contents: Seq[String] = (
      deepGetStr(ms, "summary", "pref_title", "desc_title", "alt_title") ++
        workWits(allMergedLayers).iterator.flatMap { ww =>
          txt(ww, "as_written").iterator ++ strs(ww, "note").iterator ++
            elems(ww, "contents").iterator.flatMap(ci =>
              txt(ci, "label").iterator ++ strs(ci, "note").iterator)
        } ++
        allMergedLayers.iterator.flatMap(l =>
          textUnitRecords(l).flatMap(tur => txt(tur, "label"))) ++
        deepGet(ms, Set("excerpt"), (_, v) => v.isObject).flatMap(e =>
          txt(e, "as_written").iterator ++ strs(e, "translation").iterator ++
            strs(e, "note").iterator)
      ).toSeq

    val cataloguers = deepGet(ms, Set("cataloguer"), (_, v) => v.isObject).toSeq
    // max(timestamps) by instant (naive values ordered as UTC), serialized
    // the way pydantic stores them: offset-carrying -> UTC with trailing Z,
    // timezone-naive -> verbatim
    val lastModified: Option[String] = {
      def instantOf(s: String): java.time.Instant =
        scala.util.Try(java.time.OffsetDateTime.parse(s).toInstant).getOrElse(
          java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC))
      val ts = cataloguers.flatMap(c => txt(c, "timestamp"))
      if (ts.isEmpty) None
      else {
        val raw = ts.maxBy(instantOf)
        Some(scala.util.Try {
          java.time.OffsetDateTime.parse(raw)
            .toInstant.atOffset(java.time.ZoneOffset.UTC)
            .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
            .replace("+00:00", "Z")
        }.getOrElse(raw))
      }
    }

    val iiif = elems(ms, "iiif")

    SinaiSolrRecord(
      ark_ssi = ark,
      ms_type_ssi = Option(ms.get("type")).flatMap(t => txt(t, "label")).getOrElse(""),
      state_ssi = Option(ms.get("state")).flatMap(t => txt(t, "label")).getOrElse(""),
      features_ssim = ss(controlled(ms, "features").flatMap(f => txt(f, "label"))),
      support_ssim = ss(parts.flatMap(p => elems(p, "support")).flatMap(s => txt(s, "label"))),
      repository_ssim = ss(elems(ms, "location").flatMap(l => txt(l, "repository"))),
      collection_ssim = ss(elems(ms, "location").flatMap(l => txt(l, "collection")).filter(_.nonEmpty)),
      names_ssim = ss(agents(ms).flatMap(a => txt(a, "pref_name"))),
      places_ssim = ss(placeRecords(ms).flatMap(p => txt(p, "pref_name"))),
      date_types_ssim = ss(assocDates(ms)
        .filterNot(d => typeId(d).contains("origin"))
        .flatMap(d => Option(d.get("type")).flatMap(t => txt(t, "label")))),
      program_ssim = ss(
        Option(ms.get("desc_provenance")).toSeq.flatMap(dp => elems(dp, "program"))
          .flatMap(p => txt(p, "label")) ++
          Option(ms.get("image_provenance")).toSeq.flatMap(ip => elems(ip, "program"))
            .flatMap(p => txt(p, "label")).filter(_.nonEmpty)),
      reconstructed_from_ssim = elems(ms, "reconstructed_from").flatMap(r => txt(r, "id")),
      reconstructed_from_shelfmark_ssim =
        elems(ms, "reconstructed_from").flatMap(r => txt(r, "shelfmark")),
      ot_script_ssim = ss(writingScripts(otLayers).flatMap(s => txt(s, "label"))),
      ot_writing_system_ssim = ss(writingScripts(otLayers).flatMap(s => txt(s, "writing_system"))),
      ot_genre_ssim = ss(otLayers.flatMap(l => controlled(l, "genre")).flatMap(g => txt(g, "label"))),
      ot_year_isim = otOriginDates.flatMap(d => Option(d.get("iso")).map(isoYears))
        .flatten.distinct.sorted,
      ot_language_ssim = ss(layerLangLabels(otLayers)),
      ot_works_ssim = ss(workTitles(otLayers)),
      para_script_ssim = ss(writingScripts(guestLayers).flatMap(s => txt(s, "label")) ++
        parasNonFraming.flatMap(p => elems(p, "script")).flatMap(s => txt(s, "label"))),
      para_writing_system_ssim = ss(
        writingScripts(guestLayers).flatMap(s => txt(s, "writing_system")) ++
          parasNonFraming.flatMap(p => elems(p, "script")).flatMap(s => txt(s, "writing_system"))),
      para_year_isim = guestLayers
        .flatMap(l => layerRecord(l).toSeq.flatMap(lr => originDates(elems(lr, "assoc_date"))))
        .flatMap(d => Option(d.get("iso")).map(isoYears)).flatten.distinct.sorted,
      para_language_ssim = ss(layerLangLabels(guestLayers) ++
        parasNonFraming.flatMap(p => elems(p, "lang")).flatMap(lg => txt(lg, "label"))),
      para_works_ssim = ss(workTitles(guestLayers)),
      para_genre_ssim = ss(guestLayers.flatMap(l => controlled(l, "genre")).flatMap(g => txt(g, "label"))),
      para_names_ssim = ss(guestLayers.flatMap(l => agents(l)).flatMap(a => txt(a, "pref_name")) ++
        paras.flatMap(p => elems(p, "assoc_name"))
          .flatMap(an => Option(an.get("agent_record")))
          .flatMap(a => txt(a, "pref_name"))),
      para_type_ssim = ss(paras.flatMap(p => elems(p, "subtype")).flatMap(s => txt(s, "label"))),
      uto_script_ssim = ss(utoLayers.flatMap(l => strs(l, "script"))),
      uto_language_ssim = ss(utoLayers.flatMap(l => strs(l, "lang"))),
      uto_year_isim = utoLayers.flatMap(l => elems(l, "orig_date"))
        .flatMap(d => Option(d.get("iso")).map(isoYears)).flatten.distinct.sorted,
      shelfmark_ssi = txt(ms, "shelfmark").getOrElse(""),
      // deep titles + every work wit's as_written and contents labels
      // (solr_record.py:349-364)
      titles_tesim = ss(deepGetStr(ms, "pref_title", "desc_title", "alt_title") ++
        workWits(allMergedLayers).iterator.flatMap(ww =>
          txt(ww, "as_written").iterator ++
            elems(ww, "contents").iterator.flatMap(ci => txt(ci, "label")))),
      names_tesim = ss(agents(ms).flatMap(a =>
        txt(a, "pref_name").iterator ++ strs(a, "alt_name").iterator) ++
        assocNameTexts(assocNames(ms))),
      exerpts_tesim = ss(deepGet(ms, Set("excerpt"), (_, v) => v.isObject).flatMap(e =>
        txt(e, "as_written").iterator ++ strs(e, "translation").iterator)),
      places_tesim = ss(assocPlaces(ms).flatMap { ap =>
        Option(ap.get("place_record")).iterator.flatMap(pr =>
          txt(pr, "pref_name").iterator ++ strs(pr, "alt_name").iterator) ++
          txt(ap, "value").iterator ++ txt(ap, "as_written").iterator ++
          strs(ap, "note").iterator
      }),
      contents_tesim = ss(contents),
      paracontent_tesim = ss(paracontent),
      full_text_tesim = ss(fullText),
      // contributor is tuple[str] in the current model; older records dumped
      // it as a plain string — accept both shapes
      cataloguer_tesim = ss(cataloguers.flatMap(c =>
        txt(c, "contributor").toSeq ++ strs(c, "contributor"))),
      last_modified_dtsi = lastModified,
      manuscript_json_ts = mapper.writeValueAsString(ms),
      id = ark,
      has_model_ssim = Seq("Work"),
      visibility_ssi = "open",
      discover_access_group_ssim = Seq("public"),
      read_access_group_ssim = Seq("public"),
      download_access_person_ssim = Seq("public"),
      thumbnail_url_ss = iiif.flatMap(i => txt(i, "thumbnail")).headOption,
      iiif_manifest_url_ssi = iiif.headOption.flatMap(i => txt(i, "manifest")),
      header_index_tesim = Seq(txt(ms, "shelfmark").getOrElse("")) ++ txt(ms, "extent").toSeq,
      ot_date_tesim = ss(layerOriginDateValues(otLayers)),
      para_date_tesim = ss(layerOriginDateValues(guestLayers)),
      // NOTE: iterates OT layers, replicating the reference verbatim
      // (solr_record.py:624-633 uses self.ot_layers() in uto_date_tesim)
      uto_date_tesim = ss(layerOriginDateValues(otLayers)),
      extent_tesi = txt(ms, "extent"),
      text_unit_labels_tesim = otLayers.flatMap(l =>
        textUnitRecords(l).flatMap(tur => txt(tur, "label"))),
      // deep_get over the WHOLE layer subtree (para/text-unit dates too),
      // unlike ot_date_tesim's layer_record.assoc_date (solr_record.py:652-659)
      origin_date_values_tesim = ss(otLayers.iterator.flatMap(l =>
        assocDates(l).filter(d => typeId(d).contains("origin"))
          .flatMap(d => txt(d, "value")))))
  }

  /** Merged (ark, json) -> one Solr record per manuscript (map-only). */
  def records(merged: Dataset[(String, String)]): Dataset[SinaiSolrRecord] = {
    val spark = merged.sparkSession
    import spark.implicits._
    merged.map { case (_, json) =>
      project(mapper.readTree(json).asInstanceOf[ObjectNode])
    }
  }

  /** End to end: entity dirs -> merged -> Solr records. */
  def fromEntityDirs(spark: SparkSession, root: String): DataFrame =
    records(SinaiEntityMerge.mergeAll(spark, root)).toDF()
}
