package graft.docprep

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Entity graph to merged manuscripts — the FULL reference merge
  * (feed_sinai/sinai_json_importer.py:52-300) re-expressed for Spark.
  *
  * The reference walks the graph per manuscript with memoized file reads:
  * ms_obj -> part[].layer[].id -> layers/<ark>.json -> text_unit[].id ->
  * text_units/<ark>.json -> work_wit work stubs -> works/<ark>.json, plus
  * agents (assoc_name.id, creator), places (assoc_place.id), sibling
  * manuscripts (reconstructed_from -> shelfmark; layer parent -> uto type
  * probe). Every `*Unmerged -> *Merged` convert() substitutes the referenced
  * record under a `*_record` field.
  *
  * Spark shape: the graph has FIXED depth, so the walk becomes four
  * ref-gather rounds — each one `explode refs -> equi-join the (dim) entity
  * table -> groupBy manuscript` — after which every manuscript row carries
  * exactly the entity JSONs it references, and ONE typed map performs the
  * same recursive substitution the importer does, locally and allocation-
  * bounded by that manuscript's own subgraph. Entity tables are dims
  * (broadcast-able); manuscripts shuffle only by their own ark. At 100 TB
  * the widest state is (ms_ark, referenced-json) pairs — linear in the
  * reference edges, never quadratic, no driver materialization.
  */
object SinaiEntityMerge {

  private val mapper = new ObjectMapper()

  /** Read an entity dir as (ark, json). The ark comes from the record's own
    * `ark` field, NOT the filename: importer.get_filename
    * (sinai_json_importer.py:42-50) maps ark -> filename by replacing "/"
    * with "-", which is not invertible when the ark itself contains a dash
    * (e.g. layers/tebvp1ol-2.json holds ark "ark:/21198/tebvp1ol-2"); every
    * reference is resolved by ark equality, exactly like the importer's
    * ark -> filename -> record chain for self-consistent data.
    */
  def entityTable(spark: SparkSession, root: String, entity: String): DataFrame = {
    import spark.implicits._
    val dir = new java.io.File(s"$root/$entity")
    if (!dir.exists()) return spark.emptyDataset[(String, String)].toDF("ark", "json")
    spark.read.option("wholetext", "true").text(s"$root/$entity")
      .withColumn("ark", get_json_object(col("value"), "$.ark"))
      .select(col("ark"), col("value").as("json"))
  }

  // ---------- pure per-manuscript merge (the importer's convert graph) ----------

  /** Lookup context: everything one manuscript's merge needs. */
  final case class Refs(
      layers: Map[String, String],
      textUnits: Map[String, String],
      works: Map[String, String],
      agents: Map[String, String],
      places: Map[String, String],
      msShelfmark: Map[String, String],
      msTypeId: Map[String, String])

  private def arr(o: ObjectNode, f: String): Seq[JsonNode] =
    Option(o.get(f)).filter(_.isArray).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def strField(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filter(_.isTextual).map(_.asText())

  private def parse(json: String): ObjectNode =
    mapper.readTree(json).asInstanceOf[ObjectNode]

  /** importer.get_assoc_name_item: resolve agent_record when id set. */
  private def mergeAssocName(n: ObjectNode, refs: Refs): ObjectNode = {
    strField(n, "id").foreach { id =>
      n.set[com.fasterxml.jackson.databind.JsonNode]("agent_record", parse(refs.agents(id)))
    }
    n
  }

  /** importer.get_assoc_place_item. */
  private def mergeAssocPlace(n: ObjectNode, refs: Refs): ObjectNode = {
    strField(n, "id").foreach { id =>
      n.set[com.fasterxml.jackson.databind.JsonNode]("place_record", parse(refs.places(id)))
    }
    n
  }

  private def mergeEach(o: ObjectNode, f: String, m: ObjectNode => ObjectNode): Unit =
    arr(o, f).foreach { e => m(e.asInstanceOf[ObjectNode]); () }

  /** importer.get_conceptual_work: creators are assoc names. */
  private def mergeConceptualWork(w: ObjectNode, refs: Refs): ObjectNode = {
    mergeEach(w, "creator", mergeAssocName(_, refs))
    w
  }

  /** importer.get_work_wit: stub -> full conceptual work; brief creators ->
    * (id, agent_record); contents gain pref_title from their work.
    */
  private def mergeWorkWit(ww: ObjectNode, refs: Refs): ObjectNode = {
    Option(ww.get("work")).foreach { w =>
      val wo = w.asInstanceOf[ObjectNode]
      if (wo.has("id")) { // WorkStub -> load + merge the conceptual work
        ww.set[com.fasterxml.jackson.databind.JsonNode]("work", mergeConceptualWork(parse(refs.works(wo.get("id").asText())), refs))
      } else { // WorkBrief: creator arks -> WorkBriefCreator
        val creators = arr(wo, "creator")
        if (creators.nonEmpty && creators.head.isTextual) {
          val na = wo.arrayNode()
          creators.foreach { c =>
            val wbc = wo.objectNode()
            wbc.put("id", c.asText())
            wbc.set[com.fasterxml.jackson.databind.JsonNode]("agent_record", parse(refs.agents(c.asText())))
            na.add(wbc)
          }
          wo.set[com.fasterxml.jackson.databind.JsonNode]("creator", na)
        }
      }
    }
    mergeEach(ww, "contents", { c =>
      strField(c, "work_id").foreach { wid =>
        val work = parse(refs.works(wid))
        strField(work, "pref_title").foreach(t => c.put("pref_title", t))
      }
      c
    })
    ww
  }

  /** importer.get_para. */
  private def mergePara(p: ObjectNode, refs: Refs): ObjectNode = {
    mergeEach(p, "assoc_name", mergeAssocName(_, refs))
    mergeEach(p, "assoc_place", mergeAssocPlace(_, refs))
    p
  }

  /** importer.get_text_unit. */
  private def mergeTextUnit(ark: String, refs: Refs): ObjectNode = {
    val tu = parse(refs.textUnits(ark))
    mergeEach(tu, "work_wit", mergeWorkWit(_, refs))
    mergeEach(tu, "para", mergePara(_, refs))
    resolveReconstructedFrom(tu, refs)
    tu
  }

  /** reconstructed_from: tuple[Ark] -> tuple[ReconstructedFrom(id, shelfmark)]
    * (sibling shelfmark read from the RAW sibling — the importer merges the
    * sibling first, but only its shelfmark is consumed, and shelfmark is a
    * raw field, so the lookup is equivalent and cycle-safe).
    */
  private def resolveReconstructedFrom(o: ObjectNode, refs: Refs): Unit = {
    val rf = arr(o, "reconstructed_from")
    if (rf.nonEmpty && rf.head.isTextual) {
      val na = o.arrayNode()
      rf.foreach { a =>
        val e = o.objectNode()
        e.put("id", a.asText())
        e.put("shelfmark", refs.msShelfmark(a.asText()))
        na.add(e)
      }
      o.set[com.fasterxml.jackson.databind.JsonNode]("reconstructed_from", na)
    }
  }

  /** importer.get_layer / the layer_record part of get_uto.
    * @param resolveRecon false on the uto path (get_uto's convert drops it)
    */
  private def mergeLayerRecord(ark: String, refs: Refs, resolveRecon: Boolean): ObjectNode = {
    val lr = parse(refs.layers(ark))
    mergeEach(lr, "text_unit", { ltu =>
      ltu.set[com.fasterxml.jackson.databind.JsonNode]("text_unit_record", mergeTextUnit(ltu.get("id").asText(), refs))
      ltu
    })
    mergeEach(lr, "para", mergePara(_, refs))
    mergeEach(lr, "assoc_name", mergeAssocName(_, refs))
    mergeEach(lr, "assoc_place", mergeAssocPlace(_, refs))
    if (resolveRecon) resolveReconstructedFrom(lr, refs)
    lr
  }

  /** importer.get_layer: ManuscriptLayer + its loaded layer_record. */
  private def mergeMsLayer(l: ObjectNode, refs: Refs): ObjectNode = {
    l.set[com.fasterxml.jackson.databind.JsonNode]("layer_record", mergeLayerRecord(l.get("id").asText(), refs, resolveRecon = true))
    l
  }

  /** importer.get_uto (sinai_json_importer.py:196-245): the layer record is
    * loaded, flattened into script / lang / orig_date / uto_ms_ark, and NOT
    * kept. `id` is renamed at dump time (uto_layer_ark serialization alias).
    */
  private def mergeUto(l: ObjectNode, refs: Refs): ObjectNode = {
    val lr = mergeLayerRecord(l.get("id").asText(), refs, resolveRecon = false)
    val out = l.deepCopy[ObjectNode]()
    out.set[com.fasterxml.jackson.databind.JsonNode]("uto_layer_ark", out.remove("id"))
    // uto_ms_ark: first parent manuscript of type.id == "uto"
    val utoParents = arr(lr, "parent").flatMap(p =>
      refs.msTypeId.get(p.asText()).filter(_ == "uto").map(_ => p.asText()))
    utoParents.headOption.foreach(a => out.put("uto_ms_ark", a))
    val script = out.arrayNode()
    arr(lr, "writing").foreach(w => arr(w.asInstanceOf[ObjectNode], "script")
      .foreach(s => script.add(s.get("label").asText())))
    out.set[com.fasterxml.jackson.databind.JsonNode]("script", script)
    val lang = out.arrayNode()
    arr(lr, "text_unit").foreach { tu =>
      Option(tu.get("text_unit_record")).foreach(tur =>
        arr(tur.asInstanceOf[ObjectNode], "lang").foreach(lg => lang.add(lg.get("label").asText())))
    }
    out.set[com.fasterxml.jackson.databind.JsonNode]("lang", lang)
    // origin dates from the layer record, else from its para items
    def origins(nodes: Seq[JsonNode]): Seq[JsonNode] = nodes.filter(d =>
      Option(d.get("type")).flatMap(t => strField(t, "id")).contains("origin"))
    val direct = origins(arr(lr, "assoc_date"))
    val viaPara = arr(lr, "para").flatMap(p => origins(arr(p.asInstanceOf[ObjectNode], "assoc_date")))
    val od = out.arrayNode()
    (if (direct.nonEmpty) direct else viaPara).foreach(d => od.add(d.deepCopy[JsonNode]()))
    out.set[com.fasterxml.jackson.databind.JsonNode]("orig_date", od)
    out
  }

  /** Split a raw `layer` array into (ot_layer, guest_layer, uto) merged
    * arrays on an ObjectNode — shared by part and manuscript levels
    * (sinai_json_importer.py:247-300).
    */
  private def splitLayers(o: ObjectNode, refs: Refs): Unit = {
    val layers = arr(o, "layer").map(_.asInstanceOf[ObjectNode])
    def typeId(l: ObjectNode): String = strField(l.get("type"), "id").getOrElse("")
    val ot = o.arrayNode(); val guest = o.arrayNode(); val uto = o.arrayNode()
    layers.foreach { l =>
      typeId(l) match {
        case "overtext" => ot.add(mergeMsLayer(l.deepCopy[ObjectNode](), refs)): Unit
        case "guest" => guest.add(mergeMsLayer(l.deepCopy[ObjectNode](), refs)): Unit
        case "undertext" => uto.add(mergeUto(l, refs)): Unit
        case other => throw new IllegalArgumentException(s"unknown layer type '$other'")
      }
    }
    o.remove("layer"): Unit
    o.set[com.fasterxml.jackson.databind.JsonNode]("ot_layer", ot)
    o.set[com.fasterxml.jackson.databind.JsonNode]("guest_layer", guest)
    o.set[com.fasterxml.jackson.databind.JsonNode]("uto", uto)
  }

  /** importer.get_merged_manuscript: the full substitution, then dump-shaped
    * (declaration order, defaults/nones stripped) so its serialization is
    * the reference's `merged/<ark>.json` / `manuscript_json_ts`.
    */
  def mergeManuscript(msJson: String, refs: Refs): ObjectNode = {
    val ms = parse(msJson)
    applyValidators(ms)
    mergeEach(ms, "part", { p => splitLayers(p, refs); mergeEach(p, "para", mergePara(_, refs)); p })
    splitLayers(ms, refs)
    mergeEach(ms, "assoc_name", mergeAssocName(_, refs))
    mergeEach(ms, "assoc_place", mergeAssocPlace(_, refs))
    mergeEach(ms, "para", mergePara(_, refs))
    resolveReconstructedFrom(ms, refs)
    SinaiSchema.dumpShape(ms, "ms_obj").asInstanceOf[ObjectNode]
  }

  /** Parse-time transforms the pydantic model applies to RAW data:
    * IiifItem.manifest host rewrite (sinai_types.py:797-804). Applied to the
    * manuscript tree before merging (iiif only occurs at ms level).
    */
  private def applyValidators(ms: ObjectNode): Unit =
    arr(ms, "iiif").foreach { i =>
      val o = i.asInstanceOf[ObjectNode]
      strField(o, "manifest").foreach(m =>
        o.put("manifest", m.replace("ingest.iiif.library.ucla.edu", "iiif.library.ucla.edu")))
    }

  // ---------- ref extraction (map-side, per gather round) ----------

  private def layerArksOf(msJson: String): Seq[String] = {
    val ms = parse(msJson)
    (arr(ms, "part").flatMap(p => arr(p.asInstanceOf[ObjectNode], "layer")) ++ arr(ms, "layer"))
      .flatMap(l => strField(l, "id"))
  }

  private def textUnitArksOf(layerJson: String): Seq[String] =
    arr(parse(layerJson), "text_unit").flatMap(tu => strField(tu, "id"))

  /** work arks a text unit references: work_wit stub ids + contents work_ids. */
  private def workArksOf(tuJson: String): Seq[String] = {
    val tu = parse(tuJson)
    arr(tu, "work_wit").flatMap { ww =>
      val o = ww.asInstanceOf[ObjectNode]
      Option(o.get("work")).toSeq.flatMap(w => strField(w, "id")) ++
        arr(o, "contents").flatMap(c => strField(c, "work_id"))
    }
  }

  /** agent / place arks in any node's assoc_name / assoc_place / brief
    * creators (json = a ms, layer, text unit or work).
    */
  private def agentPlaceArksOf(json: String): (Seq[String], Seq[String]) = {
    val n = parse(json)
    val agents = SinaiSchema.deepGet(n, Set("assoc_name"), (_, v) => v.isObject)
      .flatMap(a => strField(a, "id")).toSeq ++
      // ConceptualWork.creator items carry agent ids; WorkBrief.creator is
      // a bare ark list (both shapes feed get_agent)
      SinaiSchema.deepGet(n, Set("creator"), (_, v) => v.isObject || v.isTextual)
        .flatMap(c => if (c.isTextual) Some(c.asText()) else strField(c, "id")).toSeq
    val places = SinaiSchema.deepGet(n, Set("assoc_place"), (_, v) => v.isObject)
      .flatMap(p => strField(p, "id")).toSeq
    (agents.distinct, places.distinct)
  }

  /** sibling-manuscript arks (reconstructed_from) + parent arks (uto probe). */
  private def msRefArksOf(json: String): Seq[String] = {
    val n = parse(json)
    (SinaiSchema.deepGet(n, Set("reconstructed_from"), (_, v) => v.isTextual).map(_.asText()) ++
      SinaiSchema.deepGet(n, Set("parent"), (_, v) => v.isTextual).map(_.asText())).toSeq.distinct
  }

  // ---------- Spark assembly ----------

  /** Merge every manuscript under `root` into its ManuscriptObjectMerged
    * JSON. Returns (ark, merged) — merged serialized compact, byte-shaped
    * like the reference's model_dump_json().
    */
  def mergeAll(spark: SparkSession, root: String,
               failFast: Boolean = false): Dataset[(String, String)] = {
    import spark.implicits._

    val ms = entityTable(spark, root, "ms_objs").as[(String, String)].cache()
    val layers = entityTable(spark, root, "layers").as[(String, String)]
    val textUnits = entityTable(spark, root, "text_units").as[(String, String)]
    val works = entityTable(spark, root, "works").as[(String, String)]
    val agents = entityTable(spark, root, "agents").as[(String, String)]
    val places = entityTable(spark, root, "places").as[(String, String)]

    // round 1: layers of each manuscript. Join strategy is left to AQE: the
    // entity tables are dims relative to manuscripts and usually broadcast,
    // but none of them is GUARANTEED small at corpus scale, so no forced
    // broadcast hint (a forced hint would OOM the driver on a huge layer
    // table; AQE picks shuffle join exactly then).
    def gather(refs: DataFrame, dim: Dataset[(String, String)]): DataFrame =
      refs.join(dim.toDF("ref_ark", "ref_json"), Seq("ref_ark"))
        .groupBy(col("ms_ark"))
        .agg(collect_list(struct(col("ref_ark"), col("ref_json"))).as("entries"))

    val msDF = ms.toDF("ms_ark", "ms_json")
    val layerRefs = ms.flatMap { case (a, j) => layerArksOf(j).map(r => (a, r)) }
      .toDF("ms_ark", "ref_ark").distinct()
    val msLayers = gather(layerRefs, layers) // (ms_ark, layer entries)

    // round 2: text units referenced by those layers
    val tuRefs = msLayers.select(col("ms_ark"), explode(col("entries")).as("e"))
      .select(col("ms_ark"), col("e.ref_json").as("j"))
      .as[(String, String)]
      .flatMap { case (a, j) => textUnitArksOf(j).map(r => (a, r)) }
      .toDF("ms_ark", "ref_ark").distinct()
    val msTus = gather(tuRefs, textUnits)

    // round 3: works referenced by those text units
    val workRefs = msTus.select(col("ms_ark"), explode(col("entries")).as("e"))
      .select(col("ms_ark"), col("e.ref_json").as("j"))
      .as[(String, String)]
      .flatMap { case (a, j) => workArksOf(j).map(r => (a, r)) }
      .toDF("ms_ark", "ref_ark").distinct()
    val msWorks = gather(workRefs, works)

    // round 4: agents + places from ms / layers / text units / works;
    // sibling + parent manuscript lookups from ms / layers / text units
    val nodeJsons = msDF.select(col("ms_ark"), col("ms_json").as("j"))
      .unionByName(msLayers.select(col("ms_ark"), explode(col("entries.ref_json")).as("j")))
      .unionByName(msTus.select(col("ms_ark"), explode(col("entries.ref_json")).as("j")))
      .as[(String, String)]
    val workJsons = msWorks.select(col("ms_ark"), explode(col("entries.ref_json")).as("j"))
      .as[(String, String)]
    val apRefs = nodeJsons.union(workJsons).flatMap { case (a, j) =>
      val (ag, pl) = agentPlaceArksOf(j)
      ag.map(r => (a, r, "agent")) ++ pl.map(r => (a, r, "place"))
    }.toDF("ms_ark", "ref_ark", "kind").distinct()
    val msAgents = gather(apRefs.filter(col("kind") === "agent").drop("kind"), agents)
    val msPlaces = gather(apRefs.filter(col("kind") === "place").drop("kind"), places)

    val msLookupDim = ms.map { case (a, j) =>
      val o = parse(j)
      (a, strField(o, "shelfmark").getOrElse(""),
        Option(o.get("type")).flatMap(t => strField(t, "id")).getOrElse(""))
    }.toDF("ref_ark", "ref_shelfmark", "ref_type")
    val siblingRefs = nodeJsons.flatMap { case (a, j) => msRefArksOf(j).map(r => (a, r)) }
      .toDF("ms_ark", "ref_ark").distinct()
    val msSiblings = siblingRefs
      .join(msLookupDim, Seq("ref_ark")) // ms lookup is corpus-sized: no broadcast hint
      .groupBy(col("ms_ark"))
      .agg(collect_list(struct(col("ref_ark"), col("ref_shelfmark"), col("ref_type"))).as("sibs"))

    // final: each manuscript with exactly its own subgraph -> one typed map
    val assembled = msDF
      .join(msLayers.withColumnRenamed("entries", "l"), Seq("ms_ark"), "left")
      .join(msTus.withColumnRenamed("entries", "t"), Seq("ms_ark"), "left")
      .join(msWorks.withColumnRenamed("entries", "w"), Seq("ms_ark"), "left")
      .join(msAgents.withColumnRenamed("entries", "a"), Seq("ms_ark"), "left")
      .join(msPlaces.withColumnRenamed("entries", "p"), Seq("ms_ark"), "left")
      .join(msSiblings, Seq("ms_ark"), "left")
      .as[(String, String, Seq[(String, String)], Seq[(String, String)], Seq[(String, String)],
           Seq[(String, String)], Seq[(String, String)], Seq[(String, String, String)])]

    // importer semantics: a manuscript whose subgraph fails to resolve is
    // logged and skipped, never fails the batch
    // (sinai_json_importer.py:312-319 "Could not merge")
    val out = assembled.flatMap { case (ark, msJson, l, t, w, a, p, sibs) =>
      def toMap(s: Seq[(String, String)]): Map[String, String] =
        Option(s).getOrElse(Nil).toMap
      val sib = Option(sibs).getOrElse(Nil)
      val refs = Refs(toMap(l), toMap(t), toMap(w), toMap(a), toMap(p),
        sib.map(x => x._1 -> x._2).toMap, sib.map(x => x._1 -> x._3).toMap)
      scala.util.Try((ark, mapper.writeValueAsString(mergeManuscript(msJson, refs)))) match {
        case scala.util.Success(r) => Some(r)
        case scala.util.Failure(e) if !failFast =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"Could not merge $ark: ${e.getMessage}")
          None
        case scala.util.Failure(e) => throw e
      }
    }
    ms.unpersist()
    out
  }
}
