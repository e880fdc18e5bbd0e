package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Rich deterministic ManuscriptObjectMerged generator for the Sinai parity
  * harness — exercises the field surface the 7 reference fixtures and the
  * narrow q_sinai_record shapes don't reach together: guest layers, framing
  * vs non-framing paras with resolved agent/place records, work-wit
  * excerpts/alt titles, ms-level assoc places, related manuscripts, note
  * items, viscodex, bibliography, IIIF, provenance programs, and multi-level
  * features. Every value class is mod-`pk`-deterministic; the live reference
  * pydantic model (tools/sinai_parity.py) is the oracle.
  */
object SinaiRichGen {
  private val m = new ObjectMapper()

  private def ct(id: String, label: String): ObjectNode = {
    val o = m.createObjectNode(); o.put("id", id); o.put("label", label); o
  }

  private def scriptItem(pk: Long, tag: String): ObjectNode = {
    val o = m.createObjectNode()
    o.put("id", s"sc$tag${pk % 3}")
    o.put("label", s"Script $tag ${pk % 3}")
    o.put("writing_system", s"WS $tag ${pk % 2}")
    o
  }

  private def agentRecord(pk: Long, tag: String): ObjectNode = {
    val a = m.createObjectNode()
    a.put("ark", s"ark:/21198/ag$tag${pk % 7}")
    a.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("person", "Person"))
    a.put("pref_name", s"Agent $tag ${pk % 7}")
    val alt = a.putArray("alt_name")
    if (pk % 2 == 0) alt.add(s"Alt Agent $tag ${pk % 7}")
    a
  }

  private def assocName(pk: Long, tag: String, role: (String, String)): ObjectNode = {
    val an = m.createObjectNode()
    an.put("id", s"ark:/21198/ag$tag${pk % 7}")
    an.set[com.fasterxml.jackson.databind.JsonNode]("agent_record", agentRecord(pk, tag))
    if (pk % 3 == 0) an.put("value", s"Name value $tag ${pk % 5}")
    if (pk % 2 == 0) an.put("as_written", s"Written $tag ${pk % 5}")
    an.set[com.fasterxml.jackson.databind.JsonNode]("role", ct(role._1, role._2))
    if (pk % 4 == 0) an.putArray("note").add(s"Name note $tag")
    an
  }

  private def assocPlace(pk: Long, tag: String): ObjectNode = {
    val ap = m.createObjectNode()
    ap.put("id", s"ark:/21198/pl$tag${pk % 5}")
    if (pk % 2 == 0) ap.put("value", s"Place value $tag ${pk % 5}")
    if (pk % 3 == 0) ap.put("as_written", s"Place written $tag")
    ap.set[com.fasterxml.jackson.databind.JsonNode]("event", ct("origin", "Place of Origin"))
    if (pk % 3 == 1) ap.putArray("note").add(s"Place note $tag")
    val pr = m.createObjectNode()
    pr.put("ark", s"ark:/21198/pl$tag${pk % 5}")
    pr.put("pref_name", s"Place $tag ${pk % 5}")
    if (pk % 2 == 1) pr.putArray("alt_name").add(s"Alt Place $tag ${pk % 5}")
    ap.set[com.fasterxml.jackson.databind.JsonNode]("place_record", pr)
    ap
  }

  private def assocDate(pk: Long, typeId: (String, String), y: Long, span: Long): ObjectNode = {
    val ad = m.createObjectNode()
    ad.put("value", s"c. $y CE")
    val iso = m.createObjectNode()
    iso.put("not_before", y.toString)
    if (span > 0) iso.put("not_after", (y + span).toString)
    ad.set[com.fasterxml.jackson.databind.JsonNode]("iso", iso)
    ad.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(typeId._1, typeId._2))
    if (pk % 5 == 0) ad.putArray("note").add("Date note")
    ad
  }

  private def para(pk: Long, tag: String, framing: Boolean): ObjectNode = {
    val p = m.createObjectNode()
    p.set[com.fasterxml.jackson.databind.JsonNode]("type",
      if (framing) ct("framing", "Framing") else ct("colophon", "Colophon"))
    val st = p.putArray("subtype")
    st.add(ct(s"sub${pk % 3}", s"Subtype ${pk % 3}"))
    p.put("locus", s"f. ${pk % 20 + 1}r")
    p.putArray("lang").add(ct(s"pl${pk % 4}", s"Para Lang $tag ${pk % 4}"))
    p.putArray("script").add(scriptItem(pk, s"p$tag"))
    if (pk % 2 == 0) p.put("label", s"Para label $tag ${pk % 6}")
    if (pk % 3 == 0) p.put("as_written", s"Para written $tag")
    if (pk % 4 == 0) p.putArray("translation").add(s"Para translation $tag")
    p.putArray("assoc_name").add(assocName(pk, s"p$tag", ("scribe", "Scribe")))
    p.putArray("assoc_place").add(assocPlace(pk, s"p$tag"))
    p.putArray("assoc_date").add(assocDate(pk, ("origin", "Origin Date"), 700 + pk % 200, pk % 2))
    if (pk % 2 == 1) p.putArray("note").add(s"Para note $tag")
    p
  }

  private def workWit(pk: Long, tag: String): ObjectNode = {
    val ww = m.createObjectNode()
    val work = m.createObjectNode()
    work.put("ark", s"ark:/21198/w$tag${pk % 11}")
    work.put("pref_title", s"Work $tag ${pk % 11}")
    if (pk % 2 == 0) work.put("orig_lang_title", s"Orig title $tag ${pk % 11}")
    if (pk % 3 == 0) work.putArray("alt_title").add(s"Work alt $tag ${pk % 11}")
    work.putArray("genre").add(ct(s"g${pk % 4}", s"Genre $tag ${pk % 4}"))
    if (pk % 2 == 1)
      work.putArray("creator").add(assocName(pk, s"w$tag", ("author", "Author")))
    ww.set[com.fasterxml.jackson.databind.JsonNode]("work", work)
    if (pk % 3 == 0) ww.put("alt_title", s"Wit alt title $tag")
    if (pk % 2 == 0) ww.put("as_written", s"Wit as written $tag ${pk % 9}")
    if (pk % 4 == 0) {
      val ex = m.createObjectNode()
      ex.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("incipit", "Incipit"))
      ex.put("as_written", s"Excerpt text $tag ${pk % 7}")
      ex.putArray("translation").add(s"Excerpt translation $tag")
      ex.putArray("note").add(s"Excerpt note $tag")
      ww.putArray("excerpt").add(ex)
    }
    val ci = m.createObjectNode()
    ci.put("label", s"Contents $tag ${pk % 7}")
    ci.put("pref_title", s"Contents work $tag ${pk % 9}")
    if (pk % 5 == 0) ci.putArray("note").add(s"Contents note $tag")
    ww.putArray("contents").add(ci)
    ww
  }

  private def layerRecord(pk: Long, ark: String, tag: String): ObjectNode = {
    val lr = m.createObjectNode()
    lr.put("ark", s"$ark/lr$tag")
    lr.put("reconstruction", false)
    lr.set[com.fasterxml.jackson.databind.JsonNode]("state", ct("original", "Original"))
    lr.put("label", s"Layer $tag of manuscript ${pk}")
    if (pk % 2 == 0) lr.put("summary", s"Layer summary $tag ${pk % 8}")
    val wr = m.createObjectNode()
    wr.putArray("script").add(scriptItem(pk, tag))
    lr.putArray("writing").add(wr)
    val ltu = m.createObjectNode()
    ltu.put("id", s"$ark/t$tag"); ltu.put("label", s"TU link $tag")
    val tur = m.createObjectNode()
    tur.put("ark", s"$ark/tu$tag"); tur.put("reconstruction", false)
    tur.put("label", s"Text unit $tag ${pk % 13}")
    if (pk % 3 == 0) tur.put("summary", s"TU summary $tag")
    tur.putArray("lang").add(ct(s"l${pk % 5}", s"Language $tag ${pk % 5}"))
    tur.putArray("work_wit").add(workWit(pk, tag))
    if (pk % 2 == 1) tur.putArray("para").add(para(pk, s"tu$tag", framing = pk % 4 == 1))
    if (pk % 4 == 2) tur.putArray("features").add(ct("ft", s"TU Feature ${pk % 3}"))
    tur.putArray("parent").add(ark)
    ltu.set[com.fasterxml.jackson.databind.JsonNode]("text_unit_record", tur)
    lr.putArray("text_unit").add(ltu)
    if (pk % 2 == 0) lr.putArray("para").add(para(pk, s"l$tag", framing = pk % 4 == 0))
    lr.putArray("assoc_date").add(assocDate(pk, ("origin", "Origin Date"), 900 + pk % 300, pk % 3))
    if (pk % 3 == 0) lr.putArray("assoc_name").add(assocName(pk, s"l$tag", ("scribe", "Scribe")))
    if (pk % 4 == 0) lr.putArray("assoc_place").add(assocPlace(pk, s"l$tag"))
    if (pk % 5 == 0) {
      val ni = m.createObjectNode()
      ni.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("general", "Other Notes"))
      ni.put("value", s"Layer note $tag ${pk % 6}")
      lr.putArray("note").add(ni)
    }
    lr.putArray("parent").add(ark)
    lr
  }

  private def msLayer(pk: Long, ark: String, tag: String, typ: (String, String)): ObjectNode = {
    val l = m.createObjectNode()
    l.put("id", s"$ark/$tag")
    l.put("label", s"${typ._2} Layer $tag")
    l.set[com.fasterxml.jackson.databind.JsonNode]("type", ct(typ._1, typ._2))
    if (pk % 3 == 0) l.put("locus", s"ff. 1-${pk % 30 + 1}")
    l.set[com.fasterxml.jackson.databind.JsonNode]("layer_record", layerRecord(pk, ark, tag))
    l
  }

  /** One rich merged manuscript (already in merged shape + declaration
    * order via SinaiSchema.dumpShape applied by the caller).
    */
  def msJson(pk: Long): String = {
    val ark = s"ark:/21198/zr$pk"
    val o = m.createObjectNode()
    o.put("ark", ark)
    o.put("reconstruction", pk % 7 == 0)
    o.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("manuscript", "Manuscript"))
    o.put("shelfmark", s"Sinai Rich MS $pk")
    if (pk % 2 == 0) o.put("summary", s"Manuscript summary ${pk % 9}")
    if (pk % 5 != 0) o.put("extent", s"${pk % 40 + 1} ff.")
    if (pk % 3 == 0) o.put("weight", s"${pk % 5 + 1} kg")
    if (pk % 4 == 0) o.put("dim", s"${100 + pk % 99} x ${80 + pk % 60} mm")
    o.set[com.fasterxml.jackson.databind.JsonNode]("state", ct("codex", "Codex"))
    if (pk % 2 == 1) o.put("fol", s"ff. i + ${pk % 40 + 1}")
    if (pk % 6 == 0) o.put("coll", s"Quire 1: 1x${pk % 8 + 1}")
    val feats = o.putArray("features")
    if (pk % 2 == 0) feats.add(ct("palimpsest", "Palimpsest"))
    if (pk % 3 == 0) feats.add(ct("msi", "Multispectral Imaging"))

    val part = m.createObjectNode()
    part.put("label", "Part 1")
    part.putArray("support").add(ct("parchment", "Parchment"))
    part.putArray("ot_layer").add(msLayer(pk, ark, "ot1", ("overtext", "Overtext")))
    if (pk % 2 == 0)
      part.putArray("guest_layer").add(msLayer(pk, ark, "g1", ("guest", "Guest Content")))
    if (pk % 3 == 0) {
      val uto = m.createObjectNode()
      uto.put("uto_layer_ark", s"$ark/u1")
      uto.put("label", "Undertext")
      uto.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("undertext", "Undertext"))
      uto.putArray("script").add(s"UScript ${pk % 3}")
      uto.putArray("lang").add(s"ULang ${pk % 2}")
      uto.putArray("orig_date").add(assocDate(pk, ("origin", "Origin Date"), 500 + pk % 200, 1))
      part.putArray("uto").add(uto)
    }
    if (pk % 4 == 0) part.putArray("para").add(para(pk, "part", framing = pk % 8 == 0))
    o.putArray("part").add(part)

    val loc = m.createObjectNode()
    loc.put("id", "sinai-nf")
    if (pk % 2 == 0) loc.put("collection", "New Finds")
    loc.put("repository", "St. Catherine's Monastery of the Sinai")
    o.putArray("location").add(loc)

    if (pk % 3 == 0)
      o.putArray("assoc_date").add(assocDate(pk, ("binding", "Binding Date"), 1200 + pk % 300, 50))
    o.putArray("assoc_name").add(assocName(pk, "ms", ("former-owner", "Former Owner")))
    o.putArray("assoc_place").add(assocPlace(pk, "ms"))
    if (pk % 2 == 0) o.putArray("para").add(para(pk, "ms", framing = pk % 4 == 2))

    if (pk % 2 == 0) {
      val ni = m.createObjectNode()
      ni.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("binding", "Binding"))
      ni.put("value", s"Binding note ${pk % 5}")
      o.putArray("note").add(ni)
    }
    if (pk % 3 == 0) {
      val rm = m.createObjectNode()
      rm.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("filiation", "Filiation"))
      rm.put("label", s"Related to MS ${pk % 9}")
      rm.putArray("note").add("Related note")
      val ms0 = m.createObjectNode()
      ms0.put("label", s"Sinai Other ${pk % 9}")
      ms0.put("id", s"ark:/21198/zo${pk % 9}")
      rm.putArray("mss").add(ms0)
      o.putArray("related_mss").add(rm)
    }
    if (pk % 4 == 0) {
      val vc = m.createObjectNode()
      vc.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("manuscript", "Manuscript"))
      vc.put("label", s"Viscodex $pk")
      vc.put("url", s"https://vceditor.example/project/$pk/viewOnly")
      o.putArray("viscodex").add(vc)
    }
    if (pk % 2 == 1) {
      val bib = m.createObjectNode()
      bib.put("id", f"00000000-0000-4000-8000-${pk}%012d")
      bib.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("ref", "Reference Work"))
      bib.put("shortcode", s"Ref$pk")
      bib.put("citation", s"Citation for manuscript $pk.")
      bib.putArray("note").add(s"Bib note ${pk % 4}")
      o.putArray("bib").add(bib)
    }
    if (pk % 3 != 2) {
      val ii = m.createObjectNode()
      ii.set[com.fasterxml.jackson.databind.JsonNode]("type", ct("main", "Main"))
      ii.put("manifest", s"https://iiif.example.org/ark$pk/manifest")
      if (pk % 2 == 0)
        ii.put("thumbnail", s"https://iiif.example.org/ark$pk/thumb.jpg")
      o.putArray("iiif").add(ii)
    }
    val cats = o.putArray("cataloguer")
    (0 to (pk % 3).toInt).foreach { c =>
      val cat = m.createObjectNode()
      cat.put("message", s"edit $c")
      cat.putArray("contributor").add(s"Cataloguer ${(pk + c) % 6}")
      cat.put("added_by", "bot")
      cat.put("timestamp", f"2025-0${(pk + c) % 9 + 1}%d-1${c}%dT0${pk % 9}%d:30:00Z")
      cats.add(cat)
    }
    if (pk % 6 == 0) {
      val rf = m.createObjectNode()
      rf.put("id", s"ark:/21198/zr${pk + 1}")
      rf.put("shelfmark", s"Sinai Rich MS ${pk + 1}")
      o.putArray("reconstructed_from").add(rf)
    }
    if (pk % 2 == 0) {
      val dp = m.createObjectNode()
      val prog = m.createObjectNode()
      prog.put("label", s"Program ${pk % 4}")
      prog.put("description", "Cataloguing program")
      dp.putArray("program").add(prog)
      dp.put("rights", "CC BY-NC 4.0")
      o.set[com.fasterxml.jackson.databind.JsonNode]("desc_provenance", dp)
    }
    if (pk % 3 == 0) {
      val ip = m.createObjectNode()
      val prog = m.createObjectNode()
      if (pk % 6 == 0) prog.put("label", s"Imaging ${pk % 5}")
      prog.put("delivery", s"delivered-${pk % 3}")
      ip.putArray("program").add(prog)
      o.set[com.fasterxml.jackson.databind.JsonNode]("image_provenance", ip)
    }
    m.writeValueAsString(o)
  }
}
