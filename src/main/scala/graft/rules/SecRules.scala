package graft.rules

import graft.model.Event
import graft.parse._

/** aws.guardduty + azure.securityalert — semantic ports of
  * config/processors/api_security_aws.guardduty.conf and
  * event_hub_audit_azure.event_hub_securityalert.conf. */
object SecRules {

  // ----------------------------------------------------------- aws.guardduty
  /** GuardDuty findings: JSON → recursive key-downcase (the :19-56 ruby
    * normalizer), deep nested renames, explicit [0][N] security-group
    * conditionals merging into cloud.project.name, four remove-on-failure
    * dates. Quirks kept: :102's `if "[...]"` tests a string LITERAL (always
    * true — the rename itself no-ops when the field is absent), and
    * :127's `![source][ip] and [source][ip] == ""` can never both hold, so
    * the ipv6 fallback is dead. Renames through the networkinterfaces ARRAY
    * without an index (:75-77,:89) address nothing, as in Logstash. */
  def awsGuardduty(ev: Event, ctx: ParseCtx): ParseOutcome = {
    if (!JsonOps.parse(ev, "message", "guard")) { // ref :9-12
      ev.set("[event][module]", "aws")
      ev.set("[event][dataset]", "aws.guardduty")
      ev.set("[agent][parse_rule]", "not parsed")
      ev.addTag("_parse_failure")
      return Parsed(Seq(ev))
    }
    ev.set("[agent][parse_rule]", "Rule 1")
    ev.set("[cloud][provider]", "aws") // ref :13-18
    ev.set("[event][module]", "aws")
    ev.set("[event][dataset]", "aws.guardduty")
    Mutate.deepDowncaseKeys(ev, // ref :19-56
      ignore = Set("path", "@timestamp", "@metadata", "host", "@version",
        "message", "tags")) // message/tags are engine-internal carriers
    ev.rename("[guard][severity]", "[event][severity]") // ref :57-91
    ev.rename("[guard][createdat]", "[event][created]")
    ev.rename("[guard][updatedat]", "[event][modified]")
    ev.rename("[guard][title]", "[event][reason]")
    ev.rename("[guard][description]", "[rule][description]")
    ev.rename("[guard][schemaversion]", "[service][version]")
    ev.rename("[guard][accountid]", "[cloud][account][id]")
    ev.rename("[guard][region]", "[cloud][region]")
    ev.rename("[guard][partition]", "[cloud][provider]")
    ev.rename("[guard][id]", "[event][id]")
    ev.rename("[guard][type]", "[rule][name]")
    ev.rename("[guard][resource][instancedetails][availabilityzone]", "[cloud][availability_zone]")
    ev.rename("[guard][resource][instancedetails][imagedescription]", "[container][image][name]")
    ev.rename("[guard][resource][instancedetails][instanceid]", "[cloud][instance][id]")
    ev.rename("[guard][resource][instancedetails][instancestate]", "[service][state]")
    ev.rename("[guard][resource][instancedetails][instancetype]", "[cloud][machine][type]")
    // networkinterfaces is an array — index-less renames address nothing
    ev.rename("[guard][resource][instancedetails][networkinterfaces][subnetid]", "[network][name]")
    ev.rename("[guard][resource][instancedetails][networkinterfaces][securitygroups][groupname]", "[user][group][name]")
    ev.rename("[guard][resource][instancedetails][networkinterfaces][securitygroups][groupid]", "[user][group][id]")
    ev.rename("[guard][resource][accesskeydetails][username]", "[user][name]")
    ev.rename("[guard][service][action][awsapicallaction][remoteipdetails][organization][asn]", "[source][as][number]")
    ev.rename("[guard][service][action][awsapicallaction][remoteipdetails][organization][asnorg]", "[source][as][organization][name]")
    ev.rename("[guard][service][action][awsapicallaction][servicename]", "[service][name]")
    ev.rename("[guard][service][action][networkconnectionaction][remoteipdetails][ipaddressv4]", "[source][ip]")
    ev.rename("[guard][service][action][networkconnectionaction][localipdetails][ipaddressv4]", "[destination][ip]")
    ev.rename("[guard][service][action][actiontype]", "[rule][category]")
    ev.rename("[guard][service][action][portprobeaction][portprobedetails][localportdetails][port]", "[destination][port]")
    ev.rename("[guard][service][detectorid]", "[rule][id]")
    ev.rename("[guard][service][eventfirstseen]", "[event][start]")
    ev.rename("[guard][service][eventlastseen]", "[event][end]")
    ev.rename("[guard][resource][instancedetails][networkinterfaces][privateipaddresses][privateipaddress]", "[source][ip]")
    ev.rename("[guard][resource][instancedetails][tags][value]", "[source][tmp]")
    Mutate.addField(ev, "[log][source][hostname]", "%{[cloud][account][id]}") // ref :92-94
    if (ev.has("[guard][service][additionalinfo][sample]")) // ref :95-99
      ev.set("[log][syslog][priority]", "0")
    // ref :102-126 — [0][N] security-group chain into cloud.project.name
    ev.rename("[guard][resource][instancedetails][networkinterfaces][0][securitygroups][0][groupname]",
      "[cloud][project][name]")
    (1 to 4).foreach { i =>
      val p = s"[guard][resource][instancedetails][networkinterfaces][0][securitygroups][$i][groupname]"
      if (ev.has(p)) ev.get(p).foreach(v => ev.mergeInto("[cloud][project][name]", v))
    }
    // ref :127-131 — contradictory condition: dead ipv6 fallback
    def dateRm(f: String, target: String, fmts: Seq[String], tag: String): Unit = {
      if (Dates(ev, f, fmts, target, timezone = "GMT", tagOnFailure = Seq(tag)))
        ev.remove(f)
      else if (ev.hasTag(tag)) ev.remove(f)
    }
    dateRm("[event][created]", "[event][created_ms]",
      Seq("yyyy-MM-dd HH:mm:ss.SSS", "ISO8601"), "_dateparsefailure_ec")
    dateRm("[event][modified]", "[event][modified_ms]",
      Seq("yyyy-MM-dd HH:mm:ss.SSS", "ISO8601"), "_dateparsefailure_em")
    dateRm("[event][start]", "[event][start_ms]",
      Seq("ISO8601", "yyyy-MM-dd HH:mm:ss.Z"), "_dateparsefailure_es")
    dateRm("[event][end]", "[event][end_ms]",
      Seq("ISO8601", "yyyy-MM-dd HH:mm:ss.Z"), "_dateparsefailure_ee")
    ev.remove("guard") // ref :180-182
    Parsed(Seq(ev))
  }

  // ------------------------------------------------------ azure.securityalert
  /** Sentinel SecurityAlert rows through the shared event-hub envelope
    * (message-level lowercase, records[] split or bare object — same
    * machinery as officeactivity), then the alert rename block and three
    * ISO dates (ref: event_hub_audit_azure.event_hub_securityalert.conf). */
  def azureSecurityalert(ev: Event, ctx: ParseCtx): ParseOutcome = {
    Mutate.lowercase(ev, "message") // ref :9-11
    val msg = ev.stringOrNull("message")
    val isEnvelope = msg != null && msg.startsWith("{\"records\": [")
    val parsedOk =
      if (isEnvelope) JsonOps.parse(ev, "message", "tmp")
      else JsonOps.parse(ev, "message", "az")
    if (!parsedOk) {
      ev.set("[agent][parse_rule]", "not parsed")
      ev.addTag("_parse_failure")
      return Parsed(Seq(ev))
    }
    ev.set("[agent][parse_rule]", "Rule 1")
    val records: Vector[Any] =
      if (isEnvelope) ev.get("[tmp][records]") match {
        case Some(a: scala.collection.mutable.ArrayBuffer[Any @unchecked]) if a.nonEmpty => a.toVector
        case _ => Vector(new Event.FMap())
      }
      else Vector(ev.get("az").getOrElse(new Event.FMap()))
    val out = records.map { rec =>
      val sub = new Event
      ev.root.forEach((k, v) =>
        if (k != "az" && k != "tmp") sub.root.put(k, Event.deepCopy(v)))
      ev.tags.foreach(sub.addTag)
      sub.set("az", Event.deepCopy(rec))
      if (isEnvelope) JsonOps.encode(sub, "az", "message")
      alertRecord(sub)
      sub
    }
    Parsed(out)
  }

  private def alertRecord(ev: Event): Unit = {
    ev.set("[event][module]", "azure") // ref :32-36
    ev.set("[event][dataset]", "azure.securityalert")
    Mutate.addField(ev, "[log][source][hostname]", "%{[az][tenantid]}")
    ev.rename("[az][alertname]", "[rule][name]") // ref :37-54
    ev.rename("[az][alertseverity]", "[event][severity_name]")
    ev.rename("[az][alerttype]", "[rule][category]")
    ev.rename("[az][description]", "[rule][description]")
    ev.rename("[az][displayname]", "[user][name]")
    ev.rename("[az][endtime]", "[event][end]")
    ev.rename("[az][providername]", "[event][provider]")
    ev.rename("[az][starttime]", "[event][start]")
    ev.rename("[az][status]", "[event][outcome]")
    ev.rename("[az][systemalertid]", "[event][id]")
    ev.rename("[az][tactics]", "[threat][tactic][name]")
    ev.rename("[az][techniques]", "[threat][technique][name]")
    ev.rename("[az][tenantid]", "[rule][id]")
    ev.rename("[az][timegenerated]", "[event][ingested]")
    ev.rename("[az][vendorname]", "[observer][vendor]")
    ev.rename("[az][type]", "[event][type]")
    ev.remove("az"); ev.remove("tmp") // ref :55-57
    if (Dates(ev, "[event][ingested]", Seq("ISO8601"), "[event][ingested_ms]",
      timezone = "GMT", tagOnFailure = Seq("_dateparsefailure_ei")))
      ev.remove("[event][ingested]")
    if (Dates(ev, "[event][start]", Seq("ISO8601"), "[event][start_ms]",
      timezone = "GMT", tagOnFailure = Seq("_dateparsefailure_es")))
      ev.remove("[event][start]")
    if (Dates(ev, "[event][end]", Seq("ISO8601"), "[event][end_ms]",
      timezone = "GMT", tagOnFailure = Seq("_dateparsefailure_ee")))
      ev.remove("[event][end]")
  }
}
