package graft.rules

import graft.model.Event
import graft.parse.{Dates, Dissect, Grok, Kv, Mutate, SyslogPri}

/** snmp_forescout + the tenable syslog pair.
  *
  * snmp_forescout (snmp_forescout.conf, 213 lines — ~190 of them a
  * commented-out OID glossary): dissect the trap payload after "MESSAGE",
  * strip the `.N` OID indices, kv into [oid] with lowercased keys, and
  * rename five varbinds. The conf's rename keys carry the TRAILING space
  * the kv tokenization leaves before `=` — mirrored by splitting pairs on
  * `,\s*` (leading spaces consumed, trailing kept); values keep their
  * leading space (the ip one is cleaned later by 02's ip strip, the trap id
  * keeps it — visible in [event][id]). No module/dataset is ever set.
  *
  * tenable_nessus.scanner (syslog_audit_tenable.nessus_scanner.conf, 179
  * lines): the stack-dump drop (whose `# ()`/`# ???()` regex alternation
  * degenerates to "contains '# '"), dissect/grok variants over the
  * t.nessuscore bracket groups, the bracket-blob kv, the Chunk split, the
  * `10e9` (=1e10) duration multiplier, and per-description action
  * stamping.
  *
  * tenable_nessus.security_center (syslog_audit_tenable.security_center
  * .conf, 65 lines): kind stamp + one pipe-delimited grok + ECS renames;
  * lines that miss the grok keep the default `_grokparsefailure`. */
object TenableRules {

  def snmpForescout(ev: Event, ctx: ParseCtx): ParseOutcome = {
    Dissect(ev, "message", "%{[data]} MESSAGE %{[[rest_msg]]}", Seq("_dissectfailure")) // ref :11-16
    Mutate.gsub(ev, "rest_msg", "(.\\d+ =)", " =") // ref :18-20
    Kv.withPattern(ev, "rest_msg", ",\\s*", '=', target = "oid",
      transformKeyLowercase = true) // ref :22-29 (field_split "," + transform_key lowercase)
    ev.rename("[oid][forescout-mib::fstrapseverity ]", "[severity]") // ref :30-36
    ev.rename("[oid][forescout-mib::ctdeviceipaddress ]", "[source][ip]")
    ev.rename("[oid][forescout-mib::fstrapid ]", "[event][id]")
    ev.rename("[oid][forescout-mib::ctdeviceipaddresstype ]", "[network][type]")
    ev.rename("[oid][forescout-mib::ctdeviceid ]", "[agent][id]")
    ev.remove("rest_msg"); ev.remove("data"); ev.remove("oid") // ref :46
    Parsed(Seq(ev))
  }

  // ---------------- tenable nessus scanner ----------------

  private val nessusGrok = // ref :45-51
    "(.*?) (.*) (?<[host][hostname]>.*) (T.NessusCore)?(t.nessuscore)? \\[(.*?) (?<[event][start]>.*?)\\]\\[(.*?)\\]\\[(?<tmp>.*?)( )?\\:( )?(?<[rule][description]>.*)"

  def nessusScanner(ev: Event, ctx: ParseCtx): ParseOutcome = {
    ev.set("[event][module]", "tenable_nessus") // ref :9-12
    ev.set("[event][dataset]", "tenable_nessus.scanner")
    Grok(ev, "message", Seq(Registry.HeaderGrok), Seq("_parsefailure_header")) // ref :13-17
    SyslogPri(ev) // ref :18-21
    val am = ev.getString("actual_msg").getOrElse("")
    // ref :22-24 — the drop regex's `# ()` empty-group alternative matches
    // any "# " (and `# ???()` does not even compile in Java): the evident
    // gate is these substrings
    if (am.contains("call stack") || am.contains("-----") || am.contains("# "))
      return Dropped
    if (am.contains("t.nessuscore") || am.contains("T.NessusCore")) { // ref :25-168
      if (am.contains("received signal") || am.contains("Nessus is ready")) { // ref :26-44
        Dissect(ev, "actual_msg",
          "%{?data->} %{?data} %{?data} %{[[host][hostname]]} %{?data} [%{?data} %{[[event][start]]}][%{?data}] %{[[rule][description]]}",
          Seq("_dissectfailure_1"))
        if (am.contains("received signal"))
          ev.set("[event][action]", "Nessus Service stopped")
        else
          ev.set("[event][action]", "Nessus Service started back up and running")
      } else {
        Grok(ev, "actual_msg", Seq(nessusGrok), Seq("_grokparsefailure_1"))
      }
      val desc = ev.getString("[rule][description]").getOrElse("")
      if (desc.contains("Finished")) { // ref :52-63
        if (desc.contains("hosts up"))
          ev.set("[event][action]", "Finished scanning a scan chunk")
        else ev.set("[event][action]", "Scan Completed on Target IP")
      } else if (desc.contains("starting with ")) { // ref :64-95
        Dissect(ev, "[rule][description]", "%{?data}: %{tmp_ip}", Seq("_dissectfailure_2"))
        val ip = ev.getString("tmp_ip").getOrElse("")
        if (ip.matches(".*((?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)),|-.*") ||
          ip.contains(",") || ip.contains("-")) {
          Grok(ev, "tmp_ip",
            Seq("(?<[network][network_range][gte]>.*)(,|-)(?<[network][network_range][lte]>.*)"),
            Seq("_grokparsefailure_2"))
          if (ev.getString("[network][network_range][gte]").exists(g => g.contains(",") || g.contains("-")))
            ev.remove("[network][network_range]")
        }
        ev.remove("tmp_ip")
        ev.set("[event][action]", "Scan Started")
      } else if (desc.contains("Started with ")) {
        ev.set("[event][action]", "Scan Started")
      } else if (desc.contains("too slow")) {
        ev.set("[event][action]", "Plugin too slow")
      } else if (desc.contains("Collecting report info")) {
        ev.set("[event][action]", "Report collected for finished scan chunk")
      } else if (desc.contains("Warning: ")) { // ref :103-110
        Dissect(ev, "[rule][description]",
          "%{?data} scan %{[[destination][address]]}, %{?data}", Seq("_dissectfailure_3"))
      }
      Mutate.gsub(ev, "tmp", "\\]", "") // ref :111-114
      Mutate.gsub(ev, "tmp", "\\[", ",")
      Kv(ev, "tmp", ',', '=', target = "ns") // ref :115-120
      ev.rename("[ns][target]", "[destination][address]") // ref :121-128
      ev.rename("[ns][port]", "[destination][port]")
      ev.rename("[ns][pid]", "[process][pid]")
      ev.rename("[ns][scan]", "[event][id]")
      ev.rename("[ns][duration]", "[event][duration]")
      ev.rename("[ns][plugin]", "[file][name]")
      ev.getString("[ns][name]").foreach { n => // ref :129-144
        if (n.contains("Chunk "))
          Dissect(ev, "[ns][name]",
            "%{[[file][uid]]}/Chunk %{[[process][entity_id]]}.", Seq("_dissectfailure_4"))
        else Dissect(ev, "[ns][name]", "%{[[file][uid]]}", Seq("_dissectfailure_5"))
      }
      if (ev.has("[event][duration]")) { // ref :145-153 — 10e9 == 1e10 kept verbatim
        Mutate.gsub(ev, "[event][duration]", "s", "")
        Mutate.convert(ev, "[event][duration]", "float")
        ev.get("[event][duration]").foreach {
          case d: Double => ev.set("[event][duration]", d * 10e9)
          case l: Long => ev.set("[event][duration]", l * 10e9)
          case _ => ()
        }
      }
      if (Dates(ev, "[event][start]", // ref :154-166
        Seq("MMM  dd HH:mm:ss yyyy", "MMM dd HH:mm:ss yyyy", "ISO8601"),
        "[event][start_ms]", timezone = "GMT", locale = "en"))
        ev.remove("[event][start]")
      if (ev.hasTag("_dateparsefailure")) ev.remove("[event][start]")
    } else {
      ev.addTag("unparsed") // ref :169-172
    }
    ev.remove("ns"); ev.remove("tmp"); ev.remove("actual_msg") // ref :174-176
    Parsed(Seq(ev))
  }

  // ---------------- tenable security center ----------------

  private val scGrok = // ref :36-42
    "%{SYSLOGTIMESTAMP:syslog_timestamp} %{SYSLOGHOST:syslog_hostname}\\s(?<technology_name>.*?):.*\\[%{WORD:product}\\]\\:\\s%{WORD:day},\\s%{GREEDYDATA:date}\\s-%{INT:value}\\|%{WORD:status}\\|%{WORD:infotype}\\|%{WORD:messagetype}\\|%{WORD:errorlevel}\\|%{GREEDYDATA:finalmessage}"

  def securityCenter(ev: Event, ctx: ParseCtx): ParseOutcome = {
    ev.set("[event][module]", "tenable_nessus") // ref :9-12
    ev.set("[event][dataset]", "tenable_nessus.security_center")
    Grok(ev, "message", Seq(Registry.HeaderGrok), Seq("_parsefailure_header")) // ref :13-17
    SyslogPri(ev) // ref :18-21
    val am = ev.getString("actual_msg").getOrElse("")
    if (am.contains("T.NessusCore") || am.contains("SecurityCenter")) // ref :22-36
      ev.set("[event][kind]", "tenable_nessus.security_center.app")
    else
      ev.set("[event][kind]", "tenable_nessus.security_center.os_logs")
    Grok(ev, "actual_msg", Seq(scGrok)) // ref :36-42 — default _grokparsefailure on miss
    ev.rename("syslog_hostname", "[host][hostname]") // ref :43-51
    ev.rename("product", "[observer][product]")
    ev.rename("status", "[event][action]")
    ev.rename("infotype", "[error][id]")
    ev.rename("messagetype", "[error][code]")
    ev.rename("errorlevel", "[error][type]")
    ev.rename("finalmessage", "[event][outcome]")
    if (Dates(ev, "date", Seq("dd MMM yyyy HH:mm:ss", "ISO8601"), // ref :52-58
      "[event][created_ms]", timezone = "GMT", locale = "en",
      tagOnFailure = Seq("_dateparsefailure_ec")))
      ev.remove("date")
    Seq("syslog_timestamp", "technology_name", "day", "value", "date", "actual_msg")
      .foreach(ev.remove) // ref :59-61
    Parsed(Seq(ev))
  }
}
