package graft.rules

import graft.model.Event
import graft.parse.{Dates, Dissect, Grok, Mutate, SyslogPri}

/** layer7_soa_gw.traffic — semantic port of
  * config/processors/syslog_security_layer7.securespan.soa.gw.conf (233
  * lines): pri-substring gate ("14" ANYWHERE in the pri string), the giant
  * RULE 1 response-headers + XML-body dissect, the ", , 200" drop, and a
  * per-message dissect ladder.
  *
  * Mirrored reference accidents:
  *  - RULEs 7-12 dissect the field `rest_msg`, which nothing in this conf
  *    ever creates — every one of those branches tags `_dissectfailure`
  *    (parse_ok false) and extracts nothing;
  *  - `syslog_pri` keeps the `pri` field (no remove_field) so the later
  *    `[pri] == "12"` / `=~ "14"` string probes work; pri is deleted only
  *    in the final remove_field;
  *  - RULE 1's `Date:` header lands five tokens in [event][created] that
  *    the MMM-only date patterns can never parse — created falls to the 02
  *    scrub and the 03 default. */
object Layer7Rules {

  private val head3 =
    "%{[[event][start]]->} %{+[[event][start]]} %{+[[event][start]]} %{[[source][address]]} %{?ssg}: "

  def layer7(ev: Event, ctx: ParseCtx): ParseOutcome = {
    if (!ev.has("[event][dataset]")) { // ref :9
      ev.set("[event][module]", "layer7_soa_gw") // ref :10-13
      ev.set("[event][dataset]", "layer7_soa_gw.traffic")
      Mutate.strip(ev, "message") // ref :16-18
      Grok(ev, "message", Seq(Registry.HeaderGrok), Seq("_parsefailure_header")) // ref :19-23
      SyslogPri(ev, removeField = false) // ref :24-26 — pri kept for the string probes
      val am = ev.getString("actual_msg").getOrElse("")
      if (ev.getString("pri").exists(_.contains("14"))) { // ref :27
        if (am.contains("applicationId")) { // ref :28-39 — RULE 1
          ev.mergeInto("[agent][parse_rule]", "RULE 1")
          Dissect(ev, "actual_msg", head3 +
            "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[rule][description]]}: %{+[[rule][description]]}: %{+[[rule][description]]}: Connection:%{[[rule][ruleset]]}, Content-Length:%{[[file][size]]}, Content-Type:%{[[file][extension]]}; charset=utf-8, Date:%{[[event][created]]}, %{+[[event][created]]} %{+[[event][created]]} %{+[[event][created]]} %{+[[event][created]]} %{[[time][zone]]}, Server:%{server}, X-Powered-By:%{[[process][name]]} %{+[[process][name]]}  REQUEST BODY: %{?[[request][body]]} <applicationId>%{?[[application][id]]}</a%{?data} <status>%{[[event][action]]}</s%{?data} <serviceId>%{[[service][id]]}</%{?data} <issuerId>%{?[[issuer][id]]}</%{?data} <issueDate>%{?[[issue][date]]}</%{?data} <rcvDate>%{?[[receive][date]]}</rcvDate> %{msg}")
        } else {
          if (am.contains(", , 200")) { // ref :41-46 — RULE 2 drop
            ev.set("[agent][parse_rule]", "RULE 2 (dropped)")
            return Dropped
          }
          if (am.contains(" Message processed successfully")) { // ref :47-56 — RULE 3
            ev.mergeInto("[agent][parse_rule]", "RULE 3")
            Dissect(ev, "actual_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[rule][description]]}")
          } else if (am.contains("#####Client SSL Protocol")) { // ref :57-66 — RULE 4
            ev.mergeInto("[agent][parse_rule]", "RULE 4")
            Dissect(ev, "actual_msg", head3 +
              "%{[event][severity_name]} %{[[system][properties]]}: %{[[rule][description]]} - %{+[[rule][description]]} - %{[[network][protocol]]}_%{?[[key][exchange]]}_WITH_%{[[symmetric][encryption]]}_%{+[[symmetric][encryption]]}_%{+[[symmetric][encryption]]}_%{?sha}")
          } else if (am.contains("service: A00")) { // ref :67-76 — RULE 5
            ev.mergeInto("[agent][parse_rule]", "RULE 5")
            Dissect(ev, "actual_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][message]]}: %{+[[system][message]]}: %{[[rule][description]]}")
          } else if (am.contains("Requestor address")) { // ref :77-86 — RULE 6
            ev.mergeInto("[agent][parse_rule]", "RULE 6")
            Dissect(ev, "actual_msg", head3 +
              "%{[event][severity_name]} %{[[system][properties]]}: %{[[source][port]]}: Requestor address %{[[source][address]]} %{[[event][action]]}")
          } else if (am.contains("IntegrationId") && am.contains("URL:") &&
            am.contains("authorization:") && am.contains("host:")) { // ref :87-117 — RULE 7 (rest_msg!)
            ev.mergeInto("[agent][parse_rule]", "RULE 7")
            Dissect(ev, "rest_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[msg][del]]} IntegrationId: %{[[process][pid]]} %{?[[original][request]]} URL: %{[[url][path]]} %{[[msg][del]]} (Verb): %{[[http][request][method]]} %{[[msg][del]]} authorization:%{authorization} %{[[msg][del]]} host:%{[[host][hostname]]}:%{chk_data}")
            if (ev.getString("chk_data").exists(_.contains(","))) {
              ev.mergeInto("[agent][parse_rule]", "RULE 7 (a)")
              Dissect(ev, "chk_data", "%{[[source][port]]}, %{[[rule][description]]}")
            } else {
              ev.mergeInto("[agent][parse_rule]", "RULE 7 (b)")
              Dissect(ev, "chk_data", "%{[[source][port]]} %{[[rule][description]]}")
            }
          } else if (am.contains("IntegrationId") && am.contains("URL:") &&
            am.contains("authorization:")) { // ref :118-128 — RULE 8 (rest_msg)
            ev.mergeInto("[agent][parse_rule]", "RULE 8")
            Dissect(ev, "rest_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[msg][del]]} IntegrationId: %{[[process][pid]]} %{?[[original][request]]} URL: %{[[url][path]]} %{[[msg][del]]} (Verb): %{[[http][request][method]]} %{[[msg][del]]} authorization:%{authorization}")
          } else if (am.contains("IntegrationId") && am.contains("URL:") && am.contains("(Verb):")) { // ref :129-139
            ev.mergeInto("[agent][parse_rule]", "RULE 9")
            Dissect(ev, "rest_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[msg][del]]} IntegrationId: %{[[process][pid]]} %{?[[original][request]]} URL: %{[[url][path]]} %{[[msg][del]]} (Verb): %{[[http][request][method]]}")
          } else if (am.contains("IntegrationId") && am.contains("URL:") && am.contains("Original Request Query:")) {
            ev.mergeInto("[agent][parse_rule]", "RULE 9(a)") // ref :140-150
            Dissect(ev, "rest_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[msg][del]]} IntegrationId: %{[[process][pid]]} %{?[[original][request]]} URL: %{[[url][path]]} Original Request Query: %{[[url][query]]}")
          } else if (am.contains("IntegrationId") && am.contains("URL:")) { // ref :151-161
            ev.mergeInto("[agent][parse_rule]", "RULE 9(b)")
            Dissect(ev, "rest_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[msg][del]]} IntegrationId: %{[[process][pid]]} %{?[[original][request]]} URL: %{[[url][path]]}")
          } else if (am.contains("IntegrationId:")) { // ref :162-172
            ev.mergeInto("[agent][parse_rule]", "RULE 10")
            Dissect(ev, "rest_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[msg][del]]} IntegrationId: %{[[process][pid]]} %{[[rule][description]]}")
          } else if (am.contains("parsedIntUrl:")) { // ref :173-186
            ev.mergeInto("[agent][parse_rule]", "RULE 11")
            Mutate.gsub(ev, "rest_msg", "   ", " ")
            Dissect(ev, "rest_msg", head3 +
              "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[msg][del]]} parsedIntUrl: %{[[url][full]]}")
          }
        }
      } else { // ref :189-208 — RULE 12 (rest_msg: always fails)
        ev.mergeInto("[agent][parse_rule]", "RULE 12")
        Dissect(ev, "rest_msg", head3 +
          "%{[[event][severity_name]]} %{[[system][properties]]}: %{[[event][action]]}")
        if (ev.getString("pri").contains("12") && am.contains("Error")) {
          ev.mergeInto("[agent][parse_rule]", "RULE 13")
          Mutate.update(ev, "[event][severity_name]", "Error")
        }
      }
      if (Dates(ev, "[event][created]", Seq("MMM dd HH:mm:ss", "MMM dd HH:mm:ss.SSS"),
        "[event][created_ms]", timezone = "GMT", locale = "en", defaultYear = ctx.tsYear))
        ev.remove("[event][created]") // ref :209-214 (RULE 1's header date never parses)
      if (Dates(ev, "[event][start]", Seq("MMM dd HH:mm:ss", "MMM dd HH:mm:ss.SSS"),
        "[event][start_ms]", timezone = "GMT", locale = "en", defaultYear = ctx.tsYear))
        ev.remove("[event][start]") // ref :215-220
      Seq("msg", "[log][date]", "[time][zone]", "actual_msg", "[sytem][properties]",
        "server", "authorization", "chk_data", "[msg][del]", "pri").foreach(ev.remove) // ref :221-223
      ev.getString("[event][severity_name]").foreach { s => // ref :225-234
        ev.set("[rule][category]", Map("WARNING" -> "Ops Warning",
          "INFO" -> "Ops Information", "Error" -> "Ops Error").getOrElse(s, "Others"))
      }
    }
    Parsed(Seq(ev))
  }
}
