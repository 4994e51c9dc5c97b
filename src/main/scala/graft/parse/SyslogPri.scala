package graft.parse

import graft.model.Event

/** Syslog PRI decode: facility = pri >> 3, severity = pri & 7, plus label
  * lookup — semantics of the `syslog_pri` filter (used 59×,
  * ref: config/processors/syslog_security_palo.alto.fw.conf:18-21) followed by
  * the ECS renames of config/enrichments/04_syslog_pri_ecs.conf:11-30.
  * Labels are the Logstash plugin defaults (public plugin documentation).
  */
object SyslogPri {
  val FacilityLabels: Array[String] = Array(
    "kernel", "user-level", "mail", "daemon", "security/authorization",
    "syslogd", "line printer", "network news", "uucp", "clock",
    "security/authorization", "ftp", "ntp", "log audit", "log alert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7")

  val SeverityLabels: Array[String] = Array(
    "Emergency", "Alert", "Critical", "Error", "Warning", "Notice",
    "Informational", "Debug")

  /** Decode `pri` from `field`, write the 4 syslog_* fields, remove the source
    * field (the ported configs all pass `remove_field => ["pri"]`). */
  def apply(ev: Event, field: String = "pri", removeField: Boolean = true): Unit = {
    val pri = ev.getString(field).flatMap(s => s.toLongOption).getOrElse(13L) // logstash default pri=13
    val fac = (pri >> 3).toInt
    val sev = (pri & 7L).toInt
    ev.set("syslog_facility_code", fac.toLong)
    ev.set("syslog_severity_code", sev.toLong)
    ev.set("syslog_facility", if (fac < FacilityLabels.length) FacilityLabels(fac) else fac.toString)
    ev.set("syslog_severity", SeverityLabels(sev))
    if (removeField) ev.remove(field)
  }

  /** 04_syslog_pri_ecs.conf: rename the flat syslog_* fields to ECS paths. */
  def toEcs(ev: Event): Unit = {
    ev.rename("syslog_severity_code", "[log][syslog][severity][code]")
    ev.rename("syslog_facility", "[log][syslog][facility][name]")
    ev.rename("syslog_severity", "[log][syslog][severity][name]")
    ev.rename("syslog_facility_code", "[log][syslog][facility][code]")
  }
}
