package graft.model

import java.sql.Timestamp

/** The input row — exactly the BASELINE.json input_hint shape. */
final case class Turn(
  conv_id: String,
  turn_idx: Int,
  role: String,
  text: String,
  tool: String,
  ts: Timestamp)

/** The fixed wide output schema ("ECS-lite", SURVEY.md §1.4): the union of
  * fields the ported processors emit, flattened to snake_case columns so the
  * inter-stage representation is columnar and Tungsten-friendly. Nested ECS
  * paths exist only inside the transient Event within one mapPartitions.
  *
  * Timestamps derived by parsing are carried as epoch millis (Long) to keep
  * cross-engine comparisons exact; multi-valued fields are arrays (scalar
  * inputs become 1-element arrays — SURVEY.md §1.4 duality rule).
  */
final case class ParsedTurn(
  conv_id: String,
  turn_idx: Int,
  sub_idx: Int, // >0 only for envelope-split rows (azure records[])
  role: String,
  tool: String,
  ts: Timestamp,
  text: String, // input text, carried through UNTOUCHED (north-rule invariant)
  technology: String,
  parse_rule: String,
  parse_ok: Boolean,
  tags: Seq[String],
  route_index: String,
  route_outputs: Seq[String],
  message: Option[String], // working copy (post gsub/json_encode)
  log_original: Option[String],
  event_module: Option[String],
  event_dataset: Option[String],
  event_kind: Option[String],
  event_category: Option[String],
  event_type: Option[String],
  event_action: Option[String],
  event_outcome: Option[String],
  event_provider: Option[String],
  event_severity: Option[Long],
  event_created_ms: Option[Long],
  event_end_ms: Option[Long],
  event_hash: Option[String],
  source_ip: Option[String],
  source_address: Option[String],
  source_port: Option[Long],
  source_mac: Option[String],
  source_ip_private: Option[Boolean],
  source_geo_country: Option[String],
  source_geo_city: Option[String],
  destination_ip: Option[String],
  destination_port: Option[Long],
  destination_ip_private: Option[Boolean],
  destination_geo_country: Option[String],
  destination_geo_city: Option[String],
  destination_domain: Option[String],
  network_transport: Option[String],
  network_protocol: Option[String],
  network_iana_number: Option[String],
  network_bytes: Option[Long],
  network_packets: Option[Long],
  log_syslog_facility_code: Option[Long],
  log_syslog_facility_name: Option[String],
  log_syslog_severity_code: Option[Long],
  log_syslog_severity_name: Option[String],
  log_source_hostname: Option[String],
  rule_name: Option[String],
  rule_description: Option[String],
  rule_category: Option[String],
  rule_version: Option[String],
  host_name: Option[String],
  host_id: Option[String],
  user_name: Option[String],
  user_email: Option[String],
  user_full_name: Option[String],
  url_original: Option[String],
  url_domain: Option[String],
  url_path: Option[String],
  url_query: Option[String],
  url_tld: Option[String],
  url_registered_domain: Option[String],
  service_name: Option[String],
  service_version: Option[String],
  cloud_provider: Option[String],
  cloud_account_id: Option[String],
  observer_vendor: Option[String],
  observer_product: Option[String],
  observer_egress_interface_id: Option[String],
  error_code: Option[String],
  threat_tactic_name: Option[String],
  threat_tactic_reference: Option[String],
  process_pid: Option[Long],
  source_nat_ip: Option[String],
  http_request_method: Option[String],
  source_bytes: Option[Long],
  destination_bytes: Option[Long],
  host_ip: Option[String],
  event_id_s: Option[String],
  user_agent_original: Option[String],
  browser_name: Option[String],
  browser_version: Option[String],
  ua_device_name: Option[String],
  ua_os_family: Option[String],
  ua_os_platform: Option[String],
  ua_os_version: Option[String],
  related_ip: Seq[String],
  related_user: Seq[String])
