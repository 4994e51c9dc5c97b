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
  *
  * Nullable fields use `null`-able types (String / boxed java.lang numerics)
  * rather than Option: the encoder emits the same nullable columns either
  * way, and dropping ~75 Option wrappers per row measurably reduces the
  * allocation pressure of the serialization boundary at high thread counts.
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
  message: String, // working copy (post gsub/json_encode)
  log_original: String,
  event_module: String,
  event_dataset: String,
  event_kind: String,
  event_category: String,
  event_type: String,
  event_action: String,
  event_outcome: String,
  event_provider: String,
  event_severity: java.lang.Long,
  event_created_ms: java.lang.Long,
  event_end_ms: java.lang.Long,
  event_hash: String,
  source_ip: String,
  source_address: String,
  source_port: java.lang.Long,
  source_mac: String,
  source_ip_private: java.lang.Boolean,
  source_geo_country: String,
  source_geo_city: String,
  destination_ip: String,
  destination_port: java.lang.Long,
  destination_ip_private: java.lang.Boolean,
  destination_geo_country: String,
  destination_geo_city: String,
  destination_domain: String,
  network_transport: String,
  network_protocol: String,
  network_iana_number: String,
  network_bytes: java.lang.Long,
  network_packets: java.lang.Long,
  log_syslog_facility_code: java.lang.Long,
  log_syslog_facility_name: String,
  log_syslog_severity_code: java.lang.Long,
  log_syslog_severity_name: String,
  log_source_hostname: String,
  rule_name: String,
  rule_description: String,
  rule_category: String,
  rule_version: String,
  rule_ruleset: String,
  host_name: String,
  host_id: String,
  user_name: String,
  user_email: String,
  user_full_name: String,
  url_original: String,
  url_domain: String,
  url_path: String,
  url_query: String,
  url_tld: String,
  url_registered_domain: String,
  service_name: String,
  service_version: String,
  cloud_provider: String,
  cloud_account_id: String,
  observer_vendor: String,
  observer_product: String,
  observer_egress_interface_id: String,
  error_code: String,
  threat_tactic_name: String,
  threat_tactic_reference: String,
  process_pid: java.lang.Long,
  source_nat_ip: String,
  http_request_method: String,
  source_bytes: java.lang.Long,
  destination_bytes: java.lang.Long,
  host_ip: String,
  event_id_s: String,
  user_agent_original: String,
  browser_name: String,
  browser_version: String,
  ua_device_name: String,
  ua_os_family: String,
  ua_os_platform: String,
  ua_os_version: String,
  related_ip: Seq[String],
  related_hosts: Seq[String],
  related_user: Seq[String],
  // --- appended in round 2 for the cisco.switch / okta / aws.cloudtrail
  // technologies and the 14/16/18 related.*/host-split enrichments ---
  host_hostname: String,
  host_domain: String,
  event_reason: String,
  event_recommendation: String,
  event_start_ms: java.lang.Long,
  observer_ingress_interface_name: String,
  log_level: String,
  source_domain: String,
  ua_os_name: String,
  user_id: String,
  user_roles: String,
  user_type: String,
  destination_user_id: String,
  destination_user_email: String,
  destination_user_full_name: String,
  transaction_id: String,
  cloud_region: String,
  file_directory: String,
  file_name: String,
  service_type: String,
  error_message: String,
  threat_indicator_ip: String,
  threat_indicator_provider: String,
  related_mac: Seq[String],
  related_hash: Seq[String],
  destination_address: String)
