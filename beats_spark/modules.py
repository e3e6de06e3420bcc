"""Filebeat module pipelines re-expressed as DataFrame programs.

The reference ships per-service ingest pipelines (grok bank + rename/convert/
date/set steps) that Elasticsearch executes; Beats only ships the YAML
(e.g. /root/reference/filebeat/module/apache/access/ingest/pipeline.yml,
apache/error/ingest/pipeline.yml, system/syslog/ingest/files.yml,
nginx/access/ingest/pipeline.yml). Each function below is the Spark
restatement of one such pipeline: the grok patterns are carried VERBATIM
(modulo the `_tmp.url_orig` staging field, folded straight into
`url.original`), post-steps (`set event.outcome`, `uri_parts`, source
ip/domain split, `date`) become Column expressions, and the output is one
struct column `parsed` (ECS dot-paths as underscore field names) plus
top-level convenience columns.

Parity is pinned by tests/test_modules.py against the reference's own golden
files (filebeat/module/*/test/*.log-expected.json) for every field this
restatement emits.

Scale shape: the grok bank is one vectorized pandas UDF (the module regexes
are unanchored, so the bank runs the sequential first-match-wins path);
every post-step is a pure Column expression fused by codegen. No joins, no
shuffles — a module pipeline is a projection, embarrassingly parallel over
any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.grok import BUILTIN_PATTERNS
from beats_spark.operators import parse as P

# -- apache.access (pipeline.yml:10-28) --------------------------------------

APACHE_ACCESS_PATTERNS = [
    r'%{IPORHOST:destination.domain} %{IPORHOST:source.ip} - %{DATA:user.name} '
    r'\[%{HTTPDATE:apache.access.time}\] "(?:%{WORD:http.request.method} '
    r'%{DATA:url.original} HTTP/%{NUMBER:http.version}|-)?" '
    r'%{NUMBER:http.response.status_code:long} '
    r'(?:%{NUMBER:http.response.body.bytes:long}|-)'
    r'( "%{DATA:http.request.referrer}")?( "%{DATA:user_agent.original}")?',
    r'%{IPORHOST:source.address} - %{DATA:user.name} '
    r'\[%{HTTPDATE:apache.access.time}\] "(?:%{WORD:http.request.method} '
    r'%{DATA:url.original} HTTP/%{NUMBER:http.version}|-)?" '
    r'%{NUMBER:http.response.status_code:long} '
    r'(?:%{NUMBER:http.response.body.bytes:long}|-)'
    r'( "%{DATA:http.request.referrer}")?( "%{DATA:user_agent.original}")?',
    r'%{IPORHOST:source.address} - %{DATA:user.name} '
    r'\[%{HTTPDATE:apache.access.time}\] "-" '
    r'%{NUMBER:http.response.status_code:long} -',
    r'\[%{HTTPDATE:apache.access.time}\] %{IPORHOST:source.address} '
    r'%{DATA:apache.access.ssl.protocol} %{DATA:apache.access.ssl.cipher} '
    r'"%{WORD:http.request.method} %{DATA:url.original} '
    r'HTTP/%{NUMBER:http.version}" (?:-|%{NUMBER:http.response.body.bytes:long})',
]

_IP_RE = f"^(?:{BUILTIN_PATTERNS['IPV6']}|{BUILTIN_PATTERNS['IPV4']})$"


def apache_access(df: DataFrame, field: str = "message",
                  timezone: str | None = None) -> DataFrame:
    """apache/access/ingest/pipeline.yml as a DataFrame program."""
    out = P.grok(df, APACHE_ACCESS_PATTERNS, field=field,
                 target_prefix="parsed")
    p = F.col("parsed")
    status = p["http_response_status_code"]
    # set event.outcome by status class (pipeline.yml:39-47)
    out = out.withColumn(
        "event_outcome",
        F.when(status.isNull(), None)
        .when(status < 400, "success")
        .otherwise("failure"),
    )
    # uri_parts-lite: url.original → url.path / url.query (path is
    # percent-DECODED in the reference's uri_parts output)
    url = p["url_original"]
    raw_path = F.split(url, r"\?").getItem(0)
    out = out.withColumn(
        "url_path", F.coalesce(F.try_url_decode(raw_path), raw_path)
    )
    out = out.withColumn(
        "url_query",
        F.when(url.contains("?"), F.regexp_replace(url, r"^[^?]*\?", "")),
    )
    # source.address → source.ip | source.domain (the second grok stage)
    addr = F.coalesce(p["source_address"], p["source_ip"])
    out = out.withColumn("source_address", addr)
    out = out.withColumn("source_ip", F.when(addr.rlike(_IP_RE), addr))
    out = out.withColumn("source_domain", F.when(~addr.rlike(_IP_RE), addr))
    # date: HTTPDATE carries its own zone (dd/MMM/yyyy:HH:mm:ss Z)
    out = out.withColumn("_t", p["apache_access_time"])
    out = P.timestamp(out, "_t", ["02/Jan/2006:15:04:05 -0700"],
                      target="timestamp", timezone=timezone)
    return out.drop("_t")


# -- apache.error (pipeline.yml:9-27) ----------------------------------------

APACHE_ERROR_PATTERNS = [
    r"\[%{APACHE_TIME:apache.error.timestamp}\] \[%{LOGLEVEL:log.level}\]"
    r"( \[client %{IPORHOST:source.address}(:%{POSINT:source.port:int})?\])? "
    r"%{GREEDYDATA:message}",
    r"\[%{APACHE_TIME:apache.error.timestamp}\] "
    r"\[%{DATA:apache.error.module}:%{APACHE_LOGLEVEL:log.level}\] "
    r"\[pid %{NUMBER:process.pid:long}(:tid %{NUMBER:process.thread.id:long})?\]"
    r"( \[client %{IPORHOST:source.address}(:%{POSINT:source.port:int})?\])? "
    r"%{GREEDYDATA:message}",
]

APACHE_ERROR_DEFINITIONS = {
    # Apache log level can have numeric sub-levels such as trace1
    "APACHE_LOGLEVEL": r"%{LOGLEVEL}[0-9]*",
    "APACHE_TIME": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
}


def apache_error(df: DataFrame, field: str = "message",
                 timezone: str | None = None) -> DataFrame:
    """apache/error/ingest/pipeline.yml: two-pattern bank with module-local
    pattern_definitions, second grok over message for file.path, naive
    timestamp interpreted in the event timezone."""
    out = P.grok(df, APACHE_ERROR_PATTERNS, field=field,
                 target_prefix="parsed",
                 pattern_definitions=APACHE_ERROR_DEFINITIONS)
    p = F.col("parsed")
    out = out.withColumn(
        "file_path",
        F.regexp_extract(p["message"], r"File does not exist: (\S+?)(?:,|$)", 1),
    )
    out = out.withColumn(
        "file_path", F.when(F.col("file_path") != "", F.col("file_path"))
    )
    addr = p["source_address"]
    out = out.withColumn("source_ip", F.when(addr.rlike(_IP_RE), addr))
    # Spark's parser rejects day-of-week fields (EEE), so strip the leading
    # day name the reference's `EEE MMM dd H:m:s yyyy` format consumes
    out = out.withColumn(
        "_t", F.regexp_replace(p["apache_error_timestamp"], r"^[A-Za-z]+ ", "")
    )
    out = P.timestamp(
        out, "_t",
        ["Jan _2 15:04:05 2006", "Jan _2 15:04:05.999999 2006"],
        target="timestamp", timezone=timezone,
    )
    return out.drop("_t")


# -- system.syslog (files.yml:6-23) ------------------------------------------

SYSLOG_PATTERNS = [
    r"%{SYSLOGTIMESTAMP:system.syslog.timestamp} %{SYSLOGHOST:host.hostname} "
    r"%{DATA:process.name}(?:\[%{POSINT:process.pid:long}\])?: "
    r"%{GREEDYMULTILINE:system.syslog.message}",
    r"%{SYSLOGTIMESTAMP:system.syslog.timestamp} "
    r"%{GREEDYMULTILINE:system.syslog.message}",
    r"%{TIMESTAMP_ISO8601:system.syslog.timestamp} %{SYSLOGHOST:host.hostname} "
    r"%{DATA:process.name}(?:\[%{POSINT:process.pid:long}\])?: "
    r"%{GREEDYMULTILINE:system.syslog.message}",
]


def system_syslog(df: DataFrame, field: str = "message") -> DataFrame:
    """system/syslog/ingest/files.yml: grok bank + message rename. The
    timestamp has no year, so @timestamp parity is not asserted (the
    reference pipeline resolves the year ingest-side)."""
    out = P.grok(df, SYSLOG_PATTERNS, field=field, target_prefix="parsed")
    p = F.col("parsed")
    # remove message; rename system.syslog.message → message
    out = out.withColumn("message_out", p["system_syslog_message"])
    out = out.withColumn("host_hostname", p["host_hostname"])
    out = out.withColumn("process_name", p["process_name"])
    out = out.withColumn("process_pid", p["process_pid"])
    return out


# -- nginx.access (pipeline.yml:10-27) ---------------------------------------

NGINX_ACCESS_PATTERNS = [
    r'(%{NGINX_HOST} )?"?(?:%{NGINX_ADDRESS_LIST:nginx.access.remote_ip_list}'
    r"|%{NOTSPACE:source.address}) - (-|%{DATA:user.name}) "
    r"\[%{HTTPDATE:nginx.access.time}\] \"%{DATA:nginx.access.info}\" "
    r"%{NUMBER:http.response.status_code:long} "
    r"%{NUMBER:http.response.body.bytes:long} "
    r'"(-|%{DATA:http.request.referrer})" "(-|%{DATA:user_agent.original})"',
]

NGINX_ACCESS_DEFINITIONS = {
    "NGINX_HOST":
        r"(?:%{IP:destination.ip}|%{NGINX_NOTSEPARATOR:destination.domain})"
        r"(:%{NUMBER:destination.port})?",
    "NGINX_NOTSEPARATOR": r"[^\t ,:]+",
    "NGINX_ADDRESS_LIST": r'(?:%{IP}|%{WORD})("?,?\s*(?:%{IP}|%{WORD}))*',
}


def nginx_access(df: DataFrame, field: str = "message",
                 timezone: str | None = None) -> DataFrame:
    """nginx/access/ingest/pipeline.yml: main grok + the nested
    `nginx.access.info` grok for method/url/version + remote-ip-list split
    (first address = source.address when the list form matched)."""
    out = P.grok(df, NGINX_ACCESS_PATTERNS, field=field,
                 target_prefix="parsed",
                 pattern_definitions=NGINX_ACCESS_DEFINITIONS)
    p = F.col("parsed")
    info = p["nginx_access_info"]
    out = out.withColumn(
        "http_request_method", F.regexp_extract(info, r"^(\S+) ", 1)
    )
    out = out.withColumn(
        "http_request_method",
        F.when(F.col("http_request_method") != "", F.col("http_request_method")),
    )
    out = out.withColumn(
        "url_original", F.when(
            info.rlike(r"^\S+ \S+ HTTP/"), F.regexp_extract(info, r"^\S+ (\S+) ", 1)
        )
    )
    out = out.withColumn(
        "http_version", F.when(
            info.contains(" HTTP/"), F.regexp_extract(info, r" HTTP/(\S+)$", 1)
        )
    )
    # split: remote_ip_list → array; source.address = first NON-PRIVATE
    # address, else the first entry (the pipeline's painless script,
    # pipeline.yml:52-95, as a pure array expression)
    ip_list = F.split(
        F.regexp_replace(p["nginx_access_remote_ip_list"], '"', ""), r",?\s+"
    )
    out = out.withColumn(
        "remote_ip_list",
        F.when(p["nginx_access_remote_ip_list"].isNotNull(), ip_list),
    )

    def _is_private(x):
        o = F.split(x, r"\.")
        f1 = F.get(o, 0).try_cast("int")
        f2 = F.get(o, 1).try_cast("int")
        return F.coalesce(
            (f1 == 10) | (f1 == 127) | ((f1 == 192) & (f2 == 168))
            | ((f1 == 172) & f2.between(16, 31)),
            F.lit(False),
        )

    public_ips = F.filter(ip_list, lambda x: ~_is_private(x))
    addr = F.coalesce(
        F.get(public_ips, 0), F.get(ip_list, 0), p["source_address"]
    )
    out = out.withColumn("source_address", addr)
    out = out.withColumn("source_ip", F.when(addr.rlike(_IP_RE), addr))
    out = out.withColumn("_t", p["nginx_access_time"])
    out = P.timestamp(out, "_t", ["02/Jan/2006:15:04:05 -0700"],
                      target="timestamp", timezone=timezone)
    return out.drop("_t")


MODULES = {
    "apache.access": apache_access,
    "apache.error": apache_error,
    "system.syslog": system_syslog,
    "nginx.access": nginx_access,
}


# -- osquery.result (ingest/pipeline.json) -----------------------------------

OSQUERY_SCHEMA = (
    "struct<name:string, hostIdentifier:string, calendarTime:string,"
    " unixTime:string, epoch:string, counter:string, action:string,"
    " decorations:map<string,string>, columns:map<string,string>>"
)


def osquery_result(df: DataFrame, field: str = "message") -> DataFrame:
    """osquery/result/ingest/pipeline.json: ndjson decode → osquery.result
    (camelCase renames), @timestamp from unixTime, event.action mirror,
    file.path/type + host identity pulled from the dynamic columns map.
    Everything is from_json + Column expressions — fully JVM, no UDF."""
    out = df.withColumn("result", F.from_json(F.col(field), OSQUERY_SCHEMA))
    r = F.col("result")
    out = (
        out.withColumn("host_identifier", r["hostIdentifier"])
        .withColumn("unix_time", r["unixTime"].try_cast("long"))
        .withColumn("calendar_time", r["calendarTime"])
        .withColumn("event_action", r["action"])
        .withColumn("timestamp", F.timestamp_seconds(r["unixTime"].try_cast("long")))
        .withColumn("file_path", F.element_at(r["columns"], "path"))
        .withColumn("file_type", F.element_at(r["columns"], "type"))
        .withColumn("host_hostname", r["hostIdentifier"])
        .withColumn("host_id", F.element_at(r["decorations"], "host_uuid"))
    )
    return out


MODULES["osquery.result"] = osquery_result
