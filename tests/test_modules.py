"""Golden-file parity for the module pipelines (beats_spark/modules.py)
against the reference's own expected outputs
(/root/reference/filebeat/module/*/test/*.log-expected.json).

Every field the Spark restatement emits is asserted equal to the golden
value for every line of every golden file listed. Fields the reference adds
outside the parsed pipeline (geoip, user_agent parsing, event.ingested,
related.*) are out of scope and not emitted, hence not compared.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

import re

from beats_spark.modules import (
    apache_access,
    apache_error,
    kafka_log,
    mysql_error,
    nginx_access,
    postgresql_log,
    redis_log,
    system_syslog,
)

REF = "/root/reference/filebeat/module"


def _load_golden(module: str, fileset: str, log: str):
    d = f"{REF}/{module}/{fileset}/test"
    with open(f"{d}/{log}") as f:
        text = f.read()
    with open(f"{d}/{log}-expected.json") as f:
        golden = json.load(f)
    lines = text.splitlines()
    # golden entries are not file-ordered; log.offset recovers line order
    golden = sorted(golden, key=lambda e: e.get("log.offset", 0))
    return lines, golden


def _join_multiline(lines: list[str]) -> list[str]:
    """system/syslog config: multiline pattern '^\\s' match=after."""
    out: list[str] = []
    for ln in lines:
        if out and (ln[:1].isspace() if ln else True):
            out[-1] += "\n" + ln
        else:
            out.append(ln)
    return out


def _instant(s: str) -> float:
    return datetime.datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp()


def _run(spark, fn, lines: list[str], **kw):
    df = spark.createDataFrame(
        list(enumerate(lines)), "idx long, message string"
    )
    rows = fn(df, **kw).orderBy("idx").collect()
    return [r.asDict(recursive=True) for r in rows]


def _get(row: dict, path: str):
    """Resolve a golden dotted key against the module output row: the parsed
    struct first (so golden 'message' hits the grok'd field, not the raw
    input column), then top-level convenience columns."""
    safe = path.replace(".", "_").replace("@", "")
    parsed = row.get("parsed") or {}
    if parsed.get(safe) is not None:
        return parsed[safe]
    return row.get(safe)


def _check(rows, golden, fields, ts_field="@timestamp"):
    # the reference test harness truncates some goldens (first N events)
    assert len(rows) >= len(golden), f"{len(rows)} rows vs {len(golden)} golden"
    rows = rows[: len(golden)]
    mismatches = []
    for i, (row, exp) in enumerate(zip(rows, golden)):
        if any(k.startswith("error.") for k in exp):
            continue  # reference recorded a pipeline failure for this line
        for fld in fields:
            if fld not in exp:
                # golden omits unset fields; require we emit null/absent too
                got = _get(row, fld)
                if got not in (None, "-"):
                    mismatches.append((i, fld, "<absent>", got))
                continue
            got = _get(row, fld)
            want = exp[fld]
            if isinstance(want, list) and isinstance(got, list):
                # the reference test harness stores appended arrays sorted
                got, want = sorted(got), sorted(want)
            elif isinstance(want, list) and not isinstance(got, list):
                # duplicate-semantic grok captures: ES emits an array, our
                # coalesce keeps the first — equal when the array is uniform
                if {str(w) for w in want} == {str(got)}:
                    continue
            elif isinstance(want, float) and isinstance(got, float):
                # ES serializes 32-bit floats at shortest repr; compare
                # numerically, not textually
                if got == want or abs(got - want) <= 1e-6 * max(abs(want), 1e-9):
                    continue
            elif (
                got is not None
                and type(want) is not type(got)
                and not isinstance(want, (list, dict))
            ):
                # same semantic captured typed in one branch and untyped in
                # another (e.g. Id:long vs Thread_id:string) — ES keeps the
                # per-branch type, our bank uses the first declared one
                if str(want) == str(got):
                    continue
            if got != want:
                mismatches.append((i, fld, exp[fld], got))
        if ts_field and ts_field in exp and row.get("timestamp") is not None:
            want = _instant(exp[ts_field])
            got_ts = row["timestamp"].replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
            if abs(got_ts - want) > 0.5:
                mismatches.append((i, ts_field, exp[ts_field], row["timestamp"]))
    assert not mismatches, mismatches[:8]


APACHE_ACCESS_FIELDS = [
    "http.request.method", "http.version", "http.response.status_code",
    "http.response.body.bytes", "user.name", "url.original", "url.path",
    "source.address", "source.ip", "source.domain", "event.outcome",
    "http.request.referrer", "user_agent.original",
]


@pytest.mark.parametrize("log", [
    "test.log", "darwin-2.4.23.log", "ubuntu-2.2.22.log", "ssl-request.log",
])
def test_apache_access_golden(spark, log):
    lines, golden = _load_golden("apache", "access", log)
    rows = _run(spark, apache_access, lines)
    _check(rows, golden, APACHE_ACCESS_FIELDS)


APACHE_ERROR_FIELDS = [
    "log.level", "message", "process.pid", "process.thread.id",
    "source.address", "source.ip", "file.path", "apache.error.module",
]


@pytest.mark.parametrize("log", [
    "test.log", "darwin-2.4.23.log", "ubuntu-2.2.22.log", "sublevel.log",
])
def test_apache_error_golden(spark, log):
    lines, golden = _load_golden("apache", "error", log)
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, apache_error, lines, timezone=tz)
    _check(rows, golden, APACHE_ERROR_FIELDS)


SYSLOG_FIELDS = ["host.hostname", "process.name", "process.pid"]


@pytest.mark.parametrize("log", [
    "darwin-syslog.log", "darwin-syslog-sample.log", "suse-syslog.log",
])
def test_system_syslog_golden(spark, log):
    lines, golden = _load_golden("system", "syslog", log)
    joined = _join_multiline(lines)
    rows = _run(spark, system_syslog, joined)
    _check(rows, golden, SYSLOG_FIELDS, ts_field=None)
    # message rename parity
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"]


NGINX_FIELDS = [
    "http.request.method", "http.version", "http.response.status_code",
    "http.response.body.bytes", "user.name", "url.original",
    "source.address", "source.ip", "http.request.referrer",
    "user_agent.original",
]


@pytest.mark.parametrize("log", ["test.log", "access.log", "test-with-host.log"])
def test_nginx_access_golden(spark, log):
    lines, golden = _load_golden("nginx", "access", log)
    rows = _run(spark, nginx_access, lines)
    _check(rows, golden, NGINX_FIELDS)


def test_osquery_result_golden(spark):
    from beats_spark.modules import osquery_result

    lines, golden = _load_golden("osquery", "result", "test.log")
    rows = _run(spark, osquery_result, lines)
    assert len(rows) >= len(golden)
    for row, exp in zip(rows, golden):
        res = row["result"]
        assert row["host_hostname"] == exp.get("host.hostname")
        assert row["host_id"] == exp.get("host.id")
        assert row["event_action"] == exp.get("event.action")
        assert row["file_path"] == exp.get("file.path")
        assert row["file_type"] == exp.get("file.type")
        assert res["name"] == exp.get("osquery.result.name")
        assert row["calendar_time"] == exp.get("osquery.result.calendar_time")
        # dynamic columns map parity: every golden columns.* entry present
        for k, v in exp.items():
            if k.startswith("osquery.result.columns."):
                assert res["columns"][k.rsplit(".", 1)[1]] == v, k
        if "@timestamp" in exp and row["timestamp"] is not None:
            want = _instant(exp["@timestamp"])
            got = row["timestamp"].replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
            assert abs(got - want) < 0.5


def _join_negate(lines: list[str], pattern: str) -> list[str]:
    """multiline config: negate=true match=after — lines NOT matching the
    pattern continue the previous event."""
    rx = re.compile(pattern)
    out: list[str] = []
    for ln in lines:
        if out and not rx.search(ln):
            out[-1] += "\n" + ln
        else:
            out.append(ln)
    return out


REDIS_FIELDS = ["log.level", "process.pid", "redis.log.role", "message"]


@pytest.mark.parametrize("log", ["redis-5.0.3.log", "redis-darwin-3.0.2.log"])
def test_redis_log_golden(spark, log):
    lines, golden = _load_golden("redis", "log", log)
    # config exclude_lines (ascii-art banner) + the input's empty-line drop
    lines = [
        ln for ln in lines
        if ln.strip() and not re.search(r"^\s+[\-`('.|_]", ln)
    ]
    rows = _run(spark, redis_log, lines)
    _check(rows, golden, REDIS_FIELDS, ts_field=None)
    if log == "redis-5.0.3.log":
        # golden omits @timestamp, so pin the year-full layout directly:
        # '26571:M 27 Dec 2018 11:19:18.874 *' — the Go layout's bare-'2'
        # (unpadded day) token must map to Java 'd', not a literal digit
        assert rows[0]["timestamp"] == datetime.datetime(
            2018, 12, 27, 11, 19, 18, 874000
        )
        assert all(r["timestamp"] is not None for r in rows)


MYSQL_ERROR_FIELDS = [
    "log.level", "mysql.thread_id", "message", "user.name", "source.ip",
    "event.outcome", "event.category", "event.type", "event.action",
    "related.ip", "related.user",
]


@pytest.mark.parametrize("log", ["error.log", "mariadb-10.4.8.log"])
def test_mysql_error_golden(spark, log):
    lines, golden = _load_golden("mysql", "error", log)
    joined = _join_negate(lines, r"^([0-9]{4}-[0-9]{2}-[0-9]{2}|[0-9]{6})")
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, mysql_error, joined, timezone=tz)
    _check(rows, golden, MYSQL_ERROR_FIELDS)


POSTGRESQL_FIELDS = [
    "log.level", "process.pid", "message", "postgresql.log.timestamp",
    "event.timezone",
]


@pytest.mark.parametrize("log", [
    "postgresql-10-default.log",
    "postgresql-9.6-multi-core.log",
])
def test_postgresql_log_golden(spark, log):
    lines, golden = _load_golden("postgresql", "log", log)
    joined = _join_negate(lines, r"^\d{4}-\d{2}-\d{2} ")
    rows = _run(spark, postgresql_log, joined)
    _check(rows, golden, POSTGRESQL_FIELDS)


KAFKA_FIELDS = [
    "log.level", "kafka.log.class", "kafka.log.component",
    "kafka.log.trace.class", "kafka.log.trace.message",
]


@pytest.mark.parametrize("log", [
    "controller.log", "server.log", "state-change.log",
    "controller-2.0.0.log", "server-2.0.0.log",
])
def test_kafka_log_golden(spark, log):
    lines, golden = _load_golden("kafka", "log", log)
    joined = _join_negate(lines, r"^\[")
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, kafka_log, joined, timezone=tz)
    _check(rows, golden, KAFKA_FIELDS)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp


@pytest.mark.parametrize("log", [
    "audit-rhel6.log", "audit-cent7-node.log", "audit-rhel7.log",
])
def test_auditd_log_golden(spark, log):
    from beats_spark.modules import auditd_log

    lines, golden = _load_golden("auditd", "log", log)
    rows = _run(spark, auditd_log, lines)
    assert len(rows) >= len(golden)
    mismatches = []
    for i, (row, exp) in enumerate(zip(rows, golden)):
        if any(k.startswith("error.") for k in exp):
            continue
        kvmap = row["auditd_log"] or {}
        parsed = row["parsed"] or {}
        for k, v in exp.items():
            if not k.startswith("auditd.log."):
                continue
            leaf = k[len("auditd.log."):]
            if leaf in ("kv", "sub_kv", "epoch"):
                continue
            got = kvmap.get(leaf, parsed.get(f"auditd_log_{leaf}"))
            if got is None:
                got = row.get(f"auditd_log_{leaf}")
            if str(got) != str(v):
                mismatches.append((i, k, v, got))
        if "@timestamp" in exp and row["timestamp"] is not None:
            want = _instant(exp["@timestamp"])
            got_ts = row["timestamp"].replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
            if abs(got_ts - want) > 0.5:
                mismatches.append((i, "@timestamp", exp["@timestamp"], row["timestamp"]))
        if "event.original" in exp and row["event_original"] != exp["event.original"]:
            mismatches.append((i, "event.original", exp["event.original"],
                               row["event_original"]))
    assert not mismatches, mismatches[:8]


ICINGA_FIELDS = ["log.level", "icinga.main.facility", "message"]


def test_icinga_main_golden(spark):
    from beats_spark.modules import icinga_main

    lines, golden = _load_golden("icinga", "main", "test.log")
    joined = _join_negate(lines, r"^\[")
    rows = _run(spark, icinga_main, joined)
    _check(rows, golden, ICINGA_FIELDS)


TRAEFIK_FIELDS = [
    "http.request.method", "http.version", "http.response.status_code",
    "http.response.body.bytes", "http.request.referrer",
    "user_agent.original", "user.name", "source.address", "source.ip",
    "url.original", "url.path", "url.query", "url.extension",
    "traefik.access.user_identifier", "traefik.access.request_count",
    "traefik.access.frontend_name", "traefik.access.backend_url",
    "event.duration", "event.outcome", "event.category", "event.type",
    "related.ip", "related.user",
]


def test_traefik_access_golden(spark):
    from beats_spark.modules import traefik_access

    lines, golden = _load_golden("traefik", "access", "test.log")
    rows = _run(spark, traefik_access, lines)
    _check(rows, golden, TRAEFIK_FIELDS)


IIS_FIELDS = [
    "http.request.method", "http.response.status_code",
    "iis.access.sub_status", "iis.access.win32_status",
    "destination.address", "destination.ip", "destination.port",
    "source.address", "source.ip", "url.original", "url.path",
    "user_agent.original", "event.duration", "event.outcome",
    "event.category", "event.type", "related.ip", "event.original",
]


@pytest.mark.parametrize("log", ["test-iis-7.5.log", "test-iis-7.2.log"])
def test_iis_access_golden(spark, log):
    lines, golden = _load_golden("iis", "access", log)
    lines = [ln for ln in lines if not ln.startswith("#")]  # exclude_lines
    rows = _run(spark, iis_access_fn(), lines)
    _check(rows, golden, IIS_FIELDS)


def iis_access_fn():
    from beats_spark.modules import iis_access
    return iis_access


HAPROXY_FIELDS = [
    "process.name", "process.pid", "source.address", "source.ip",
    "source.port", "destination.ip", "destination.port",
    "destination.address", "destination.domain",
    "haproxy.frontend_name", "haproxy.backend_name", "haproxy.server_name",
    "haproxy.mode", "haproxy.source", "haproxy.bytes_read",
    "haproxy.termination_state", "haproxy.connections.active",
    "haproxy.connections.frontend", "haproxy.connections.backend",
    "haproxy.connections.server", "haproxy.connections.retries",
    "haproxy.server_queue", "haproxy.backend_queue",
    "haproxy.total_waiting_time_ms", "haproxy.connection_wait_time_ms",
    "haproxy.http.request.time_wait_ms",
    "haproxy.http.request.time_wait_without_data_ms",
    "haproxy.http.request.captured_cookie",
    "haproxy.http.response.captured_cookie",
    "haproxy.http.request.captured_headers",
    "haproxy.http.response.captured_headers",
    "haproxy.http.request.raw_request_line",
    "http.request.method", "http.version", "http.response.status_code",
    "http.response.bytes", "event.duration", "event.outcome",
    "event.category", "event.type", "related.ip", "related.hosts",
]


@pytest.mark.parametrize("log", [
    "default.log", "haproxy.log", "tcplog.log", "httplog-no-headers.log",
])
def test_haproxy_log_golden(spark, log):
    from beats_spark.modules import haproxy_log

    lines, golden = _load_golden("haproxy", "log", log)
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, haproxy_log, lines, timezone=tz)
    _check(rows, golden, HAPROXY_FIELDS, ts_field=None)


PG_CSV_FIELDS_CHECK = [
    "log.level", "process.pid", "user.name", "postgresql.log.database",
    "postgresql.log.session_id", "postgresql.log.sql_state_code",
    "postgresql.log.timestamp", "postgresql.log.transaction_id",
    "postgresql.log.virtual_transaction_id", "postgresql.log.command_tag",
    "postgresql.log.client_addr", "postgresql.log.client_port",
    "postgresql.log.application_name", "postgresql.log.query_step",
    "postgresql.log.detail", "event.duration", "event.timezone",
    "related.user", "event.category", "event.type",
]


@pytest.mark.parametrize("log", [
    "postgresql-11-connection-disconnection.csv.log",
    "postgresql-11-autovacuum.csv.log",
    "postgresql-11-duration.csv.log",
])
def test_postgresql_csv_golden(spark, log):
    from beats_spark.modules import postgresql_csv

    lines, golden = _load_golden("postgresql", "log", log)
    joined = _join_negate(lines, r"^\d{4}-\d{2}-\d{2} ")
    rows = _run(spark, postgresql_csv, joined)
    _check(rows, golden, PG_CSV_FIELDS_CHECK)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp
        if "postgresql.log.session_start_time" in exp and row[
            "postgresql_log_session_start_time"
        ] is not None:
            want = _instant(exp["postgresql.log.session_start_time"])
            got = row["postgresql_log_session_start_time"].replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
            assert abs(got - want) < 0.5


MONGODB_FIELDS = [
    "log.level", "mongodb.log.component", "mongodb.log.context",
    "mongodb.log.id", "event.type", "event.category", "event.original",
]


@pytest.mark.parametrize("log", [
    "mongodb-debian-3.2.11.log", "mongodb-ubuntu-4.4.4-json.log",
])
def test_mongodb_log_golden(spark, log):
    from beats_spark.modules import mongodb_log

    lines, golden = _load_golden("mongodb", "log", log)
    rows = _run(spark, mongodb_log, lines)
    _check(rows, golden, MONGODB_FIELDS)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp


LOGSTASH_FIELDS = ["log.level", "logstash.log.module", "logstash.log.thread",
                   "event.type"]


@pytest.mark.parametrize("log", [
    "logstash-plain.log", "logstash-plain-7.4.log", "logstash-json.log",
])
def test_logstash_log_golden(spark, log):
    from beats_spark.modules import logstash_log

    lines, golden = _load_golden("logstash", "log", log)
    # plain config: multiline pattern '^\[' negate; json fileset is ndjson
    joined = lines if "json" in log else _join_negate(lines, r"^\[")
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, logstash_log, joined, timezone=tz)
    _check(rows, golden, LOGSTASH_FIELDS)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp
        ev = row.get("logstash_log_log_event") or {}
        for k in ("count", "pipeline_id", "port", "status"):
            if f"logstash.log.log_event.{k}" in exp:
                assert ev.get(k) == exp[f"logstash.log.log_event.{k}"], k


NATS_FIELDS = [
    "log.level", "process.pid", "client.ip", "client.port",
    "nats.log.client.id", "nats.log.msg.type", "nats.log.msg.sid",
    "nats.log.msg.subject", "nats.log.msg.reply_to", "nats.log.msg.bytes",
    "network.direction", "event.type", "related.ip",
]


def test_nats_log_golden(spark):
    from beats_spark.modules import nats_log

    lines, golden = _load_golden("nats", "log", "test.log")
    rows = _run(spark, nats_log, lines)
    _check(rows, golden, NATS_FIELDS)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp


SANTA_FIELDS = [
    "log.level", "santa.action", "santa.decision", "santa.reason",
    "santa.mode", "santa.certificate.sha256",
    "santa.certificate.common_name", "santa.disk.mount", "santa.disk.volume",
    "santa.disk.bsdname", "santa.disk.fs", "santa.disk.model",
    "santa.disk.serial", "santa.disk.bus", "process.hash.sha256",
    "process.executable", "process.pid", "process.parent.pid", "user.id",
    "user.name", "group.id", "group.name", "process.args", "event.action",
    "event.outcome", "event.category", "event.type", "event.original",
    "related.user", "related.hash", "file.x509.issuer.common_name",
]


def test_santa_log_golden(spark):
    from beats_spark.modules import santa_log

    lines, golden = _load_golden("santa", "log", "santa.log")
    rows = _run(spark, santa_log, lines)
    _check(rows, golden, SANTA_FIELDS)


SLOWLOG_FIELDS = [
    "user.name", "mysql.slowlog.current_user", "source.domain", "source.ip",
    "mysql.thread_id", "mysql.slowlog.schema", "mysql.slowlog.lock_time.sec",
    "mysql.slowlog.rows_sent", "mysql.slowlog.rows_examined",
    "mysql.slowlog.rows_affected", "mysql.slowlog.bytes_sent",
    "mysql.slowlog.tmp_tables", "mysql.slowlog.tmp_disk_tables",
    "mysql.slowlog.tmp_table_sizes", "mysql.slowlog.merge_passes",
    "mysql.slowlog.query", "event.duration", "event.category", "event.type",
    "related.user", "related.ip",
]

_SLOWLOG_BOOLS = [
    "query_cache_hit", "tmp_table", "tmp_table_on_disk", "filesort",
    "filesort_on_disk", "priority_queue", "full_scan", "full_join",
]


@pytest.mark.parametrize("log", [
    "mysql-5.7.22.log", "mariadb-10.3.13.log", "mariadb-explain.log",
    "mysql-ubuntu-8.0.15.log", "percona-ubuntu-5.7.19.log",
])
def test_mysql_slowlog_golden(spark, log):
    from beats_spark.modules import mysql_slowlog

    lines, golden = _load_golden("mysql", "slowlog", log)
    joined = _join_negate(lines, r"^(# User@Host: |# Time: )")
    joined = [
        ev for ev in joined
        if not re.match(r"^[\/\w\.]+, Version: .* started with:.*", ev)
        and not ev.startswith("# Time:")
    ]
    rows = _run(spark, mysql_slowlog, joined)
    _check(rows, golden, SLOWLOG_FIELDS)
    for row, exp in zip(rows, golden):
        parsed = row["parsed"] or {}
        for b in _SLOWLOG_BOOLS:
            k = f"mysql.slowlog.{b}"
            if k in exp:
                got = parsed.get(f"mysql_slowlog_{b}")
                assert got == str(exp[k]).lower(), (k, exp[k], got)


ES_SERVER_FIELDS = [
    "log.level", "elasticsearch.component", "elasticsearch.node.name",
    "elasticsearch.index.name", "elasticsearch.index.id",
    "elasticsearch.cluster.name", "elasticsearch.cluster.uuid",
    "elasticsearch.node.id", "log.logger", "process.thread.name",
    "service.name", "event.type", "event.category", "host.id",
]


@pytest.mark.parametrize("log", [
    "elasticsearch.624.log", "elasticsearch-json.800.log",
    "elasticsearch-json.800.mixed.log",
])
def test_elasticsearch_server_golden(spark, log):
    from beats_spark.modules import elasticsearch_server

    lines, golden = _load_golden("elasticsearch", "server", log)
    joined = lines if "json" in log else _join_negate(lines, r"^\[")
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, elasticsearch_server, joined, timezone=tz)
    _check(rows, golden, ES_SERVER_FIELDS)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp


ES_GC_FIELDS = [
    "log.level", "process.pid", "elasticsearch.gc.tags",
    "elasticsearch.gc.jvm_runtime_sec", "elasticsearch.gc.phase.name",
    "elasticsearch.gc.phase.duration_sec",
    "elasticsearch.gc.phase.cpu_time.user_sec",
    "elasticsearch.gc.phase.cpu_time.sys_sec",
    "elasticsearch.gc.phase.cpu_time.real_sec",
    "elasticsearch.gc.young_gen.used_kb", "elasticsearch.gc.young_gen.size_kb",
    "elasticsearch.gc.old_gen.used_kb", "elasticsearch.gc.old_gen.size_kb",
    "elasticsearch.gc.heap.used_kb", "elasticsearch.gc.heap.size_kb",
    "elasticsearch.gc.threads_total_stop_time_sec",
    "elasticsearch.gc.stopping_threads_time_sec",
    "event.kind", "event.category", "event.type", "message",
]


# test-docker.log's golden is a single mid-file event (offset-aligned, not
# prefix-aligned), which this index-zipped harness can't line up
@pytest.mark.parametrize("log", ["gc.log", "test.log"])
def test_elasticsearch_gc_golden(spark, log):
    from beats_spark.modules import elasticsearch_gc

    lines, golden = _load_golden("elasticsearch", "gc", log)
    rows = _run(spark, elasticsearch_gc, lines)
    _check(rows, golden, ES_GC_FIELDS)


ES_DEP_FIELDS = [
    "log.level", "elasticsearch.component", "elasticsearch.node.name",
    "data_stream.dataset", "data_stream.namespace", "data_stream.type",
    "elasticsearch.elastic_product_origin", "elasticsearch.event.category",
    "elasticsearch.http.request.x_opaque_id", "event.code", "service.name",
    "process.thread.name", "log.logger", "trace.id",
    "elasticsearch.cluster.uuid", "elasticsearch.node.id",
    "elasticsearch.cluster.name", "event.dataset", "event.type",
    "event.category", "host.id",
]


@pytest.mark.parametrize("log", [
    "elasticsearch_deprecation.log", "es_deprecation-json.800.log",
    "es_deprecation-json.800.mixed.log",
])
def test_elasticsearch_deprecation_golden(spark, log):
    from beats_spark.modules import elasticsearch_deprecation

    lines, golden = _load_golden("elasticsearch", "deprecation", log)
    joined = lines if "json" in log else _join_negate(lines, r"^\[")
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, elasticsearch_deprecation, joined, timezone=tz)
    _check(rows, golden, ES_DEP_FIELDS)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp


KIBANA_FIELDS = [
    "process.pid", "kibana.log.state", "kibana.log.tags",
    "http.response.status_code", "http.response.body.bytes",
    "http.request.method", "http.request.referrer", "user_agent.original",
    "source.address", "source.ip", "url.original", "event.duration",
    "event.outcome", "event.type", "service.name",
]

_KIBANA_RENAMED_HEADERS = {"referer", "user-agent"}


@pytest.mark.parametrize("log", ["log.624.log", "test.log"])
def test_kibana_log_golden(spark, log):
    from beats_spark.modules import kibana_log

    lines, golden = _load_golden("kibana", "log", log)
    rows = _run(spark, kibana_log, lines)
    _check(rows, golden, KIBANA_FIELDS, ts_field="@timestamp")
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp
        meta = row["meta"] or {}
        req = meta.get("req") or {}
        headers = req.get("headers") or {}
        for k, v in exp.items():
            if k.startswith("kibana.log.meta.req.headers."):
                h = k.rsplit(".", 1)[1]
                if h not in _KIBANA_RENAMED_HEADERS:
                    assert headers.get(h) == v, k
        if "kibana.log.meta.type" in exp:
            assert meta.get("type") == exp["kibana.log.meta.type"]
        if "kibana.log.meta.prevMsg" in exp:
            assert meta.get("prevMsg") == exp["kibana.log.meta.prevMsg"]
        if "kibana.log.meta.prevState" in exp:
            assert meta.get("prevState") == exp["kibana.log.meta.prevState"]
        if "kibana.log.meta.req.userAgent" in exp:
            assert req.get("userAgent") == exp["kibana.log.meta.req.userAgent"]


AUTH_FIELDS = [
    "host.hostname", "process.name", "process.pid",
    "source.address", "source.ip", "source.domain", "source.port",
    "user.name", "user.id", "user.effective.name",
    "group.name", "group.id",
    "system.auth.ssh.event", "system.auth.ssh.method",
    "system.auth.ssh.signature", "system.auth.ssh.dropped_ip",
    "system.auth.sudo.error", "system.auth.sudo.tty",
    "system.auth.sudo.pwd", "system.auth.sudo.user",
    "system.auth.sudo.command",
    "system.auth.useradd.home", "system.auth.useradd.shell",
    "event.kind", "event.action", "event.outcome",
    "event.category", "event.type",
    "related.user", "related.ip", "related.hosts",
]


@pytest.mark.parametrize(
    "log",
    ["test.log", "timestamp.log", "secure-rhel7.log", "auth-ubuntu1204.log"],
)
def test_system_auth_golden(spark, log):
    from beats_spark.modules import system_auth

    lines, golden = _load_golden("system", "auth", log)
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, system_auth, lines, timezone=tz)
    # yearless syslog stamps resolve their year ingest-side in the
    # reference; only the ISO-stamped log asserts @timestamp
    _check(rows, golden, AUTH_FIELDS,
           ts_field="@timestamp" if log == "timestamp.log" else None)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp
        else:
            assert row["message_out"] is None, (exp, row["message_out"])


ES_SLOWLOG_FIELDS = [
    "log.level", "log.logger", "process.thread.name", "service.name",
    "elasticsearch.slowlog.logger", "elasticsearch.component",
    "elasticsearch.node.name", "elasticsearch.node.id",
    "elasticsearch.cluster.name", "elasticsearch.cluster.uuid",
    "elasticsearch.index.name", "elasticsearch.index.id",
    "elasticsearch.shard.id",
    "elasticsearch.slowlog.took", "elasticsearch.slowlog.type",
    "elasticsearch.slowlog.id", "elasticsearch.slowlog.routing",
    "elasticsearch.slowlog.search_type", "elasticsearch.slowlog.total_hits",
    "elasticsearch.slowlog.total_shards", "elasticsearch.slowlog.types",
    "elasticsearch.slowlog.source", "elasticsearch.slowlog.source_query",
    "elasticsearch.slowlog.extra_source",
    "event.duration", "event.kind", "event.category", "event.type",
    "event.dataset", "host.id",
]


def _slowlog_stats_ok(want, got):
    # the reference's split processor turns 'a,b' into an array only when
    # non-empty; json branches carry the raw JSON value (string or array).
    # We emit the raw string; decode both spellings here.
    if want is None:
        return got is None
    if isinstance(want, list):
        if got is None:
            return False
        if got.startswith("["):
            return json.loads(got) == want
        return got.split(",") == want
    return got == want


@pytest.mark.parametrize("log", [
    "test.log", "auditlog_index_indexing_slowlog.log", "slowlogs-json.log",
    "es_index_indexing_slowlog-json.log", "es_index_search_slowlog-json.log",
    "es74_index_indexing_slowlog-json.log", "es74_index_search_slowlog-json.log",
    "es814_index_indexing_slowlog-json.log", "es814_index_search_slowlog-json.log",
    "es_indexing_slowlog.800.log", "es_search_slowlog.800.log",
    "es_slowlog.800.mixed.log",
])
def test_elasticsearch_slowlog_golden(spark, log):
    from beats_spark.modules import elasticsearch_slowlog

    lines, golden = _load_golden("elasticsearch", "slowlog", log)
    # config/slowlog.yml multiline: ^(\[?YYYY-MM-DD|{) negate match=after
    joined = _join_negate(lines, r"^(\[?[0-9]{4}-[0-9]{2}-[0-9]{2}|\{)")
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, elasticsearch_slowlog, joined, timezone=tz)
    _check(rows, golden, ES_SLOWLOG_FIELDS)
    for i, (row, exp) in enumerate(zip(rows, golden)):
        if any(k.startswith("error.") for k in exp):
            continue
        if "message" in exp:
            assert row["message_out"] == exp["message"], (i, exp["message"])
        assert _slowlog_stats_ok(
            exp.get("elasticsearch.slowlog.stats"),
            row.get("elasticsearch_slowlog_stats"),
        ), (i, exp.get("elasticsearch.slowlog.stats"),
            row.get("elasticsearch_slowlog_stats"))


NGINX_ERROR_FIELDS = [
    "log.level", "process.pid", "process.thread.id",
    "nginx.error.connection_id", "event.original",
    "event.kind", "event.category", "event.type",
]


def test_nginx_error_golden(spark):
    from beats_spark.modules import nginx_error

    lines, golden = _load_golden("nginx", "error", "error.log")
    # nginx error config multiline: ^YYYY/MM/DD negate match=after
    joined = _join_negate(lines, r"^[0-9]{4}/[0-9]{2}/[0-9]{2}")
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, nginx_error, joined, timezone=tz)
    _check(rows, golden, NGINX_ERROR_FIELDS)
    for row, exp in zip(rows, golden):
        if "message" in exp:
            assert row["message_out"] == exp["message"], exp


ES_AUDIT_FIELDS = [
    "elasticsearch.audit.layer", "elasticsearch.audit.event_type",
    "elasticsearch.audit.origin.type", "elasticsearch.audit.realm",
    "elasticsearch.audit.user.realm", "elasticsearch.audit.user.roles",
    "elasticsearch.audit.user.run_as.name",
    "elasticsearch.audit.user.run_as.realm",
    "elasticsearch.audit.action", "elasticsearch.audit.indices",
    "elasticsearch.audit.opaque_id", "elasticsearch.audit.request.id",
    "elasticsearch.audit.request.name", "elasticsearch.audit.url.params",
    "elasticsearch.audit.authentication.type",
    "elasticsearch.audit.invalidate.apikeys.owned_by_authenticated_user",
    "elasticsearch.node.id", "elasticsearch.node.name",
    "elasticsearch.cluster.name", "elasticsearch.cluster.uuid",
    "event.action", "event.outcome", "event.type",
    "event.kind", "event.category", "event.dataset",
    "source.address", "source.ip", "source.port",
    "user.name", "user.full_name", "user.email", "user.effective.name",
    "related.user", "url.original",
    "http.request.method", "http.request.id", "http.request.body.content",
    "trace.id", "log.level", "host.id", "host.name", "message",
]


@pytest.mark.parametrize("log", [
    "test-access.log", "test-audit.log", "test-audit-711.log",
    "test-audit-730.log", "test-audit-761.log", "test-audit-800.log",
    "test-audit-800.mixed.log", "test-audit-docker.log",
])
def test_elasticsearch_audit_golden(spark, log):
    from beats_spark.modules import elasticsearch_audit

    lines, golden = _load_golden("elasticsearch", "audit", log)
    # drop-rule lines (non-audit json) have no golden entry
    golden = [e for e in golden if not any(
        k.startswith("error.") for k in e)]
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, elasticsearch_audit, lines, timezone=tz)
    _check(rows, golden, ES_AUDIT_FIELDS)


KIBANA_AUDIT_FIELDS = [
    "event.action", "event.outcome", "event.dataset", "event.kind",
    "kibana.saved_object.id", "kibana.saved_object.type",
    "kibana.saved_object.name", "kibana.space_id",
    "kibana.authentication_provider", "kibana.authentication_type",
    "kibana.authentication_realm", "kibana.lookup_realm",
    "labels.application", "log.level", "log.logger", "process.pid",
    "service.node.roles", "trace.id", "transaction.id",
    "http.request.method", "url.domain", "url.path", "url.port",
    "url.scheme", "client.ip", "user.name", "user.roles", "related.user",
]


def _ecs_shape_ok(want, got):
    """kibana 7.11 writes event.category/type as a bare scalar; the typed
    engine normalizes to a single-element array (module docstring)."""
    if want is None:
        return got is None
    if isinstance(want, list):
        return got is not None and sorted(got) == sorted(want)
    return got == [want]


@pytest.mark.parametrize("log", [
    "test-audit-711.log", "test-audit-713.log", "test-audit-814.log",
    "test-audit-890.log",
])
def test_kibana_audit_golden(spark, log):
    from beats_spark.modules import kibana_audit

    lines, golden = _load_golden("kibana", "audit", log)
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, kibana_audit, lines, timezone=tz)
    _check(rows, golden, KIBANA_AUDIT_FIELDS)
    for i, (row, exp) in enumerate(zip(rows, golden)):
        assert row["message_out"] == exp["message"], i
        assert _ecs_shape_ok(exp.get("event.category"),
                             row.get("event_category")), (i, "category")
        assert _ecs_shape_ok(exp.get("event.type"),
                             row.get("event_type")), (i, "type")


IIS_ERROR_FIELDS = [
    "iis.error.reason_phrase", "iis.error.queue_name",
    "http.request.method", "http.version", "http.response.status_code",
    "source.address", "source.port", "source.ip",
    "destination.address", "destination.port", "destination.ip",
    "url.original", "url.path", "url.query", "url.extension",
    "event.kind", "event.category", "event.type", "event.outcome",
    "related.ip", "event.original",
]


@pytest.mark.parametrize("log", [
    "test.log", "ipv6_zone_id.log", "iis_error_url.log",
])
def test_iis_error_golden(spark, log):
    from beats_spark.modules import iis_error

    lines, golden = _load_golden("iis", "error", log)
    # fileset config exclude_lines: ^# (the HTTP-API file header)
    lines = [ln for ln in lines if not ln.startswith("#")]
    rows = _run(spark, iis_error, lines)
    _check(rows, golden, IIS_ERROR_FIELDS)


LOGSTASH_SLOWLOG_FIELDS = [
    "log.level", "event.kind", "event.type", "event.duration",
    "logstash.slowlog.module", "logstash.slowlog.plugin_type",
    "logstash.slowlog.plugin_name", "logstash.slowlog.took_in_millis",
    "logstash.slowlog.plugin_params", "logstash.slowlog.event",
    "logstash.slowlog.thread",
]


@pytest.mark.parametrize("log", ["slowlog-plain.log", "slowlog-json.log"])
def test_logstash_slowlog_golden(spark, log):
    from beats_spark.modules import logstash_slowlog

    lines, golden = _load_golden("logstash", "slowlog", log)
    tz = golden[0].get("event.timezone") if golden else None
    rows = _run(spark, logstash_slowlog, lines, timezone=tz)
    _check(rows, golden, LOGSTASH_SLOWLOG_FIELDS)
    for row, exp in zip(rows, golden):
        # map-typed plugin_params_object: golden stores flattened keys
        obj = row.get("logstash_slowlog_plugin_params_object") or {}
        for k, v in exp.items():
            if k.startswith("logstash.slowlog.plugin_params_object."):
                assert obj.get(k.rsplit(".", 1)[1]) == v, k


NGINX_INGRESS_FIELDS = [
    "http.request.method", "http.version", "http.response.status_code",
    "http.response.body.bytes", "http.request.referrer", "http.request.id",
    "user.name", "user_agent.original", "source.address", "source.ip",
    "url.original", "url.path", "url.query", "url.extension",
    "nginx.ingress_controller.http.request.id",
    "nginx.ingress_controller.http.request.length",
    "nginx.ingress_controller.http.request.time",
    "nginx.ingress_controller.upstream.name",
    "nginx.ingress_controller.upstream.alternative_name",
    "nginx.ingress_controller.upstream.ip",
    "nginx.ingress_controller.upstream.port",
    "nginx.ingress_controller.upstream.response.length",
    "nginx.ingress_controller.upstream.response.time",
    "nginx.ingress_controller.upstream.response.status_code",
    "event.kind", "event.category", "event.type", "event.outcome",
    "related.ip", "related.user", "event.original",
]

NGINX_INGRESS_LIST_FIELDS = {
    "nginx.ingress_controller.remote_ip_list": "remote_ip_list",
    "nginx.ingress_controller.upstream_address_list": "upstream_address_list",
    "nginx.ingress_controller.upstream.response.length_list":
        "upstream_response_length_list",
    "nginx.ingress_controller.upstream.response.time_list":
        "upstream_response_time_list",
    "nginx.ingress_controller.upstream.response.status_code_list":
        "upstream_response_status_code_list",
}


def test_nginx_ingress_controller_golden(spark):
    from beats_spark.modules import nginx_ingress_controller

    lines, golden = _load_golden("nginx", "ingress_controller", "test.log")
    rows = _run(spark, nginx_ingress_controller, lines)
    _check(rows, golden, NGINX_INGRESS_FIELDS)
    for i, (row, exp) in enumerate(zip(rows, golden)):
        for gk, col in NGINX_INGRESS_LIST_FIELDS.items():
            want = exp.get(gk)
            got = row.get(col)
            # expected.json stores arrays sorted
            assert (sorted(got) if got else None) == \
                   (sorted(want) if want else None), (i, gk, want, got)


def test_icinga_startup_golden(spark):
    from beats_spark.modules import icinga_startup

    lines, golden = _load_golden("icinga", "startup", "test.log")
    rows = _run(spark, icinga_startup, lines)
    _check(rows, golden,
           ["log.level", "icinga.startup.facility", "message",
            "event.kind", "event.type"], ts_field=None)


def test_icinga_debug_golden(spark):
    from beats_spark.modules import icinga_debug

    lines, golden = _load_golden("icinga", "debug", "test.log")
    rows = _run(spark, icinga_debug, lines)
    _check(rows, golden,
           ["log.level", "icinga.debug.facility", "message",
            "event.kind", "event.type"])


PENSANDO_DFW_FIELDS = [
    "pensando.dfw.action", "pensando.dfw.destination_address",
    "pensando.dfw.destination_port", "pensando.dfw.direction",
    "pensando.dfw.protocol", "pensando.dfw.rule_id",
    "pensando.dfw.session_id", "pensando.dfw.session_state",
    "pensando.dfw.source_address", "pensando.dfw.source_port",
    "source.address", "source.port", "destination.address",
    "destination.port", "client.ip", "server.ip", "server.port",
    "network.transport", "network.type", "observer.vendor",
    "observer.type", "observer.product", "rule.id",
    "event.kind", "event.category", "event.type", "event.action",
    "event.outcome", "event.original",
]


def test_pensando_dfw_golden(spark):
    from beats_spark.modules import pensando_dfw

    lines, golden = _load_golden("pensando", "dfw", "test.log")
    rows = _run(spark, pensando_dfw, lines)
    _check(rows, golden, PENSANDO_DFW_FIELDS)


def test_redis_slowlog_harvester_vectors(spark):
    """redis.slowlog has no golden file (its ingest pipeline is empty and
    the event is built by the redis-protocol harvester), so pin to the
    reply vector documented in the reference source
    (filebeat/input/redis/harvester.go:44-52: entry 13 / 1309448128 / 30 /
    ["slowlog","get","100"]) plus the arg-splitting edge cases of
    harvester.go:171-183."""
    from beats_spark.modules import redis_slowlog

    df = spark.createDataFrame(
        [
            (13, 1309448128, 30, ["slowlog", "get", "100"], "master"),
            (14, 1309448129, 51, ["get", "k1"], "master"),
            (15, 1309448130, 7, ["ping"], "slave"),
            (16, 1309448131, 2, [], "slave"),
            (17, 1309448132, 9999, ["setex", "k2", "60", "v", "nx"], "master"),
        ],
        "id long, ts_epoch long, duration_us long, args array<string>, role string",
    )
    rows = {r["redis_slowlog_id"]: r.asDict()
            for r in redis_slowlog(df).collect()}

    r13 = rows[13]
    assert r13["redis_slowlog_cmd"] == "slowlog"
    assert r13["redis_slowlog_key"] == "get"
    assert r13["redis_slowlog_args"] == ["100"]
    assert r13["message"] == "slowlog get 100"
    assert r13["redis_slowlog_duration_us"] == 30
    assert r13["redis_slowlog_role"] == "master"
    assert r13["timestamp"] == datetime.datetime(2011, 6, 30, 15, 35, 28)

    # exactly two args: cmd+key set, args absent (harvester.go:180-183)
    assert rows[14]["redis_slowlog_cmd"] == "get"
    assert rows[14]["redis_slowlog_key"] == "k1"
    assert rows[14]["redis_slowlog_args"] is None
    # one arg: key absent
    assert rows[15]["redis_slowlog_cmd"] == "ping"
    assert rows[15]["redis_slowlog_key"] is None
    assert rows[15]["message"] == "ping"
    # empty reply: nothing set, message empty
    assert rows[16]["redis_slowlog_cmd"] is None
    assert rows[16]["message"] == ""
    # >2 args: tail preserved in order
    assert rows[17]["redis_slowlog_args"] == ["60", "v", "nx"]
    assert rows[17]["message"] == "setex k2 60 v nx"
