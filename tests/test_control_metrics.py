"""Driver-side utilities: retry, notify routing, metrics/trend, report."""

import json
import os
import time

import pytest

from data_quality_check_pipeline_spark.control import StageLog, retry
from data_quality_check_pipeline_spark.metrics import (
    prometheus_text,
    quality_trend_alert,
    save_metrics,
)
from data_quality_check_pipeline_spark.notify import ROUTING, SINKS, notify
from data_quality_check_pipeline_spark.report import (
    render_run_report,
    save_run_report,
)

METRICS = {
    "run_id": "r42",
    "stages": [
        {"stage": "load", "status": "ok", "duration_s": 0.01},
        {"stage": "validate", "status": "ok", "duration_s": 1.5,
         "kept": 90},
    ],
    "quality": {"total": 100, "kept": 90, "dropped": 10, "pii_rows": 3,
                "keep_pct": 90.0},
    "gate": {"decision": "continue", "failure_pct": 10.0},
    "performance": {"wall_seconds": 2.0, "clips_per_sec": 50.0},
}


class TestRetry:
    def test_retries_then_succeeds(self):
        calls = []

        @retry(max_tries=3, base_delay_s=0.01)
        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise OSError("transient")
            return "done"

        assert flaky() == "done"
        assert len(calls) == 3

    def test_exhausts(self):
        @retry(max_tries=2, base_delay_s=0.01)
        def always_fails():
            raise ValueError("nope")

        with pytest.raises(ValueError):
            always_fails()


class TestNotify:
    def test_routing_tiers(self):
        assert notify("CRITICAL", "x") == ["pagerduty", "slack", "email"]
        assert notify("LOW", "x") == []

    def test_custom_sink_called(self):
        seen = []
        SINKS["slack"] = lambda sev, msg: seen.append((sev, msg))
        try:
            notify("MEDIUM", "hello")
            assert seen == [("MEDIUM", "hello")]
        finally:
            del SINKS["slack"]

    def test_webhook_transport_real_http(self):
        """webhook_sink POSTs a Slack-compatible JSON body over real
        HTTP; configure_from_env wires it from the declared env vars;
        a dead transport logs and never raises (alerting must not take
        the pipeline down)."""
        import http.server
        import json
        import threading

        from data_quality_check_pipeline_spark.notify import (
            configure_from_env,
        )

        received = []

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                received.append(
                    (self.path, json.loads(self.rfile.read(n)))
                )
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            n = configure_from_env(
                {"CLIP_QUALITY_SLACK_WEBHOOK": f"{url}/slack"}
            )
            assert n == 1
            targets = notify("MEDIUM", "keep rate degraded")
            assert targets == ["slack"]
            assert received == [
                ("/slack", {"text": "[MEDIUM] keep rate degraded"})
            ]
            # dead transport: logged, not raised
            SINKS["slack"] = __import__(
                "data_quality_check_pipeline_spark.notify",
                fromlist=["webhook_sink"],
            ).webhook_sink("http://127.0.0.1:9/unreachable", timeout=0.2)
            assert notify("MEDIUM", "x") == ["slack"]  # no exception
        finally:
            SINKS.pop("slack", None)
            srv.shutdown()
            srv.server_close()

    def test_smtp_transport_real_server(self):
        """smtp_sink speaks real SMTP: a minimal threaded server
        (socket-level, the TestInteractiveReview realness discipline)
        accepts one delivery and the captured DATA carries the
        severity-stamped subject + body; configure_from_env wires it
        into the email slot, overriding a webhook; a dead SMTP host
        logs and never raises."""
        import socket
        import threading

        from data_quality_check_pipeline_spark.notify import (
            configure_from_env,
            smtp_sink,
        )

        captured: dict = {}
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def serve_one():
            conn, _ = srv.accept()
            f = conn.makefile("rb")
            conn.sendall(b"220 test ESMTP\r\n")
            data_lines = []
            in_data = False
            while True:
                line = f.readline()
                if not line:
                    break
                if in_data:
                    if line.rstrip(b"\r\n") == b".":
                        in_data = False
                        captured["data"] = b"".join(data_lines)
                        conn.sendall(b"250 ok\r\n")
                    else:
                        data_lines.append(line)
                    continue
                cmd = line.rstrip(b"\r\n").upper()
                if cmd.startswith((b"EHLO", b"HELO")):
                    conn.sendall(b"250 test\r\n")
                elif cmd.startswith(b"MAIL FROM"):
                    captured["from"] = line.decode().strip()
                    conn.sendall(b"250 ok\r\n")
                elif cmd.startswith(b"RCPT TO"):
                    captured.setdefault("rcpt", []).append(
                        line.decode().strip()
                    )
                    conn.sendall(b"250 ok\r\n")
                elif cmd.startswith(b"DATA"):
                    in_data = True
                    conn.sendall(b"354 go\r\n")
                elif cmd.startswith(b"QUIT"):
                    conn.sendall(b"221 bye\r\n")
                    break
                else:
                    conn.sendall(b"250 ok\r\n")
            conn.close()

        t = threading.Thread(target=serve_one, daemon=True)
        t.start()
        try:
            n = configure_from_env(
                {
                    "CLIP_QUALITY_EMAIL_WEBHOOK": "http://x/ignored",
                    "CLIP_QUALITY_SMTP_HOST": f"127.0.0.1:{port}",
                    "CLIP_QUALITY_SMTP_FROM": "qa@example.com",
                    "CLIP_QUALITY_SMTP_TO":
                        "a@example.com, b@example.com",
                }
            )
            # ONE live slot: smtp overrode the email webhook — the
            # count reports slots wired, never double-counts a slot
            assert n == 1
            assert notify("HIGH", "keep rate degraded") == [
                "slack", "email",
            ]
            t.join(timeout=10)
            assert "qa@example.com" in captured["from"]
            assert len(captured["rcpt"]) == 2
            data = captured["data"].decode()
            assert "[clip-quality HIGH] alert" in data
            assert "[HIGH] keep rate degraded" in data
            # dead host: logged, not raised
            SINKS["email"] = smtp_sink(
                "127.0.0.1", "x@example.com", ["y@example.com"],
                port=9, timeout=0.2,
            )
            assert notify("HIGH", "x") == ["slack", "email"]
        finally:
            SINKS.pop("email", None)
            SINKS.pop("slack", None)
            srv.close()

    def test_pagerduty_events_transport(self):
        """pagerduty_events_sink POSTs a well-formed Events API v2
        trigger (routing_key + mapped severity) — verified against a
        local HTTP capture; configure_from_env wires the routing key
        into the pagerduty slot."""
        import http.server
        import json
        import threading

        from data_quality_check_pipeline_spark.notify import (
            configure_from_env,
            pagerduty_events_sink,
        )

        received = []

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                received.append(json.loads(self.rfile.read(n)))
                self.send_response(202)
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/v2/enqueue"
            n = configure_from_env(
                {"CLIP_QUALITY_PAGERDUTY_ROUTING_KEY": "rk123"}
            )
            assert n == 1
            # point the registered sink at the local capture server
            SINKS["pagerduty"] = pagerduty_events_sink("rk123", url=url)
            assert notify("CRITICAL", "pipeline gate quarantined") == [
                "pagerduty", "slack", "email",
            ]
            (body,) = received
            assert body["routing_key"] == "rk123"
            assert body["event_action"] == "trigger"
            assert body["payload"]["severity"] == "critical"
            assert body["payload"]["summary"] == (
                "pipeline gate quarantined"
            )
        finally:
            SINKS.pop("pagerduty", None)
            srv.shutdown()
            srv.server_close()

    def test_smtp_host_parse_ipv6_and_brackets(self, monkeypatch):
        """host[:port] parsing (r05 ADVICE): a bare IPv6 literal whose
        last group is decimal must NOT be split into host+port; only a
        single-colon host:digits or a bracketed [addr]:port is."""
        from data_quality_check_pipeline_spark import notify as notify_mod

        seen = {}

        def fake_smtp_sink(host, from_addr, to_addrs, port=25, **kw):
            seen["host"], seen["port"] = host, port
            return lambda *a, **k: None

        monkeypatch.setattr(notify_mod, "smtp_sink", fake_smtp_sink)
        base = {
            "CLIP_QUALITY_SMTP_FROM": "a@example.com",
            "CLIP_QUALITY_SMTP_TO": "b@example.com",
        }
        for host_env, want_host, want_port in [
            ("::1", "::1", 25),
            ("2001:db8::5", "2001:db8::5", 25),
            ("mail.example.com:2525", "mail.example.com", 2525),
            ("127.0.0.1:587", "127.0.0.1", 587),
            ("[2001:db8::5]:2525", "2001:db8::5", 2525),
            ("[::1]", "::1", 25),
            ("mail.example.com", "mail.example.com", 25),
        ]:
            notify_mod.configure_from_env(
                {**base, "CLIP_QUALITY_SMTP_HOST": host_env}
            )
            assert (seen["host"], seen["port"]) == (
                want_host, want_port,
            ), host_env
        SINKS.pop("email", None)


class TestMetrics:
    def test_prometheus_flatten(self):
        text = prometheus_text(METRICS)
        assert "clip_quality_quality_kept 90" in text
        assert "clip_quality_performance_clips_per_sec 50.0" in text

    def test_trend_alert(self, tmp_path):
        d = str(tmp_path)
        for i, pct in enumerate([95.0, 96.0, 94.0]):
            save_metrics(
                {"quality": {"keep_pct": pct}}, d, f"h{i}"
            )
        ok = quality_trend_alert(d, current_keep_pct=93.0)
        assert not ok["alert"]
        bad = quality_trend_alert(d, current_keep_pct=80.0)
        assert bad["alert"] and bad["runs"] == 3

    def test_push_to_gateway_payload_and_url(self):
        from data_quality_check_pipeline_spark.metrics import (
            push_to_gateway,
        )

        seen = {}

        def fake_transport(url, data, headers):
            seen.update(url=url, data=data, headers=headers)

        url, payload = push_to_gateway(
            METRICS, "http://gw:9091/", job="clips",
            transport=fake_transport,
        )
        assert url == "http://gw:9091/metrics/job/clips"
        assert seen["url"] == url and seen["data"] == payload
        assert b"clip_quality_quality_kept 90" in payload
        assert seen["headers"]["Content-Type"].startswith("text/plain")

    def test_trend_alert_routes_through_notify(self, tmp_path):
        from data_quality_check_pipeline_spark.metrics import (
            alert_quality_trend,
        )

        d = str(tmp_path)
        for i, pct in enumerate([95.0, 96.0, 94.0]):
            save_metrics({"quality": {"keep_pct": pct}}, d, f"h{i}")
        calls = []
        res = alert_quality_trend(
            d, 80.0, notifier=lambda sev, msg: calls.append((sev, msg)),
        )
        assert res["alert"] and len(calls) == 1
        assert calls[0][0] == "HIGH" and "80.00%" in calls[0][1]
        # no degradation -> no notification
        ok = alert_quality_trend(
            d, 94.0, notifier=lambda *a: calls.append(a)
        )
        assert not ok["alert"] and len(calls) == 1

    def test_review_decision_audit_log(self, tmp_path):
        from data_quality_check_pipeline_spark.control import (
            poll_review_decision,
        )

        f = tmp_path / "decision.json"
        f.write_text(json.dumps({"decision": "halt"}))
        d = poll_review_decision(str(f), timeout_s=0.0, default="quarantine")
        assert d == "halt"
        # timeout path audits the default too
        missing = tmp_path / "absent.json"
        d2 = poll_review_decision(
            str(missing), timeout_s=0.0, default="quarantine"
        )
        assert d2 == "quarantine"
        rows = [
            json.loads(line)
            for line in open(f"{f}.audit.jsonl").read().splitlines()
        ]
        assert rows[0]["decision"] == "halt"
        assert rows[0]["source"] == "decision_file"
        rows2 = [
            json.loads(line)
            for line in open(f"{missing}.audit.jsonl").read().splitlines()
        ]
        assert rows2[0]["source"] == "timeout_default"

    def test_prometheus_exports_stage_list(self):
        """stages is a LIST of dicts — its numeric leaves must export."""
        text = prometheus_text(
            {"stages": [{"duration_s": 1.5, "kept": 7}], "total": 9}
        )
        assert "clip_quality_stages_0_duration_s 1.5" in text
        assert "clip_quality_stages_0_kept 7" in text

    def test_trend_uses_mtime_not_filename_order(self, tmp_path):
        """run_ids are random hex: history must be mtime-ordered, so the
        trailing window is the RECENT runs even when filenames sort the
        other way."""
        import os
        import time as _t

        d = str(tmp_path)
        # filename order ('aaa' < 'zzz') OPPOSES chronological order
        p_new = save_metrics({"quality": {"keep_pct": 50.0}}, d, "aaa")
        p_old = save_metrics({"quality": {"keep_pct": 99.0}}, d, "zzz")
        now = _t.time()
        os.utime(p_old, (now - 100, now - 100))  # zzz is the OLD run
        os.utime(p_new, (now, now))              # aaa is the NEW run
        r = quality_trend_alert(d, current_keep_pct=60.0, window=1)
        # window of 1 = most recent by mtime = aaa (50%) -> no alert at 60
        assert r["trailing_avg"] == 50.0 and not r["alert"]

    def test_save_metrics_roundtrip(self, tmp_path):
        p = save_metrics(METRICS, str(tmp_path), "r42")
        with open(p) as f:
            assert json.load(f)["quality"]["kept"] == 90

    def test_alert_rules_reference_only_exported_metrics(self):
        """Every metric name an alert expr references must be a name
        prometheus_text actually exports for a real run-shaped metrics
        dict — rules and exporter cannot drift apart."""
        import re

        from data_quality_check_pipeline_spark.metrics import (
            render_alert_rules,
        )

        m = dict(METRICS)
        m["trend"] = {"alert": False, "trailing_avg": 91.0, "runs": 3}
        exported = {
            line.split()[0]
            for line in prometheus_text(m).splitlines()
            if line
        }
        rules = render_alert_rules()
        expr_lines = [
            ln for ln in rules.splitlines() if "expr:" in ln
        ]
        names = set(
            re.findall(r"clip_quality_\w+", "\n".join(expr_lines))
        )
        assert len(names) >= 5
        for name in names:
            assert name in exported, name
        import yaml

        parsed = yaml.safe_load(rules)
        assert len(parsed["groups"][0]["rules"]) == 6
        # scale-free contract: no absolute-count comparisons — every
        # non-pct threshold is a ratio of two exported gauges or a rate
        for r in parsed["groups"][0]["rules"]:
            expr = r["expr"]
            if "keep_pct" in expr or "trend_alert" in expr:
                continue
            assert "/" in expr or "clips_per_sec" in expr, expr

    def test_alert_rules_thresholds_and_save(self, tmp_path):
        from data_quality_check_pipeline_spark.metrics import (
            render_alert_rules,
            save_alert_rules,
        )

        t = render_alert_rules({"low_keep_pct": 95.0})
        assert "clip_quality_quality_keep_pct < 95" in t
        assert "severity: critical" in t  # CriticalKeepRate retained
        p = save_alert_rules(str(tmp_path))
        assert os.path.exists(p) and p.endswith("alerts.yml")

    def test_dashboard_targets_only_exported_metrics(self, tmp_path):
        """Same drift-proof contract as the alert rules: every panel
        target must be a metric name prometheus_text exports for a
        run-shaped metrics dict (incl. the per-PII-type counters)."""
        from data_quality_check_pipeline_spark.metrics import (
            render_dashboard,
            save_dashboard,
        )

        m = dict(METRICS)
        m["quality"] = {**METRICS["quality"], "pii_emails": 2,
                        "pii_phones": 1, "pii_ssns": 0, "pii_tox": 4}
        exported = {
            line.split()[0]
            for line in prometheus_text(m).splitlines()
            if line
        }
        d = json.loads(render_dashboard())
        exprs = [
            t["expr"] for p in d["panels"]
            for t in p.get("targets", [])
        ]
        assert len(exprs) >= 12
        for e in exprs:
            assert e in exported, e
        # grid sanity: no panel exceeds the 24-unit grid width
        for p in d["panels"]:
            assert p["gridPos"]["x"] + p["gridPos"]["w"] <= 24
        path = save_dashboard(str(tmp_path))
        assert os.path.exists(path)


class TestDagSpec:
    def test_graph_is_closed_and_branch_targets_valid(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from jobs.quality_dag import TASK_GRAPH, branch_decision

        names = {k.removeprefix("branch:") for k in TASK_GRAPH}
        for k, downstream in TASK_GRAPH.items():
            for d in downstream:
                assert d.removeprefix("branch:") in names, (k, d)
        branch_targets = set(TASK_GRAPH["branch:check_failure_threshold"])
        # routing delegates to the SAME in-process threshold gate
        assert branch_decision(1000, 10) == "run_cleaning"  # 1% <= hard
        assert branch_decision(1000, 100) == "run_cleaning"  # quarantine+go
        assert (
            branch_decision(1000, 300) == "human_review_gate"
        )  # pass 70 < 80
        for total, failed in [(1000, 10), (1000, 100), (1000, 300)]:
            assert branch_decision(total, failed) in branch_targets

    def test_trigger_rules_cover_multi_upstream_tasks(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from jobs.quality_dag import TASK_GRAPH, TRIGGER_RULES

        # every task reachable from the branch that ALSO has a second
        # upstream (the skip-propagation hazard) must carry a non-default
        # trigger rule, mirroring the reference DAG
        upstreams: dict[str, int] = {}
        for k, downstream in TASK_GRAPH.items():
            for d in downstream:
                d = d.removeprefix("branch:")
                upstreams[d] = upstreams.get(d, 0) + 1
        for task, n_up in upstreams.items():
            if n_up > 1 and task != "halt_pipeline":
                assert task in TRIGGER_RULES, task
        assert TRIGGER_RULES["run_cleaning"] == "none_failed_min_one_success"
        assert TRIGGER_RULES["notify"] == "all_done"
        assert set(TRIGGER_RULES) <= {
            k.removeprefix("branch:") for k in TASK_GRAPH
        }

    def test_build_dag_gated_without_airflow(self):
        import importlib.util
        import sys

        sys.path.insert(0, "/root/repo")
        import pytest as _pytest

        from jobs.quality_dag import build_dag

        if importlib.util.find_spec("airflow") is not None:
            _pytest.skip("airflow installed: gate does not apply")
        with _pytest.raises(ImportError):
            build_dag("/in", "/out")

    def test_build_dag_materializes_with_fake_airflow(self):
        """build_dag was previously only spec-tested; materialize it
        against a minimal fake airflow and assert the REAL operator
        graph: every TASK_GRAPH edge wired, branch task a
        BranchPythonOperator, and the non-default trigger rules landing
        on the materialized operators (reference data_quality_dag.py:585,
        628 none_failed_min_one_success; :643 all_done)."""
        import sys
        import types

        sys.path.insert(0, "/root/repo")

        class _Op:
            def __init__(self, task_id, python_callable=None, dag=None,
                         trigger_rule="all_success", **kw):
                self.task_id = task_id
                self.python_callable = python_callable
                self.trigger_rule = trigger_rule
                self.downstream: set = set()
                if dag is not None:
                    dag.tasks.append(self)

            def __rshift__(self, other):
                self.downstream.add(other.task_id)
                return other

        class _BranchOp(_Op):
            pass

        class _DAG:
            def __init__(self, dag_id, schedule=None, start_date=None,
                         catchup=None, **kw):
                self.dag_id = dag_id
                self.schedule = schedule
                self.catchup = catchup
                self.tasks: list = []

        fake_airflow = types.ModuleType("airflow")
        fake_airflow.DAG = _DAG
        fake_ops = types.ModuleType("airflow.operators")
        fake_py = types.ModuleType("airflow.operators.python")
        fake_py.PythonOperator = _Op
        fake_py.BranchPythonOperator = _BranchOp
        fake_airflow.operators = fake_ops
        fake_ops.python = fake_py
        fake_pendulum = types.ModuleType("pendulum")
        fake_pendulum.yesterday = lambda: None
        saved = {
            k: sys.modules.get(k)
            for k in ("airflow", "airflow.operators",
                      "airflow.operators.python", "pendulum")
        }
        sys.modules.update({
            "airflow": fake_airflow,
            "airflow.operators": fake_ops,
            "airflow.operators.python": fake_py,
            "pendulum": fake_pendulum,
        })
        try:
            from jobs.quality_dag import (
                SCHEDULE,
                TASK_GRAPH,
                TRIGGER_RULES,
                build_dag,
            )

            dag = build_dag("/in", "/out")
            assert dag.dag_id == "clip_quality_pipeline"
            assert dag.schedule == SCHEDULE and dag.catchup is False
            ops = {t.task_id: t for t in dag.tasks}
            # every spec task materialized exactly once
            assert set(ops) == {
                k.removeprefix("branch:") for k in TASK_GRAPH
            }
            # every spec edge wired on the real operators
            for k, downstream in TASK_GRAPH.items():
                src = ops[k.removeprefix("branch:")]
                assert src.downstream == {
                    d.removeprefix("branch:") for d in downstream
                }, k
            assert isinstance(ops["check_failure_threshold"], _BranchOp)
            # reference-parity trigger rules on the materialized tasks
            for task, op in ops.items():
                assert op.trigger_rule == TRIGGER_RULES.get(
                    task, "all_success"
                ), task
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v


class TestReport:
    def test_render_contains_key_figures(self):
        text = render_run_report(METRICS)
        assert "keep rate:     90.00%" in text
        assert "decision:      continue" in text
        assert "validate" in text

    def test_save(self, tmp_path):
        p = save_run_report(METRICS, str(tmp_path))
        assert os.path.exists(p)


class TestModuleReports:
    DATA = {
        "quality": {"total": 100, "kept": 90, "dropped": 10,
                    "keep_pct": 90.0, "pii_rows": 3, "pii_emails": 2,
                    "pii_phones": 1, "pii_ssns": 0, "pii_tox": 4},
        "reason_histogram": [("high_perplexity", 6), ("bad_sr_hz", 4)],
        "ge": [{"name": "not_be_null:clip_id", "success": True,
                "pass_rate": 1.0, "mostly": 1.0},
               {"name": "be_between:dur_ms", "success": False,
                "pass_rate": 0.97, "mostly": 0.99}],
        "completeness": {"rows": 100, "columns": {
            "transcript": {"missing": 2, "completeness_pct": 98.0}}},
        "stats": {"dur_ms_avg": 4000.25, "snr_db_avg": 38.5},
        "mask_samples": [{"clip_id": "c1", "before": "x a@b.com",
                          "after": "x [EMAIL]"}],
        "dlq_sample": [{"clip_id": "c9", "reasons": ["bad_sr_hz"],
                        "severity": "HIGH"}],
        "cleaning": {"normalize:transcript": 12, "normalize:codec": 3},
        "review": {"decision": "continue", "failure_pct": 10.0,
                   "audit": [{"ts": "2026-08-16T00:00:00",
                              "decision": "approved",
                              "source": "decision_file"}]},
    }

    def test_validation_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_validation_report,
        )

        t = render_validation_report(self.DATA)
        assert "keep rate:    90.00%" in t
        assert "high_perplexity" in t and "6" in t

    def test_expectations_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_expectations_report,
        )

        t = render_expectations_report(self.DATA)
        assert "[PASS] not_be_null:clip_id" in t
        assert "[FAIL] be_between:dur_ms" in t and "0.9700" in t

    def test_profile_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_profile_report,
        )

        t = render_profile_report(self.DATA)
        assert "transcript" in t and "98.00%" in t

    def test_statistical_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_statistical_report,
        )

        t = render_statistical_report(self.DATA)
        assert "dur_ms_avg" in t and "4000.2500" in t

    def test_mask_sample_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_mask_sample_report,
        )

        t = render_mask_sample_report(self.DATA)
        assert "before: x a@b.com" in t and "after:  x [EMAIL]" in t
        assert "emails=2" in t and "tox=4" in t

    def test_dlq_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_dlq_report,
        )

        t = render_dlq_report(self.DATA)
        assert "c9" in t and "[HIGH]" in t and "bad_sr_hz" in t

    def test_pii_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_pii_report,
        )

        t = render_pii_report(self.DATA)
        assert "rows with PII:  3" in t and "(3.00%)" in t
        assert "emails" in t and "toxicity" in t

    def test_cleaning_log(self):
        from data_quality_check_pipeline_spark.report import (
            render_cleaning_log,
        )

        t = render_cleaning_log(self.DATA)
        assert "normalize:transcript" in t and "12" in t
        assert "row(s) changed" in t

    def test_contract_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_contract_report,
        )

        t = render_contract_report(self.DATA)
        # one FAIL in ge -> contract violated; data checks show pass_rate
        assert "contract: VIOLATED" in t
        assert "[FAIL] be_between:dur_ms" in t and "0.9700" in t

    def test_review_report(self):
        from data_quality_check_pipeline_spark.report import (
            render_review_report,
        )

        t = render_review_report(self.DATA)
        assert "gate decision: continue" in t
        assert "decision=approved" in t and "source=decision_file" in t

    def test_save_all(self, tmp_path):
        from data_quality_check_pipeline_spark.report import (
            MODULE_RENDERERS,
            save_module_reports,
        )

        paths = save_module_reports(self.DATA, str(tmp_path), "rX")
        assert len(paths) == len(MODULE_RENDERERS) == 10
        assert all(os.path.exists(p) for p in paths)


class TestStageLog:
    def test_records(self):
        log = StageLog()
        t0 = time.time()
        log.record("load", "ok", t0, rows=5)
        assert log.stages[0]["stage"] == "load"
        assert log.stages[0]["rows"] == 5


class TestInteractiveReview:
    """Interactive TTY review prompt (reference human_review.py:127-235
    parity): choice mapping, invalid/timeout defaults, the non-TTY
    guard, real select()-based timeout, and the audit trail."""

    def _prompt(self, line=None, tmp_path=None, **kw):
        from data_quality_check_pipeline_spark.control import (
            Thresholds,
            prompt_review_interactive,
        )

        audit = str(tmp_path / "audit.jsonl") if tmp_path else None
        t = Thresholds(review_timeout_s=0.1)
        return prompt_review_interactive(
            30.0, 70.0, 100, 30, t,
            audit_log=audit,
            input_fn=(lambda: line) if line is not None else None,
            **kw,
        ), audit

    def test_choice_mapping(self, capsys):
        from data_quality_check_pipeline_spark.control import (
            CONTINUE,
            DISCARD,
            HALT,
            QUARANTINE,
        )

        for line, want in (
            ("c\n", CONTINUE), ("D\n", DISCARD),
            ("q\n", QUARANTINE), ("H\n", HALT),
            ("  quarantine\n", QUARANTINE),  # first letter wins
        ):
            got, _ = self._prompt(line, isatty=True)
            assert got == want
        out = capsys.readouterr().out
        assert "HUMAN REVIEW REQUIRED" in out
        assert "[C] Continue" in out and "Auto-quarantine" in out

    def test_invalid_choice_applies_timeout_action(self, tmp_path):
        import json

        got, audit = self._prompt("x\n", tmp_path=tmp_path, isatty=True)
        assert got == "quarantine"  # Thresholds default timeout_action
        row = json.loads(open(audit).read().strip().splitlines()[-1])
        assert row["source"] == "invalid_choice_default"

    def test_non_tty_never_blocks(self, tmp_path):
        import json
        import time as _t

        t0 = _t.time()
        got, audit = self._prompt(tmp_path=tmp_path, isatty=False)
        assert got == "quarantine" and _t.time() - t0 < 1.0
        row = json.loads(open(audit).read().strip().splitlines()[-1])
        assert row["source"] == "non_interactive_auto"

    def test_real_stdin_select_timeout_and_read(self, monkeypatch):
        """Drive the production select() path with a real pipe: data
        present -> read; empty pipe -> timeout default."""
        import os
        import sys

        from data_quality_check_pipeline_spark.control import (
            HALT,
            Thresholds,
            prompt_review_interactive,
        )

        t = Thresholds(review_timeout_s=0.2)
        r, w = os.pipe()
        os.write(w, b"h\n")
        with os.fdopen(r, "r") as rf:
            monkeypatch.setattr(sys, "stdin", rf)
            got = prompt_review_interactive(
                30.0, 70.0, 100, 30, t, isatty=True
            )
            assert got == HALT
        os.close(w)

        r2, w2 = os.pipe()  # nothing written -> select times out
        with os.fdopen(r2, "r") as rf2:
            monkeypatch.setattr(sys, "stdin", rf2)
            got = prompt_review_interactive(
                30.0, 70.0, 100, 30, t, isatty=True
            )
            assert got == "quarantine"
        os.close(w2)

    def test_gate_routes_to_interactive_prompt(self, monkeypatch):
        """threshold_gate with no decision file + non_interactive=False
        uses the TTY prompt (non-TTY stdin -> immediate timeout action,
        reviewed=True)."""
        from data_quality_check_pipeline_spark.control import (
            QUARANTINE,
            threshold_gate,
        )

        g = threshold_gate(
            100, 30, review_decision_file=None, non_interactive=False
        )
        assert g.decision == QUARANTINE and g.reviewed
