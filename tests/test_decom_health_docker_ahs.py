"""Round-14 operators, pinned per the reference tests:
TestDecommissioningNodesWatcher (RM graceful decommission),
TestNodeHealthService / TestNodeHealthScriptRunner (NM health),
TestDockerContainerRuntime (Docker/OCI admission + launch spec),
TestFileSystemApplicationHistoryStore (AHS merge semantics)."""

from __future__ import annotations

from hadoop_source_spark.operators import ahstore, decomwatcher as dw
from hadoop_source_spark.operators import dockerrun as dr, nodehealth as nh


# ---------------------------------------------------------------- decom

def _nodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "node_id string, node_state string, decom_start_time long,"
        " timeout_ms long",
    )


def _statuses(spark, rows):
    return spark.createDataFrame(
        rows, "node_id string, container_id string, state string,"
        " update_seq long",
    )


def _apps(spark, rows):
    return spark.createDataFrame(rows, "node_id string, app_id string")


def _status_of(spark, nodes, statuses, apps, now=40_000):
    out = dw.decommissioning_status(
        _nodes(spark, nodes), _statuses(spark, statuses),
        _apps(spark, apps), now=now,
    ).collect()
    return {r["node_id"]: r.asDict() for r in out}


def test_decom_wait_container_then_app_then_ready(spark):
    # TestDecommissioningNodesWatcher.testDecommissioningNodesWatcher:
    # containers drain 3→0 (WAIT_CONTAINER while any RUNNING), then the
    # still-running app holds WAIT_APP, then app completion → READY.
    nodes = [("h1", "DECOMMISSIONING", 0, 40_000)]
    running = [("h1", f"c{i}", "RUNNING", i) for i in range(3)]
    st = _status_of(spark, nodes, running, [("h1", "a1")], now=10_000)
    assert st["h1"]["status"] == dw.WAIT_CONTAINER and not st["h1"]["ready"]

    drained = running + [("h1", f"c{i}", "COMPLETE", 10 + i) for i in range(3)]
    st = _status_of(spark, nodes, drained, [("h1", "a1")], now=10_000)
    assert st["h1"]["status"] == dw.WAIT_APP and not st["h1"]["ready"]
    assert st["h1"]["n_active"] == 0

    st = _status_of(spark, nodes, drained, [], now=10_000)
    assert st["h1"]["status"] == dw.READY and st["h1"]["ready"]


def test_decom_previous_running_app_holds_wait_app(spark):
    # ...WithPreviousRunningApps: zero containers at decommission time
    # but the app that previously ran there still blocks readiness.
    st = _status_of(
        spark, [("h1", "DECOMMISSIONING", 0, 40_000)],
        [("h1", "c0", "COMPLETE", 1)], [("h1", "a1")], now=5_000,
    )
    assert st["h1"]["status"] == dw.WAIT_APP


def test_decom_timeout_and_negative_timeout(spark):
    nodes = [
        ("slow", "DECOMMISSIONING", 0, 40_000),
        ("forever", "DECOMMISSIONING", 0, -1),
    ]
    running = [(n, "c", "RUNNING", 1) for n in ("slow", "forever")]
    st = _status_of(spark, nodes, running, [], now=50_000)
    # waitTime >= timeout → TIMEOUT, and TIMEOUT counts as ready
    # (checkReadyToBeDecommissioned:226-230); timeout < 0 never expires
    assert st["slow"]["status"] == dw.TIMEOUT and st["slow"]["ready"]
    assert st["forever"]["status"] == dw.WAIT_CONTAINER


def test_decom_none_decommissioned_and_new_counts_active(spark):
    nodes = [
        ("run", "RUNNING", 0, 40_000),
        ("done", "DECOMMISSIONED", 0, 40_000),
        ("fresh", "DECOMMISSIONING", 0, 40_000),
    ]
    # NEW containers count as active (update:166-169); COMPLETE not.
    sts = [("fresh", "c1", "NEW", 1), ("fresh", "c2", "COMPLETE", 1)]
    st = _status_of(spark, nodes, sts, [], now=1_000)
    assert st["run"]["status"] == dw.NONE
    assert st["done"]["status"] == dw.DECOMMISSIONED
    assert st["fresh"]["status"] == dw.WAIT_CONTAINER
    assert st["fresh"]["n_active"] == 1


def test_decom_last_state_wins_and_poll_actions(spark):
    nodes = [("h1", "DECOMMISSIONING", 0, 1_000)]
    sts = [("h1", "c1", "RUNNING", 1), ("h1", "c1", "COMPLETE", 2)]
    stdf = dw.decommissioning_status(
        _nodes(spark, nodes), _statuses(spark, sts), _apps(spark, []),
        now=5_000,
    )
    row = stdf.collect()[0]
    assert row["n_active"] == 0 and row["status"] == dw.READY
    acts = {
        r["node_id"]: r["action"]
        for r in dw.poll_actions(
            dw.decommissioning_status(
                _nodes(spark, [
                    ("t", "DECOMMISSIONING", 0, 1_000),
                    ("n", "RUNNING", 0, 1_000),
                    ("k", "DECOMMISSIONING", 0, -1),
                ]),
                _statuses(spark, [("t", "c", "RUNNING", 1),
                                  ("k", "c", "RUNNING", 1)]),
                _apps(spark, []), now=5_000,
            )
        ).collect()
    }
    assert acts == {"t": "SEND_DECOMMISSION", "n": "REMOVE", "k": "KEEP"}


# --------------------------------------------------------------- health

def _runs(spark, rows):
    return spark.createDataFrame(
        rows,
        "node_id string, script_name string, script_order int,"
        " run_seq long, exit_code int, timed_out boolean,"
        " exception string, output string, check_time long",
    )


def _classify(spark, exit_code=0, timed_out=False, exception=None,
              output="OK"):
    out = nh.classify_runs(
        _runs(spark, [("n", "s", 0, 1, exit_code, timed_out, exception,
                       output, 100)])
    ).collect()[0]
    return out


def test_health_exit_code_stays_healthy(spark):
    # reportHealthStatus: FAILED_WITH_EXIT_CODE → healthy, empty report
    # (a syntax-error script must not poison the node)
    r = _classify(spark, exit_code=127)
    assert r["status"] == nh.FAILED_WITH_EXIT_CODE
    assert r["healthy"] and r["report"] == ""


def test_health_timeout_beats_exception(spark):
    r = _classify(spark, timed_out=True, exception="trace")
    assert r["status"] == nh.TIMED_OUT and not r["healthy"]
    assert r["report"] == nh.TIMED_OUT_MSG


def test_health_exception_reports_trace(spark):
    r = _classify(spark, exception="java.io.IOException: x")
    assert r["status"] == nh.FAILED_WITH_EXCEPTION
    assert r["report"] == "java.io.IOException: x"


def test_health_error_line_is_prefix_anchored(spark):
    # hasErrors: line must START with ERROR — TestNodeHealthScriptRunner
    # pins "ERROR disk out of space" unhealthy and plain output healthy
    assert _classify(spark, output="ERROR disk out of space")["status"] == nh.FAILED
    assert _classify(spark, output="ok\nERROR later")["status"] == nh.FAILED
    assert _classify(spark, output="xERROR not at start")["status"] == nh.SUCCESS
    r = _classify(spark, output="ERROR bad")
    assert not r["healthy"] and r["report"] == "ERROR bad"


def test_health_node_rollup_joins_reports_in_order(spark):
    rows = [
        # latest run per script wins: script a run2 is healthy
        ("n1", "a", 0, 1, 0, False, None, "ERROR old", 100),
        ("n1", "a", 0, 2, 0, False, None, "fine", 200),
        ("n1", "b", 1, 1, 0, False, None, "ERROR disk", 150),
        ("n1", "c", 2, 1, 0, True, None, "", 160),
        ("n2", "a", 0, 1, 0, False, None, "all good", 300),
    ]
    out = {r["node_id"]: r.asDict()
           for r in nh.node_health_report(_runs(spark, rows)).collect()}
    # ';'-joined non-empty reports in script_order (getHealthReport)
    assert out["n1"]["health_report"] == \
        "ERROR disk;" + nh.TIMED_OUT_MSG
    assert not out["n1"]["healthy"] and out["n1"]["n_unhealthy"] == 2
    assert out["n1"]["last_report_time"] == 200
    assert out["n2"]["healthy"] and out["n2"]["health_report"] == ""


# --------------------------------------------------------------- docker

def _containers(spark, rows):
    return spark.createDataFrame(
        rows,
        "container_id string, user string, image string, network string,"
        " hostname string, runtime string, ports_mapping string,"
        " mounts string, tmpfs_mounts string, pid_namespace string,"
        " privileged boolean, service_mode boolean, entry_point boolean",
    )


_BASE = ("c1", "u1", "library/busybox:latest", None, None, None, None,
         None, None, None, False, False, False)


def _admit(spark, row=None, **kw):
    out = dr.docker_admission(
        _containers(spark, [row or _BASE]), **kw
    ).collect()[0]
    return out.asDict()


def _admit_many(spark, rows, **kw):
    """Batch scenarios sharing operator kwargs into ONE invocation
    (r15): the operator's cost is constant plan analysis, so the
    one-row-per-collect shape paid it once per scenario and made the
    docker tests ~90 s of suite wall. Keyed by container_id."""
    out = dr.docker_admission(_containers(spark, rows), **kw).collect()
    assert len(out) == len(rows)
    return {r["container_id"]: r.asDict() for r in out}


def _with(**over):
    cols = ["container_id", "user", "image", "network", "hostname",
            "runtime", "ports_mapping", "mounts", "tmpfs_mounts",
            "pid_namespace", "privileged", "service_mode", "entry_point"]
    d = dict(zip(cols, _BASE))
    d.update(over)
    return tuple(d[c] for c in cols)


def test_docker_defaults_and_allowed(spark):
    r = _admit(spark, _with(image=None),
               default_image="library/default:latest")
    assert r["verdict"] == dr.ALLOWED
    assert r["image"] == "library/default:latest"
    assert r["network"] == "host" and r["detach"]


def test_docker_image_validation(spark):
    # TestDockerContainerRuntime.testDockerImageNamePattern:2037-2048,
    # verbatim valid/invalid sets
    ok = ["ubuntu", "fedora/httpd:version1.0",
          "fedora/httpd:version1.0.test",
          "fedora/httpd:version1.0.TEST",
          "myregistryhost:5000/ubuntu",
          "myregistryhost:5000/fedora/httpd:version1.0",
          "myregistryhost:5000/fedora/httpd:version1.0.test",
          "myregistryhost:5000/fedora/httpd:version1.0.TEST"]
    bad = ["Ubuntu", "ubuntu || fedora", "ubuntu#",
           "myregistryhost:50AB0/ubuntu", "myregistry#host:50AB0/ubuntu",
           ":8080/ubuntu"]
    rows = [_with(container_id=f"ok{i}", image=img)
            for i, img in enumerate(ok)]
    rows += [_with(container_id=f"bad{i}", image=img)
             for i, img in enumerate(bad)]
    out = _admit_many(spark, rows)
    for i, img in enumerate(ok):
        assert out[f"ok{i}"]["verdict"] == dr.ALLOWED, img
    for i, img in enumerate(bad):
        assert out[f"bad{i}"]["verdict"] == dr.FAIL_IMAGE, img


def test_docker_network_and_hostname(spark):
    ok_h = ("ab", "a.b.c.d", "a1-b.cd.ef", "0AB.", "C_D-")
    bad_h = ("a", "a#.b.c", "-a.b.c", "a@b.c", "a/b/c")
    rows = [
        _with(container_id="net_bad", network="isolated"),
        _with(container_id="net_ok", network="bridge",
              hostname="ctr-e84-host"),
        # testValidDockerHostnameLength boundary: 64 ok, 65 fails
        _with(container_id="len64", hostname="h" * 64),
        _with(container_id="len65", hostname="h" * 65),
        # host network with no hostname → container carries none
        _with(container_id="nohost"),
    ]
    # testDockerHostnamePattern:2067-2069 verbatim valid/invalid sets
    rows += [_with(container_id=f"hok{i}", hostname=h)
             for i, h in enumerate(ok_h)]
    rows += [_with(container_id=f"hbad{i}", hostname=h)
             for i, h in enumerate(bad_h)]
    out = _admit_many(spark, rows)
    assert out["net_bad"]["verdict"] == dr.FAIL_NETWORK
    assert out["net_ok"]["verdict"] == dr.ALLOWED
    assert out["len64"]["verdict"] == dr.ALLOWED
    assert out["len65"]["verdict"] == dr.FAIL_HOSTNAME
    for i, h in enumerate(ok_h):
        assert out[f"hok{i}"]["verdict"] == dr.ALLOWED, h
    for i, h in enumerate(bad_h):
        assert out[f"hbad{i}"]["verdict"] == dr.FAIL_HOSTNAME, h
    assert out["nohost"]["hostname"] is None


def test_docker_runtime_ports_mounts_tmpfs(spark):
    out = _admit_many(spark, [
        _with(container_id="rt_kata", runtime="kata"),
        _with(container_id="rt_empty", runtime=""),
        _with(container_id="p_ok",
              ports_mapping=":8080,9090:90,1.2.3.4:80:8080"),
        _with(container_id="p_bad1", ports_mapping="abc:80"),
        _with(container_id="p_bad2", ports_mapping="256.1.1.1:80:80"),
        _with(container_id="m_ok", mounts="/a:/b:ro,/c:/d"),
        # testMountInvalid: a mount missing its destination is rejected
        _with(container_id="m_bad1", mounts="/bad"),
        _with(container_id="m_bad2", mounts="/a:/b:rx"),
        _with(container_id="t_ok", tmpfs_mounts="/run"),
        # testInvalidTmpfsMount: relative path / colon rejected
        _with(container_id="t_bad1", tmpfs_mounts="rel/path"),
        _with(container_id="t_bad2", tmpfs_mounts="/a:/b"),
    ])
    assert out["rt_kata"]["verdict"] == dr.FAIL_RUNTIME
    assert out["rt_empty"]["verdict"] == dr.ALLOWED
    assert out["p_ok"]["verdict"] == dr.ALLOWED
    assert out["p_bad1"]["verdict"] == dr.FAIL_PORTS
    assert out["p_bad2"]["verdict"] == dr.FAIL_PORTS
    assert out["m_ok"]["verdict"] == dr.ALLOWED
    assert out["m_bad1"]["verdict"] == dr.FAIL_MOUNTS
    assert out["m_bad2"]["verdict"] == dr.FAIL_MOUNTS
    assert out["t_ok"]["verdict"] == dr.ALLOWED
    assert out["t_bad1"]["verdict"] == dr.FAIL_TMPFS
    assert out["t_bad2"]["verdict"] == dr.FAIL_TMPFS
    # the allowed_runtimes kwarg variant needs its own invocation
    assert _admit(spark, _with(runtime="kata"),
                  allowed_runtimes=("runc", "kata"))["verdict"] == dr.ALLOWED


def test_docker_pid_and_privileged_gates(spark):
    # invalid pid-ns value is IGNORED (allowHostPidNamespace:231-236)
    assert _admit(spark, _with(pid_namespace="private"))["verdict"] == dr.ALLOWED
    assert _admit(spark, _with(pid_namespace="host"))["verdict"] == dr.FAIL_PID_NS
    r = _admit(spark, _with(pid_namespace="HOST"), host_pid_enabled=True)
    assert r["verdict"] == dr.ALLOWED and r["host_pid"]
    # testLaunchPrivilegedContainersInvalidEnvVar / ...DisabledCluster /
    # ...FailedACL / ...SuccessfulACL progression
    assert _admit(spark, _with(privileged=True))["verdict"] == \
        dr.FAIL_PRIVILEGED_DISABLED
    assert _admit(spark, _with(privileged=True), privileged_enabled=True,
                  privileged_acl=("other",))["verdict"] == dr.FAIL_PRIVILEGED_ACL
    r = _admit(spark, _with(privileged=True), privileged_enabled=True,
               privileged_acl=("u1",))
    assert r["verdict"] == dr.ALLOWED and r["privileged"]
    # non-requested privileged never escalates
    assert not _admit(spark, _with())["privileged"]


def test_docker_entry_point_and_service_mode(spark):
    r = _admit(spark, _with(entry_point=True))
    assert r["use_entry_point"] and not r["detach"] and r["mount_yarn_dirs"]
    r = _admit(spark, _with(service_mode=True))
    # service mode implies entry point and skips the YARN dir mounts
    assert r["use_entry_point"] and not r["mount_yarn_dirs"]


def test_docker_canonical_mounts(spark):
    rows = [_with(container_id="m1", mounts="/a:/b,/c:/d:ro,/e:/f:rshared"),
            _with(container_id="m2", mounts="/x:/y:rw+rslave"),
            _with(container_id="m3", mounts=None)]
    out = {r["container_id"]: r["mount_spec"]
           for r in dr.canonical_mounts(_containers(spark, rows)).collect()}
    # launchContainer:710-717 — default rw; bare propagation → rw+<prop>
    assert out["m1"] == ["/a:/b:rw", "/c:/d:ro", "/e:/f:rw+rshared"]
    assert out["m2"] == ["/x:/y:rw+rslave"]
    assert out["m3"] == []


# ------------------------------------------------------------------ ahs

def _entries(spark, rows):
    return spark.createDataFrame(
        rows,
        "app_id string, entity_type string, entity_id string,"
        " suffix string, seq long, name string, user string,"
        " queue string, host string, node string, diagnostics string,"
        " final_status string, state string, start_time long,"
        " finish_time long, exit_status int",
    )


def _e(app, etype, eid, suffix, seq, **kw):
    d = dict(name=None, user=None, queue=None, host=None, node=None,
             diagnostics=None, final_status=None, state=None,
             start_time=None, finish_time=None, exit_status=None)
    d.update(kw)
    return (app, etype, eid, suffix, seq, d["name"], d["user"], d["queue"],
            d["host"], d["node"], d["diagnostics"], d["final_status"],
            d["state"], d["start_time"], d["finish_time"], d["exit_status"])


def test_ahs_merge_start_finish_groups(spark):
    rows = [
        _e("a1", "application", "application_1", "start", 0,
           name="job", user="u", queue="q", start_time=100),
        _e("a1", "application", "application_1", "finish", 1,
           final_status="SUCCEEDED", state="FINISHED", finish_time=500,
           diagnostics="ok"),
    ]
    m = ahstore.merge_history_entries(_entries(spark, rows)).collect()[0]
    assert m["has_start"] and m["has_finish"]
    assert m["name"] == "job" and m["start_time"] == 100
    assert m["finish_time"] == 500 and m["final_status"] == "SUCCEEDED"


def test_ahs_missing_suffix_survives_first_entry_wins(spark):
    rows = [
        # missing finish → outcome fields null (getApplication logs a
        # warning but returns the merged row)
        _e("a1", "application", "application_1", "start", 0, name="j",
           start_time=1),
        # duplicate finish entries: FIRST by write order wins
        _e("a2", "application", "application_2", "finish", 5,
           diagnostics="first", finish_time=50),
        _e("a2", "application", "application_2", "finish", 9,
           diagnostics="late", finish_time=99),
    ]
    m = {r["entity_id"]: r.asDict()
         for r in ahstore.merge_history_entries(_entries(spark, rows)).collect()}
    assert m["application_1"]["has_finish"] is False
    assert m["application_1"]["finish_time"] is None
    assert m["application_2"]["has_start"] is False
    assert m["application_2"]["diagnostics"] == "first"
    assert m["application_2"]["finish_time"] == 50


def test_ahs_app_rollup_counts(spark):
    rows = [
        _e("a1", "application", "application_1", "start", 0, name="j",
           user="u", queue="q", start_time=100),
        _e("a1", "application", "application_1", "finish", 1,
           final_status="SUCCEEDED", finish_time=400),
        _e("a1", "appattempt", "appattempt_1_1", "start", 2, host="h"),
        _e("a1", "appattempt", "appattempt_1_1", "finish", 3,
           final_status="SUCCEEDED"),
        _e("a1", "container", "container_1_1", "start", 4, start_time=110),
        _e("a1", "container", "container_1_1", "finish", 5,
           finish_time=300, exit_status=0),
        _e("a1", "container", "container_1_2", "start", 6, start_time=120),
        _e("a1", "container", "container_1_3", "finish", 7,
           finish_time=310, exit_status=137),
    ]
    merged = ahstore.merge_history_entries(_entries(spark, rows))
    out = ahstore.app_history_rollup(merged).collect()[0]
    assert out["complete"] and out["elapsed_ms"] == 300
    assert out["n_attempts"] == 1 and out["n_containers"] == 3
    assert out["n_finished_containers"] == 2
    assert out["n_failed_containers"] == 1
