"""NM GPU allocator pins (GpuResourceAllocator.java:118-160,182-295)."""

from __future__ import annotations

from hadoop_source_spark.operators import gpu

D_SCHEMA = (
    "node_id string, gpu_index int, minor int, used_by string,"
    " holder_final boolean"
)
R_SCHEMA = "node_id string, container_id string, requested long"
M_SCHEMA = (
    "node_id string, container_id string, gpu_index int, minor int"
)


def assign(spark, reqs, devs):
    out = gpu.assign_gpus(
        spark.createDataFrame(reqs, R_SCHEMA),
        spark.createDataFrame(devs, D_SCHEMA),
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["container_id"], []).append(r)
    return by


DEVS = [
    ("n1", 0, 0, None, False),
    ("n1", 0, 1, "c9", True),    # held, holder finishing
    ("n1", 1, 0, None, False),
    ("n1", 1, 1, "c8", False),   # held, live
]


def test_assigns_first_free_devices_in_order(spark):
    by = assign(spark, [("n1", "cA", 2)], DEVS)
    rows = sorted(by["cA"], key=lambda r: (r["gpu_index"], r["minor"]))
    assert [(r["gpu_index"], r["minor"]) for r in rows] == [(0, 0), (1, 0)]
    assert all(r["verdict"] == "ASSIGNED" for r in rows)
    # denied = allowed(4) - assigned(2): the device-cgroup deny list
    assert rows[0]["n_denied"] == 2


def test_zero_request_denies_all(spark):
    by = assign(spark, [("n1", "cB", 0)], DEVS)
    (r,) = by["cB"]
    assert (r["verdict"], r["n_assigned"], r["n_denied"]) == (
        "ALLOW_NONE", 0, 4)
    assert r["gpu_index"] is None


def test_wait_when_releasing_covers_request(spark):
    # 2 free + 1 releasing: a request for 3 waits instead of failing
    by = assign(spark, [("n1", "cC", 3)], DEVS)
    (r,) = by["cC"]
    assert r["verdict"] == "WAIT_RELEASING"


def test_fail_when_even_releasing_cannot_cover(spark):
    by = assign(spark, [("n1", "cD", 4)], DEVS)
    (r,) = by["cD"]
    assert r["verdict"] == "FAIL_NOT_ENOUGH"


def test_recovery_validation(spark):
    out = gpu.recover_gpus(
        spark.createDataFrame(
            [
                ("n1", "cR", 0, 0),   # free, allowed -> OK
                ("n1", "cR", 7, 7),   # not in allowed list
                ("n1", "cR", 1, 1),   # held by c8
                ("n1", "c8", 1, 1),   # its own holder recovering -> OK
            ],
            M_SCHEMA,
        ),
        spark.createDataFrame(DEVS, D_SCHEMA),
    ).collect()
    by = {(r["container_id"], r["gpu_index"], r["minor"]): r["verdict"]
          for r in out}
    assert by[("cR", 0, 0)] == "OK"
    assert by[("cR", 7, 7)] == "NOT_ALLOWED"
    assert by[("cR", 1, 1)] == "ALREADY_ASSIGNED"
    assert by[("c8", 1, 1)] == "OK"
