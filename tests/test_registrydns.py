"""Registry DNS record synthesis pins
(ContainerServiceRecordProcessor.java:58-280,
ApplicationServiceRecordProcessor.java:60-180,
BaseServiceRecordProcessor.java:268-310,356-451,
RecordCreatorFactory.java:218-220)."""

from __future__ import annotations

from hadoop_source_spark.operators import registrydns as rd

C_SCHEMA = (
    "user string, service string, container_id string,"
    " description string, component string, yarn_id string,"
    " ip string, hostname string"
)
E_SCHEMA = (
    "user string, service string, endpoint_idx int, api string,"
    " address_type string, host string, port int, uri_path string,"
    " host_ip string"
)
DOM = "hwx.site."


def crecs(spark, rows):
    out = rd.container_records(
        spark.createDataFrame(rows, C_SCHEMA), DOM).collect()
    return {(r["record_name"], r["rtype"]): r["rdata"] for r in out}


def test_container_a_at_three_names_plus_ptr_txt(spark):
    by = crecs(spark, [
        ("hadoop", "hbase", "ctr-e01-5", "Hbase-MASTER-0", "MASTER",
         "container_e01_5", "10.1.2.3", "host1.example.com"),
    ])
    inst = "hbase-master-0.hbase.hadoop.hwx.site."
    assert by[(inst, "A")] == "10.1.2.3"
    assert by[("ctr-e01-5.hwx.site.", "A")] == "10.1.2.3"
    assert by[("master.hbase.hadoop.hwx.site.", "A")] == "10.1.2.3"
    assert by[(inst, "AAAA")] == "::ffff:10.1.2.3"
    assert by[("3.2.1.10.in-addr.arpa.", "PTR")] == inst
    assert by[(inst, "TXT")] == "id=container_e01_5"


def test_container_without_ip_emits_only_txt(spark):
    by = crecs(spark, [
        ("u", "svc", "ctr-1", "Comp-0", "COMP", "cid-1", None, "h1"),
    ])
    assert list(by) == [("comp-0.svc.u.hwx.site.", "TXT")]


def test_container_without_hostname_skips_ptr(spark):
    by = crecs(spark, [
        ("u", "svc", "ctr-1", "Comp-0", "COMP", "cid-1",
         "10.0.0.9", None),
    ])
    assert ("9.0.0.10.in-addr.arpa.", "PTR") not in by
    assert by[("comp-0.svc.u.hwx.site.", "A")] == "10.0.0.9"


def test_application_endpoint_records(spark):
    rows = [
        ("hadoop", "hbase", 0,
         "classpath:org.apache.hadoop.yarn.service.hbase.master",
         "host/port", "host1", 16000, None, "10.1.2.3"),
        ("hadoop", "hbase", 1, "http://", "uri", "host2", 8080,
         "/ui", "10.1.2.4"),
    ]
    out = rd.application_records(
        spark.createDataFrame(rows, E_SCHEMA), DOM).collect()
    recs = {(r["record_name"], r["rtype"], r["rdata"]) for r in out}
    svc = "hbase.hadoop.hwx.site."
    ep0 = "hbase-master-api." + svc
    ep1 = "http-api." + svc
    # api fragment: prefix stripped, dots -> dashes
    assert (ep0, "SRV", "1 1 16000 host1.") in recs
    assert (svc, "SRV", "1 1 16000 host1.") in recs
    assert (ep0, "TXT", "api=hbase-master") in recs
    assert (ep0, "CNAME", svc) in recs
    # URI endpoint: http fragment + path in the TXT
    assert (ep1, "TXT", "api=http path=/ui") in recs
    assert (ep1, "SRV", "1 1 8080 host2.") in recs
    # only the FIRST endpoint sources the service A/AAAA
    assert (svc, "A", "10.1.2.3") in recs
    assert (svc, "A", "10.1.2.4") not in recs
    assert (svc, "AAAA", "::ffff:10.1.2.3") in recs
