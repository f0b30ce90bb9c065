"""Registry DNS zone synthesis: the DNS records the YARN registry DNS
server creates from container and application service records — the
discovery surface `<instance>.<service>.<user>.<domain>` that every
YARN-service client resolves.

Reference semantics (`hadoop-common-project/hadoop-registry/.../
registry/server/dns/`):

- Container records (`ContainerServiceRecordProcessor.java`): an A
  record (and a v4-mapped AAAA) at THREE names — the instance name
  ``<description,lowercased>.<service>.<user>.<domain>``
  (`BaseServiceRecordProcessor.getContainerName:280-291`), the bare
  container-id name ``<container-id>.<domain>``
  (``getContainerIDName:268-271``) and the component name
  ``<yarn:component,lowercased>.<service>.<user>.<domain>``
  (``getComponentName:297-310``) — targeting yarn:ip
  (``AContainerRecordDescriptor:238-251``; records are skipped
  entirely when no IP is registered); a PTR record from the reversed
  IP only when BOTH hostname and IP exist (:194-212); a TXT record at
  the instance name carrying ``id=<yarn:id>`` (:157-170).
- Application records (`ApplicationServiceRecordProcessor.java`):
  created ONLY when the record has external endpoints (:62-66). Per
  service: A/AAAA at ``<service>.<user>.<domain>``
  (``getServiceName:356-364``) targeting the FIRST endpoint's host
  (:136-146); per endpoint: an SRV at BOTH the service name and the
  endpoint name with priority=1, weight=1
  (`RecordCreatorFactory.SRVRecordCreator:218-220`), a TXT at both
  names carrying ``api=<fragment>`` plus ``path=<uri path>`` for URI
  addresses (``getTextRecords:410-421``), and a CNAME from the
  endpoint name to the service name (:103-107). The endpoint name is
  ``<api-fragment>-api.<service name>`` where the fragment strips the
  ``classpath:org.apache.hadoop.yarn.service.`` prefix or maps
  ``http://...`` to ``http``, dots becoming dashes
  (``getDNSApiFragment:429-438``, ``getEndpointName:446-451``).

The engine takes pre-split address fields (host, port, uri path)
where the reference parses java.net.URI; name synthesis, gating and
rdata match the reference.

Spark-first: pure projections + unions — zero shuffles, zero UDFs;
one row per emitted DNS record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

YARN_SERVICE_API_PREFIX = "classpath:org.apache.hadoop.yarn.service."
HTTP_API_TYPE = "http://"


def _rec(name, rtype: str, rdata):
    return F.struct(
        name.alias("record_name"), F.lit(rtype).alias("rtype"),
        rdata.alias("rdata"),
    )


def reverse_ipv4(ip_col):
    """a.b.c.d -> d.c.b.a.in-addr.arpa. (BaseServiceRecordProcessor
    reverseIP via RegistryDNS.IN_ADDR_ARPA)."""
    p = F.split(ip_col, "\\.")
    return F.concat_ws(
        ".", p[3], p[2], p[1], p[0], F.lit("in-addr.arpa."),
    )


def container_records(containers: DataFrame, domain: str) -> DataFrame:
    """DNS records for one container service record per row.

    ``containers``: (user, service, container_id, description,
    component, yarn_id, ip string nullable, hostname string
    nullable). ``domain`` must carry its trailing dot.

    Returns (record_name, rtype, rdata) rows."""
    d = F.lit(domain)
    instance = F.concat(
        F.lower(F.col("description")), F.lit("."), F.col("service"),
        F.lit("."), F.col("user"), F.lit("."), d,
    )
    cid_name = F.concat(F.col("container_id"), F.lit("."), d)
    comp_name = F.concat(
        F.lower(F.col("component")), F.lit("."), F.col("service"),
        F.lit("."), F.col("user"), F.lit("."), d,
    )
    has_ip = F.col("ip").isNotNull()
    recs = F.array(
        F.when(has_ip, _rec(instance, "A", F.col("ip"))),
        F.when(has_ip, _rec(cid_name, "A", F.col("ip"))),
        F.when(has_ip, _rec(comp_name, "A", F.col("ip"))),
        F.when(
            has_ip,
            _rec(instance, "AAAA", F.concat(F.lit("::ffff:"),
                                            F.col("ip"))),
        ),
        F.when(
            has_ip,
            _rec(cid_name, "AAAA", F.concat(F.lit("::ffff:"),
                                            F.col("ip"))),
        ),
        F.when(
            has_ip,
            _rec(comp_name, "AAAA", F.concat(F.lit("::ffff:"),
                                             F.col("ip"))),
        ),
        F.when(
            has_ip & F.col("hostname").isNotNull(),
            _rec(reverse_ipv4(F.col("ip")), "PTR", instance),
        ),
        _rec(instance, "TXT",
             F.concat(F.lit("id="), F.col("yarn_id"))),
    )
    return containers.select(
        F.explode(F.filter(recs, lambda r: r.isNotNull())).alias("r")
    ).select("r.record_name", "r.rtype", "r.rdata")


def api_fragment(api_col):
    """getDNSApiFragment:429-438."""
    stripped = (
        F.when(
            api_col.startswith(YARN_SERVICE_API_PREFIX),
            F.substring(
                api_col, len(YARN_SERVICE_API_PREFIX) + 1, 10_000
            ),
        )
        .when(api_col.startswith(HTTP_API_TYPE), F.lit("http"))
    )
    return F.translate(stripped, ".", "-")


def application_records(endpoints: DataFrame, domain: str) -> DataFrame:
    """DNS records for application (service) records, one EXTERNAL
    endpoint per row.

    ``endpoints``: (user, service, endpoint_idx int — 0 is the A
    record's address source, api string, address_type
    'host/port' | 'uri', host, port int, uri_path string nullable,
    host_ip string — the resolved address of ``host``).

    Returns (record_name, rtype, rdata) rows; services with no
    external endpoint rows emit nothing, as the reference does."""
    d = F.lit(domain)
    svc_name = F.concat(
        F.col("service"), F.lit("."), F.col("user"), F.lit("."), d
    )
    ep_name = F.concat(
        api_fragment(F.col("api")), F.lit("-api."), svc_name
    )
    srv_rdata = F.concat_ws(
        " ", F.lit("1"), F.lit("1"), F.col("port").cast("string"),
        F.concat(F.col("host"), F.lit(".")),
    )
    txt_rdata = F.concat(
        F.lit("api="), api_fragment(F.col("api")),
        F.when(
            F.col("address_type") == "uri",
            F.concat(F.lit(" path="), F.col("uri_path")),
        ).otherwise(F.lit("")),
    )
    per_ep = F.array(
        _rec(svc_name, "SRV", srv_rdata),
        _rec(ep_name, "SRV", srv_rdata),
        _rec(svc_name, "TXT", txt_rdata),
        _rec(ep_name, "TXT", txt_rdata),
        _rec(ep_name, "CNAME", svc_name),
        F.when(
            F.col("endpoint_idx") == 0,
            _rec(svc_name, "A", F.col("host_ip")),
        ),
        F.when(
            F.col("endpoint_idx") == 0,
            _rec(svc_name, "AAAA",
                 F.concat(F.lit("::ffff:"), F.col("host_ip"))),
        ),
    )
    return endpoints.select(
        F.explode(F.filter(per_ep, lambda r: r.isNotNull())).alias("r")
    ).select("r.record_name", "r.rtype", "r.rdata")
