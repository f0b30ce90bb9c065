"""NM Docker/OCI container-runtime admission checks and docker-run
launch-spec synthesis.

Reference semantics (`hadoop-yarn-server-nodemanager/.../linux/runtime/
DockerLinuxContainerRuntime.java` over `OCIContainerRuntime.java`,
pinned by `TestDockerContainerRuntime.java`):

- Launch-time env keys (DockerLinuxContainerRuntime.java:215-247):
  YARN_CONTAINER_RUNTIME_DOCKER_IMAGE / _CONTAINER_NETWORK /
  _CONTAINER_HOSTNAME / _DOCKER_RUNTIME / _MOUNTS / _TMPFS_MOUNTS /
  _PORTS_MAPPING / _SERVICE_MODE, plus the OCI-formatted
  ..._DOCKER_CONTAINER_PID_NAMESPACE and
  ..._DOCKER_RUN_PRIVILEGED_CONTAINER.
- Validation order inside ``launchContainer:584-612``: default image /
  network substitution first, then network ∈ allowed set
  (OCIContainerRuntime.validateContainerNetworkType:181-192 — a
  DEFAULTED network is still validated), hostname against
  ``^[a-zA-Z0-9][a-zA-Z0-9_.-]+$`` and ≤ 64 chars
  (:72-73, validateHostname:251-262), image against
  ``^(([a-zA-Z0-9.-]+)(:\\d+)?/)?([a-z0-9_./-]+)(:[\\w.-]+)?$``
  (DOCKER_IMAGE_PATTERN:204, empty image after defaulting fails
  "not set"), runtime ∈ allowed unless null/empty
  (validateContainerRuntimeType:194-206).
- Ports mappings (launchContainer:672-680) each match
  ``:port | host:container | ipv4:host:container``; user mounts
  (:695-729) each match USER_MOUNT_PATTERN ``src:dst[:mode]`` with
  mode defaulting to rw and non-r[ow] propagation modes rewritten to
  ``rw+<prop>``; a skipped malformed mount is caught by the
  comma-count cross-check. Tmpfs mounts must be absolute,
  colon-free paths (TMPFS_MOUNT_PATTERN).
- Host PID namespace (OCIContainerRuntime.allowHostPidNamespace:
  219-248): value other than "host" (case-insensitive) is IGNORED,
  "host" with the cluster feature off is an error.
- Privileged (allowPrivilegedContainerExecution:283-321): requested
  via env boolean; fails if the cluster disallows privileged
  containers, then if the submitting user is not in the ACL.
- Spec synthesis (launchContainer:664-838): ENTRY_POINT mode
  (service mode, or the override-disable env) keeps the image
  entrypoint, passes the env through, and runs attached with a log
  dir; otherwise the command is ``bash <workdir>/launch_container.sh``
  detached. In service mode the YARN local/log dirs are NOT mounted;
  otherwise log+app-local dirs mount rw and the filecache dirs ro.
  The container runs privileged only when the full privileged check
  passes, and in host-network mode a hostname is set only when
  explicitly provided (setHostname:500-531).

Spark-first: each admission rule is a pure column predicate (the
regexes run JVM-side via rlike); the ACL and allowed-set lookups are
broadcast joins against control-plane-sized tables; the first failing
check in reference order becomes the verdict with one chained
``when``. Mount canonicalization is transform() over split() — no
explode, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALLOWED = "ALLOWED"
FAIL_NETWORK = "FAIL_NETWORK"
FAIL_HOSTNAME = "FAIL_HOSTNAME"
FAIL_IMAGE = "FAIL_IMAGE"
FAIL_RUNTIME = "FAIL_RUNTIME"
FAIL_PORTS = "FAIL_PORTS"
FAIL_MOUNTS = "FAIL_MOUNTS"
FAIL_TMPFS = "FAIL_TMPFS"
FAIL_PID_NS = "FAIL_PID_NS"
FAIL_PRIVILEGED_DISABLED = "FAIL_PRIVILEGED_DISABLED"
FAIL_PRIVILEGED_ACL = "FAIL_PRIVILEGED_ACL"

# DockerLinuxContainerRuntime.DOCKER_IMAGE_PATTERN:204 (anchored).
IMAGE_RE = r"^(([a-zA-Z0-9.-]+)(:\d+)?/)?([a-z0-9_./-]+)(:[\w.-]+)?$"
# OCIContainerRuntime.HOSTNAME_PATTERN:72 (2+ chars by construction).
HOSTNAME_RE = r"^[a-zA-Z0-9][a-zA-Z0-9_.-]+$"
# OCIContainerRuntime.PORTS_MAPPING_PATTERN:79-82.
PORTS_RE = (
    r"^:[0-9]+$|^[0-9]+:[0-9]+$"
    r"|^(([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\.){3}"
    r"([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5]):[0-9]+:[0-9]+$"
)
# USER_MOUNT_PATTERN:74-76 applied per comma-separated element.
MOUNT_RE = (
    r"^([^:\x00]+):([^:\x00]+)"
    r"(:(r[ow]|(r[ow]\+)?(r?shared|r?slave|r?private)))?$"
)
TMPFS_RE = r"^/[^:\x00]+$"

_HOST_NAME_LENGTH = 64


def _all_elements_match(col: Column, pattern: str) -> Column:
    """True when every comma-separated element of ``col`` matches
    ``pattern`` (vacuously true for null — the env key is absent)."""
    return F.when(
        col.isNull(), F.lit(True)
    ).otherwise(
        F.forall(F.split(col, ","), lambda e: e.rlike(pattern))
    )


def docker_admission(
    containers: DataFrame,
    *,
    allowed_networks: tuple[str, ...] = ("host", "none", "bridge"),
    allowed_runtimes: tuple[str, ...] = ("runc",),
    default_network: str = "host",
    default_image: str | None = None,
    privileged_enabled: bool = False,
    privileged_acl: tuple[str, ...] = (),
    host_pid_enabled: bool = False,
) -> DataFrame:
    """Admission verdict + effective launch knobs per container.

    ``containers``: (container_id, user, image, network, hostname,
    runtime, ports_mapping, mounts, tmpfs_mounts, pid_namespace,
    privileged boolean, service_mode boolean, entry_point boolean —
    the override-disable env; string columns nullable = env absent).

    Returns (container_id, user, verdict, image, network, hostname,
    privileged boolean, host_pid boolean, use_entry_point boolean,
    detach boolean, mount_yarn_dirs boolean)."""
    image = F.coalesce(F.col("image"), F.lit(default_image))
    network = F.coalesce(F.col("network"), F.lit(default_network))
    hostname_ok = F.col("hostname").isNull() | (
        F.col("hostname").rlike(HOSTNAME_RE)
        & (F.length("hostname") <= _HOST_NAME_LENGTH)
    )
    runtime_ok = (
        F.col("runtime").isNull()
        | (F.col("runtime") == "")
        | F.col("runtime").isin(*allowed_runtimes)
    )
    pid_is_host = F.lower(F.col("pid_namespace")) == F.lit("host")
    priv_requested = F.coalesce(F.col("privileged"), F.lit(False))
    acl = (
        F.array(*[F.lit(u) for u in privileged_acl])
        if privileged_acl
        else F.array().cast("array<string>")
    )
    verdict = (
        F.when(~network.isin(*allowed_networks), FAIL_NETWORK)
        .when(~hostname_ok, FAIL_HOSTNAME)
        .when(image.isNull() | ~image.rlike(IMAGE_RE), FAIL_IMAGE)
        .when(~runtime_ok, FAIL_RUNTIME)
        .when(
            ~_all_elements_match(F.col("ports_mapping"), PORTS_RE),
            FAIL_PORTS,
        )
        .when(
            ~_all_elements_match(F.col("mounts"), MOUNT_RE), FAIL_MOUNTS
        )
        .when(
            ~_all_elements_match(F.col("tmpfs_mounts"), TMPFS_RE),
            FAIL_TMPFS,
        )
        .when(
            F.coalesce(pid_is_host, F.lit(False))
            & F.lit(not host_pid_enabled),
            FAIL_PID_NS,
        )
        .when(
            priv_requested & F.lit(not privileged_enabled),
            FAIL_PRIVILEGED_DISABLED,
        )
        .when(
            priv_requested & ~F.array_contains(acl, F.col("user")),
            FAIL_PRIVILEGED_ACL,
        )
        .otherwise(ALLOWED)
    )
    service = F.coalesce(F.col("service_mode"), F.lit(False))
    use_ep = service | F.coalesce(F.col("entry_point"), F.lit(False))
    # Host-network containers only carry a hostname when one was
    # explicitly requested (setHostname:500-531).
    eff_hostname = F.when(
        (network == "host") & F.col("hostname").isNull(),
        F.lit(None).cast("string"),
    ).otherwise(F.col("hostname"))
    return containers.select(
        "container_id",
        "user",
        verdict.alias("verdict"),
        image.alias("image"),
        network.alias("network"),
        eff_hostname.alias("hostname"),
        (priv_requested & (verdict == ALLOWED)).alias("privileged"),
        (
            F.coalesce(pid_is_host, F.lit(False))
            & F.lit(host_pid_enabled)
        ).alias("host_pid"),
        use_ep.alias("use_entry_point"),
        (~use_ep).alias("detach"),
        (~service).alias("mount_yarn_dirs"),
    )


def canonical_mounts(containers: DataFrame) -> DataFrame:
    """Explode-free user-mount canonicalization
    (launchContainer:695-729): per element, mode defaults to "rw" and
    a bare propagation mode (shared/rslave/...) is rewritten to
    ``rw+<prop>``. Returns (container_id, mount_spec array<string> of
    ``src:dst:mode``)."""
    elem_mode = lambda e: F.coalesce(  # noqa: E731
        F.regexp_extract(e, MOUNT_RE, 3), F.lit("")
    )
    canon = F.transform(
        F.split(F.col("mounts"), ","),
        lambda e: F.concat(
            F.regexp_extract(e, MOUNT_RE, 1),
            F.lit(":"),
            F.regexp_extract(e, MOUNT_RE, 2),
            F.lit(":"),
            F.when(elem_mode(e) == "", F.lit("rw"))
            .when(
                elem_mode(e).rlike(r"^:(r[ow])"),
                F.regexp_extract(e, MOUNT_RE, 4),
            )
            .otherwise(F.concat(F.lit("rw+"), F.substring(elem_mode(e), 2, 1024))),
        ),
    )
    return containers.select(
        "container_id",
        F.when(F.col("mounts").isNull(), F.array().cast("array<string>"))
        .otherwise(canon)
        .alias("mount_spec"),
    )
