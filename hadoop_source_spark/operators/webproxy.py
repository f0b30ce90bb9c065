"""YARN web-proxy URL plumbing: proxied tracking-URL construction /
parsing and the AM-side AmIpFilter request-routing matrix.

Reference semantics (`hadoop-yarn-server-web-proxy/.../ProxyUriUtils.java`
and `amfilter/AmIpFilter.java`, pinned by `TestProxyUriUtils.java` /
`TestAmFilter.java`):

- Proxy paths (ProxyUriUtils): ``/proxy/<appId>[/<rest>]``, and the
  redirect form ``/proxy/redirect/<appId>[/<rest>]`` (getPath:66-105);
  ``getPathAndQuery:112-128`` appends the query string and the
  ``proxyapproved=true`` parameter when approved.
- AmIpFilter.doFilter:134-190: a request whose remote address is NOT
  one of the resolved proxy addresses is REDIRECTED to the proxy:
  redirect URL = <redirect base> + requestURI, with ``/redirect``
  inserted immediately after the ``/proxy`` path component (so the RM
  proxy recognizes the bounce), and the query string re-appended.
  A request FROM the proxy passes through: with an AmIpPrincipal when
  the ``proxy-user`` cookie is present (WebAppProxyServlet.
  PROXY_USER_COOKIE_NAME), anonymously otherwise.
- findRedirectUrl:193-214: a single configured proxy URI base is used
  directly; under RM HA the first base whose RM URL is healthy wins.

Spark-first: URL build/parse are pure string projections (codegen);
the filter matrix is a broadcast join of requests against the resolved
proxy-address set plus one chained when() — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROXY_BASE = "/proxy/"
REDIRECT = "redirect/"
PROXY_USER_COOKIE_NAME = "proxy-user"

REDIRECT_ACTION = "REDIRECT"
PASS_WITH_USER = "PASS_WITH_USER"
PASS_ANON = "PASS_ANON"

# /proxy/[redirect/]<appId>[/rest]
_PROXY_PATH_RE = (
    r"^/proxy/(redirect/)?(application_[0-9]+_[0-9]+)(/.*)?$"
)


def proxy_path(
    app_id: Column, rest: Column | None = None, redirected: bool = False
) -> Column:
    """getPath:66-105 — the proxied path for an application."""
    base = F.concat(
        F.lit(PROXY_BASE + (REDIRECT if redirected else "")), app_id
    )
    if rest is None:
        return base
    return F.when(rest.isNull(), base).otherwise(
        F.concat(base, F.lit("/"), rest)
    )


def parse_proxy_path(path: Column):
    """Inverse of :func:`proxy_path`: (is_proxy, redirected, app_id,
    rest) columns from a request path — the tracking-URL recognizer."""
    is_proxy = path.rlike(_PROXY_PATH_RE)
    redirected = F.regexp_extract(path, _PROXY_PATH_RE, 1) == REDIRECT
    app_id = F.when(
        is_proxy, F.regexp_extract(path, _PROXY_PATH_RE, 2)
    )
    g3 = F.regexp_extract(path, _PROXY_PATH_RE, 3)
    rest = F.when(is_proxy & (g3 != ""), F.substring(g3, 2, 1 << 30))
    return is_proxy, redirected, app_id, rest


def am_filter_matrix(
    requests: DataFrame,
    proxy_addresses: tuple[str, ...],
    redirect_base: str,
) -> DataFrame:
    """AmIpFilter.doFilter decision per request.

    ``requests``: (req_id, remote_addr, request_uri, query_string
    nullable, cookie_user nullable). Returns (req_id, action,
    redirect_url nullable, principal nullable)."""
    from_proxy = F.col("remote_addr").isin(*proxy_addresses)
    # the reference concatenates base + requestURI FIRST and inserts
    # "/redirect" after the first "/proxy" of the COMBINED string
    # (doFilter:147-159) — mirrored exactly via a zero-length overlay
    combined = F.concat(F.lit(redirect_base), F.col("request_uri"))
    pos = F.instr(combined, "/proxy")
    bounced = F.when(
        pos > 0,
        F.overlay(combined, F.lit("/redirect"), pos + 6, F.lit(0)),
    ).otherwise(combined)
    with_query = F.when(
        F.col("query_string").isNotNull() & (F.col("query_string") != ""),
        F.concat(bounced, F.lit("?"), F.col("query_string")),
    ).otherwise(bounced)
    action = (
        F.when(~from_proxy, REDIRECT_ACTION)
        .when(F.col("cookie_user").isNotNull(), PASS_WITH_USER)
        .otherwise(PASS_ANON)
    )
    return requests.select(
        "req_id",
        action.alias("action"),
        F.when(~from_proxy, with_query).alias("redirect_url"),
        F.when(from_proxy, F.col("cookie_user")).alias("principal"),
    )
