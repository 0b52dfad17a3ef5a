"""SSRF-guarded URL fetcher for /api/fetch.

The reference fetches any URL unchecked (fetch/handlers.rs:21-41); this
service also exposes network-writable vector routes on the same port, so
it must not double as an open proxy. Guarantees:

  - scheme allowlist (http/https only);
  - the target must resolve to a PUBLIC address (no loopback, RFC1918,
    link-local/metadata, reserved, multicast) unless
    MEMEX_FETCH_ALLOW_PRIVATE=1;
  - the connection is PINNED to the vetted IP: the socket connects to the
    exact address the guard approved (Host header / TLS SNI + hostname
    verification carry the original name), closing the DNS-rebinding
    TOCTOU where a 0-TTL name resolves public for the check and loopback
    for the request;
  - redirects are followed manually (relative Locations resolved against
    the current URL) and every hop is re-vetted and re-pinned;
  - response size is capped.
"""

from __future__ import annotations

import ipaddress
import os
import socket
from urllib.parse import urljoin, urlsplit

__all__ = ["guarded_fetch", "vet_target"]


def _allow_private() -> bool:
    return os.environ.get("MEMEX_FETCH_ALLOW_PRIVATE", "") in ("1", "true")


def vet_target(url: str, resolver=socket.getaddrinfo) -> tuple:
    """Validate one hop. Returns (split_result, host, port, pinned_ip).
    The connection is ALWAYS pinned to the resolved address (also under
    MEMEX_FETCH_ALLOW_PRIVATE — which only skips the public-address
    check), so there is exactly one resolve per hop and no second lookup
    for the attacker to answer differently. Raises ValueError on block."""
    parsed = urlsplit(url)
    if parsed.scheme not in ("http", "https"):
        raise ValueError(
            f"scheme {parsed.scheme!r} not allowed (http/https only)")
    host = parsed.hostname
    if not host:
        raise ValueError("missing host")
    port = parsed.port or (443 if parsed.scheme == "https" else 80)
    try:
        infos = resolver(host, port, proto=socket.IPPROTO_TCP)
    except OSError as exc:
        raise ValueError(f"cannot resolve {host!r}: {exc}") from exc
    if not infos:
        raise ValueError(f"cannot resolve {host!r}")
    if not _allow_private():
        for info in infos:
            ip = ipaddress.ip_address(info[4][0])
            if (ip.is_loopback or ip.is_private or ip.is_link_local
                    or ip.is_reserved or ip.is_multicast or ip.is_unspecified):
                raise ValueError(f"target {ip} is not a public address")
    return parsed, host, port, infos[0][4][0]


def _charset(content_type: str | None) -> str:
    if content_type:
        for part in content_type.split(";")[1:]:
            k, _, v = part.strip().partition("=")
            if k.lower() == "charset" and v:
                return v.strip('"\'') or "utf-8"
    return "utf-8"


def _fetch_hop(url: str, max_bytes: int, resolver) -> tuple[str | None, str]:
    """One GET against the vetted+pinned address. Returns
    (absolute_redirect_target, "") or (None, decoded_body)."""
    import certifi
    import urllib3

    parsed, host, port, connect_host = vet_target(url, resolver=resolver)
    if parsed.scheme == "https":
        # TLS rides the pinned socket; SNI + certificate verification use
        # the original hostname, so pinning is invisible to the server.
        pool = urllib3.HTTPSConnectionPool(
            connect_host, port, server_hostname=host, assert_hostname=host,
            cert_reqs="CERT_REQUIRED", ca_certs=certifi.where(),
            timeout=30.0, maxsize=1)
    else:
        pool = urllib3.HTTPConnectionPool(connect_host, port,
                                          timeout=30.0, maxsize=1)
    path = parsed.path or "/"
    if parsed.query:
        path += "?" + parsed.query
    host_hdr = host if port in (80, 443) else f"{host}:{port}"
    try:
        resp = pool.urlopen(
            "GET", path, headers={"Host": host_hdr, "Accept-Encoding": "gzip"},
            redirect=False, retries=False, preload_content=False)
        try:
            if 300 <= resp.status < 400:
                loc = resp.headers.get("Location")
                if not loc:
                    raise ValueError(f"redirect ({resp.status}) without Location")
                # Relative Locations are ubiquitous: resolve against the
                # CURRENT url before the next hop's vetting parses it.
                return urljoin(url, loc), ""
            if resp.status >= 400:
                raise ValueError(f"HTTP {resp.status}")
            chunks, total = [], 0
            for chunk in resp.stream(65536, decode_content=True):
                total += len(chunk)
                if total > max_bytes:
                    raise ValueError(f"response exceeds {max_bytes} bytes")
                chunks.append(chunk)
            enc = _charset(resp.headers.get("Content-Type"))
            try:
                return None, b"".join(chunks).decode(enc, errors="replace")
            except LookupError:
                return None, b"".join(chunks).decode("utf-8", errors="replace")
        finally:
            resp.release_conn()
    finally:
        pool.close()


def guarded_fetch(url: str, max_bytes: int = 8 * 1024 * 1024,
                  max_redirects: int = 5,
                  resolver=socket.getaddrinfo) -> str:
    """Fetch `url` with the SSRF guard; returns the decoded body text.
    Raises ValueError on any blocked/oversize/over-redirected target."""
    target = url
    for _ in range(max_redirects + 1):
        redirect, body = _fetch_hop(target, max_bytes, resolver)
        if redirect is None:
            return body
        target = redirect
    raise ValueError("too many redirects")
