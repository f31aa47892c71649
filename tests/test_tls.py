"""TLS on the HTTP transport — server/mcp_server.py `_tls_context` +
`serve_http` cert/key wiring.

Parity target: the reference exercises TLS transport configuration
extensively (reference internal/trino/client_test.go:500-647 — https
scheme detection, custom cert pools, handshake failure modes).  Here
the engine *serves* TLS: a self-signed cert round-trip, a client that
refuses the cert without trust, and the both-or-neither startup check.
"""

import datetime
import json
import ssl
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest


@pytest.fixture(scope="module")
def cert_and_key(tmp_path_factory):
    """Self-signed localhost certificate via `cryptography`."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    d = tmp_path_factory.mktemp("tls")
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost")]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_p, key_p = d / "cert.pem", d / "key.pem"
    cert_p.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_p.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return str(cert_p), str(key_p)


@pytest.fixture()
def https_server(cert_and_key):
    from server.mcp_server import MCPServer, _HTTPHandler, _tls_context

    cert, key = cert_and_key
    httpd = ThreadingHTTPServer(
        ("localhost", 0), _HTTPHandler.make(MCPServer(spark=None))
    )
    port = httpd.server_address[1]
    httpd.socket = _tls_context(cert, key).wrap_socket(
        httpd.socket, server_side=True
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port, cert
    httpd.shutdown()


def test_https_round_trip(https_server):
    """A client trusting the cert completes a JSON-RPC call over TLS."""
    port, cert = https_server
    ctx = ssl.create_default_context(cafile=cert)
    req = urllib.request.Request(
        f"https://localhost:{port}/mcp",
        data=json.dumps(
            {"jsonrpc": "2.0", "id": 1, "method": "tools/list"}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, context=ctx) as resp:
        assert resp.status == 200
        body = json.loads(resp.read())
    assert "result" in body and "tools" in body["result"]


def test_untrusted_client_fails_handshake(https_server):
    """Without the cert in its trust store the client must refuse —
    i.e. the transport really is TLS, not plaintext on a fancy port."""
    import urllib.error

    port, _cert = https_server
    with pytest.raises((ssl.SSLError, urllib.error.URLError)) as exc_info:
        urllib.request.urlopen(
            f"https://localhost:{port}/status",
            context=ssl.create_default_context(),
        )
    assert "CERTIFICATE_VERIFY_FAILED" in str(exc_info.value)


def test_plain_http_to_tls_port_fails(https_server):
    port, _cert = https_server
    with pytest.raises(Exception):
        urllib.request.urlopen(f"http://localhost:{port}/status", timeout=5)


def test_min_version_is_tls12(cert_and_key):
    from server.mcp_server import _tls_context

    ctx = _tls_context(*cert_and_key)
    assert ctx.minimum_version >= ssl.TLSVersion.TLSv1_2


def test_cert_without_key_fails_fast(monkeypatch, cert_and_key):
    from server.mcp_server import serve_http

    cert, _key = cert_and_key
    monkeypatch.setenv("MCP_TLS_CERT", cert)
    monkeypatch.delenv("MCP_TLS_KEY", raising=False)
    with pytest.raises(RuntimeError, match="must be set together"):
        serve_http(port=0)
