"""Deterministic X.509 certificate builder (the fixture side of the SSL
tier).

The reference attaches an ``SSLCertificate`` to every crawl result when
``fetch_ssl_certificate=True`` (crawl4ai/async_crawler_strategy.py:547,
models.py:159): a TLS handshake yields the peer's DER bytes, pyOpenSSL
decodes them into a cert-info dict (crawl4ai/ssl_certificate.py:30-84)
with subject / issuer / version / serial_number / not_before / not_after
/ fingerprint / signature_algorithm / raw_cert, exportable as JSON / PEM
/ DER (ssl_certificate.py:102-184).

No TLS endpoint exists in this sandbox, so the handshake is modeled the
same way the fetch stage models HTTP: a deterministic builder that emits
REAL DER — a syntactically valid X.509 v3 certificate assembled with a
minimal ASN.1 encoder (SEQUENCE/SET/INTEGER/OID/UTCTime/BIT STRING...),
round-trippable through ``openssl x509`` — whose field values are pure
functions of the host (``cert_fields``).  The oracle twin reads those
field values straight from the recipe; the engine must recover them by
PARSING the DER (operators/sslcert.py): fields in == fields out, and the
parser is never consulted by the oracle.

The key material is synthetic (hash-derived RSA modulus, fabricated
signature bytes): the certs are structurally real but cryptographically
meaningless, exactly what the plumbing — schema, batching, error
isolation, PEM export — needs.
"""

from __future__ import annotations

import hashlib

__all__ = ["cert_fields", "build_cert_der", "host_certs_df"]


# ------------------------------------------------------------- ASN.1 DER

def _len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _tlv(tag: int, body: bytes) -> bytes:
    return bytes([tag]) + _len(len(body)) + body


def _seq(*parts: bytes) -> bytes:
    return _tlv(0x30, b"".join(parts))


def _set(*parts: bytes) -> bytes:
    return _tlv(0x31, b"".join(parts))


def _int(v: int) -> bytes:
    body = v.to_bytes((v.bit_length() + 8) // 8 or 1, "big")
    return _tlv(0x02, body)


def _oid(dotted: str) -> bytes:
    arcs = [int(a) for a in dotted.split(".")]
    body = bytes([arcs[0] * 40 + arcs[1]])
    for a in arcs[2:]:
        chunk = [a & 0x7F]
        a >>= 7
        while a:
            chunk.append(0x80 | (a & 0x7F))
            a >>= 7
        body += bytes(reversed(chunk))
    return _tlv(0x06, body)


def _utf8(s: str) -> bytes:
    return _tlv(0x0C, s.encode())


def _printable(s: str) -> bytes:
    return _tlv(0x13, s.encode())


def _utctime(s: str) -> bytes:
    """s = 'YYMMDDHHMMSSZ' (UTCTime; certs use it for years < 2050)."""
    return _tlv(0x17, s.encode())


def _bitstring(data: bytes) -> bytes:
    return _tlv(0x03, b"\x00" + data)


def _ctx(n: int, body: bytes) -> bytes:  # [n] EXPLICIT (constructed)
    return _tlv(0xA0 | n, body)


_OID_CN = "2.5.4.3"
_OID_O = "2.5.4.10"
_OID_C = "2.5.4.6"
_OID_SHA256_RSA = "1.2.840.113549.1.1.11"
_OID_RSA = "1.2.840.113549.1.1.1"
_OID_SAN = "2.5.29.17"
_OID_BASIC = "2.5.29.19"


def _name(cn: str, org: str, country: str) -> bytes:
    """RDNSequence in the conventional C / O / CN order, one AVA per RDN.
    C is PrintableString (RFC 5280 mandates it); O/CN are UTF8String."""
    return _seq(
        _set(_seq(_oid(_OID_C), _printable(country))),
        _set(_seq(_oid(_OID_O), _utf8(org))),
        _set(_seq(_oid(_OID_CN), _utf8(cn))),
    )


# ------------------------------------------------------------ the recipe

def _h(host: str, salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(f"{salt}|{host}".encode()).digest()[:8], "big")


def cert_fields(host: str) -> dict:
    """Every certificate field as a pure function of the host — the
    recipe shared by the builder, the engine probe and the oracle twin
    (same contract as warcsynth.record_fields_of: fields in == fields
    out, parser never consulted by the oracle)."""
    issuer_i = _h(host, "issuer") % 4
    serial = _h(host, "serial") | (1 << 60)  # positive, fixed width
    start_day = _h(host, "start") % 364
    mo, dy = start_day // 31 + 1, start_day % 28 + 1
    not_before = f"24{mo:02d}{dy:02d}000000Z"
    end_mo = mo + 3
    not_after = (f"25{end_mo - 12:02d}{dy:02d}235959Z" if end_mo > 12
                 else f"24{end_mo:02d}{dy:02d}235959Z")
    return {
        "host": host,
        "version": 2,  # X.509 v3 (zero-based, as pyOpenSSL reports it)
        "serial_number": hex(serial),  # ssl_certificate.py:63 hex() form
        "not_before": not_before,
        "not_after": not_after,
        "subject_cn": host,
        "subject_o": f"{host.split('.')[0]} Org",
        "subject_c": "SG",
        "issuer_cn": f"Synthetic Root CA {issuer_i}",
        "issuer_o": "Synthetic Trust Services",
        "issuer_c": "US",
        "signature_algorithm": "sha256WithRSAEncryption",
        "san": [host, f"www.{host}"],
    }


def build_cert_der(host: str) -> bytes:
    """DER bytes of an X.509 v3 certificate carrying cert_fields(host).

    Structure per RFC 5280 §4.1: Certificate ::= SEQUENCE
    {tbsCertificate, signatureAlgorithm, signatureValue}.  Key material
    is hash-derived (2048-bit modulus, e=65537) and the signature is
    fabricated — parseable, not verifiable.
    """
    f = cert_fields(host)
    ser = int(f["serial_number"], 16)
    # deterministic 2048-bit modulus: md5 keystream, top bit forced
    stream = b"".join(
        hashlib.md5(f"mod|{host}|{i}".encode()).digest() for i in range(16)
    )
    modulus = int.from_bytes(stream, "big") | (1 << 2047) | 1
    pubkey = _seq(
        _seq(_oid(_OID_RSA), _tlv(0x05, b"")),  # rsaEncryption, NULL
        _bitstring(_seq(_int(modulus), _int(65537))),
    )
    san = _seq(b"".join(
        _tlv(0x82, d.encode()) for d in f["san"]  # [2] IMPLICIT dNSName
    ))
    exts = _ctx(3, _seq(
        _seq(_oid(_OID_SAN), _tlv(0x04, san)),
        _seq(_oid(_OID_BASIC), _tlv(0x04, _seq())),  # CA=false (defaults)
    ))
    sig_alg = _seq(_oid(_OID_SHA256_RSA), _tlv(0x05, b""))
    tbs = _seq(
        _ctx(0, _int(2)),  # version v3
        _int(ser),
        sig_alg,
        _name(f["issuer_cn"], f["issuer_o"], f["issuer_c"]),
        _seq(_utctime(f["not_before"]), _utctime(f["not_after"])),
        _name(f["subject_cn"], f["subject_o"], f["subject_c"]),
        pubkey,
        exts,
    )
    sig = b"".join(
        hashlib.md5(f"sig|{host}|{i}".encode()).digest() for i in range(16)
    )
    return _seq(tbs, sig_alg, _bitstring(sig))


# ----------------------------------------------------------- Spark-side

def host_certs_df(hosts_df, host_col: str = "host"):
    """(host) -> (host, cert_der binary): the handshake stage analog.

    One Arrow pass over the host DIMENSION (certs are per-host, never
    per-URL — fetching them on the frontier side would rebuild the same
    DER millions of times); join the result back to pages on host, as
    the robots dimension does.  Builder errors null the column
    (allow-on-error, matching the reference's from_url returning None,
    ssl_certificate.py:82-84).
    """
    import pandas as pd

    fields = ", ".join(
        f"{fld.name} {fld.dataType.simpleString()}"
        for fld in hosts_df.schema.fields
    )

    def build(batches):
        for b in batches:
            ders = []
            for h in b[host_col]:
                try:
                    ders.append(build_cert_der(str(h)))
                except Exception:  # pragma: no cover - builder is total
                    ders.append(None)
            out = b.copy()
            out["cert_der"] = pd.Series(ders, index=b.index, dtype=object)
            yield out

    return hosts_df.mapInPandas(build, f"{fields}, cert_der binary")
