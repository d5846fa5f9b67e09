"""SSL certificate extraction: DER -> the reference's cert-info surface
as typed columns (one Arrow stage over the host dimension).

Reference: crawl4ai/ssl_certificate.py:30-84 builds a cert-info dict from
the peer's DER via pyOpenSSL — subject / issuer component dicts, version,
``hex(serial_number)``, notBefore/notAfter ASN.1 time strings, sha256
fingerprint, signature algorithm, base64 raw_cert — attached to
``CrawlResult.ssl_certificate`` (models.py:159) when
``fetch_ssl_certificate=True`` (async_configs.py:742), with to_pem /
to_der / to_json exports (ssl_certificate.py:117-184).

pyOpenSSL does not exist in this sandbox, so ``parse_cert_der`` is a
from-scratch minimal ASN.1/X.509 reader (TLV walker over the RFC 5280
layout) covering the fields the reference exports.  Documented
divergences from the pyOpenSSL surface:

- ``fingerprint`` is the plain lowercase sha256 hex of the DER.  The
  reference stores ``x509.digest("sha256").hex()`` — pyOpenSSL's digest()
  already returns ASCII ``b"AA:BB:..."``, so ``.hex()`` hex-encodes that
  ASCII a second time (ssl_certificate.py:66); the double encoding is a
  quirk, not information, and is one ``hexlify(':'.join(...).upper())``
  away for byte parity.
- ``not_before``/``not_after`` are returned exactly as stored (UTCTime
  ``YYMMDDHHMMSSZ`` here); pyOpenSSL expands UTCTime to a four-digit
  year.  ``asn1_time_to_iso`` provides the expanded form.

Scale shape: certificates are a HOST dimension (one handshake per host,
reference does one per fetched page only because it is single-URL
oriented) — parse once per host in one mapInPandas pass (thousands of
rows), broadcast-join the struct back to pages.  Malformed DER yields
``ssl_ok=false`` with null fields (allow-on-error: a bad cert must not
kill the crawl, matching from_url's None, ssl_certificate.py:82-84).
"""

from __future__ import annotations

import base64
import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "parse_cert_der",
    "asn1_time_to_iso",
    "cert_to_pem",
    "ssl_certificate_stage",
]

_SIG_ALGS = {
    "1.2.840.113549.1.1.5": "sha1WithRSAEncryption",
    "1.2.840.113549.1.1.11": "sha256WithRSAEncryption",
    "1.2.840.113549.1.1.12": "sha384WithRSAEncryption",
    "1.2.840.113549.1.1.13": "sha512WithRSAEncryption",
    "1.2.840.10045.4.3.2": "ecdsa-with-SHA256",
    "1.2.840.10045.4.3.3": "ecdsa-with-SHA384",
}

_ATTR_NAMES = {
    "2.5.4.3": "CN", "2.5.4.6": "C", "2.5.4.7": "L", "2.5.4.8": "ST",
    "2.5.4.10": "O", "2.5.4.11": "OU",
}

_OID_SAN = "2.5.29.17"


# ----------------------------------------------------------- TLV reader

def _read_tlv(data: bytes, pos: int) -> tuple[int, bytes, int]:
    """-> (tag, body, next_pos); raises ValueError on truncation."""
    if pos + 2 > len(data):
        raise ValueError("truncated TLV header")
    tag = data[pos]
    ln = data[pos + 1]
    pos += 2
    if ln & 0x80:
        n = ln & 0x7F
        if n == 0 or pos + n > len(data):
            raise ValueError("bad length")
        ln = int.from_bytes(data[pos:pos + n], "big")
        pos += n
    if pos + ln > len(data):
        raise ValueError("truncated body")
    return tag, data[pos:pos + ln], pos + ln


def _children(body: bytes) -> list[tuple[int, bytes]]:
    out, pos = [], 0
    while pos < len(body):
        tag, val, pos = _read_tlv(body, pos)
        out.append((tag, val))
    return out


def _decode_oid(body: bytes) -> str:
    arcs = [body[0] // 40, body[0] % 40]
    v = 0
    for b in body[1:]:
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            arcs.append(v)
            v = 0
    return ".".join(str(a) for a in arcs)


def _decode_name(body: bytes) -> dict[str, str]:
    """RDNSequence -> {attr: value} (last wins on repeats, like the
    reference's dict(get_components()), ssl_certificate.py:60-61)."""
    out: dict[str, str] = {}
    for _tag, rdn in _children(body):          # SET
        for _t2, ava in _children(rdn):        # SEQUENCE
            kids = _children(ava)
            if len(kids) != 2:
                continue
            oid = _decode_oid(kids[0][1])
            out[_ATTR_NAMES.get(oid, oid)] = kids[1][1].decode(
                "utf-8", "replace")
    return out


def asn1_time_to_iso(t: str) -> str:
    """UTCTime 'YYMMDDHHMMSSZ' -> 'YYYYMMDDHHMMSSZ' (RFC 5280 §4.1.2.5:
    YY < 50 is 20YY); GeneralizedTime passes through."""
    if len(t) == 13:
        century = "20" if int(t[:2]) < 50 else "19"
        return century + t
    return t


def parse_cert_der(der: bytes) -> dict:
    """DER -> the reference's cert-info dict (field names per
    ssl_certificate.py:59-79; divergences in the module docstring)."""
    _tag, cert, _ = _read_tlv(der, 0)
    tbs_raw, sigalg_raw, _sig_raw = _children(cert)[:3]
    tbs = _children(tbs_raw[1])
    i = 0
    version = 0
    if tbs[0][0] == 0xA0:  # [0] EXPLICIT version
        version = int.from_bytes(_children(tbs[0][1])[0][1], "big")
        i = 1
    serial = int.from_bytes(tbs[i][1], "big")
    issuer = _decode_name(tbs[i + 2][1])
    validity = _children(tbs[i + 3][1])
    subject = _decode_name(tbs[i + 4][1])
    sig_oid = _decode_oid(_children(sigalg_raw[1])[0][1])
    san: list[str] = []
    for tag, val in tbs[i + 5:]:
        if tag != 0xA3:  # [3] extensions
            continue
        for _t, ext in _children(_children(val)[0][1]):
            kids = _children(ext)
            if _decode_oid(kids[0][1]) != _OID_SAN:
                continue
            octets = kids[-1][1]  # skip optional critical BOOLEAN
            _t2, names, _ = _read_tlv(octets, 0)
            san = [v.decode("ascii", "replace")
                   for t2, v in _children(names) if t2 == 0x82]
    return {
        "version": version,
        "serial_number": hex(serial),
        "not_before": validity[0][1].decode("ascii"),
        "not_after": validity[1][1].decode("ascii"),
        "subject": subject,
        "issuer": issuer,
        "signature_algorithm": _SIG_ALGS.get(sig_oid, sig_oid),
        "fingerprint": hashlib.sha256(der).hexdigest(),
        "san": san,
        "raw_cert": base64.b64encode(der).decode("ascii"),
    }


def cert_to_pem(der: bytes) -> str:
    """DER -> PEM (ssl_certificate.py:117-140 to_pem, sans pyOpenSSL)."""
    b64 = base64.b64encode(der).decode("ascii")
    lines = [b64[i:i + 64] for i in range(0, len(b64), 64)]
    return ("-----BEGIN CERTIFICATE-----\n"
            + "\n".join(lines) + "\n-----END CERTIFICATE-----\n")


# ---------------------------------------------------------- Spark stage

_OUT_FIELDS = (
    "ssl_ok boolean, ssl_version int, ssl_serial string, "
    "ssl_not_before string, ssl_not_after string, ssl_subject_cn string, "
    "ssl_issuer_cn string, ssl_issuer_o string, ssl_sig_alg string, "
    "ssl_fingerprint string, ssl_san array<string>, ssl_pem string"
)

_NULLS = {
    "ssl_ok": False, "ssl_version": None, "ssl_serial": None,
    "ssl_not_before": None, "ssl_not_after": None, "ssl_subject_cn": None,
    "ssl_issuer_cn": None, "ssl_issuer_o": None, "ssl_sig_alg": None,
    "ssl_fingerprint": None, "ssl_san": None, "ssl_pem": None,
}


def ssl_certificate_stage(df: DataFrame,
                          der_col: str = "cert_der") -> DataFrame:
    """Adds the flattened cert-info columns (ssl_* above) by parsing
    ``der_col``; null/malformed DER -> ssl_ok=false, null fields."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for der in b[der_col]:
                if der is None:
                    rows.append(dict(_NULLS))
                    continue
                try:
                    info = parse_cert_der(bytes(der))
                    rows.append({
                        "ssl_ok": True,
                        "ssl_version": info["version"],
                        "ssl_serial": info["serial_number"],
                        "ssl_not_before": info["not_before"],
                        "ssl_not_after": info["not_after"],
                        "ssl_subject_cn": info["subject"].get("CN"),
                        "ssl_issuer_cn": info["issuer"].get("CN"),
                        "ssl_issuer_o": info["issuer"].get("O"),
                        "ssl_sig_alg": info["signature_algorithm"],
                        "ssl_fingerprint": info["fingerprint"],
                        "ssl_san": info["san"],
                        "ssl_pem": cert_to_pem(bytes(der)),
                    })
                except Exception:
                    rows.append(dict(_NULLS))
            ext = pd.DataFrame(rows, index=b.index)
            yield pd.concat([b, ext], axis=1)

    return df.mapInPandas(parse, f"{fields}, {_OUT_FIELDS}")
