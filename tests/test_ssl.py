"""SSL certificate tier: builder -> parser round-trip, openssl
cross-validation, error isolation, and the Spark stage."""

import shutil
import subprocess
import tempfile

import pytest

from crawl4ai_spark.operators.sslcert import (
    asn1_time_to_iso,
    cert_to_pem,
    parse_cert_der,
    ssl_certificate_stage,
)
from crawl4ai_spark.sources.sslsynth import (
    build_cert_der,
    cert_fields,
    host_certs_df,
)

HOSTS = ["a.test", "shop.example.test", "x-y.co.uk", "d7.corpus.test",
         "very.long.subdomain.chain.example.org"]


def test_round_trip_fields():
    for h in HOSTS:
        f = cert_fields(h)
        info = parse_cert_der(build_cert_der(h))
        assert info["version"] == 2
        assert info["serial_number"] == f["serial_number"]
        assert info["not_before"] == f["not_before"]
        assert info["not_after"] == f["not_after"]
        assert info["subject"] == {"C": f["subject_c"], "O": f["subject_o"],
                                   "CN": f["subject_cn"]}
        assert info["issuer"]["CN"] == f["issuer_cn"]
        assert info["signature_algorithm"] == f["signature_algorithm"]
        assert info["san"] == [h, f"www.{h}"]


def test_openssl_cross_validation():
    """The synthetic DER must be real X.509 to an independent parser."""
    if not shutil.which("openssl"):
        pytest.skip("no openssl binary")
    h = HOSTS[1]
    der = build_cert_der(h)
    with tempfile.NamedTemporaryFile(suffix=".der") as fh:
        fh.write(der)
        fh.flush()
        out = subprocess.run(
            ["openssl", "x509", "-inform", "der", "-in", fh.name,
             "-noout", "-subject", "-serial", "-fingerprint", "-sha256"],
            capture_output=True, text=True,
        )
    assert out.returncode == 0, out.stderr
    assert f"CN={h}" in out.stdout.replace(" = ", "=")
    f = cert_fields(h)
    assert f["serial_number"][2:].upper() in out.stdout  # serial=...
    fp = parse_cert_der(der)["fingerprint"]
    got = [ln.split("=", 1)[1].replace(":", "").lower()
           for ln in out.stdout.splitlines() if "Fingerprint" in ln]
    assert got == [fp]


def test_error_isolation():
    for junk in (b"", b"\x30\x03\x02\x01", b"not a cert at all"):
        with pytest.raises(ValueError):
            parse_cert_der(junk)


def test_pem_shape():
    pem = cert_to_pem(build_cert_der("a.test"))
    lines = pem.strip().splitlines()
    assert lines[0] == "-----BEGIN CERTIFICATE-----"
    assert lines[-1] == "-----END CERTIFICATE-----"
    assert all(len(ln) <= 64 for ln in lines[1:-1])
    if shutil.which("openssl"):
        out = subprocess.run(
            ["openssl", "x509", "-noout", "-subject"],
            input=pem, capture_output=True, text=True,
        )
        assert out.returncode == 0, out.stderr


def test_utctime_expansion():
    assert asn1_time_to_iso("240101000000Z") == "20240101000000Z"
    assert asn1_time_to_iso("991231235959Z") == "19991231235959Z"
    assert asn1_time_to_iso("20240101000000Z") == "20240101000000Z"


def test_spark_stage(spark):
    hosts = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    got = {
        r["host"]: r
        for r in ssl_certificate_stage(host_certs_df(hosts)).collect()
    }
    assert len(got) == len(HOSTS)
    for h in HOSTS:
        f = cert_fields(h)
        r = got[h]
        assert r["ssl_ok"] and r["ssl_subject_cn"] == h
        assert r["ssl_serial"] == f["serial_number"]
        assert r["ssl_issuer_cn"] == f["issuer_cn"]
        assert r["ssl_san"] == [h, f"www.{h}"]
        assert r["ssl_pem"].startswith("-----BEGIN CERTIFICATE-----")


def test_spark_stage_null_and_garbage(spark):
    df = spark.createDataFrame(
        [("good.test", build_cert_der("good.test")),
         ("bad.test", b"\x00garbage"), ("none.test", None)],
        "host string, cert_der binary",
    )
    rows = {r["host"]: r for r in ssl_certificate_stage(df).collect()}
    assert rows["good.test"]["ssl_ok"]
    assert not rows["bad.test"]["ssl_ok"]
    assert rows["bad.test"]["ssl_fingerprint"] is None
    assert not rows["none.test"]["ssl_ok"]


def test_deep_crawl_flag(spark):
    """fetch_ssl_certificate=True attaches ssl_* columns to results."""
    from crawl4ai_spark.plans.frontier import CrawlConfig, deep_crawl
    from crawl4ai_spark.sources.synth import GraphParams, synth_local, url_of

    params = GraphParams(n_pages=30, n_domains=3, mean_degree=4, seed=42)
    pages, links, _ = synth_local(params)
    run = deep_crawl(
        spark, [url_of(0, params)], spark.createDataFrame(pages),
        spark.createDataFrame(links),
        CrawlConfig(strategy="bfs", max_depth=1,
                    fetch_ssl_certificate=True),
    )
    rows = run.results.collect()
    assert rows, "crawl produced no results"
    for r in rows:
        assert r["ssl_ok"] and r["ssl_subject_cn"] == r["host"]
        f = cert_fields(r["host"])
        assert r["ssl_serial"] == f["serial_number"]
