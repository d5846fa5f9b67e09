"""Driver-side xxh64 must be bit-identical to Spark's F.xxhash64 (seed 42):
the URL-seen key (north_rule) is computed JVM-side in the pipeline and
Python-side in the oracle/bloom sizing."""

from pyspark.sql import functions as F

from crawl4ai_spark.hashing import xxh64_signed

URLS = [
    "",
    "a",
    "https://example.com/",
    "https://d3.example.test/p/000001",
    "x" * 7, "x" * 8, "x" * 9, "x" * 31, "x" * 32, "x" * 33, "x" * 100,
    "日本語のURLパス/ü",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for u in URLS:
        assert got[u] == xxh64_signed(u), f"hash mismatch for {u!r}"


def test_xxh64_binary_matches_spark(spark):
    data = [b"", b"abc", bytes(range(256)), b"\x00" * 40]
    df = spark.createDataFrame([(d,) for d in data], "b binary")
    got = [r["h"] for r in df.select(F.xxhash64("b").alias("h")).collect()]
    assert got == [xxh64_signed(d) for d in data]


def test_oracle_xxh64_twin_matches_spark(spark):
    """The VERIFICATION-INDEPENDENT twin in oracle/expected.py must agree
    with the JVM bit-for-bit (it shares no code with hashing.py)."""
    from crawl4ai_spark.oracle.expected import _xxh64_twin

    df = spark.createDataFrame([(u,) for u in URLS], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for u in URLS:
        signed = _xxh64_twin(u.encode())
        signed = signed - (1 << 64) if signed >= (1 << 63) else signed
        assert got[u] == signed, f"twin mismatch for {u!r}"
