"""Scalar / predicate / auth-chain operators (SURVEY.md §2.2, §2.8):
extension gate, path exclusion, ISO round-trip, interval arithmetic /
token expiry, JSON decode, filename-from-header, auth coalesce chain.

The reference applies these row-at-a-time in request handlers; here each is
one codegen'd column expression over the fact tables. Where the reference
derives inputs from HTTP context (filenames, headers, tokens), the query
synthesizes those columns deterministically from table keys so both the
Spark and DuckDB sides compute them identically.

Reference anchors: ext allow-list file_utils.py:104-110 + config.py:19-21,
path exclusion analytics_middleware.py:26-41, ISO-Z parse
api_token_service.py:122-125 + db.py:111-115, interval arithmetic db.py:116
+ api_token_service.py:70-71, token validity api_token_service.py:99-145,
auth fallback dependencies.py:83-145, filename-from-header
file_utils.py:92-101, JSON decode docs.py:57,97.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALLOWED_EXTS = (".pdf", ".docx", ".doc", ".html", ".txt", ".md")
EXT_POOL = (".pdf", ".docx", ".html", ".txt", ".md", ".exe", ".png")
EXCLUDED_PREFIXES = ("/health", "/metrics", "/error")


def extension_gate(docs: DataFrame) -> DataFrame:
    """F1+X5: synthesize a filename per doc, extract the lowered suffix,
    gate on the allow-list; rejected rows are counted (quarantine), never
    raised — the pipeline must not die on a bad document."""
    fname = F.concat(
        F.lit("doc_"),
        F.col("doc_id").cast("string"),
        F.element_at(
            F.array(*[F.lit(e.upper() if i % 2 else e) for i, e in enumerate(EXT_POOL)]),
            (F.col("doc_id") % len(EXT_POOL) + 1).cast("int"),
        ),
    )
    ext = F.lower(F.regexp_extract(fname, r"(\.[^.]+)$", 1))
    return (
        docs.select(ext.alias("ext"))
        .groupBy("ext")
        .agg(
            F.count("*").alias("n"),
            F.max(F.col("ext").isin(*ALLOWED_EXTS)).alias("allowed"),
        )
    )


def path_exclusion(events: DataFrame) -> DataFrame:
    """F3: drop rows whose synthesized request path starts with any excluded
    prefix — an `exists` higher-order predicate over a literal array, the
    set-membership form of the middleware's startswith chain."""
    path = F.concat(F.lit("/"), F.col("event_type"), F.lit("/"), F.col("user_id").cast("string"))
    excluded = F.exists(
        F.array(*[F.lit(p) for p in EXCLUDED_PREFIXES]),
        lambda p: F.startswith(path, p),
    )
    return (
        events.select(path.alias("path"), excluded.alias("excluded"))
        .filter(~F.col("excluded"))
        .groupBy(F.regexp_extract("path", r"^/([^/]+)/", 1).alias("event_type"))
        .agg(F.count("*").alias("n"))
    )


def iso_roundtrip(events: DataFrame) -> DataFrame:
    """X9: format ts as ISO-8601 with Z suffix, then parse it back with the
    reference's Z -> +00:00 fixup; prove the round-trip via epoch seconds."""
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    parsed = F.to_timestamp(F.regexp_replace(iso, "Z$", "+00:00"), "yyyy-MM-dd'T'HH:mm:ssXXX")
    return events.groupBy("event_type").agg(
        F.min(F.unix_timestamp(parsed)).alias("min_epoch"),
        F.max(F.unix_timestamp(parsed)).alias("max_epoch"),
        F.sum((F.unix_timestamp(parsed) == F.unix_timestamp(F.date_trunc("second", "ts"))).cast("long")).alias("n_roundtrip_ok"),
    )


def token_expiry(events: DataFrame, now: str = "2024-01-15 00:00:00") -> DataFrame:
    """F6+X7+X10: model each event as an API token — token_hash =
    sha256(user), expires_at = created + (1 + value % 30) days. Valid iff
    active (event_type != 'error') AND now <= expires_at (inclusive, like
    api_token_service.py:128)."""
    days = (F.lit(1) + F.floor(F.col("value")) % 30).cast("int")
    expires = F.col("ts") + F.make_interval(days=days)
    active = F.col("event_type") != "error"
    valid = active & (F.lit(now).cast("timestamp") <= expires)
    return (
        events.select(
            F.sha2(F.col("user_id").cast("string"), 256).alias("token_hash"),
            valid.alias("valid"),
        )
        .groupBy("token_hash")
        .agg(
            F.sum(F.col("valid").cast("long")).alias("n_valid"),
            F.sum((~F.col("valid")).cast("long")).alias("n_expired"),
        )
    )


def json_props_decode(events: DataFrame) -> DataFrame:
    """X13: from_json over the `props` JSON column, then aggregate on the
    decoded field (the reference json.loads()es response content)."""
    k = F.from_json("props", "k INT")["k"]
    return (
        events.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_decile"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
    )


def filename_from_header(docs: DataFrame) -> DataFrame:
    """X14: filename = content-disposition match, else URL basename.
    One in three rows has a quoted CD header, one in three unquoted, the
    rest fall back to the URL path."""
    m = F.col("doc_id") % 3
    cd = (
        F.when(m == 0, F.concat(F.lit('attachment; filename="f'), F.col("doc_id").cast("string"), F.lit('.pdf"')))
        .when(m == 1, F.concat(F.lit("attachment; filename=f"), F.col("doc_id").cast("string"), F.lit(".html")))
        .otherwise(F.lit(None).cast("string"))
    )
    url = F.concat(F.lit("http://host/a/b/file"), F.col("doc_id").cast("string"), F.lit(".bin"))
    from_cd = F.regexp_extract(cd, r'filename="?([^";]+)"?', 1)
    fname = F.when(from_cd != "", from_cd).otherwise(F.element_at(F.split(url, "/"), -1))
    return docs.select("doc_id", fname.alias("filename"))


def auth_coalesce(events: DataFrame) -> DataFrame:
    """F7+F8: priority projection — API-token identity, else Firebase
    identity, else anonymous — as a coalesce over two conditional lookups,
    plus the completed/failed status branch."""
    api_uid = F.when(F.col("event_type").isin("click", "view"), F.col("user_id"))
    fb_uid = F.when(F.col("value") > 5.0, F.col("user_id") + 100000)
    uid = F.coalesce(api_uid, fb_uid, F.lit(-1))
    source = (
        F.when(api_uid.isNotNull(), "api_token")
        .when(fb_uid.isNotNull(), "firebase")
        .otherwise("anonymous")
    )
    status = F.when(F.col("event_type") == "error", "failed").otherwise("completed")
    return (
        events.select(uid.alias("uid"), source.alias("auth_source"), status.alias("status"))
        .groupBy("auth_source", "status")
        .agg(F.count("*").alias("n"), F.count_distinct(F.col("uid")).alias("n_uids"))
    )


AES_KEY = "0123456789abcdef"  # test passphrase (reference: settings key)
AES_SALT = b"docling-nlp-api-spark-x16"  # pinned salt for the PBKDF2 path


def _derived_key_hex() -> str:
    """The reference's actual KDF (encryption_utils.py:10-21): PBKDF2-HMAC-
    SHA256, 100k iterations, 32-byte key. Derived ONCE driver-side (as a
    real job would — the KDF runs per key, not per row) and shipped to
    executors as an unhex literal."""
    import hashlib

    return hashlib.pbkdf2_hmac("sha256", AES_KEY.encode(), AES_SALT, 100_000).hex()


def aes_roundtrip(docs: DataFrame) -> DataFrame:
    """X16: AES-256-CBC/PKCS7 with PBKDF2(100k) key derivation — the
    reference's real scheme (encryption_utils.py:10-56). The reference
    draws the IV from os.urandom; determinism (required for testing and
    for idempotent re-runs) comes from deriving the IV from the content:
    iv = unhex(md5(text)). Spark's CBC prepends the IV to the ciphertext
    exactly like the reference's b64encode(iv + ciphertext), so
    - ct_len = 16 (iv) + pkcs7_padded_len
    - iv_hex (first 16 ct bytes) = md5(text), cross-checkable in SQL
    - aes_decrypt reads the prepended IV and must roundtrip exactly."""
    key = f"unhex('{_derived_key_hex()}')"
    ct_sql = f"aes_encrypt(text, {key}, 'CBC', 'PKCS', unhex(md5(text)))"
    # encrypt ONCE behind a Generate barrier: inlining ct_sql into the
    # three consumers below would run the CBC encryption 3x per row
    # (Catalyst has no CSE across sibling scalar expressions) — AES is
    # the most expensive expression in this operator
    staged = docs.select(
        "doc_id", "text",
        F.inline(F.array(F.struct(F.expr(ct_sql).alias("ct")))),
    )
    pt = F.expr(f"cast(aes_decrypt(ct, {key}, 'CBC', 'PKCS') as string)")
    return staged.select(
        "doc_id",
        F.length("ct").alias("ct_len"),
        F.lower(F.hex(F.expr("substring(ct, 1, 16)"))).alias("iv_hex"),
        (pt == F.col("text")).alias("roundtrip_ok"),
    )
