"""Object-store access (SURVEY §2.1 last row).

Reference parity: `datafusion-cli/src/object_storage.rs` registers
s3/gcs/http object stores so any scan can read remote URLs. Spark's
equivalent is the Hadoop FileSystem connector layer — the same
`spark.read.parquet(url)` works against `s3a://`, `gs://`, `abfss://`,
or `https://` once the filesystem implementation and credentials are
configured. No engine code changes: every operator in this repo takes a
path, and the path's scheme picks the connector.

This container ships no cloud connector jars and has no network, so the
helpers below only assemble configuration (pure dict-in/dict-out,
tested), and `read_remote` fails with a clear message instead of a
Hadoop class-not-found stack.

At 100 TB this layer is where the real deployment lives: S3A exposes
committers (`spark.hadoop.fs.s3a.committer.name=magic` avoids
rename-based commits), connection pools sized to executor count, and
prefetching (`fs.s3a.experimental.input.fadvise=random` for column
pruning workloads) — captured as defaults here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

S3A_DEFAULTS = {
    # committer: direct-to-final-path commit, no driver-side rename storm
    "spark.hadoop.fs.s3a.committer.name": "magic",
    # columnar scans seek: random fadvise beats sequential readahead
    "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
    # pool sized for wide executors; defaults starve 32-core executors
    "spark.hadoop.fs.s3a.connection.maximum": "96",
    "spark.hadoop.fs.s3a.threads.max": "64",
    # multipart upload sizing for large shuffles/writes
    "spark.hadoop.fs.s3a.multipart.size": "67108864",
    "spark.hadoop.fs.s3a.fast.upload": "true",
}


def s3a_conf(
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    anonymous: bool = False,
) -> dict[str, str]:
    """Build the spark conf dict for an S3-compatible store. Pass the
    result to session.get_spark(extra_conf=...). Credential-free
    (instance-profile / IRSA) setups omit the keys entirely."""
    conf = dict(S3A_DEFAULTS)
    if access_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
    if secret_key:
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if anonymous:
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    return conf


def read_remote(spark: SparkSession, url: str, fmt: str = "parquet") -> DataFrame:
    """Scan a remote object-store URL (s3a://, gs://, abfss://, ...).
    Raises RuntimeError with a setup hint when the connector jars are
    absent (as in this container)."""
    try:
        return spark.read.format(fmt).load(url)
    except Exception as e:  # hadoop-aws / connector jar missing, or no network
        raise RuntimeError(
            f"object-store read of {url!r} failed — deploy with the matching "
            "connector on the classpath (e.g. hadoop-aws + aws-sdk for s3a://) "
            f"and credentials from sources.object_store.s3a_conf(): {e}"
        ) from e
