"""Object-store access (SURVEY §2.1 last row).

Reference parity: `datafusion-cli/src/object_storage.rs` registers
s3/gcs/http object stores so any scan can read remote URLs; the
underlying `object_store` crate does list + ranged reads + parquet
footer pruning against any scheme.

Two paths here:

1. **JVM connector layer** (production default): the same
   `spark.read.parquet(url)` works against `s3a://`, `gs://`,
   `abfss://` once the connector jars and credentials are configured —
   `s3a_conf()` assembles the tuned conf (committers, pools,
   fadvise). This container ships no cloud jars and has no network, so
   `read_remote` fails with a setup hint instead of a Hadoop
   class-not-found stack.

2. **Arrow-native scan** (`object_store_scan`, executable here): the
   direct analogue of the reference's object_store crate — driver
   lists the URI via `pyarrow.fs.FileSystem.from_uri`, reads ONE
   parquet footer for the schema, and executors open the same
   filesystem and stream record batches via `mapInArrow`. The code
   path is scheme-generic (`file://` exercised in tests; `s3://` /
   `gs://` resolve to pyarrow's S3/GCS filesystems with credentials
   from the standard env/instance chain — no JVM jars needed). Column
   pruning is pushed to the parquet reader per-file.

At 100 TB the JVM path is where the real deployment lives: S3A exposes
committers (`spark.hadoop.fs.s3a.committer.name=magic` avoids
rename-based commits), connection pools sized to executor count, and
prefetching (`fs.s3a.experimental.input.fadvise=random` for column
pruning workloads) — captured as defaults here. The Arrow path scales
by file-granular tasks (one task per object, batches streamed, never
materializing a file in memory); pair it with ~128-512 MB objects, the
same layout discipline sources/compact.py enforces for local parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _list_objects(url: str, fmt: str):
    """Resolve a URI to (filesystem, data file paths, root path).
    Hidden and commit-marker files (_SUCCESS, dotfiles) are skipped,
    matching both Spark's and the reference's listers."""
    import pyarrow.fs as pafs

    fs, path = pafs.FileSystem.from_uri(url)
    info = fs.get_file_info(path)
    if info.type == pafs.FileType.Directory:
        ext = {"parquet": ".parquet", "csv": ".csv"}[fmt]
        sel = pafs.FileSelector(path, recursive=True)
        files = sorted(
            f.path
            for f in fs.get_file_info(sel)
            if f.type == pafs.FileType.File
            and not f.base_name.startswith(("_", "."))
            and f.base_name.endswith(ext)
        )
    elif info.type == pafs.FileType.File:
        files = [path]
    else:
        raise FileNotFoundError(f"object-store URI not found: {url!r}")
    if not files:
        raise FileNotFoundError(f"no {fmt} objects under {url!r}")
    return fs, files, path


def _partition_spec(files: list[str], root: str) -> list[str]:
    """Hive-style partition keys from the directory layout (`k=v` path
    segments between root and file). All files must agree on the key
    sequence — partition values live in directory NAMES, not file
    footers, so ignoring them would silently drop columns."""
    specs = set()
    for f in files:
        rel = f[len(root):].strip("/")
        keys = tuple(
            seg.split("=", 1)[0] for seg in rel.split("/")[:-1] if "=" in seg
        )
        specs.add(keys)
    if len(specs) > 1:
        raise ValueError(
            f"inconsistent hive partition layouts under {root!r}: {sorted(specs)}"
        )
    return list(specs.pop()) if specs else []


def _partition_values(path: str, root: str, keys: list[str]) -> list[str]:
    rel = path[len(root):].strip("/")
    vals = dict(
        seg.split("=", 1) for seg in rel.split("/")[:-1] if "=" in seg
    )
    return [vals[k] for k in keys]


def object_store_scan(
    spark: SparkSession,
    url: str,
    fmt: str = "parquet",
    columns: list[str] | None = None,
    partitions: dict[str, str] | None = None,
) -> DataFrame:
    """Distributed scan of any pyarrow-filesystem URI (file://, s3://,
    gs://, hdfs://) without JVM connector jars — the executable analogue
    of the reference's object_store crate (list → per-object ranged
    reads → Arrow batches).

    Driver work is bounded: one LIST plus one schema probe (parquet:
    footer only; csv: first block via the streaming reader). Executors
    re-open the filesystem from the URI (pyarrow filesystems are not
    pickled) and stream batches, so a file is never fully materialized.
    Column pruning is pushed into the parquet reader; CSV files decode
    with the DRIVER-probed schema (ConvertOptions), so per-file
    inference drift cannot corrupt the declared types.

    Hive-style `k=v` directories surface as STRING partition columns
    appended after the file columns (Spark's layout; type inference
    deliberately not applied — cast downstream). All data files must
    share one schema: a file whose arrow schema diverges from the probe
    fails with a clear per-file error (schema-evolved layouts: use
    spark.read.option("mergeSchema", True) through a connector instead)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    fs, files, root = _list_objects(url, fmt)
    part_keys = _partition_spec(files, root)
    if partitions:
        # List-level partition pruning (the reference's hive-partition
        # pruning, listing/helpers.rs): equality predicates on k=v
        # directory keys drop whole objects BEFORE any read — at scale
        # this is the difference between scanning one partition and
        # listing-then-filtering the lake.
        unknown = set(partitions) - set(part_keys)
        if unknown:
            raise ValueError(
                f"partition filter on non-partition keys {sorted(unknown)}; "
                f"layout has {part_keys or 'no partition columns'}"
            )
        files = [
            f
            for f in files
            if all(
                dict(zip(part_keys, _partition_values(f, root, part_keys)))[k] == v
                for k, v in partitions.items()
            )
        ]
        if not files:
            raise FileNotFoundError(
                f"no objects match partition filter {partitions} under {url!r}"
            )

    if fmt == "parquet":
        import pyarrow.parquet as pq

        with fs.open_input_file(files[0]) as fh:
            file_schema = pq.ParquetFile(fh).schema_arrow
        if columns:
            file_schema = pa.schema([file_schema.field(c) for c in columns])
        convert = None
    elif fmt == "csv":
        import pyarrow.csv as pacsv

        with fs.open_input_stream(files[0]) as fh:
            # streaming reader: schema from the first block only — the
            # probe never materializes a whole (possibly multi-GB) object
            file_schema = pacsv.open_csv(fh).schema
        if columns:
            raise ValueError("column pruning is parquet-only in object_store_scan")
        convert = {f.name: f.type for f in file_schema}
    else:
        raise ValueError(f"unsupported format {fmt!r} (parquet|csv)")

    out_schema = pa.schema(
        list(file_schema) + [pa.field(k, pa.string()) for k in part_keys]
    )
    spark_schema = from_arrow_schema(out_schema)
    cols = list(columns) if columns else None

    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(min(len(files), spark.sparkContext.defaultParallelism))

    def scan(batches: Iterator) -> Iterator:
        import pyarrow as pa_x
        import pyarrow.fs as pafs_x

        fs_x, _ = pafs_x.FileSystem.from_uri(url)

        def with_parts(batch: pa_x.RecordBatch, pvals: list[str]) -> pa_x.RecordBatch:
            if not part_keys:
                return batch
            arrays = list(batch.columns) + [
                pa_x.array([v] * batch.num_rows, type=pa_x.string()) for v in pvals
            ]
            return pa_x.RecordBatch.from_arrays(arrays, schema=out_schema)

        for b in batches:
            for p in b.column("path").to_pylist():
                pvals = _partition_values(p, root, part_keys)
                if fmt == "parquet":
                    import pyarrow.parquet as pq_x

                    with fs_x.open_input_file(p) as fh:
                        pf = pq_x.ParquetFile(fh)
                        got = pf.schema_arrow
                        want_names = cols or [f.name for f in file_schema]
                        missing = set(want_names) - set(got.names)
                        if missing:
                            raise ValueError(
                                f"object_store_scan: {p!r} lacks columns "
                                f"{sorted(missing)} present in the probed "
                                "schema — mixed-schema layout (mergeSchema "
                                "is not supported by this scan)"
                            )
                        for batch in pf.iter_batches(columns=cols):
                            if batch.schema != file_schema:
                                batch = batch.cast(file_schema)
                            yield with_parts(batch, pvals)
                else:
                    import pyarrow.csv as pacsv_x

                    opts = pacsv_x.ConvertOptions(column_types=convert)
                    with fs_x.open_input_stream(p) as fh:
                        rd = pacsv_x.open_csv(fh, convert_options=opts)
                        for batch in rd:
                            yield with_parts(batch, pvals)

    return paths_df.mapInArrow(scan, schema=spark_schema)


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
