"""File-metadata enrichment (SURVEY §2 A6).

The reference attaches per-input-file header fields before the ETL pipeline
runs: download/upload URL, scheme, host, port, path, name, length,
last-modified, owner/group/permissions, plus ``base_id``
(mr/morphline/MorphlineMapRunner.java:218-255; field names
mr/HdfsFileFieldNames.java:25-40; URI decomposition mr/PathParts.java:31-133).

Spark-first: everything except owner/permissions comes from the scan itself
via the hidden ``_metadata`` struct (no extra I/O, no UDF).  POSIX
owner/group/permission bits are not exposed by Spark's file index; when
needed they are stat'ed EXECUTOR-side over the distinct-paths DataFrame
(``mapInPandas``) and broadcast-joined back — the reference's mappers stat
the filesystem the same way (every task sees the shared FS), and nothing is
collected to the driver, so a 100M-file corpus costs a distributed pass
over paths, not a driver loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# HdfsFileFieldNames.java:25-40
FILE_FIELDS = [
    "file_upload_url",
    "file_download_url",
    "file_scheme",
    "file_host",
    "file_port",
    "file_path",
    "file_name",
    "file_length",
    "file_last_modified",
    "file_owner",
    "file_group",
    "file_permissions_user",
    "file_permissions_group",
    "file_permissions_other",
    "file_permissions_stickybit",
]


def enrich_file_metadata(df: DataFrame, with_posix: bool = False) -> DataFrame:
    """Attach ``file_*`` header columns derived from the scan metadata.

    Requires the input to have been read with the ``_metadata`` column
    selected (any file-based source).  ``base_id`` is the download URL, as in
    MorphlineMapRunner.getRecord.
    """
    meta = F.col("_metadata")
    url = meta["file_path"]
    parsed = F.parse_url(url, F.lit("HOST"))
    out = (
        df.withColumn("file_download_url", url)
        .withColumn("file_upload_url", url)
        .withColumn(
            "file_scheme",
            # regexp_extract yields "" (not NULL) on no match, so a
            # coalesce default never fires — scheme-less local paths
            # must still report "file" (PathParts' default scheme)
            F.when(
                F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
                == "",
                F.lit("file"),
            ).otherwise(
                F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
            ),
        )
        .withColumn("file_host", F.coalesce(parsed, F.lit("")))
        .withColumn(
            "file_port",
            # PathParts.getPort: the URI's explicit port, -1 when absent
            # (parse_url has no PORT part, so extract from AUTHORITY —
            # "host:8020" — with -1 for portless/authority-less URLs)
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        F.parse_url(url, F.lit("AUTHORITY")), r":(\d+)$", 1
                    ),
                    F.lit(""),
                ).cast("int"),
                F.lit(-1),
            ),
        )
        .withColumn("file_path", meta["file_path"])
        .withColumn("file_name", meta["file_name"])
        .withColumn("file_length", meta["file_size"].cast("long"))
        .withColumn(
            "file_last_modified",
            # millisecond precision: the reference reports HDFS mtime in
            # epoch millis; unix_timestamp() truncates to seconds, which
            # collapsed sub-second mtime ordering (retain-most-recent over
            # files written in the same second saw equal order keys)
            (meta["file_modification_time"].cast("double") * 1000)
            .cast("long"),
        )
        .withColumn("base_id", url)
    )
    if with_posix:
        posix = _posix_stats(out.select("file_path").distinct())
        out = out.join(F.broadcast(posix), "file_path", "left")
    return out


_POSIX_SCHEMA = (
    "file_path string, file_owner string, file_group string, "
    "file_permissions_user string, file_permissions_group string, "
    "file_permissions_other string, file_permissions_stickybit boolean"
)


def _posix_stats(paths_df: DataFrame) -> DataFrame:
    """Distributed ``os.stat`` over a one-column ``file_path`` DataFrame.

    Runs in ``mapInPandas`` so the stat calls happen where the tasks run
    (valid whenever executors mount the same filesystem as the scan — local
    mode, NFS, fuse mounts); unreachable paths yield null fields rather
    than failing the job (B22 stance)."""

    def stat_batches(batches):
        import os
        import stat as stat_mod
        from urllib.parse import urlparse

        import pandas as pd

        for pdf in batches:
            rows = []
            for f in pdf["file_path"]:
                local = urlparse(f).path or f
                try:
                    st = os.stat(local)
                    mode = st.st_mode
                    fm = stat_mod.filemode(mode)
                    rows.append(
                        (f, str(st.st_uid), str(st.st_gid),
                         fm[1:4], fm[4:7], fm[7:10],
                         bool(mode & stat_mod.S_ISVTX))
                    )
                except OSError:
                    rows.append((f, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_path", "file_owner", "file_group",
                    "file_permissions_user", "file_permissions_group",
                    "file_permissions_other", "file_permissions_stickybit",
                ],
            )

    return paths_df.mapInPandas(stat_batches, schema=_POSIX_SCHEMA)
