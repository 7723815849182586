"""File-metadata enrichment (SURVEY §2 A6).

The reference attaches per-input-file header fields before the ETL pipeline
runs: download/upload URL, scheme, host, port, path, name, length,
last-modified, owner/group/permissions, plus ``base_id``
(mr/morphline/MorphlineMapRunner.java:218-255; field names
mr/HdfsFileFieldNames.java:25-40; URI decomposition mr/PathParts.java:31-133).

Spark-first: everything except owner/permissions comes from the scan itself
via the hidden ``_metadata`` struct (no extra I/O, no UDF).  POSIX
owner/group/permission bits are not exposed by Spark's file index; when needed
they come from a driver-side ``os.stat`` over the (small) file list, joined in
broadcast — the file list is tiny relative to the data.
"""

from __future__ import annotations

import os
import stat
from urllib.parse import urlparse

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
            F.coalesce(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1), F.lit("file")),
        )
        .withColumn("file_host", F.coalesce(parsed, F.lit("")))
        .withColumn("file_port", F.lit(-1).cast("int"))
        .withColumn("file_path", meta["file_path"])
        .withColumn("file_name", meta["file_name"])
        .withColumn("file_length", meta["file_size"].cast("long"))
        .withColumn(
            "file_last_modified",
            (F.unix_timestamp(meta["file_modification_time"]) * 1000).cast("long"),
        )
        .withColumn("base_id", url)
    )
    if with_posix:
        spark = df.sparkSession
        files = [r[0] for r in out.select("file_path").distinct().collect()]
        rows = []
        for f in files:
            local = urlparse(f).path or f
            try:
                st = os.stat(local)
                mode = st.st_mode
                rows.append(
                    (
                        f,
                        str(st.st_uid),
                        str(st.st_gid),
                        stat.filemode(mode)[1:4],
                        stat.filemode(mode)[4:7],
                        stat.filemode(mode)[7:10],
                        bool(mode & stat.S_ISVTX),
                    )
                )
            except OSError:
                rows.append((f, None, None, None, None, None, None))
        posix = spark.createDataFrame(
            rows,
            "file_path string, file_owner string, file_group string, "
            "file_permissions_user string, file_permissions_group string, "
            "file_permissions_other string, file_permissions_stickybit boolean",
        )
        out = out.join(F.broadcast(posix), "file_path", "left")
    return out
