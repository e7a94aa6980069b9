"""ZIP archive ingestion (round 4, session 18).

Dataset drops and bulk-upload surfaces routinely arrive as ZIP archives
(the reference accepts one file per HTTP request — documents.py:16-26 —
but a real corpus lands as archives of thousands of members). This
source treats the archive as the unit of parallelism: archives split
across executors, each member becomes its own row with byte-exact
payload, per-member CRC verification, and per-ARCHIVE error isolation
(a corrupt central directory error-flags its rows, never the task).

Pure stdlib (zipfile over BytesIO) inside one Arrow-batched mapInPandas
— the same shape as the .warc.gz member walk (sources/warc.py), which
covers the crawl-native container; ZIP covers the dataset-drop one.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..scale.salt import ensure_parallelism

ZIP_MEMBER_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("member_idx", LongType()),
        StructField("name", StringType()),
        StructField("size", LongType()),
        StructField("compressed_size", LongType()),
        StructField("method", StringType()),
        StructField("crc_ok", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("error", StringType()),
    ]
)


def split_zip_members(
    df: DataFrame,
    archive_col: str = "archive",
    payload_col: str = "payload",
) -> DataFrame:
    """Explode ZIP archives into one row per member: (archive,
    member_idx, name, size, compressed_size, method, crc_ok, payload,
    error). Directories are skipped. ``crc_ok`` re-verifies the stored
    CRC-32 against the inflated bytes (zipfile checks on read — a
    mismatch surfaces as that MEMBER's error row, other members
    survive). A payload that isn't a ZIP at all yields one error row
    for the archive. Archives parallelize across executors; the member
    walk within one archive is sequential by format, exactly like the
    .warc.gz member walk — which is why bulk drops cap archive size."""
    sel = ensure_parallelism(
        df.selectExpr(
            f"{archive_col} as archive", f"{payload_col} as payload"
        )
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ZIP_MEMBER_SCHEMA.fields]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}

            def emit(**kw) -> None:
                for c in cols:
                    out[c].append(kw.get(c))

            for archive, payload in zip(pdf["archive"], pdf["payload"]):
                if payload is None:
                    emit(archive=archive, error="null payload")
                    continue
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(payload)))
                except (zipfile.BadZipFile, OSError) as e:
                    emit(archive=archive, error=f"BadZipFile: {e}")
                    continue
                idx = 0
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    method = {0: "stored", 8: "deflated"}.get(
                        info.compress_type, str(info.compress_type)
                    )
                    try:
                        data = zf.read(info.filename)
                        crc_ok = 1  # zipfile raises BadZipFile on CRC
                    except (zipfile.BadZipFile, OSError, NotImplementedError) as e:
                        emit(
                            archive=archive, member_idx=idx,
                            name=info.filename, size=info.file_size,
                            compressed_size=info.compress_size,
                            method=method, crc_ok=0,
                            error=f"{type(e).__name__}: {e}",
                        )
                        idx += 1
                        continue
                    emit(
                        archive=archive, member_idx=idx, name=info.filename,
                        size=len(data), compressed_size=info.compress_size,
                        method=method, crc_ok=crc_ok, payload=data,
                    )
                    idx += 1
            yield pd.DataFrame(out)

    return sel.mapInPandas(kernel, ZIP_MEMBER_SCHEMA)


def synthesize_zip_archives_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic ZIP per 10 documents: member d stores
    'doc-<d>.txt' with payload 'payload <d> ' * (d%4+1), stored and
    deflated members alternating; built in the SAME Arrow stage shape
    the reader uses."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    grouped = docs.select(
        (F.col("doc_id") / 10).cast("long").alias("g"),
        F.col("doc_id"),
    ).groupBy("g").agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, blobs = [], []
            for g, ids in zip(pdf["g"], pdf["ids"]):
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as zf:
                    for d in ids:
                        d = int(d)
                        body = (f"payload {d} " * (d % 4 + 1)).encode()
                        zf.writestr(
                            zipfile.ZipInfo(f"doc-{d}.txt"),
                            body,
                            compress_type=(
                                zipfile.ZIP_DEFLATED
                                if d % 2
                                else zipfile.ZIP_STORED
                            ),
                        )
                names.append(f"arc-{int(g)}.zip")
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"archive": names, "payload": blobs})

    return ensure_parallelism(grouped).mapInPandas(
        kernel, "archive string, payload binary"
    )


TAR_MEMBER_SCHEMA = StructType(
    [
        StructField("archive", StringType()),
        StructField("member_idx", LongType()),
        StructField("name", StringType()),
        StructField("size", LongType()),
        StructField("mtime", LongType()),
        StructField("payload", BinaryType()),
        StructField("error", StringType()),
    ]
)


def split_tar_members(
    df: DataFrame,
    archive_col: str = "archive",
    payload_col: str = "payload",
) -> DataFrame:
    """Explode tar / tar.gz archives into one row per regular-file
    member: (archive, member_idx, name, size, mtime, payload, error) —
    the ML-dataset-drop sibling of ``split_zip_members`` (tarballs
    dominate academic corpus releases). Compression sniffs from magic
    (gzip member vs plain ustar blocks), directories/links are skipped,
    and a torn archive keeps the members read so far plus ONE error row
    at the tear (tar has no central directory to salvage from — same
    prefix-kept contract as the .warc.gz walk)."""
    import tarfile

    sel = ensure_parallelism(
        df.selectExpr(
            f"{archive_col} as archive", f"{payload_col} as payload"
        )
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TAR_MEMBER_SCHEMA.fields]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}

            def emit(**kw) -> None:
                for c in cols:
                    out[c].append(kw.get(c))

            for archive, payload in zip(pdf["archive"], pdf["payload"]):
                if payload is None:
                    emit(archive=archive, error="null payload")
                    continue
                idx = 0
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(payload)), mode="r:*"
                    ) as tf:
                        while True:
                            info = tf.next()
                            if info is None:
                                break
                            if not info.isfile():
                                continue
                            data = tf.extractfile(info).read()
                            emit(
                                archive=archive, member_idx=idx,
                                name=info.name, size=len(data),
                                mtime=int(info.mtime), payload=data,
                            )
                            idx += 1
                except (tarfile.TarError, OSError, EOFError) as e:
                    emit(
                        archive=archive, member_idx=idx,
                        error=f"{type(e).__name__}: {e}",
                    )
            yield pd.DataFrame(out)

    return sel.mapInPandas(kernel, TAR_MEMBER_SCHEMA)


def synthesize_tar_archives_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic tarball per 10 documents (gzipped when the
    group index is odd): member d is 'docs/doc-<d>.txt' with payload
    'tar <d> ' * (d%5+1) and mtime 1700000000+d."""
    import gzip
    import tarfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    grouped = docs.select(
        (F.col("doc_id") / 10).cast("long").alias("g"),
        F.col("doc_id"),
    ).groupBy("g").agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, blobs = [], []
            for g, ids in zip(pdf["g"], pdf["ids"]):
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    for d in ids:
                        d = int(d)
                        body = (f"tar {d} " * (d % 5 + 1)).encode()
                        info = tarfile.TarInfo(f"docs/doc-{d}.txt")
                        info.size = len(body)
                        info.mtime = 1700000000 + d
                        tf.addfile(info, io.BytesIO(body))
                raw = buf.getvalue()
                if int(g) % 2 == 1:
                    raw = gzip.compress(raw, compresslevel=6, mtime=0)
                names.append(f"drop-{int(g)}.tar" + (".gz" if int(g) % 2 else ""))
                blobs.append(raw)
            yield pd.DataFrame({"archive": names, "payload": blobs})

    return ensure_parallelism(grouped).mapInPandas(
        kernel, "archive string, payload binary"
    )
