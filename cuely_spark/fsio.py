"""Filesystem-portable metadata IO for index roots.

Index roots may live on any pyarrow-supported filesystem (local path,
file://, s3://, hdfs://, gs://): every non-Spark touch of an index root
— stats.json / manifests, segment-directory listings, parquet footer
counts, prune deletes — goes through these helpers instead of
os.listdir/open/shutil, so the same build/merge/live code runs when the
index root is an object store on a real cluster (the spark-submit
story). Spark itself already handles URIs via Hadoop FS.
"""

from __future__ import annotations

import json
import posixpath

from pyarrow import fs as pafs


def resolve(path: str):
    """-> (FileSystem, fs_internal_path)."""
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _parent(p: str) -> str:
    return posixpath.dirname(p.rstrip("/"))


def read_json(path: str):
    fs, p = resolve(path)
    with fs.open_input_stream(p) as f:
        return json.loads(f.read().decode("utf-8"))


def write_json(path: str, obj) -> None:
    fs, p = resolve(path)
    parent = _parent(p)
    if parent:
        fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(p) as f:
        f.write(json.dumps(obj, indent=1).encode("utf-8"))


def exists(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def rmtree(path: str) -> None:
    """Recursive delete, ignore-missing (prune semantics)."""
    fs, p = resolve(path)
    try:
        fs.delete_dir(p)
    except FileNotFoundError:
        pass


def list_subdirs(path: str) -> list[str]:
    """Base names of immediate subdirectories."""
    fs, p = resolve(path)
    sel = pafs.FileSelector(p, allow_not_found=True)
    return [i.base_name for i in fs.get_file_info(sel)
            if i.type == pafs.FileType.Directory]


def list_files(path: str, suffix: str = "") -> list[str]:
    """Base names of immediate files (optionally filtered by suffix)."""
    fs, p = resolve(path)
    sel = pafs.FileSelector(p, allow_not_found=True)
    return [i.base_name for i in fs.get_file_info(sel)
            if i.type == pafs.FileType.File
            and i.base_name.endswith(suffix)]


def parquet_num_rows(path: str) -> int:
    """Row count from one parquet file's footer."""
    import pyarrow.parquet as pq

    fs, p = resolve(path)
    with fs.open_input_file(p) as f:
        return pq.ParquetFile(f).metadata.num_rows


def join(base: str, *parts: str) -> str:
    """URI-safe path join (os.path.join is fine for plain paths but this
    is explicit about the '/' separator for URIs)."""
    out = base.rstrip("/")
    for part in parts:
        out += "/" + part.strip("/")
    return out
