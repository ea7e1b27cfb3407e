"""Object-store abstraction (reference S3 layer, re-expressed).

The reference's I/O helpers speak raw S3: paginated ``list_objects_v2``
key listing, parquet-suffix filtering, and text-blob puts
(``pasta1_etl/src/utils.py:16-43,46-66,69-84``). This module re-expresses
those semantics behind a path-scheme registry so the same call sites work
against a local directory tree today and an object store on a real
cluster (Spark itself reads/writes through its Hadoop FS layer either
way — this layer only covers the *driver-side* listing/log operations
the reference does outside Spark).

S3 semantics preserved exactly (mirrored by the reference's moto tests,
``pasta1_etl/tests/test_utils.py:36-88``):

- keys are ``/``-separated relative paths, listed RECURSIVELY — an S3
  bucket has no directories, so ``folder/file2.txt`` is one key;
- ``prefix`` is a plain string prefix of the whole key (not a glob, not
  anchored at path components);
- results come back in lexicographic key order;
- listings are PAGINATED (S3 caps pages at 1000 keys) — the iterator
  yields pages so callers never hold a 100 TB lake's listing in one list.

100 TB note: raw LIST on a big lake is itself a bottleneck (~5,500
requests/s per prefix; millions of objects = minutes of listing). The
page iterator keeps memory flat, but at that scale prefer a
catalog/manifest over enumeration — ``discover_files`` documents the
same caveat.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence
from urllib.parse import urlparse

PAGE_SIZE = 1000  # list_objects_v2 page cap


class LocalStore:
    """Directory-tree backend with S3 listing semantics."""

    def __init__(self, root: str):
        self.root = root

    def iter_pages(self, prefix: str = "", page_size: int = PAGE_SIZE) -> Iterator[list[str]]:
        keys = []
        for dirpath, _dirs, files in os.walk(self.root):
            rel = os.path.relpath(dirpath, self.root)
            for f in files:
                key = f if rel == "." else f"{rel.replace(os.sep, '/')}/{f}"
                if key.startswith(prefix):
                    keys.append(key)
        keys.sort()
        for i in range(0, len(keys), page_size):
            yield keys[i : i + page_size]
        if not keys:
            yield []

    def put_text(self, key: str, content: str) -> str:
        dest = os.path.join(self.root, *key.split("/"))
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        with open(dest, "w") as fh:
            fh.write(content)
        return dest

    def get_text(self, key: str) -> str:
        with open(os.path.join(self.root, *key.split("/"))) as fh:
            return fh.read()


def get_store(url: str):
    """Scheme registry (the analog of ``get_s3_client``,
    ``utils.py:16-28``): ``/local/path`` or ``file:///...`` → LocalStore;
    ``s3://`` / ``s3a://`` would map to an S3 client on a real deploy —
    deliberately unimplemented here (no boto3 in this environment) so a
    mis-configured path fails loudly instead of writing somewhere odd.
    """
    parsed = urlparse(url)
    if parsed.scheme in ("", "file"):
        return LocalStore(parsed.path or url)
    raise NotImplementedError(
        f"scheme {parsed.scheme!r} has no registered object store in this environment"
    )


def list_objects(url: str, prefix: str = "") -> list[str]:
    """All keys under ``url`` with ``prefix``, lexicographic — the
    reference's ``list_s3_objects`` (``utils.py:31-43``), pagination
    drained internally."""
    out: list[str] = []
    for page in get_store(url).iter_pages(prefix):
        out.extend(page)
    return out


def list_parquet_files(url: str, prefix: str = "") -> list[str]:
    """Sorted ``*.parquet`` keys — ``list_parquet_files_in_bucket``
    (``utils.py:46-66``)."""
    return sorted(k for k in list_objects(url, prefix) if k.endswith(".parquet"))


def save_text(url: str, key: str, content: str) -> str:
    """String put — ``save_file_content_in_s3`` (``utils.py:69-84``).
    Returns the concrete path written (backend-specific)."""
    return get_store(url).put_text(key, content)


__all__: Sequence[str] = (
    "LocalStore",
    "get_store",
    "list_objects",
    "list_parquet_files",
    "save_text",
    "PAGE_SIZE",
)
