"""StorageBackend: the file-op substrate under tables, manifests, catalogs.

The reference is built on an object-store abstraction end-to-end
(columnar_storage/src/storage.rs:189-225 writes SSTs through
``ParquetObjectWriter`` to an ``ObjectStore``; manifest deltas are object
puts, manifest/mod.rs:131-157). Rounds 1-3 hard-coded POSIX calls
(``os.replace`` staging renames, ``os.listdir`` walks, local JSON manifest
files); this module factors every such call behind a small interface with
two implementations:

- ``PosixBackend`` — the prior behavior, byte-for-byte: atomic renames are
  real renames, staging directories move into place with ``os.replace``.
- ``ObjectStoreBackend`` — object-store SEMANTICS: there is no rename, so
  ``commit_dir`` publishes a staged SST by RETURNING ITS STAGING PATH for
  the manifest to reference (the "rename becomes a manifest-pointer move"
  design, SCALING.md §storage): data bytes are written once and never
  touched again; only the manifest changes. ``put_if_absent`` exposes the
  conditional-put every real object store has (S3 If-None-Match, GCS
  x-goog-if-generation-match: 0, ABS If-None-Match: *), which the manifest
  uses for lock-free multi-writer delta appends.

This in-repo implementation runs over a local directory (the container has
no cloud credentials); a real S3/GCS deployment subclasses
``ObjectStoreBackend`` and reroutes the primitive ops through its SDK —
every caller above this interface is already object-store-shaped. Spark
reads/writes parquet by path string in both cases (``spark_path`` is the
hook where ``s3a://`` URL translation would go).

Design rule for callers: LIST/READ/PUT/DELETE and conditional-put are the
only primitives; no caller may assume rename exists (``commit_dir`` is the
one publish verb, and its return value is the path of record).
"""

from __future__ import annotations

import os
import shutil
import threading


def threading_ident() -> int:
    return threading.get_ident()


class StorageBackend:
    """Primitive object ops. Paths are plain strings; directories are
    prefixes. Subclasses must implement everything."""

    name = "abstract"
    # True when commit_dir publishes in place (object store): staged paths
    # can then be LIVE data, so maintenance must treat staging dirs as
    # potentially referenced (by this manifest or by clones).
    commits_in_place = False

    # -- small objects (manifest deltas, schema, leases) -------------------

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def put_text(self, path: str, data: str) -> None:
        """Atomic publish of a small object (PUT semantics: readers see the
        old or the new content, never a torn write)."""
        raise NotImplementedError

    def put_if_absent(self, path: str, data: str) -> bool:
        """Conditional PUT: create the object only if it does not exist.
        Returns False (and writes nothing) when it does — the CAS primitive
        for multi-writer coordination."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Child names (not full paths) under a directory/prefix; [] if the
        prefix does not exist."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Delete one object; no error if missing."""
        raise NotImplementedError

    def delete_tree(self, path: str) -> None:
        """Recursive best-effort delete of a prefix."""
        raise NotImplementedError

    # -- directories / larger structures -----------------------------------

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def commit_dir(self, src: str, dst: str) -> str:
        """Publish a staged directory (one SST) at its final identity and
        return THE PATH OF RECORD for the manifest. POSIX renames and
        returns ``dst``; an object store cannot rename, so it returns
        ``src`` — the staged bytes are final and the manifest pointer is
        the only thing that moves."""
        raise NotImplementedError

    def copy_tree(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def walk_files(self, path: str, suffix: str = "") -> list[str]:
        """All file paths under a prefix (recursive), filtered by suffix."""
        raise NotImplementedError

    def open_binary(self, path: str):
        """File-like object for metadata reads (parquet footers)."""
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def spark_path(self, path: str) -> str:
        """Translate a backend path for Spark's reader/writer (s3a:// etc.);
        identity for local-backed implementations."""
        return path


class PosixBackend(StorageBackend):
    """Local filesystem: renames are renames (the rounds-1-3 behavior)."""

    name = "posix"

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def put_text(self, path: str, data: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}.{threading_ident()}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: str) -> bool:
        # Write the full content to a private temp object, then publish with
        # a hard link — exclusive AND content-atomic (a reader can never see
        # a created-but-unwritten object, matching object-store PUT
        # semantics where the object appears only when complete).
        tmp = f"{path}.tmp.{os.getpid()}.{threading_ident()}"
        with open(tmp, "w") as f:
            f.write(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_dir(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except OSError:
            pass

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def commit_dir(self, src: str, dst: str) -> str:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)
        return dst

    def copy_tree(self, src: str, dst: str) -> None:
        shutil.copytree(src, dst)

    def walk_files(self, path: str, suffix: str = "") -> list[str]:
        out: list[str] = []
        for dirpath, _dirs, files in os.walk(path):
            for name in files:
                if name.endswith(suffix):
                    out.append(os.path.join(dirpath, name))
        return sorted(out)

    def open_binary(self, path: str):
        return open(path, "rb")

    def size(self, path: str) -> int:
        return os.path.getsize(path)


# One durable "bucket" per (process, bucket name): reopening a FakeS3Backend
# must see the same objects, like a real bucket outlives any client.
_FAKE_BUCKETS: dict[str, str] = {}
_FAKE_BUCKETS_LOCK = threading.Lock()


class FakeS3Backend(StorageBackend):
    """A MinIO-style LOCAL FAKE of a cloud object store — the integration
    shim for the reference's ObjectStore data path
    (columnar_storage/src/storage.rs:189-225) in a container with no cloud
    credentials or SDK (no fsspec/s3fs baked in; SCALING.md §backends).

    Unlike ``ObjectStoreBackend`` (object-store *semantics* over the
    caller's local paths), this class emulates the full bucket model:

    - paths are ``s3://<bucket>/<key>`` URLs (plain local paths are also
      accepted and mapped into the bucket's key space, so the whole
      lifecycle suite parameterizes over it unchanged);
    - the key space is FLAT: ``makedirs`` is a no-op, directories exist
      only as common prefixes of keys (empty "dirs" don't exist at all);
    - ``list_dir`` is a real paginated prefix LIST with a delimiter:
      pages of ``page_size`` keys + continuation token, common prefixes
      reported once — the S3 ListObjectsV2 shape;
    - ``put_if_absent`` is the conditional PUT (If-None-Match emulated
      with an exclusive hard link on the mirror);
    - ``commit_dir`` cannot rename: the staged keys are final and the
      manifest pointer is the publish;
    - ``spark_path`` translates the URL to the bucket's local mirror
      directory — the exact hook where a real deployment returns the
      ``s3a://`` form for Spark's Hadoop connector.

    Objects are byte-for-byte files under a per-bucket mirror directory
    (created once per process); only this class touches the mirror —
    every caller above speaks URLs and object verbs."""

    name = "fake_s3"
    commits_in_place = True

    def __init__(self, bucket: str = "horaedb-test", page_size: int = 1000):
        import tempfile

        self.bucket = bucket
        self.page_size = page_size
        with _FAKE_BUCKETS_LOCK:
            if bucket not in _FAKE_BUCKETS:
                _FAKE_BUCKETS[bucket] = tempfile.mkdtemp(
                    prefix=f"fake_s3_{bucket}_"
                )
            self.mirror = _FAKE_BUCKETS[bucket]

    # -- key model ----------------------------------------------------------

    def _key(self, path: str) -> str:
        if path.startswith("s3://"):
            rest = path[len("s3://"):]
            bucket, _, key = rest.partition("/")
            if bucket != self.bucket:
                raise ValueError(f"wrong bucket {bucket!r} != {self.bucket!r}")
            return key.strip("/")
        return path.lstrip("/").rstrip("/")

    def _local(self, path: str) -> str:
        return os.path.join(self.mirror, self._key(path))

    def _all_keys(self, prefix: str) -> list[str]:
        """Every object key under a prefix (the bucket 'server side')."""
        base = os.path.join(self.mirror, prefix) if prefix else self.mirror
        out = []
        for dirpath, _dirs, files in os.walk(base):
            for name in files:
                full = os.path.join(dirpath, name)
                out.append(os.path.relpath(full, self.mirror))
        return sorted(out)

    def _list_page(
        self, prefix: str, token: int
    ) -> tuple[list[str], int | None]:
        """One LIST page: up to ``page_size`` keys starting at ``token``,
        plus the next continuation token (None when exhausted)."""
        keys = self._all_keys(prefix)
        page = keys[token : token + self.page_size]
        nxt = token + self.page_size
        return page, (nxt if nxt < len(keys) else None)

    # -- small objects ------------------------------------------------------

    def read_text(self, path: str) -> str:
        with open(self._local(path)) as f:
            return f.read()

    def put_text(self, path: str, data: str) -> None:
        local = self._local(path)
        os.makedirs(os.path.dirname(local), exist_ok=True)
        tmp = f"{local}.tmp.{os.getpid()}.{threading_ident()}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, local)  # mirror-internal: emulates atomic PUT

    def put_if_absent(self, path: str, data: str) -> bool:
        local = self._local(path)
        os.makedirs(os.path.dirname(local), exist_ok=True)
        tmp = f"{local}.tmp.{os.getpid()}.{threading_ident()}"
        with open(tmp, "w") as f:
            f.write(data)
        try:
            os.link(tmp, local)  # If-None-Match: * emulation
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def exists(self, path: str) -> bool:
        local = self._local(path)
        return os.path.isfile(local) or os.path.isdir(local)

    def list_dir(self, path: str) -> list[str]:
        """Immediate children under a prefix, via the paginated LIST:
        object keys one level down plus common prefixes ('directories')."""
        prefix = self._key(path)
        plen = len(prefix) + 1 if prefix else 0
        children: set[str] = set()
        token: int | None = 0
        while token is not None:
            page, token = self._list_page(prefix, token)
            for key in page:
                rel = key[plen:]
                children.add(rel.split("/", 1)[0])
        return sorted(children)

    def delete(self, path: str) -> None:
        try:
            os.unlink(self._local(path))
        except OSError:
            pass

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(self._local(path), ignore_errors=True)

    # -- directories / larger structures ------------------------------------

    def makedirs(self, path: str) -> None:
        pass  # a flat key space has no directories to create

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(self._local(path))

    def commit_dir(self, src: str, dst: str) -> str:
        return src  # staged keys are final; the manifest pointer moves

    def copy_tree(self, src: str, dst: str) -> None:
        shutil.copytree(self._local(src), self._local(dst))

    def walk_files(self, path: str, suffix: str = "") -> list[str]:
        prefix = self._key(path)
        sep = "s3://" + self.bucket + "/"
        return [
            sep + k
            for k in self._all_keys(prefix)
            if k.endswith(suffix)
        ]

    def open_binary(self, path: str):
        return open(self._local(path), "rb")

    def size(self, path: str) -> int:
        return os.path.getsize(self._local(path))

    def spark_path(self, path: str) -> str:
        """URL -> data-plane translation: Spark reads/writes the bucket's
        mirror directly (a cloud deployment returns the s3a:// form)."""
        return self._local(path)


class ObjectStoreBackend(PosixBackend):
    """Object-store semantics over a local directory: no renames.

    ``commit_dir`` leaves the staged bytes where they were written and
    returns the STAGING path — callers record it in the manifest (the
    pointer move). Everything else inherits the local primitives, which
    match object-store PUT/LIST/DELETE semantics closely enough for
    correctness testing: ``put_text`` is an atomic PUT, ``put_if_absent``
    is a conditional PUT (S3 If-None-Match), ``list_dir`` is a prefix
    LIST. A cloud deployment overrides the primitives with SDK calls and
    inherits the same commit/manifest behavior."""

    name = "object_store"
    commits_in_place = True

    def commit_dir(self, src: str, dst: str) -> str:
        return src  # no rename on an object store: the pointer moves instead


class S3Backend(StorageBackend):
    """The REAL cloud object-store backend: every verb below is the literal
    boto3 S3 call for it — ``get_object`` / ``put_object`` (conditional via
    ``IfNoneMatch='*'``) / ``head_object`` / paginated ``list_objects_v2``
    with a delimiter / batched ``delete_objects`` / ``copy_object`` — the
    SDK counterpart of the reference's opendal ObjectStore layering
    (columnar_storage/src/storage.rs:189-225).

    The client is INJECTABLE (any object speaking the boto3 S3 client
    surface), so the URL handling, pagination walking, conditional-PUT
    error mapping and batch-delete chunking — the logic that actually goes
    wrong against a bucket — is fully unit-tested in this repo against an
    API-faithful stub (tests/test_backend.py) even though the sandbox has
    no SDK or network; with no client passed, boto3 imports lazily and a
    missing SDK raises a named ImportError. Semantics notes:

    - S3 is strongly read-after-write consistent (since 2020), so the
      manifest CAS (``put_if_absent`` -> conditional PUT, documented by
      AWS to be atomic per key) carries the same multi-writer guarantees
      the FakeS3 suite proves;
    - the key space is flat: ``makedirs`` is a no-op, ``commit_dir``
      cannot rename (staged keys are final; the manifest pointer is the
      publish — same contract as ObjectStoreBackend/FakeS3Backend);
    - ``spark_path`` returns the ``s3a://`` form for Spark's Hadoop
      connector (scheme configurable for S3-compatible stores).
    """

    name = "s3"
    commits_in_place = True

    def __init__(
        self,
        bucket: str,
        client=None,
        page_size: int = 1000,
        spark_scheme: str = "s3a",
    ):
        if client is None:
            try:
                import boto3  # not baked into this container
            except ImportError as e:  # pragma: no cover - env without SDK
                raise ImportError(
                    "S3Backend needs boto3 (pip install boto3) or an "
                    "injected client object speaking the boto3 S3 surface"
                ) from e
            client = boto3.client("s3")  # pragma: no cover
        self.bucket = bucket
        self.client = client
        self.page_size = page_size
        self.spark_scheme = spark_scheme

    # -- key model (same URL handling as FakeS3Backend) ----------------------

    def _key(self, path: str) -> str:
        if path.startswith("s3://"):
            rest = path[len("s3://"):]
            bucket, _, key = rest.partition("/")
            if bucket != self.bucket:
                raise ValueError(f"wrong bucket {bucket!r} != {self.bucket!r}")
            return key.strip("/")
        return path.lstrip("/").rstrip("/")

    def _url(self, key: str) -> str:
        return f"s3://{self.bucket}/{key}"

    @staticmethod
    def _error_code(exc: Exception) -> str:
        """botocore.ClientError carries ``e.response['Error']['Code']`` —
        read it duck-typed so injected stubs need no botocore import."""
        resp = getattr(exc, "response", None) or {}
        return str(resp.get("Error", {}).get("Code", ""))

    def _list(self, prefix: str, delimiter: str = ""):
        """Walk list_objects_v2 pages; yields (keys, common_prefixes) per
        page. Continuation handled here so NO caller can forget it — the
        classic truncated-LIST bug class."""
        token = None
        while True:
            kwargs = {
                "Bucket": self.bucket,
                "Prefix": prefix,
                "MaxKeys": self.page_size,
            }
            if delimiter:
                kwargs["Delimiter"] = delimiter
            if token:
                kwargs["ContinuationToken"] = token
            page = self.client.list_objects_v2(**kwargs)
            yield (
                [o["Key"] for o in page.get("Contents", [])],
                [p["Prefix"] for p in page.get("CommonPrefixes", [])],
            )
            if not page.get("IsTruncated"):
                return
            token = page.get("NextContinuationToken")

    # -- small text objects (manifest/meta) ----------------------------------

    def read_text(self, path: str) -> str:
        obj = self.client.get_object(Bucket=self.bucket, Key=self._key(path))
        return obj["Body"].read().decode("utf-8")

    def put_text(self, path: str, data: str) -> None:
        self.client.put_object(
            Bucket=self.bucket, Key=self._key(path), Body=data.encode("utf-8")
        )

    def put_if_absent(self, path: str, data: str) -> bool:
        """Conditional PUT: ``IfNoneMatch='*'`` fails with 412 when the key
        exists — S3's native CAS primitive (AWS docs: conditional writes),
        exactly the exclusivity the manifest snapshot protocol needs.

        Concurrent conditional PUTs racing on ONE key can also surface 409
        ``ConditionalRequestConflict`` ("a conflicting conditional
        operation is currently in progress... Retry") — the outcome is
        UNKNOWN, not lost, so the correct CAS behavior is to re-attempt
        until the request resolves to success or a definitive 412."""
        import time as _time

        for attempt in range(8):
            try:
                self.client.put_object(
                    Bucket=self.bucket,
                    Key=self._key(path),
                    Body=data.encode("utf-8"),
                    IfNoneMatch="*",
                )
                return True
            except Exception as e:
                code = self._error_code(e)
                if code in ("PreconditionFailed", "412"):
                    return False
                if code == "ConditionalRequestConflict" and attempt < 7:
                    _time.sleep(0.05 * (attempt + 1))
                    continue
                raise
        raise RuntimeError("unreachable")  # pragma: no cover

    # -- existence / listing --------------------------------------------------

    def exists(self, path: str) -> bool:
        key = self._key(path)
        if key:  # head_object rejects an empty key (bucket root is a prefix)
            try:
                self.client.head_object(Bucket=self.bucket, Key=key)
                return True
            except Exception as e:
                if self._error_code(e) not in ("404", "NoSuchKey", "NotFound"):
                    raise
        # a "directory" exists iff any key lives under the prefix
        for keys, prefixes in self._list(key + "/" if key else ""):
            if keys or prefixes:
                return True
        return False

    def list_dir(self, path: str) -> list[str]:
        key = self._key(path)
        prefix = key + "/" if key else ""
        children: set[str] = set()
        for keys, prefixes in self._list(prefix, delimiter="/"):
            children.update(k[len(prefix):] for k in keys)
            children.update(p[len(prefix):].rstrip("/") for p in prefixes)
        children.discard("")
        return sorted(children)

    def is_dir(self, path: str) -> bool:
        key = self._key(path)
        for keys, prefixes in self._list(key + "/" if key else ""):
            if keys or prefixes:
                return True
        return False

    # -- deletes ---------------------------------------------------------------

    def delete(self, path: str) -> None:
        self.client.delete_object(Bucket=self.bucket, Key=self._key(path))

    def delete_tree(self, path: str) -> None:
        key = self._key(path)
        # LIST fully BEFORE deleting: interleaving deletes with a paginated
        # LIST skips keys (the continuation cursor moves through a shrinking
        # result) — caught by the stub-client test. Key counts here are
        # SST-file scale, driver-side metadata.
        all_keys = [
            k
            for keys, _prefixes in self._list(key + "/" if key else "")
            for k in keys
        ]
        for i in range(0, len(all_keys), 1000):  # delete_objects hard cap
            self.client.delete_objects(
                Bucket=self.bucket,
                Delete={"Objects": [{"Key": k} for k in all_keys[i : i + 1000]]},
            )
        # the path itself may be a bare object (FakeS3 delete_tree parity)
        self.client.delete_object(Bucket=self.bucket, Key=key)

    # -- directories / larger structures --------------------------------------

    def makedirs(self, path: str) -> None:
        pass  # flat key space

    def commit_dir(self, src: str, dst: str) -> str:
        return src  # no rename: the manifest pointer is the publish

    def copy_tree(self, src: str, dst: str) -> None:
        skey, dkey = self._key(src), self._key(dst)
        # same rule as delete_tree: LIST fully BEFORE mutating — with dst
        # under the src prefix, copies written mid-LIST would sort into
        # later pages and be re-listed and re-copied (unbounded growth)
        all_keys = [
            k
            for keys, _prefixes in self._list(skey + "/" if skey else "")
            for k in keys
        ]
        for k in all_keys:
            self.client.copy_object(
                Bucket=self.bucket,
                Key=dkey + k[len(skey):],
                CopySource={"Bucket": self.bucket, "Key": k},
            )

    def walk_files(self, path: str, suffix: str = "") -> list[str]:
        key = self._key(path)
        out = []
        for keys, _prefixes in self._list(key + "/" if key else ""):
            out.extend(self._url(k) for k in keys if k.endswith(suffix))
        return out

    def open_binary(self, path: str):
        import io

        obj = self.client.get_object(Bucket=self.bucket, Key=self._key(path))
        # pyarrow needs a seekable stream; footers are metadata-sized
        return io.BytesIO(obj["Body"].read())

    def size(self, path: str) -> int:
        head = self.client.head_object(Bucket=self.bucket, Key=self._key(path))
        return int(head["ContentLength"])

    def spark_path(self, path: str) -> str:
        return f"{self.spark_scheme}://{self.bucket}/{self._key(path)}"
