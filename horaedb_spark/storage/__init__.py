from horaedb_spark.storage.backend import (
    FakeS3Backend,
    ObjectStoreBackend,
    PosixBackend,
    S3Backend,
    StorageBackend,
)
from horaedb_spark.storage.bucketed import BucketedMirror, BucketSpec
from horaedb_spark.storage.manifest import Manifest, SstFile
from horaedb_spark.storage.table import ColumnarTable, ScanRequest, WriteRequest

__all__ = [
    "Manifest",
    "SstFile",
    "ColumnarTable",
    "ScanRequest",
    "WriteRequest",
    "BucketSpec",
    "BucketedMirror",
    "StorageBackend",
    "PosixBackend",
    "ObjectStoreBackend",
    "FakeS3Backend",
    "S3Backend",
]
