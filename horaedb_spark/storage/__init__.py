from horaedb_spark.storage.manifest import Manifest, SstFile
from horaedb_spark.storage.table import ColumnarTable, ScanRequest, WriteRequest

__all__ = ["Manifest", "SstFile", "ColumnarTable", "ScanRequest", "WriteRequest"]
