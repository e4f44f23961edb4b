"""File / table sources.

Reference parity map (SURVEY.md §2.1):

- ``read_parquet`` ↔ ``spark_client.py:107-115`` (prefix scan) and
  ``read_multiple_parquet_files`` ``spark_client.py:177-196``: the reference
  loops file-by-file and folds ``unionByName``; we issue ONE multi-path scan
  with ``mergeSchema`` so Catalyst plans splits and the scan parallelizes
  across the cluster instead of serializing on the driver.
- ``read_csv`` ↔ ``spark_client.py:117-175`` (``;`` default delimiter kept).
- ``read_json`` ↔ ``s3_client.py:291-299`` — executors read directly.
- ``read_jdbc`` ↔ the cursor streamers (``rs_client.py:537-551``,
  ``lynx_client.py:138-147``): server-side batch loops become a partitioned
  parallel JDBC read.
- ``read_records`` ↔ ``common.py:386-390`` list-of-dicts ingestion.
"""

from pyveb_spark.sources.connectors import (
    excel_sink,
    ftp_upload,
    match_filename,
    read_excel_df,
    sharepoint_download,
    sharepoint_upload,
    webdriver_download,
)
from pyveb_spark.sources.readers import (
    load_tables,
    read_csv,
    read_jdbc,
    read_json,
    read_parquet,
    read_records,
    read_table,
)

__all__ = [
    "load_tables",
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_parquet",
    "read_records",
    "read_table",
    "match_filename",
    "ftp_upload",
    "read_excel_df",
    "excel_sink",
    "sharepoint_download",
    "sharepoint_upload",
    "webdriver_download",
]
