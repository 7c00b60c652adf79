from .json_dump import read_json_dump, split_corrupt, write_json_dump
from .tables import (
    TABLE_NAMES,
    cascading_delete,
    load_table,
    load_tables,
    mark_status,
    ordered_chunk_scan,
    register_views,
    storage_stats,
    write_json_backup,
    write_parquet,
)

__all__ = [
    "TABLE_NAMES",
    "cascading_delete",
    "load_table",
    "load_tables",
    "mark_status",
    "ordered_chunk_scan",
    "read_json_dump",
    "register_views",
    "split_corrupt",
    "storage_stats",
    "write_json_backup",
    "write_json_dump",
    "write_parquet",
]
