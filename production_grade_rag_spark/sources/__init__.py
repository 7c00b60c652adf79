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
    "register_views",
    "storage_stats",
    "write_json_backup",
    "write_parquet",
]
