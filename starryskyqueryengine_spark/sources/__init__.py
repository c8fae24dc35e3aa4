from .fixtures import TABLES, load_table, register_views  # noqa: F401
from .paged import fetcher_from_rows, paged_scan  # noqa: F401
from .table_changes import register_table_changes_source  # noqa: F401
