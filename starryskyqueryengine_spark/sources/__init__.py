from .fixtures import TABLES, load_table, register_views  # noqa: F401
from .paged import fetcher_from_rows, paged_scan  # noqa: F401
